"""Multimodal columns: opaque binary payloads + typed metadata (Tier 3).

Design per the north star: image/audio/video travel as ``binary`` columns
with a metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the one sanctioned Python surface — per-batch, not
per-row). The actual codecs aren't available in this environment, so the
decode step is STUBBED: ``decoder="fake"`` produces deterministic
hash-derived features (full plumbing testable end-to-end), and
``decoder="real"`` raises ``NotImplementedError`` where a PIL/ffmpeg call
would go. The Spark-side contract — schemas, batch iteration, partition
sizing — is real.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

# Canonical multimodal record: payload + metadata columns.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("format", StringType()),  # png|jpeg|wav|mp4|...
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def binary_metadata(content: Column | str) -> Column:
    """Typed metadata struct for an opaque binary column — native
    expressions (no decode needed): byte length + content digest."""
    c = F.col(content) if isinstance(content, str) else content
    return F.struct(
        F.length(c).cast("long").alias("n_bytes"),
        F.sha2(c, 256).alias("sha256"),
    )


def attach_binary_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    meta = binary_metadata(content_col)
    return df.withColumn("n_bytes", meta["n_bytes"]).withColumn(
        "sha256", meta["sha256"]
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: bytes →
    rolling FNV-ish hash per dimension, scaled to [0, 1)."""
    feats = []
    h = 1469598103934665603
    for i in range(FEATURE_DIM):
        h ^= i + 1
        for b in payload[i :: FEATURE_DIM] or b"\x00":
            h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        feats.append((h >> 11) / float(1 << 53))
    return feats


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: str = "fake",
    batch_hint: int = 1024,
) -> DataFrame:
    """Decode + featurize media payloads via Arrow-batched mapInPandas.

    ``decoder='real'`` marks where an actual codec (PIL / torchaudio /
    ffmpeg) plugs in — not available in this environment.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present "
                    "in this environment; use decoder='fake' for plumbing"
                )
            payloads = pdf[content_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": payloads.map(len),
                    "features": payloads.map(_fake_features),
                }
            )

    narrow = df.select(id_col, content_col)
    return narrow.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: annotates each media row with the
    frame indices a decoder should extract (metadata-only; the decode
    itself goes through extract_features). Downstream shape is one row
    per (media, frame) via ``explode`` — see catalog ``mm_frame_sample``,
    which pairs each planned frame with a content-addressed digest of
    the payload window it covers."""
    return df.withColumn(
        "sample_frames",
        F.sequence(F.lit(0), F.lit(every_n * (FEATURE_DIM - 1)), F.lit(every_n)),
    )


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: str = "fake",
) -> DataFrame:
    """Resize stub behind the same decode seam as extract_features: the
    output contract (one row per input, ``content`` exactly
    ``width*height`` bytes, ``n_bytes`` matching) is real and tested;
    ``decoder='fake'`` produces a deterministic byte surface by tiling
    the source payload (content-dependent, so tests can pin identity),
    ``decoder='real'`` raises where PIL/ffmpeg scaling would run."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    n_out = width * height

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media resizing requires codec libraries not present "
                    "in this environment; use decoder='fake' for plumbing"
                )
            def tile(b) -> bytes:
                # NULL payloads tile like empty ones (defensive, matching
                # the rest of the multimodal surface) — never TypeError
                # inside the executor
                b = bytes(b) if b is not None else b""
                return ((b or b"\x00") * (n_out // max(len(b), 1) + 1))[:n_out]

            payloads = pdf[content_col].map(tile)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": payloads,
                    "n_bytes": payloads.map(len),
                }
            )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("content", BinaryType()),
            StructField("n_bytes", LongType()),
        ]
    )
    return df.select(id_col, content_col).mapInPandas(run, out_schema)
