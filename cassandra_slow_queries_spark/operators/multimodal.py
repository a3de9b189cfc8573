"""Multimodal columns: opaque binary payloads + typed metadata (Tier 3).

Design per the north star: image/audio/video travel as ``binary`` columns
with a metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the one sanctioned Python surface — per-batch, not
per-row). Two decoders share every seam:

- ``decoder="fake"`` — deterministic hash-derived features / tiled
  resize surfaces, importable anywhere, keeps the full plumbing
  (schemas, batch iteration, partition sizing) testable end-to-end;
- ``decoder="real"`` — IMPORT-GUARDED Pillow path (round-5 verdict
  item 6): decodes image payloads with ``PIL.Image`` inside the
  executor batches when Pillow is importable there, and raises a clear
  ``NotImplementedError`` naming the missing dependency otherwise (this
  container ships no codec libraries — the PIL tier is exercised by
  ``pytest.importorskip`` tests that run wherever Pillow exists).
  Audio/video codecs (torchaudio/ffmpeg) remain stub-only.
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

# Byte width of the payload window each sampled frame digests
# (q_mm_frame_sample and the mm_suite consolidation, Spark AND oracle
# sides — one constant so the four sites cannot drift).
FRAME_WINDOW_BYTES = 16

# Fake-decoder resize target used by the mm_resize / mm_suite gates on
# both engine sides; output is always RESIZE_W * RESIZE_H bytes.
RESIZE_W, RESIZE_H = 24, 16

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


def _require_pil():
    """Import Pillow or fail with an actionable message. Called INSIDE
    the mapInPandas batches so the check runs on the executor that
    would do the decoding (driver and executors can differ)."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "decoder='real' requires Pillow on the executors "
            "(pip install Pillow); use decoder='fake' for plumbing-only "
            "runs in codec-less environments"
        ) from exc
    return Image


def _pil_features(Image, payload: bytes | None) -> list[float]:
    """Decode an image payload and reduce it to FEATURE_DIM floats: the
    4×4 grayscale thumbnail, scaled to [0, 1] — deterministic, and a
    genuine content feature (nearby images → nearby vectors), unlike
    the hash-derived fake. Undecodable payloads fail the job loudly —
    silently null features would poison downstream similarity search."""
    import io

    img = Image.open(io.BytesIO(bytes(payload or b"")))
    thumb = img.convert("L").resize((4, 4))
    return [p / 255.0 for p in thumb.getdata()]


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

    ``decoder='real'`` decodes IMAGE payloads with Pillow when it is
    importable on the executors (4×4 grayscale thumbnail →
    ``FEATURE_DIM`` floats in [0, 1]); without Pillow it raises a clear
    ``NotImplementedError`` at first batch. ``decoder='fake'`` is the
    codec-free deterministic stand-in.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        featurize = _fake_features
        if decoder == "real":
            Image = _require_pil()
            featurize = lambda payload: _pil_features(Image, payload)  # noqa: E731

        for pdf in batches:
            payloads = pdf[content_col]
            # NULL payloads: NULL metrics, never TypeError inside the
            # executor (len(None)/subscript) — the resize_media contract
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": payloads.map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "features": payloads.map(
                        lambda p: featurize(p) if p is not None else None
                    ),
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
    if every_n < 1:
        # 0 would build a step-0 sequence that fails deep in the job;
        # negatives would silently plan nonsense negative frame indices
        raise ValueError(f"every_n must be >= 1, got {every_n}")
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
    """Resize behind the same decode seam as extract_features: the
    output contract (one row per input, ``content`` exactly
    ``width*height`` bytes, ``n_bytes`` matching) is identical for both
    decoders. ``decoder='fake'`` produces a deterministic byte surface
    by tiling the source payload (content-dependent, so tests can pin
    identity); ``decoder='real'`` decodes with Pillow where importable
    on the executors (grayscale resample to width×height, raw ``L``
    bytes out — exactly ``width*height`` of them) and raises the clear
    ``NotImplementedError`` otherwise."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    n_out = width * height

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        import pandas as pd

        Image = _require_pil() if decoder == "real" else None

        def pil_resize(b) -> bytes:
            img = Image.open(io.BytesIO(bytes(b or b"")))
            return img.convert("L").resize((width, height)).tobytes()

        for pdf in batches:
            def tile(b) -> bytes:
                # NULL payloads tile like empty ones (defensive, matching
                # the rest of the multimodal surface) — never TypeError
                # inside the executor
                b = bytes(b) if b is not None else b""
                return ((b or b"\x00") * (n_out // max(len(b), 1) + 1))[:n_out]

            payloads = pdf[content_col].map(
                pil_resize if decoder == "real" else tile
            )
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
