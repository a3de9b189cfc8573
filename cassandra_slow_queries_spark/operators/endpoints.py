"""J5: hot-key → cluster-endpoint enrichment (find_pk_nodes.py:53-87).

The reference shells out to ``nodetool getendpoints <ks> <cf> <pk>`` once
per CSV row — the single per-row external side effect in the whole
system. In a distributed job that becomes a batched ``mapInPandas``
stage: Arrow hands each executor a batch of keys, the lookup runs once
per batch partition (rate-limitable, idempotent), and the endpoint list
comes back as a typed array column.

Two lookup providers:

- ``"nodetool"`` — the real subprocess call, one per key, batched per
  Arrow chunk. Requires a Cassandra installation on the executors; gated
  behind an explicit provider choice and raises ``NotImplementedError``
  in this container (no nodetool binary), with the call-shape kept
  faithful to find_pk_nodes.py:79-84.
- ``"fake"`` — deterministic stand-in: the replica set is derived from
  the md5 of ``ks.cf.pk`` (first hex digit → ring position), mimicking
  token-ring placement. Fully SQL-expressible, so the operator is
  oracle-checkable end-to-end (plans/catalog.py ``j5_endpoints``).

At 100 TB the right design is the offline variant anyway: snapshot the
token ring once (driver-side ``nodetool ring``), broadcast it, and range
-join tokens — avoiding per-row subprocess calls entirely. The provider
seam here is where that snapshot join plugs in.
"""

from __future__ import annotations

import hashlib
import subprocess
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

HEX_DIGITS = "0123456789abcdef"


def fake_endpoints(keyspace: str, cf: str, pk: str, n_nodes: int, rf: int) -> list[str]:
    """Deterministic replica set: md5 first hex digit → ring offset,
    ``rf`` consecutive nodes (mod ring size) — SQL-mirrorable."""
    digest = hashlib.md5(f"{keyspace}.{cf}.{pk}".encode()).hexdigest()
    base = HEX_DIGITS.index(digest[0]) % n_nodes
    return [f"node{(base + i) % n_nodes}" for i in range(rf)]


def nodetool_endpoints(keyspace: str, cf: str, pk: str) -> list[str]:
    """The reference's call shape (find_pk_nodes.py:79-84)."""
    out = subprocess.run(
        ["nodetool", "getendpoints", keyspace, cf, pk],
        capture_output=True,
        text=True,
        check=True,
    )
    return [line.strip() for line in out.stdout.splitlines() if line.strip()]


def attach_endpoints(
    df: DataFrame,
    keyspace_col: str = "keyspace",
    cf_col: str = "column_family",
    pk_col: str = "primary_key",
    provider: str = "fake",
    n_nodes: int = 6,
    rf: int = 3,
) -> DataFrame:
    """Append ``endpoints array<string>`` via an Arrow-batched
    ``mapInPandas`` stage (J5)."""
    if provider not in ("fake", "nodetool"):
        raise ValueError(f"unknown provider {provider!r}")

    out_schema = StructType(
        list(df.schema.fields) + [StructField("endpoints", ArrayType(StringType()))]
    )

    def lookup_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if provider == "fake":
                pdf = pdf.assign(
                    endpoints=[
                        fake_endpoints(ks, cf, pk, n_nodes, rf)
                        for ks, cf, pk in zip(
                            pdf[keyspace_col], pdf[cf_col], pdf[pk_col]
                        )
                    ]
                )
            else:
                # one subprocess per key, same as the reference loop
                # (find_pk_nodes.py:79-84) — executors must have nodetool
                # on PATH. The call+parse shape is unit-tested against a
                # fake `nodetool` executable (tests/test_streaming_endpoints);
                # batch-level dedup below bounds the subprocess count by
                # DISTINCT keys per batch, not rows.
                keys = list(
                    zip(pdf[keyspace_col], pdf[cf_col], pdf[pk_col])
                )
                cache: dict[tuple, list[str]] = {}
                for k in keys:
                    if k not in cache:
                        cache[k] = nodetool_endpoints(*k)
                pdf = pdf.assign(endpoints=[cache[k] for k in keys])
            yield pdf

    return df.mapInPandas(lookup_batches, out_schema)


def filter_pks_spanning_nodes(
    enriched: DataFrame,
    nodes: list[str],
    endpoints_col: str = "endpoints",
) -> DataFrame:
    """Keep only rows whose replica set covers ALL the given nodes — the
    reference's "3 node hotspot" TODO (analyze_slow_queries.py:70:
    "Filter reports to only PKs that cross all nodes in whitelist").

    Pure Catalyst set containment (``array_except(wanted, endpoints)``
    empty), evaluated row-local after the J5 endpoint attach — no
    shuffle, no Python."""
    if not nodes:  # empty whitelist: vacuously spanned
        return enriched
    want = F.array(*[F.lit(n) for n in nodes])
    return enriched.filter(
        F.array_size(F.array_except(want, F.col(endpoints_col))) == 0
    )


def endpoints_report(enriched: DataFrame, max_endpoints: int = 6) -> DataFrame:
    """K3: fixed-width endpoint columns ``Endpoint0..EndpointN-1``
    (find_pk_nodes.py:90-117 prints exactly 6 header columns)."""
    # F.get, not getItem: slots past the replica count must be NULL, and
    # ANSI mode (Spark 4 default) raises on out-of-bounds getItem
    cols = [
        F.get(F.col("endpoints"), i).alias(f"Endpoint{i}")
        for i in range(max_endpoints)
    ]
    return enriched.select(
        *[c for c in enriched.columns if c != "endpoints"], *cols
    )
