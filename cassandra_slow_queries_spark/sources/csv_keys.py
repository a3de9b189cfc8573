"""Hot-key CSV input for the endpoint enricher (SURVEY.md S7/F6).

Reference (find_pk_nodes.py:26-50): read CSV with header, keep rows having
keyspace / column family / primary key in the first three columns, drop
short rows and rows carrying the ``'truncated output'`` marker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_slow_keys_csv(spark: SparkSession, path: str) -> DataFrame:
    """→ ``(keyspace string, column_family string, primary_key string)``."""
    # escape='"': the input is written by Python's csv module
    # (RFC 4180 doubled quotes); Spark's default escape is backslash,
    # which would leave `"a,""b"""` unparsed (caught by the
    # find_pk_nodes differential test).
    df = (
        spark.read.option("header", "true")
        .option("escape", '"')
        .csv(path)
    )
    cols = df.columns[:3]
    if len(cols) < 3:
        raise ValueError(f"expected ≥3 CSV columns, got {df.columns}")
    out = df.select(
        F.col(cols[0]).alias("keyspace"),
        F.col(cols[1]).alias("column_family"),
        F.col(cols[2]).alias("primary_key"),
    )
    return out.filter(
        F.col("keyspace").isNotNull()
        & F.col("column_family").isNotNull()
        & F.col("primary_key").isNotNull()
        & ~F.col("primary_key").contains("truncated output")
    )
