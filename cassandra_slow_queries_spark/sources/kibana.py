"""Kibana/Elasticsearch `_msearch` result JSON → raw log DataFrame.

Reference behavior (analyze_slow_queries.py:1264-1306): iterate
``responses[*].hits.hits[*]._source``; read ``@timestamp``, ``message``
with ``@message`` fallback, ``tags`` defaulting to ``[]``; keep only rows
whose message contains ``'Query too slow'``; malformed hits are warned and
skipped (permissive).

Spark-first shape: one multi-path ``spark.read.json`` (multi-file union =
S4 for free), an explicit nested schema (never infer on 100 TB of JSON),
two ``explode``s, and the cheap ``contains`` filter placed before any
regex parsing so Catalyst keeps it at the scan (SURVEY.md §4). Corrupt
records land in ``_corrupt_record`` (PERMISSIVE) and are counted, not
crashed on — the dead-letter analog of the reference's warn-and-skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SLOW_QUERY_FILTER = "Query too slow"

# Explicit nested schema for the `_msearch` response envelope
# (FIXTURES.md A1; pre-ES7 integer hits.total).
SOURCE_SCHEMA = StructType(
    [
        StructField("@timestamp", StringType()),
        StructField("message", StringType()),
        StructField("@message", StringType()),
        StructField("tags", ArrayType(StringType())),
    ]
)
# Per-response shard accounting (download_slow_queries.py:110-128 reads
# _shards.failures[].reason.reason and logs each; the failed count is the
# cheap aggregate).
SHARDS_SCHEMA = StructType(
    [
        StructField("total", LongType()),
        StructField("successful", LongType()),
        StructField("failed", LongType()),
        StructField(
            "failures",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "reason",
                            StructType([StructField("reason", StringType())]),
                        )
                    ]
                )
            ),
        ),
    ]
)
KIBANA_SCHEMA = StructType(
    [
        StructField(
            "responses",
            ArrayType(
                StructType(
                    [
                        StructField("_shards", SHARDS_SCHEMA),
                        StructField(
                            "hits",
                            StructType(
                                [
                                    StructField("total", LongType()),
                                    StructField(
                                        "hits",
                                        ArrayType(
                                            StructType(
                                                [StructField("_source", SOURCE_SCHEMA)]
                                            )
                                        ),
                                    ),
                                ]
                            ),
                        )
                    ]
                )
            ),
        ),
        StructField("_corrupt_record", StringType()),
    ]
)


def _scan(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """The ONE Kibana scan contract (schema + PERMISSIVE + multiLine +
    corrupt-record column) every reader in this module shares — the
    hits path, the shard-failure report, and the corrupt-record
    accounting must stay byte-for-byte the same scan, or the drop
    metrics stop describing the frame they claim to mirror."""
    if isinstance(paths, str):
        paths = [paths]
    return (
        spark.read.schema(KIBANA_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("multiLine", "true")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(paths)
    )


def read_kibana_json(
    spark: SparkSession,
    paths: list[str] | str,
    filter_slow: bool = True,
) -> DataFrame:
    """Read one or more Kibana `_msearch` JSON files into the raw-log frame
    ``(ts_raw string, message string, tags array<string>)``.

    ``message`` applies the ``@message`` fallback (reference :1287-1290)
    and ``tags`` the ``[]`` default (:1291-1294). With ``filter_slow`` the
    ``'Query too slow'`` containment filter (:1295) is applied here so it
    sits directly above the scan.
    """
    if isinstance(paths, str):
        paths = [paths]
    raw = _scan(spark, paths)

    hits = (
        raw.filter(F.col("_corrupt_record").isNull())
        .select(F.explode("responses").alias("response"))
        .select(F.explode("response.hits.hits").alias("hit"))
        .select(
            F.col("hit._source.@timestamp").alias("ts_raw"),
            F.coalesce(
                F.col("hit._source.message"), F.col("hit._source.@message")
            ).alias("message"),
            F.coalesce(
                F.col("hit._source.tags"),
                F.array().cast("array<string>"),
            ).alias("tags"),
        )
        .filter(F.col("message").isNotNull())
    )
    if filter_slow:
        hits = hits.filter(F.col("message").contains(SLOW_QUERY_FILTER))
    return hits


def shard_failure_report(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Per-file shard-failure accounting — the engine-side analog of the
    reference's ``_log_failures`` (download_slow_queries.py:110-128),
    which peeks each page response for ``"failures":`` and logs every
    ``_shards.failures[].reason.reason``.

    Returns ``(file, n_failed_shards, reasons array<string>)`` — one row
    per input file that reported at least one failed shard. A failed
    shard means that page's hits are silently INCOMPLETE; surfacing it is
    the difference between "report ran" and "report ran over partial
    data". Same explicit-schema scan as :func:`read_kibana_json`, so the
    check is one cheap extra pass (only ``_shards`` columns are read).
    """
    if isinstance(paths, str):
        paths = [paths]
    raw = _scan(spark, paths)
    per_response = (
        raw.filter(F.col("_corrupt_record").isNull())
        .select(
            F.input_file_name().alias("file"),
            F.explode("responses").alias("response"),
        )
        .select(
            "file",
            F.coalesce(F.col("response._shards.failed"), F.lit(0)).alias(
                "n_failed"
            ),
            F.coalesce(
                F.transform(
                    F.col("response._shards.failures"),
                    lambda fl: fl["reason"]["reason"],
                ),
                F.array().cast("array<string>"),
            ).alias("reasons"),
        )
    )
    return (
        per_response.groupBy("file")
        .agg(
            F.sum("n_failed").alias("n_failed_shards"),
            F.flatten(F.collect_list("reasons")).alias("reasons"),
        )
        .filter(F.col("n_failed_shards") > 0)
    )


def corrupt_record_count(spark: SparkSession, paths: list[str] | str) -> int:
    """Dead-letter observability: number of unparseable top-level records."""
    if isinstance(paths, str):
        paths = [paths]
    raw = _scan(spark, paths)
    # Spark disallows querying only the corrupt-record column from a raw
    # JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    # the documented workaround is to cache the parsed frame first.
    raw = raw.cache()
    try:
        return raw.filter(F.col("_corrupt_record").isNotNull()).count()
    finally:
        raw.unpersist()
