"""The full analysis pipeline: raw logs → parsed facts → five reports.

Spark re-expression of the reference lifecycle (SURVEY.md §3.1):

1. scan + parse (narrow stage, all codegen'd expressions),
2. enrichment via broadcast joins (still narrow — no fact shuffle),
3. optional Parquet materialization of the fact frame (the reference's
   ``processed.json``, analyze_slow_queries.py:141-142, and its TODO :62),
4. persist-once fan-out into five grouped aggregations.

Observability: dropped-row reasons are surfaced with ``observe()`` named
metrics — the Spark-native form of the reference's aggregated incident
logger (analyze_slow_queries.py:209-292).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from cassandra_slow_queries_spark.config import AnalysisConfig
from cassandra_slow_queries_spark.functions.parse import (
    add_log_columns,
    parse_bound_values,
    parse_timestamp,
)
from cassandra_slow_queries_spark.operators.aggregates import five_reports
from cassandra_slow_queries_spark.operators.dispatch import is_enriched, statement_type
from cassandra_slow_queries_spark.operators.enrich import (
    apply_query_patterns,
    attach_primary_key,
    resolve_keyspace_cf,
    table_segment_expr,
)

FACT_COLUMNS = [
    "ts",
    "type",
    "duration",
    "query",
    "bound_values",
    "tags",
    "keyspace",
    "column_family",
    "primary_key",
]


def parse_messages(
    raw: DataFrame,
    spark: SparkSession,
    config: AnalysisConfig,
    observation: Observation | None = None,
    with_incidents: bool = False,
) -> DataFrame:
    """Raw log frame ``(ts_raw, message, tags)`` → parsed fact frame
    (schema per FIXTURES.md A2 / analyze_slow_queries.py:917-926).

    Rows the reference would raise-and-skip on are filtered: unparseable
    timestamp or log grammar, non-integer duration, or no matching
    statement processor (:932-934, :1296-1304).

    ``observation``: drop-accounting metrics (n_input / n_bad_ts /
    n_bad_grammar / n_unknown_statement / n_parsed) collected at action
    time — the Spark-native form of the reference's warn counters.
    ``with_incidents``: keep a ``_incidents`` array column of per-row
    warning tags for :func:`incident_report` (off the hot path by
    default).
    """
    pre = (
        add_log_columns(raw.withColumn("ts", parse_timestamp("ts_raw")))
        .select("ts", "tags", "_duration_str", "_counts", "_bv_str", "_raw_query")
        # try_cast, not cast: ANSI mode (Spark 4 default) raises
        # CAST_INVALID_INPUT on e.g. 'took 12.5 ms:' and aborts the job;
        # the reference drops the row (analyze_slow_queries.py:1296-1300).
        # NULL feeds the validity filter + n_bad_grammar counter below.
        .withColumn("duration", F.col("_duration_str").try_cast("long"))
        .withColumn("type", statement_type(F.col("_raw_query")))
        # Pushdown barrier: PushDownPredicates substitutes filter columns
        # through every projection below, which would compile the validity
        # filter into one scan-level predicate containing the ENTIRE parse
        # chain (measured: a 472 KB Filter re-evaluating ~1900 locate()s
        # per input row — 40× the whole pipeline cost). A nondeterministic
        # project blocks all predicate pushdown through it — but ONLY while
        # the column is referenced (ColumnPruning would otherwise drop it
        # and re-open the hole), hence the `_row_id >= 0` conjunct in the
        # validity filter below. Streaming plans reject
        # monotonically_increasing_id, so they use rand() (both are ≥ 0).
        .withColumn(
            "_row_id",
            F.rand(42) if raw.isStreaming else F.monotonically_increasing_id(),
        )
    )
    if observation is not None:
        pre = pre.observe(
            observation,
            F.count(F.lit(1)).alias("n_input"),
            F.count_if(F.col("ts").isNull()).alias("n_bad_ts"),
            F.count_if(F.col("duration").isNull()).alias("n_bad_grammar"),
            F.count_if(
                F.col("duration").isNotNull() & F.col("type").isNull()
            ).alias("n_unknown_statement"),
            F.count_if(
                F.col("ts").isNotNull()
                & F.col("duration").isNotNull()
                & F.col("type").isNotNull()
            ).alias("n_parsed"),
        )
    parsed = pre.filter(
        F.col("ts").isNotNull()
        & F.col("duration").isNotNull()
        & F.col("type").isNotNull()
        # always true; keeps _row_id referenced so the barrier project
        # stays nondeterministic (see comment above)
        & (F.col("_row_id") >= 0)
    )

    # Bound values parse for SELECT/INSERT (BATCH/DELETE/UPDATE carry an
    # empty map — reference ret default, :922).
    empty_map = F.create_map().cast("map<string,string>")
    parsed = parsed.withColumn(
        "_bv_parsed",
        F.when(
            is_enriched("type") & F.col("_bv_str").isNotNull(),
            parse_bound_values(F.col("_bv_str")),
        ).otherwise(empty_map),
    )

    # Pattern rewrite applies to SELECT only (analyze_slow_queries.py:641-646);
    # pattern-extracted values override parsed bound values (dict.update →
    # map_concat under LAST_WIN).
    rewritten = apply_query_patterns(F.col("_raw_query"), config.queries)
    parsed = (
        parsed.withColumn(
            "_rw", F.when(F.col("type") == "SELECT", rewritten)
        )
        .withColumn(
            "query", F.coalesce(F.col("_rw.query"), F.col("_raw_query"))
        )
        .withColumn(
            "bound_values",
            F.when(
                F.col("_rw").isNotNull(),
                F.map_concat(F.col("_bv_parsed"), F.col("_rw.bound_values")),
            ).otherwise(F.col("_bv_parsed")),
        )
    )

    # Table segment → keyspace / column family → primary key (broadcast joins).
    parsed = parsed.withColumn(
        "table_segment", table_segment_expr(F.col("type"), F.col("query"))
    )
    parsed = resolve_keyspace_cf(parsed, spark, config)
    # Non-enriched types carry no ks/cf at all (reference returns only
    # type/duration/query for BATCH/DELETE/UPDATE).
    parsed = parsed.withColumn(
        "keyspace", F.when(is_enriched("type"), F.col("keyspace"))
    ).withColumn(
        "column_family", F.when(is_enriched("type"), F.col("column_family"))
    )
    parsed = attach_primary_key(parsed, spark, config)
    parsed = parsed.withColumn(
        "primary_key", F.when(is_enriched("type"), F.col("primary_key"))
    ).withColumn(
        "bound_values", F.when(is_enriched("type"), F.col("bound_values")).otherwise(empty_map)
    )
    if config.ignored_column_families:
        # Reference TODO (analyze_slow_queries.py:61): drop configured
        # noise CFs. Accepts bare "cf" and qualified "ks.cf" entries;
        # unresolved rows (NULL cf) are never ignored.
        ignore = [e.lower() for e in config.ignored_column_families]
        qualified = F.concat_ws(".", F.col("keyspace"), F.col("column_family"))
        parsed = parsed.filter(
            F.col("column_family").isNull()
            | ~(F.col("column_family").isin(ignore) | qualified.isin(ignore))
        )
    if with_incidents:
        # Aggregated-incident-logger analog (analyze_slow_queries.py:209-292):
        # tag the same conditions the reference warns on, per row.
        enriched = is_enriched("type")
        tags_arr = F.array(
            F.when(
                enriched & F.col("table_segment").isNull(),
                F.lit("no table segment in query"),
            ),
            F.when(
                enriched
                & F.col("table_segment").isNotNull()
                & (F.col("keyspace").isNull() | F.col("column_family").isNull()),
                F.lit("unable to resolve keyspace/column family"),
            ),
            F.when(
                enriched
                & F.col("keyspace").isNotNull()
                & F.col("column_family").isNotNull()
                & F.col("primary_key").isNull(),
                F.lit("no schema entry for keyspace.column_family"),
            ),
            F.when(
                F.col("_bv_str").isNotNull() & (F.size("bound_values") == 0),
                F.lit("bad bound values"),
            ),
        )
        parsed = parsed.withColumn(
            "_incidents", F.filter(tags_arr, lambda t: t.isNotNull())
        )
        return parsed.select(*FACT_COLUMNS, "_incidents")
    return parsed.select(*FACT_COLUMNS)


def incident_report(fact_with_incidents: DataFrame) -> DataFrame:
    """``(incident, count)`` sorted ascending by count — the flush order
    of the reference's incident logger (T4, analyze_slow_queries.py:255-261)."""
    return (
        fact_with_incidents.select(F.explode("_incidents").alias("incident"))
        .groupBy("incident")
        .agg(F.count("*").alias("count"))
        .orderBy("count", "incident")
    )


def run_analysis(
    spark: SparkSession,
    raw: DataFrame,
    config: AnalysisConfig,
    fact_parquet_path: str | None = None,
    shared_shuffle: bool = True,
) -> dict[str, DataFrame]:
    """Parse + enrich, optionally materialize the fact frame to Parquet
    (the re-analyzable intermediate), then build the five reports.

    ``shared_shuffle=True`` (default) uses the single GROUPING SETS pass
    — measured ~3.7× faster than the persist+fan-out at 2M rows and the
    right shape at 100 TB (one input pass; see SURVEY.md §4). The
    fan-out remains available for callers that consume a single report.
    Either way the persisted intermediate's lifecycle is tied to this
    one-shot job (the CLI / driver pattern); long-lived sessions should
    pass ``fact_parquet_path`` which needs no cache at all.
    """
    from cassandra_slow_queries_spark.operators.aggregates import (
        five_reports_shared_shuffle,
    )

    fact = parse_messages(raw, spark, config)
    if fact_parquet_path:
        fact.write.mode("overwrite").parquet(fact_parquet_path)
        fact = spark.read.parquet(fact_parquet_path)
    elif not shared_shuffle:
        fact = fact.persist(StorageLevel.MEMORY_AND_DISK)
    if shared_shuffle:
        return five_reports_shared_shuffle(fact, config)
    return five_reports(fact, config)


def parse_observation() -> Observation:
    """Named-metric observation to attach on the raw frame for drop
    accounting (incident-logger analog)."""
    return Observation("parse_metrics")
