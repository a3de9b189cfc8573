"""The five-report aggregation core (SURVEY.md §2.6, A1-A5 + F3 + T1-T3).

The reference feeds five hash aggregates from one pass over the parsed
records (analyze_slow_queries.py:986-1124). The Spark shape: **persist the
parsed fact DataFrame once**, then declare five independent grouped
aggregations off it — each is a single map-side-combined hash aggregate,
and Catalyst handles partial aggregation, spill, and AQE coalescing.
(A grouping-sets megaquery could share one shuffle, but the five branches
have different filters and grain; clarity wins — SURVEY.md §4.)

Shared post-aggregation semantics, pinned to the reference:

- HAVING ``count >= min_count`` (:1077-1091);
- ``avg_duration = floor(sum_duration / count)`` as BIGINT — the
  reference's Python-2 truncating ``int(v['duration'] / v['count'])``
  (:1093-1104) — NOT ``avg()``'s double;
- NULL grouping dims coalesce to ``''`` (:1007-1009);
- top-N / per-minute top-K with the configured ``order_by`` key.

Determinism divergences (documented, tested): carried dims on A1/A2 use
earliest-timestamp-wins (``min(struct(ts, ...))``) instead of the
reference's nondeterministic first-seen-in-input-order; the volume report
is sorted by minute (the reference's TODO :55 admits its emission order is
a Python-2 dict artifact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.config import AnalysisConfig
from cassandra_slow_queries_spark.functions.parse import minute_bucket
from cassandra_slow_queries_spark.operators.topk import grouped_top_k, top_n


def _measures() -> list:
    return [
        F.count("*").alias("count"),
        F.sum("duration").alias("duration"),
    ]


def _with_avg(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "avg_duration", F.floor(F.col("duration") / F.col("count")).cast("long")
    )


def _having(df: DataFrame, config: AnalysisConfig) -> DataFrame:
    return df.filter(F.col("count") >= config.min_count)


def prepare_fact(fact: DataFrame) -> DataFrame:
    """Normalize the parsed fact frame for aggregation: NULL dims → ``''``
    (reference :1007-1009) and the minute bucket string (:1010)."""
    return fact.select(
        F.col("ts"),
        F.col("type"),
        F.col("duration"),
        F.col("query"),
        F.coalesce(F.col("primary_key"), F.lit("")).alias("primary_key"),
        F.coalesce(F.col("keyspace"), F.lit("")).alias("keyspace"),
        F.coalesce(F.col("column_family"), F.lit("")).alias("column_family"),
        minute_bucket("ts").alias("minute"),
    )


def _report_with_carried_dims(
    fact: DataFrame, keys: list[str], config: AnalysisConfig
) -> DataFrame:
    """A1/A2 core with the carried-dims fetch split off the big
    aggregation.

    The reference carries ks/cf from the first record that created each
    cell (analyze_slow_queries.py:1015-1022). Folding strings (or a
    struct) into the aggregation buffer forces SortAggregate — the whole
    fact stream gets map-side sorted. Instead:

    1. hash-aggregate (count, sum, ``min(ts)``) — fixed-size buffer, so
       the 100 TB pass stays a map-side-combined HashAggregate;
    2. HAVING + top-N first (``TakeOrderedAndProject``; ranking never
       needs the dims) → at most ``top_n`` rows survive;
    3. broadcast those rows back against the fact (already persisted for
       the five-report fan-out) matching on keys + ``ts == min(ts)``, and
       take ``min(struct(ks, cf))`` over the handful of matches.

    Result is deterministic (earliest timestamp wins; lexicographic
    (ks, cf) on exact ts ties) and identical to aggregating
    ``min(struct(ts, ks, cf))`` directly — pinned by tests.
    """
    agg = fact.groupBy(*keys).agg(*_measures(), F.min("ts").alias("_min_ts"))
    out = _with_avg(_having(agg, config))
    top = top_n(out, config.order_by, config.top_n, tiebreaks=keys)
    probe = top.select(*keys, "_min_ts")
    match_cond = [F.col(f"f.{k}") == F.col(f"p.{k}") for k in keys]
    match_cond.append(F.col("f.ts") == F.col("p._min_ts"))
    dims = (
        fact.alias("f")
        .join(F.broadcast(probe.alias("p")), on=match_cond)
        .groupBy(*[F.col(f"p.{k}").alias(k) for k in keys])
        .agg(F.min(F.struct("f.keyspace", "f.column_family")).alias("_d"))
    )
    order = [F.col(config.order_by).desc()] + [F.col(k) for k in keys]
    return (
        top.join(F.broadcast(dims), on=keys, how="left")
        .select(
            *keys,
            "count",
            "duration",
            F.col("_d.keyspace").alias("keyspace"),
            F.col("_d.column_family").alias("column_family"),
            "avg_duration",
        )
        .orderBy(*order)
    )


def query_report(fact: DataFrame, config: AnalysisConfig) -> DataFrame:
    """A1: per-query-shape totals; carried ks/cf come from the
    earliest-timestamp record in the group (deterministic stand-in for the
    reference's first-seen, :1015-1022)."""
    return _report_with_carried_dims(fact, ["query"], config)


def query_pk_report(fact: DataFrame, config: AnalysisConfig) -> DataFrame:
    """A2: (query, primary_key) totals for rows with a primary key."""
    return _report_with_carried_dims(
        fact.filter(F.col("primary_key") != ""), ["query", "primary_key"], config
    )


def primary_key_report(fact: DataFrame, config: AnalysisConfig) -> DataFrame:
    """A3: (keyspace, column_family, primary_key) totals, all three present."""
    agg = (
        fact.filter(
            (F.col("primary_key") != "")
            & (F.col("keyspace") != "")
            & (F.col("column_family") != "")
        )
        .groupBy("keyspace", "column_family", "primary_key")
        .agg(*_measures())
    )
    out = _with_avg(_having(agg, config))
    return top_n(
        out,
        config.order_by,
        config.top_n,
        tiebreaks=["keyspace", "column_family", "primary_key"],
    )


def volume_report(fact: DataFrame, config: AnalysisConfig) -> DataFrame:
    """A4/T3: per-minute totals, sorted by minute (the reference *intends*
    timestamp order — :1113 comment vs TODO :55)."""
    agg = fact.groupBy("minute").agg(*_measures())
    return _with_avg(_having(agg, config)).orderBy("minute")


def volume_top_report(fact: DataFrame, config: AnalysisConfig) -> DataFrame:
    """A5/T2: per-minute (query, primary_key) cells, HAVING-filtered, then
    top ``rows_per_minute`` per minute by the configured key."""
    agg = fact.groupBy("minute", "query", "primary_key").agg(*_measures())
    cells = _with_avg(_having(agg, config))
    return grouped_top_k(
        cells,
        ["minute"],
        config.order_by,
        config.rows_per_minute,
        tiebreaks=["query", "primary_key"],
    ).orderBy("minute", F.col(config.order_by).desc(), "query", "primary_key")


def five_reports(fact: DataFrame, config: AnalysisConfig) -> dict[str, DataFrame]:
    """All five reports off one (caller-persisted) fact frame."""
    prepared = prepare_fact(fact)
    return {
        "query": query_report(prepared, config),
        "query_pk": query_pk_report(prepared, config),
        "primary_key": primary_key_report(prepared, config),
        "volume": volume_report(prepared, config),
        "volume_top": volume_top_report(prepared, config),
    }
