"""The five-report aggregation core (SURVEY.md §2.6, A1-A5 + F3 + T1-T3).

The reference feeds five hash aggregates from one pass over the parsed
records (analyze_slow_queries.py:986-1124). Two Spark shapes, both exact:

- :func:`five_reports` — persist the fact once, five independent grouped
  aggregations (clear, composable, single-report friendly);
- :func:`five_reports_shared_shuffle` — ONE ``GROUPING SETS`` pass:
  Expand ×5 → one hash aggregate → one shuffle, reports as
  ``grouping_id()`` slices. Measured ~3.7× faster on a 2M-row fact
  (SURVEY.md §4) because one input pass beats five cache passes + five
  job schedules; at 100 TB (cache spills to disk) the gap widens. This
  is the production default in plans/pipeline.py ``run_analysis``.

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


def prepare_fact(fact: DataFrame, tz: str | None = None) -> DataFrame:
    """Normalize the parsed fact frame for aggregation: NULL dims → ``''``
    (reference :1007-1009) and the minute bucket string (:1010).

    ``tz`` (reference TODO analyze_slow_queries.py:58 "Convert time
    output to local timezone"): an IANA zone name shifts the REPORT
    buckets only — ``ts`` itself stays the UTC instant, so windowed /
    streaming semantics and cross-engine oracles are unaffected."""
    bucket_ts = F.from_utc_timestamp("ts", tz) if tz else F.col("ts")
    return fact.select(
        F.col("ts"),
        F.col("type"),
        F.col("duration"),
        F.col("query"),
        F.coalesce(F.col("primary_key"), F.lit("")).alias("primary_key"),
        F.coalesce(F.col("keyspace"), F.lit("")).alias("keyspace"),
        F.coalesce(F.col("column_family"), F.lit("")).alias("column_family"),
        minute_bucket(bucket_ts).alias("minute"),
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
    return _carried_dims_post(agg, fact, keys, config)


def _carried_dims_post(
    agg: DataFrame, fact: DataFrame, keys: list[str], config: AnalysisConfig
) -> DataFrame:
    """Steps 2-3 of :func:`_report_with_carried_dims`, off an already
    aggregated ``(keys..., count, duration, _min_ts)`` frame (shared by
    the per-report and grouping-sets paths)."""
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
    prepared = prepare_fact(fact, tz=config.report_timezone)
    return {
        "query": query_report(prepared, config),
        "query_pk": query_pk_report(prepared, config),
        "primary_key": primary_key_report(prepared, config),
        "volume": volume_report(prepared, config),
        "volume_top": volume_top_report(prepared, config),
    }


# grouping-set membership bitmasks over (query, pk, ks, cf, minute):
# grouping_id() sets bit i (MSB = first groupBy column) when the column
# is AGGREGATED AWAY in that set
_GS_COLS = ["query", "primary_key", "keyspace", "column_family", "minute"]
_GID = {
    "query": 0b01111,
    "query_pk": 0b00111,
    "primary_key": 0b10001,
    "volume": 0b11110,
    "volume_top": 0b00110,
}


def five_reports_shared_shuffle(
    fact: DataFrame, config: AnalysisConfig
) -> dict[str, DataFrame]:
    """The five reports as ONE ``GROUPING SETS`` aggregation — the
    single-shuffle alternative SURVEY.md §4 left open.

    One Expand (×5 per input row) feeds one hash aggregate and one
    shuffle keyed on the synthetic grouping id; each report is a
    ``_gid`` slice of the persisted result with the same post-processing
    (HAVING / top-N / carried-dims back-join) as the fan-out path.
    Per-report row filters (A2's pk≠'', A3's three-dims-present) commute
    with grouping on those same columns, so they apply post-agg to the
    slices.

    Measured at sf0.1 (see bench note in SURVEY.md §4): one shared
    Expand pass beats the persist-once fan-out by ~3.7× end-to-end, so
    this IS the production default (``run_analysis(shared_shuffle=True)``
    in plans/pipeline.py); the fan-out path remains available for
    clusters where the ×5 Expand row stream is the binding constraint.

    The five report frames are eagerly materialized (they are top-N /
    per-minute sized, i.e. tiny) so the grouping-sets intermediate can be
    unpersisted before returning — no storage residue in long-lived
    sessions.
    """
    prepared = prepare_fact(fact, tz=config.report_timezone)
    gs = (
        prepared.groupingSets(
            [
                ["query"],
                ["query", "primary_key"],
                ["keyspace", "column_family", "primary_key"],
                ["minute"],
                ["minute", "query", "primary_key"],
            ],
            *[F.col(c) for c in _GS_COLS],
        )
        .agg(
            *_measures(),
            F.min("ts").alias("_min_ts"),
            F.grouping_id().alias("_gid"),
        )
        .persist()
    )

    def slice_(name: str, *extra) -> DataFrame:
        out = gs.filter(F.col("_gid") == _GID[name])
        for cond in extra:
            out = out.filter(cond)
        return out.drop("_gid")

    a1 = _carried_dims_post(slice_("query"), prepared, ["query"], config)
    a2 = _carried_dims_post(
        slice_("query_pk", F.col("primary_key") != ""),
        prepared.filter(F.col("primary_key") != ""),
        ["query", "primary_key"],
        config,
    )
    a3_keys = ["keyspace", "column_family", "primary_key"]
    a3 = top_n(
        _with_avg(
            _having(
                slice_(
                    "primary_key",
                    (F.col("primary_key") != "")
                    & (F.col("keyspace") != "")
                    & (F.col("column_family") != ""),
                ).select(*a3_keys, "count", "duration"),
                config,
            )
        ),
        config.order_by,
        config.top_n,
        tiebreaks=a3_keys,
    )
    a4 = (
        _with_avg(
            _having(slice_("volume").select("minute", "count", "duration"), config)
        ).orderBy("minute")
    )
    a5_cells = _with_avg(
        _having(
            slice_("volume_top").select(
                "minute", "query", "primary_key", "count", "duration"
            ),
            config,
        )
    )
    a5 = grouped_top_k(
        a5_cells,
        ["minute"],
        config.order_by,
        config.rows_per_minute,
        tiebreaks=["query", "primary_key"],
    ).orderBy("minute", F.col(config.order_by).desc(), "query", "primary_key")
    reports = {
        "query": a1,
        "query_pk": a2,
        "primary_key": a3,
        "volume": a4,
        "volume_top": a5,
    }
    # materialize the (tiny) reports while the grouping-sets cache is
    # hot, then release it — same lifecycle contract as
    # dedup._materialize_release; unpersist in finally so a failed
    # materialization can't leak the cache
    try:
        reports = {
            name: df.localCheckpoint(eager=True) for name, df in reports.items()
        }
    finally:
        gs.unpersist()
    return reports
