"""Physical-plan audits for the flagship production pipeline — the
100 TB claims pinned mechanically, not by docstring: the parse stage is
pure JVM expressions (no Python eval node anywhere), the schema
dimensions join as broadcasts (never a shuffled SMJ against a KB-sized
dim), the report aggregation is a fixed-buffer HashAggregate (folding
carried dims into the buffer would silently flip it to SortAggregate —
the regression _report_with_carried_dims exists to prevent), and the
shared five-report pass expands the fact exactly once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.config import AnalysisConfig
from cassandra_slow_queries_spark.operators.aggregates import (
    five_reports_shared_shuffle,
    query_report,
)
from cassandra_slow_queries_spark.plans.pipeline import parse_messages


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        (
            f"2024-01-01T10:{i % 3:02d}:{i % 60:02d}.123456Z",
            f"INFO Query too slow, took {100 + i} ms: [1 bound values] "
            f"SELECT * FROM ks1.events WHERE a=? LIMIT 10; [a:'v{i % 4}']",
            ["prod"],
        )
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "ts_raw string, message string, tags array<string>"
    )


@pytest.fixture(scope="module")
def config():
    return AnalysisConfig(
        schema={"ks1": {"events": {"primary_key": ["a"], "clustering_key": []}}},
        tags={"prod": "ks1"},
        min_count=1,
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parse_stage_is_jvm_only_with_broadcast_dims(spark, raw, config):
    fact = parse_messages(raw, spark, config)
    plan = _plan(fact)
    # the hot path must never cross into Python per-row evaluation
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan
    # both schema dims (cf→keyspace guess, pk fields) join as broadcasts
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_report_corpus_agg_is_hash_not_sort(spark, raw, config):
    fact = parse_messages(raw, spark, config)
    plan = _plan(query_report(fact, config))
    assert "HashAggregate" in plan
    # folding carried ks/cf strings into the agg buffer demotes the
    # whole corpus pass to SortAggregate — the exact regression the
    # top-N back-join design avoids. SortAggregate is legitimate ONLY
    # on the bounded subtrees: the KB-sized cf→keyspace schema dim and
    # the ≤top_n-row min(struct) dims back-join. No corpus measure
    # (count/sum of duration) may ever appear under one.
    for line in plan.splitlines():
        if "SortAggregate" in line:
            assert "min(keyspace" in line or "min(struct(keyspace" in line, line
            assert "sum(duration" not in line, line


def test_shared_shuffle_reports_come_back_materialized(spark, raw, config):
    """The five-report production path materializes each (tiny) report
    while the single grouping-sets cache is hot, then releases the
    cache: every returned frame must plan as a checkpointed scan — NOT
    as a live subtree that would silently re-run the corpus aggregation
    on every downstream action (the 3.7×-measured design, SURVEY §4,
    and the no-storage-residue lifecycle contract)."""
    fact = parse_messages(raw, spark, config).persist()
    try:
        reports = five_reports_shared_shuffle(fact, config)
        for name, df in reports.items():
            plan = _plan(df)
            assert "ExistingRDD" in plan or "LocalTableScan" in plan, (
                name, plan,
            )
            assert "Expand" not in plan, name  # agg already executed
    finally:
        fact.unpersist()
