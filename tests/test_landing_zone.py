"""Date-partitioned landing zone: the 100 TB ingest layout.

At scale the parsed fact frame lands as Parquet partitioned by day
(`plans/pipeline.py` materializes the intermediate; this is its
partitioned variant). These tests pin the two properties that make the
layout pay off: a date filter must reach the scan as a PARTITION filter
(only matching directories are read — static pruning), and a join
against a filtered dimension must plan a dynamic-partition-pruning
subquery when DPP is enabled (`session.py` ships it off by default for
driver-time reasons at tiny scale; SPARK_GRAFT_DPP=1 or the runtime
conf turns it on for real clusters).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_SMALL), reason="driver testdata not present"
)


def _formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _events(spark):
    # catalog.load normalizes the TIMESTAMP(NANOS) ts column (read as
    # long under the nanosAsLong conf) to a real timestamp
    from cassandra_slow_queries_spark.plans.catalog import load

    return load(spark, SF_SMALL, "events")


@pytest.fixture(scope="module")
def zone(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("landing") / "events_by_day")
    events = _events(spark)
    events.withColumn("day", F.to_date("ts")).write.partitionBy(
        "day"
    ).mode("overwrite").parquet(out)
    return out


def test_static_partition_pruning(spark, zone):
    back = spark.read.parquet(zone)
    days = [r["day"] for r in back.select("day").distinct().collect()]
    assert len(days) > 1, "fixture needs multiple day partitions"
    target = sorted(days)[0]
    q = back.filter(F.col("day") == F.lit(target)).groupBy("event_type").agg(
        F.count("*").alias("cnt")
    )
    plan = _formatted_plan(q)
    assert "PartitionFilters" in plan
    # the day predicate must appear among partition filters, NOT as a
    # data filter — i.e. pruning happens at planning, not per row
    part_section = plan[plan.index("PartitionFilters") :]
    assert "day" in part_section.splitlines()[0]


def test_pruned_read_matches_full_scan(spark, zone):
    back = spark.read.parquet(zone)
    target = sorted(
        r["day"] for r in back.select("day").distinct().collect()
    )[0]
    pruned = (
        back.filter(F.col("day") == F.lit(target))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )
    events = _events(spark)
    full = (
        events.filter(F.to_date("ts") == F.lit(target))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_dynamic_partition_pruning_plan(spark, zone):
    """With DPP on, a join whose dim side is filtered plans a
    dynamicpruning expression on the partitioned fact scan."""
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        back = spark.read.parquet(zone)
        days = sorted(
            r["day"] for r in back.select("day").distinct().collect()
        )
        dim = spark.createDataFrame(
            [(d, i) for i, d in enumerate(days)], "day date, flag int"
        ).filter(F.col("flag") == 0)
        joined = back.join(dim, "day").groupBy("event_type").agg(
            F.count("*").alias("cnt")
        )
        plan = _formatted_plan(joined)
        assert "dynamicpruning" in plan.lower()
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )
