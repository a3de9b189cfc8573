"""Custom Python DataSource (sources/pyds.py) and the VARIANT
semi-structured path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.sources import pyds


def _read(spark, partitions, rows):
    pyds.register(spark)
    return (
        spark.read.format("slowquerygen")
        .option("partitions", partitions)
        .option("rowsperpartition", rows)
        .load()
    )


def test_pyds_generation_rule(spark):
    rows = {r["gid"]: r for r in _read(spark, 2, 10).collect()}
    assert len(rows) == 20
    for gid, r in rows.items():
        stmt, table, duration, n_bound = pyds.gen_row(gid)
        assert (r["statement"], r["table_ref"]) == (stmt, table)
        assert (r["duration"], r["n_bound"]) == (duration, n_bound)


def test_pyds_partition_independence(spark):
    # same 120 global rows whether served by 2, 3, or 8 partitions
    frames = [
        sorted(map(tuple, _read(spark, p, 120 // p).collect()))
        for p in (2, 3, 8)
    ]
    assert frames[0] == frames[1] == frames[2]


def test_pyds_parallel_scan_partitions(spark):
    df = _read(spark, 5, 10)
    assert df.rdd.getNumPartitions() == 5


def test_variant_extract_and_try_semantics(spark):
    df = spark.createDataFrame(
        [('{"k": 7, "tags": ["a"]}',), ('{"k": 7',), (None,)],
        "p string",
    )
    v = F.try_parse_json("p")
    out = df.select(
        v.isNull().alias("bad"),
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.try_variant_get(v, "$.missing", "int").alias("m"),
        F.try_variant_get(v, "$.tags[0]", "string").alias("t0"),
    ).collect()
    assert [r["bad"] for r in out] == [False, True, True]
    assert [r["k"] for r in out] == [7, None, None]
    assert out[0]["m"] is None  # missing path → NULL, no error
    assert out[0]["t0"] == "a"


def test_pyds_stream_drains_all_batches_exactly_once(spark):
    from cassandra_slow_queries_spark.streaming.pipeline import (
        run_stream_drain,
    )

    pyds.register(spark)
    stream = (
        spark.readStream.format("slowquerygen")
        .option("rowsperbatch", 150)
        .option("maxrows", 400)
        .load()
    )
    res = run_stream_drain(stream)
    gids = [r["gid"] for r in res.select("gid").collect()]
    # every row exactly once across the 3 micro-batches (150+150+100)
    assert sorted(gids) == list(range(400))
