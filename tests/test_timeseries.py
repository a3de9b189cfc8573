"""Unit tests for operators/timeseries.py; the three catalog entries
are oracle-checked by test_entry_oracle.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.timeseries import (
    _duration_micros,
    mad_outliers,
    resample,
    trailing_agg,
)


def _series(spark, rows):
    return spark.createDataFrame(
        rows, "k long, ts_s string, v double"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")


def test_duration_parse():
    assert _duration_micros("1 hour") == 3_600_000_000
    assert _duration_micros("30 seconds") == 30_000_000
    assert _duration_micros("2 days") == 2 * 86_400_000_000
    for bad in ("hour", "0 hours", "-1 minute", "1 fortnight"):
        with pytest.raises(ValueError):
            _duration_micros(bad)


def test_trailing_agg_range_frame_inclusive(spark):
    df = _series(
        spark,
        [
            (1, "2024-01-01 00:00:00", 10.0),
            (1, "2024-01-01 00:30:00", 20.0),
            (1, "2024-01-01 01:00:00", 30.0),  # 1h window includes all 3
            (1, "2024-01-01 02:30:00", 40.0),  # everything else aged out
            (2, "2024-01-01 00:30:00", 99.0),  # other key: own frame
        ],
    )
    out = trailing_agg(
        df, ["k"], "ts", {"n": F.count(F.lit(1)), "s": F.sum("v")}, "1 hour"
    )
    got = {
        (r["k"], str(r["ts"])): (r["n"], r["s"]) for r in out.collect()
    }
    assert got[(1, "2024-01-01 00:00:00")] == (1, 10.0)
    assert got[(1, "2024-01-01 00:30:00")] == (2, 30.0)
    # inclusive both ends: the event exactly 1h earlier is in frame
    assert got[(1, "2024-01-01 01:00:00")] == (3, 60.0)
    assert got[(1, "2024-01-01 02:30:00")] == (1, 40.0)
    assert got[(2, "2024-01-01 00:30:00")] == (1, 99.0)


def test_resample_ffill_and_latest_per_bucket(spark):
    df = _series(
        spark,
        [
            (1, "2024-01-01 00:01:00", 1.0),
            (1, "2024-01-01 00:05:00", 2.0),  # same 10-min bucket: latest wins
            (1, "2024-01-01 00:35:00", 5.0),  # 2 empty buckets before this
        ],
    )
    out = resample(df, ["k"], "ts", "v", step_seconds=600, fill="ffill")
    vals = [r["value"] for r in out.orderBy("bucket_ts").collect()]
    assert vals == [2.0, 2.0, 2.0, 5.0]  # 00:00, 00:10, 00:20, 00:30 buckets

    raw = resample(df, ["k"], "ts", "v", step_seconds=600, fill="none")
    vals = [r["value"] for r in raw.orderBy("bucket_ts").collect()]
    assert vals == [2.0, None, None, 5.0]

    with pytest.raises(ValueError):
        resample(df, ["k"], "ts", "v", step_seconds=0)
    with pytest.raises(ValueError):
        resample(df, ["k"], "ts", "v", fill="bfill")


def test_mad_outliers_flags_and_zero_mad_convention(spark):
    df = spark.createDataFrame(
        [("a", v) for v in [10.0, 11.0, 12.0, 13.0, 14.0, 100.0]]
        + [("b", v) for v in [5.0, 5.0, 5.0, 7.0]],
        "g string, v double",
    )
    out = {
        (r["g"], r["v"]): r for r in mad_outliers(df, ["g"], "v").collect()
    }
    # group a: median 12.5, MAD 1.5 -> 100 is a screaming outlier
    assert out[("a", 100.0)]["is_outlier"] is True
    assert all(
        out[("a", v)]["is_outlier"] is False
        for v in (10.0, 11.0, 12.0, 13.0, 14.0)
    )
    # group b: median 5, MAD 0 -> degenerate convention: any deviation from the
    # median flags, exact-median rows do not
    assert out[("b", 7.0)]["is_outlier"] is True
    assert out[("b", 5.0)]["is_outlier"] is False
    assert out[("b", 5.0)]["z"] is None


def test_resample_null_valued_rows_are_not_observations(spark):
    # a later-timestamp NULL value must not shadow an earlier real
    # reading in the same bucket, and a NULL boundary row must not
    # void the "interpolated series is total" guarantee
    from cassandra_slow_queries_spark.operators.timeseries import resample

    rows = [
        ("k", "2026-01-01 00:00:00", 1.0),
        ("k", "2026-01-01 00:00:10", 5.0),
        ("k", "2026-01-01 00:00:20", None),  # same bucket, later ts
        ("k", "2026-01-01 00:02:00", None),  # trailing non-observation
        ("k", "2026-01-01 00:01:30", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts string, v double"
    ).select("k", F.to_timestamp("ts").alias("ts"), "v")
    out = resample(df, ["k"], "ts", "v", step_seconds=60, fill="interp")
    got = {r["bucket_ts"].strftime("%H:%M"): r["value"] for r in out.collect()}
    assert got == {"00:00": 5.0, "00:01": 7.0}  # total, no NULLs
    assert all(v is not None for v in got.values())


def test_mad_outliers_keeps_null_groups_and_flags_null_values_false(spark):
    from cassandra_slow_queries_spark.operators.timeseries import (
        mad_outliers,
    )

    rows = [
        ("g", 1.0), ("g", 2.0), ("g", 100.0),
        (None, 10.0), (None, 11.0), (None, None),
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = mad_outliers(df, ["grp"], "v", threshold=3.5).collect()
    assert len(out) == 6  # NULL-group rows survive the stats back-join
    null_group = [r for r in out if r["grp"] is None]
    assert len(null_group) == 3
    nv = [r for r in null_group if r["v"] is None]
    assert nv[0]["is_outlier"] is False  # verdict column, never NULL
