"""Unit tests for ordered funnel analysis (operators/funnel.py); the
events-table entry is oracle-checked by test_entry_oracle.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.funnel import funnel_steps


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts_s string, event_type string"
    ).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
    )


def _steps():
    # built lazily: Column construction needs an active SparkContext
    return [
        ("view", F.col("event_type") == "view"),
        ("click", F.col("event_type") == "click"),
        ("purchase", F.col("event_type") == "purchase"),
    ]


def test_funnel_sequential_semantics(spark):
    ev = _events(
        spark,
        [
            # u1 completes the whole funnel in order
            (1, "2024-01-01 00:00:00", "view"),
            (1, "2024-01-01 01:00:00", "click"),
            (1, "2024-01-01 02:00:00", "purchase"),
            # u2 clicked BEFORE viewing: click doesn't count; later click does
            (2, "2024-01-01 00:00:00", "click"),
            (2, "2024-01-01 01:00:00", "view"),
            (2, "2024-01-01 03:00:00", "click"),
            # u3 purchases without ever clicking: stops at view
            (3, "2024-01-01 00:00:00", "view"),
            (3, "2024-01-01 01:00:00", "purchase"),
            # u4 never views: in no step
            (4, "2024-01-01 00:00:00", "click"),
        ],
    )
    out = {r["step"]: r.asDict() for r in funnel_steps(ev, _steps()).collect()}
    assert out["view"]["n_users"] == 3
    assert out["view"]["sum_lag_us"] is None
    assert out["click"]["n_users"] == 2  # u1 (+1h) and u2 (+2h)
    assert out["click"]["sum_lag_us"] == (1 + 2) * 3600 * 1_000_000
    assert out["purchase"]["n_users"] == 1  # only u1
    assert out["purchase"]["sum_lag_us"] == 3600 * 1_000_000


def test_funnel_equal_timestamps_count(spark):
    """At-or-after: a click at the exact view instant completes step 2."""
    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", "view"),
            (1, "2024-01-01 00:00:00", "click"),
        ],
    )
    out = {r["step"]: r["n_users"] for r in funnel_steps(ev, _steps()).collect()}
    assert out == {"view": 1, "click": 1, "purchase": 0}


def test_funnel_conversion_window(spark):
    """`within` bounds each TRANSITION, not the whole funnel."""
    ev = _events(
        spark,
        [
            # u1: click 2h after view — outside a 1h window
            (1, "2024-01-01 00:00:00", "view"),
            (1, "2024-01-01 02:00:00", "click"),
            # u2: click 30min after view, purchase 50min after click — each
            # transition inside 1h even though the whole path is 80min
            (2, "2024-01-01 00:00:00", "view"),
            (2, "2024-01-01 00:30:00", "click"),
            (2, "2024-01-01 01:20:00", "purchase"),
        ],
    )
    out = {
        r["step"]: r["n_users"]
        for r in funnel_steps(ev, _steps(), within="1 hour").collect()
    }
    assert out == {"view": 2, "click": 1, "purchase": 1}


def test_funnel_empty_steps_raise(spark):
    with pytest.raises(ValueError):
        funnel_steps(_events(spark, []), [])


def test_funnel_earliest_qualifying_event_wins(spark):
    """Step time is the EARLIEST qualifying event — a later extra click
    must not shift the purchase clock."""
    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", "view"),
            (1, "2024-01-01 01:00:00", "click"),
            (1, "2024-01-01 05:00:00", "click"),  # ignored: later
            (1, "2024-01-01 06:00:00", "purchase"),
        ],
    )
    out = {r["step"]: r.asDict() for r in funnel_steps(ev, _steps()).collect()}
    # purchase lag measured from the FIRST qualifying click (01:00)
    assert out["purchase"]["sum_lag_us"] == 5 * 3600 * 1_000_000


def test_funnel_null_users_excluded_from_denominator(spark):
    from cassandra_slow_queries_spark.operators.funnel import funnel_steps

    rows = [
        (1, "2026-01-01 00:00:00", "view"),
        (1, "2026-01-01 00:01:00", "buy"),
        (None, "2026-01-01 00:00:30", "view"),  # anonymous: can't convert
    ]
    events = spark.createDataFrame(
        rows, "user_id long, ts string, et string"
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "et")
    out = funnel_steps(
        events,
        [("view", F.col("et") == "view"), ("buy", F.col("et") == "buy")],
    ).collect()
    by = {r["step"]: r for r in out}
    assert by["view"]["n_users"] == 1  # NULL user not in the denominator
    assert by["buy"]["n_users"] == 1
