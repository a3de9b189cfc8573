"""The check-window rotation invariant (round-5 verdict item 1 / ADVICE
catalog.py:2924): the slice of the catalog the external driver gate
re-verifies each round must be derived mechanically from recorded
staleness, not curated by hand."""

from __future__ import annotations

import json

from cassandra_slow_queries_spark.plans.rotation import (
    CHECK_WINDOW,
    last_green_rounds,
    latest_round,
    rotated_order,
)


def test_last_green_parsing(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True, "hash_match": True,
              "err": None},
        "b": {"rows_match": True, "schema_match": True, "hash_match": False,
              "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "b": {"rows_match": True, "schema_match": True, "hash_match": True,
              "err": None},
        "c": {"rows_match": True, "schema_match": True, "hash_match": True,
              "err": "boom"},
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text("not json")
    greens = last_green_rounds(tmp_path)
    # a: green in r1 only; b: hash-mismatch in r1, green in r2; c: errored
    assert greens == {"a": 1, "b": 2}
    assert latest_round(tmp_path) == 3


def test_rotated_order_stalest_first(tmp_path):
    names = ["w", "x", "y", "z"]
    greens = {"w": 5, "x": 3, "z": 5}  # y never driver-checked
    assert rotated_order(names, greens) == ["y", "x", "w", "z"]
    # no files at all → stable definition order
    assert rotated_order(names, {}) == names


def test_catalog_window_invariant():
    """Against the COMMITTED correctness files: every catalog entry
    beyond the driver's check window must have been driver-green in the
    latest recorded round (i.e. the tail is exactly the freshest
    entries, so nothing goes >2 rounds unchecked at the current shape).
    This is the mechanical replacement for the round-5 hand-maintained
    tail comment."""
    from cassandra_slow_queries_spark.plans.catalog import CATALOG

    greens = last_green_rounds()
    latest = latest_round()
    names = list(CATALOG)
    assert rotated_order(names, greens) == names, (
        "catalog dict order must equal the mechanical rotation "
        "(did a by-hand reorder sneak back in?)"
    )
    stale_tail = [
        n for n in names[CHECK_WINDOW:] if greens.get(n, 0) < latest
    ]
    assert not stale_tail, (
        f"entries parked beyond the driver window without a green row in "
        f"round {latest}: {stale_tail}"
    )


def test_catalog_fits_two_round_rotation():
    """ceil(catalog / window) must stay ≤ 2, the bound the invariant
    test above guarantees; if the catalog outgrows 2×CHECK_WINDOW the
    rotation needs a third round and the docs/tests must be revisited."""
    from cassandra_slow_queries_spark.plans.catalog import CATALOG

    assert len(CATALOG) <= 2 * CHECK_WINDOW
