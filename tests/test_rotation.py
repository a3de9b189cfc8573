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
    """Against the COMMITTED correctness files: the catalog order must
    equal the mechanical stalest-first rotation (no by-hand reorder),
    and every entry beyond the driver's check window must have been
    driver-green within the last ceil(N/W)−1 recorded rounds — the
    bound the stalest-first policy actually guarantees at the current
    catalog size (2 rounds at N≤2W, K−1 rounds at N≤K·W). Never-checked
    entries must all sort INTO the window (they rank stalest), never
    into the tail, unless the catalog grew by more than W in one round.
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
    k = -(-len(names) // CHECK_WINDOW)  # ceil(N/W)
    floor_round = latest - (k - 1) + 1  # tail must be green since here
    never_checked = [n for n in names if greens.get(n, 0) == 0]
    # If more entries were added this round than the window holds, the
    # excess never-checked entries CANNOT fit in the window — exactly
    # that many may overflow into the tail (they are still locally
    # oracle-checked every pytest run, and rank stalest next round).
    allowed_overflow = max(0, len(never_checked) - CHECK_WINDOW)
    tail = names[CHECK_WINDOW:]
    tail_never = [n for n in tail if greens.get(n, 0) == 0]
    assert len(tail_never) == allowed_overflow, (
        f"{len(tail_never)} never-checked entries in the tail, but only "
        f"{allowed_overflow} overflow slots are unavoidable: {tail_never}"
    )
    stale_tail = [
        n
        for n in tail
        if 0 < greens.get(n, 0) < floor_round
    ]
    assert not stale_tail, (
        f"entries parked beyond the driver window without a green row "
        f"since round {floor_round} (K={k}): {stale_tail}"
    )


def test_catalog_fits_three_round_rotation():
    """ceil(catalog / window) must stay ≤ 3 — the rotation keeps every
    entry within a K-round driver re-check, but past K=3 the external
    gate sees under a third of the catalog per round and entries should
    be consolidated instead of grown. (Every entry is still DuckDB-
    checked locally on every pytest run by test_entry_oracle.py; this
    bounds only the external re-verification latency.)"""
    from cassandra_slow_queries_spark.plans.catalog import CATALOG

    assert len(CATALOG) <= 3 * CHECK_WINDOW
