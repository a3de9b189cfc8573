"""Unit tests for sorted-neighborhood linkage (operators/linkage.py);
the customer-registry catalog entry is oracle-checked by
test_entry_oracle.py."""

from __future__ import annotations

import random

import pytest


def _brute_pairs(rows, window):
    """All pairs at sort-rank distance 1..window, lower rank first.
    rows = [(id, key)]; rank order = (key, id)."""
    ranked = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (aid, akey) in enumerate(ranked):
        for j in range(i + 1, min(i + 1 + window, len(ranked))):
            bid, bkey = ranked[j]
            out.add((aid, akey, bid, bkey))
    return out


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_candidates_match_brute_force_exactly_once(spark):
    from cassandra_slow_queries_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    rng = random.Random(7)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(4)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = [
        (r.a_id, r.a_key, r.b_id, r.b_key)
        for r in sorted_neighborhood_pairs(
            df, "id", "name", window=4, num_ranges=4
        ).collect()
    ]
    # exactly once: no duplicate emissions from the two-band explode
    assert len(got) == len(set(got))
    assert set(got) == _brute_pairs(rows, 4)


@pytest.mark.parametrize("window", [1, 3, 7])
def test_candidate_count_is_linear_in_window(spark, window):
    from cassandra_slow_queries_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    n = 40
    rows = [(i, f"k{i:03d}") for i in range(n)]
    df = spark.createDataFrame(rows, "id long, name string")
    cnt = sorted_neighborhood_pairs(
        df, "id", "name", window=window, num_ranges=3
    ).count()
    # exact closed form for distinct keys: sum over ranks of
    # min(window, remaining) — the linear bound, not quadratic
    assert cnt == sum(min(window, n - 1 - i) for i in range(n))


def test_fuzzy_link_verifies_with_levenshtein(spark):
    from cassandra_slow_queries_spark.operators.linkage import fuzzy_link

    rows = [
        (1, "acme corp"),
        (2, "acme corpX"),   # distance 1 from id 1 -> linked
        (3, "acme gorp"),    # distance 1 from "acme corp" -> linked
        (4, "zzz totally different"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = {
        (r.a_id, r.b_id): r.distance
        for r in fuzzy_link(df, "id", "name", window=3).collect()
    }
    assert out[(1, 2)] == 1 and out[(1, 3)] == 1
    assert all(4 not in pair for pair in out)
    # verify distances against a reference implementation
    names = dict(rows)
    for (a, b), d in out.items():
        assert _lev(names[a], names[b]) == d <= 1


def test_window_must_be_positive(spark):
    from cassandra_slow_queries_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "id", "name", window=0)


def test_multi_pass_recovers_head_edits(spark):
    from pyspark.sql import functions as F

    from cassandra_slow_queries_spark.operators.linkage import (
        multi_pass_link,
    )

    # head-edited twin sorts far from its original on name, adjacent on
    # reversed name; tail-edited twin is the opposite
    rows = [
        (1, "alpha registry entry"),
        (2, "zlpha registry entry"),   # head edit of 1 (sorts to the far end)
        (3, "omega registry entry"),
        (4, "omega registry entrX"),   # tail edit of 3
        # spacer rows so the head-edited twin is out of pass-1 range
        (5, "beta one"), (6, "beta two"), (7, "gamma one"),
        (8, "delta one"), (9, "epsilon one"), (10, "zeta one"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")

    def pairs(passes):
        return {
            (r.a_id, r.b_id)
            for r in multi_pass_link(
                df, "id", "name", passes, window=2, max_distance=1
            ).collect()
        }

    name_only = pairs([F.col("name")])
    both = pairs([F.col("name"), F.reverse(F.col("name"))])
    assert (3, 4) in name_only          # tail edit: pass 1 finds it
    assert (1, 2) not in name_only      # head edit: pass 1 misses
    assert {(1, 2), (3, 4)} <= both     # second pass recovers it
    # canonical orientation and no duplicates
    assert all(a < b for a, b in both)
