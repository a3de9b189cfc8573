"""Unit tests for the round-6 additions: transition matrices
(operators/sequences.py), distribution drift (operators/profile.py),
and triangle counting (operators/graph.py). The events/documents/
lineitem-derived catalog entries are oracle-checked by
test_entry_oracle.py; these pin the operator semantics on hand-built
frames where the expected answer is computable by eye."""

from __future__ import annotations

import math
from itertools import combinations

from pyspark.sql import functions as F


# --- transition matrix -------------------------------------------------


def test_transition_matrix_counts_and_probs(spark):
    from cassandra_slow_queries_spark.operators.sequences import (
        transition_matrix,
    )

    rows = [
        # user 1: a -> b -> a -> c
        (1, 10, "a"), (1, 20, "b"), (1, 30, "a"), (1, 40, "c"),
        # user 2: a -> b
        (2, 10, "a"), (2, 20, "b"),
        # user 3: single event, no pairs
        (3, 10, "z"),
    ]
    df = spark.createDataFrame(rows, "u long, t long, s string")
    out = {
        (r.prev_state, r.next_state): (r.n, r.p)
        for r in transition_matrix(df, "u", "s", [F.col("t")]).collect()
    }
    assert out[("a", "b")] == (2, round(2 / 3, 6))
    assert out[("a", "c")] == (1, round(1 / 3, 6))
    assert out[("b", "a")] == (1, 1.0)
    # no cross-user pair (2,'b') -> (3,'z'); singletons emit nothing
    assert ("b", "z") not in out and ("z", "z") not in out
    assert len(out) == 3


def test_transition_matrix_orders_by_given_columns(spark):
    from cassandra_slow_queries_spark.operators.sequences import (
        transition_matrix,
    )

    # same ts everywhere: the explicit tiebreak column decides the order
    rows = [(1, 0, 2, "b"), (1, 0, 1, "a"), (1, 0, 3, "c")]
    df = spark.createDataFrame(rows, "u long, t long, i long, s string")
    out = {
        (r.prev_state, r.next_state)
        for r in transition_matrix(
            df, "u", "s", [F.col("t"), F.col("i")]
        ).collect()
    }
    assert out == {("a", "b"), ("b", "c")}


# --- distribution drift ------------------------------------------------


def _js(p_counts, q_counts):
    pt, qt = sum(p_counts.values()), sum(q_counts.values())
    vocab = set(p_counts) | set(q_counts)
    js = 0.0
    for t in vocab:
        p = p_counts.get(t, 0) / pt
        q = q_counts.get(t, 0) / qt
        m = (p + q) / 2
        if p > 0:
            js += 0.5 * p * math.log(p / m)
        if q > 0:
            js += 0.5 * q * math.log(q / m)
    return js


def test_distribution_drift_matches_closed_form(spark):
    from cassandra_slow_queries_spark.operators.profile import (
        distribution_drift,
    )

    left = spark.createDataFrame(
        [("a a b",), ("b c",)], "text string"
    )
    right = spark.createDataFrame(
        [("a d d",), ("d",)], "text string"
    )
    rows = distribution_drift(left, right).collect()
    got = sum(r.js for r in rows)
    want = _js({"a": 2, "b": 2, "c": 1}, {"a": 1, "d": 3})
    assert abs(got - want) < 1e-12
    by_tok = {r.token: r for r in rows}
    # one-sided tokens carry only their own side's term
    assert by_tok["c"].q == 0.0 and by_tok["d"].p == 0.0
    assert set(by_tok) == {"a", "b", "c", "d"}


def test_distribution_drift_identical_corpora_is_zero(spark):
    from cassandra_slow_queries_spark.operators.profile import (
        distribution_drift,
    )

    df = spark.createDataFrame([("x y z",), ("x y",)], "text string")
    rows = distribution_drift(df, df).collect()
    assert all(abs(r.js) < 1e-15 for r in rows)


def test_distribution_drift_disjoint_corpora_is_ln2(spark):
    from cassandra_slow_queries_spark.operators.profile import (
        distribution_drift,
    )

    left = spark.createDataFrame([("a b",)], "text string")
    right = spark.createDataFrame([("c d",)], "text string")
    total = sum(
        r.js for r in distribution_drift(left, right).collect()
    )
    assert abs(total - math.log(2)) < 1e-12


# --- triangle counting -------------------------------------------------


def _brute_triangles(edge_list):
    edges = {
        (min(a, b), max(a, b)) for a, b in edge_list if a != b
    }
    nodes = sorted({v for e in edges for v in e})
    per = {v: 0 for v in nodes}
    for a, b, c in combinations(nodes, 3):
        if (
            (a, b) in edges and (b, c) in edges and (a, c) in edges
        ):
            per[a] += 1
            per[b] += 1
            per[c] += 1
    return per


def _run_triangles(spark, edge_list, **kw):
    from cassandra_slow_queries_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edge_list, "src long, dst long")
    return {
        r.node: r.n_triangles for r in triangle_counts(df, **kw).collect()
    }


def test_triangles_matches_brute_force(spark):
    # two triangles sharing an edge + a pendant node + a reversed dup
    edges = [
        (1, 2), (2, 3), (1, 3),
        (2, 4), (3, 4),
        (4, 5),
        (3, 2),  # duplicate in reverse direction
        (5, 5),  # self loop, dropped
    ]
    assert _run_triangles(spark, edges) == _brute_triangles(edges)


def test_triangles_zero_rows_for_triangle_free_nodes(spark):
    out = _run_triangles(spark, [(1, 2), (2, 3)])
    assert out == {1: 0, 2: 0, 3: 0}


def test_triangles_degree_cap_removes_hub(spark):
    # hub 0 touches everyone; capped out of the GRAPH, only the 1-2-3
    # triangle survives — but the hub still appears in the OUTPUT with
    # 0 triangles (stable node universe: capped vs uncapped runs diff
    # row-for-row instead of silently losing rows)
    edges = [(0, v) for v in range(1, 6)] + [(1, 2), (2, 3), (1, 3)]
    capped = _run_triangles(spark, edges, max_degree=4)
    assert capped[1] == 1 and capped[2] == 1 and capped[3] == 1
    assert capped[0] == 0  # hub: edges removed, node reported
    assert capped[4] == 0 and capped[5] == 0  # hub-only neighbors too
    uncapped = _run_triangles(spark, edges)
    assert uncapped == _brute_triangles(edges)


# --- bigram PMI collocations ------------------------------------------


def test_bigram_pmi_closed_form(spark):
    from cassandra_slow_queries_spark.operators.profile import bigram_pmi

    # "new york" always adjacent; "the the" never; corpus built so the
    # closed-form PMI is checkable by hand
    docs = [("new york is big",), ("new york is old",), ("big old the a",)]
    df = spark.createDataFrame(docs, "text string")
    rows = bigram_pmi(df, "text", min_count=2, pmi_digits=None).collect()
    got = {(r.x, r.y): (r.n_xy, r.pmi) for r in rows}
    # unigrams: 12 tokens total; bigrams: 3 docs x 3 pairs = 9
    n_xy, pmi = got[("new", "york")]
    assert n_xy == 2
    want = math.log((2 * 12 * 12) / (9 * 2 * 2))
    assert abs(pmi - want) < 1e-12
    # min_count filters singleton pairs
    assert ("is", "big") not in got


def test_bigram_pmi_adjacent_only(spark):
    from cassandra_slow_queries_spark.operators.profile import bigram_pmi

    df = spark.createDataFrame([("a b c a b",)], "text string")
    rows = bigram_pmi(df, "text", min_count=1).collect()
    pairs = {(r.x, r.y) for r in rows}
    # only consecutive pairs exist; ("a","c") never adjacent
    assert pairs == {("a", "b"), ("b", "c"), ("c", "a")}


# --- token entropy -----------------------------------------------------


def test_token_entropy_closed_form(spark):
    from cassandra_slow_queries_spark.operators.profile import token_entropy

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # zero entropy: one token repeated
            (2, "a b c d"),          # uniform: ln 4
            (3, "a a b"),            # H = ln3 - (2 ln2)/3
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_distinct, r.entropy)
        for r in token_entropy(df, digits=None).collect()
    }
    assert out[1] == (4, 1, 0.0)
    assert abs(out[2][2] - math.log(4)) < 1e-12
    want3 = math.log(3) - (2 * math.log(2)) / 3
    assert out[3][:2] == (3, 2) and abs(out[3][2] - want3) < 1e-12


def test_equi_depth_histogram_invariants(spark):
    from cassandra_slow_queries_spark.operators.profile import (
        equi_depth_histogram,
    )

    # skewed data: equi-width would starve — equi-depth must balance
    rows = [
        (float(v) if v is not None else None,)
        for v in list(range(100)) + [1000.0] * 20 + [None]
    ]
    df = spark.createDataFrame(rows, "v double").repartition(5)
    out = equi_depth_histogram(df, "v", buckets=4).collect()
    assert [r["bucket"] for r in out] == [0, 1, 2, 3]
    n_total = sum(r["n"] for r in out)
    assert n_total == 120  # NULL excluded
    # depth balance: no bucket more than 2x the ideal share even with
    # the planted point mass at 1000
    assert max(r["n"] for r in out) <= 2 * (120 / 4)
    # edges are the interpolated quartiles, monotone, spanning min..max
    edges = [out[0]["lo"]] + [r["hi"] for r in out]
    assert edges == sorted(edges)
    assert edges[0] == 0.0 and edges[-1] == 1000.0
    # ties at a bound fall to the LOWER bucket: all 20 copies of the
    # max sit together in the last bucket
    assert out[3]["n"] >= 20

    # single bucket degenerates to a total count
    one = equi_depth_histogram(df, "v", buckets=1).collect()
    assert len(one) == 1 and one[0]["n"] == 120
    import pytest as _pytest

    with _pytest.raises(ValueError):
        equi_depth_histogram(df, "v", buckets=0)


def test_transition_pairs_null_state_breaks_chain_symmetrically(spark):
    from cassandra_slow_queries_spark.operators.sequences import (
        transition_pairs,
    )

    rows = [("u", 1, "a"), ("u", 2, None), ("u", 3, "b"), ("u", 4, "c")]
    df = spark.createDataFrame(rows, "k string, t long, s string")
    pairs = sorted(
        (r["prev_state"], r["next_state"])
        for r in transition_pairs(df, "k", "s", ["t"]).collect()
    )
    # neither (a -> NULL) nor (NULL -> b) exists; only the real pair
    assert pairs == [("b", "c")]
