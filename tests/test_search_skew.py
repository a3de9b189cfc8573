"""Unit tests for the inverted index (operators/search.py) and the
generic salted join (operators/skew.py); the catalog entries are
oracle-checked by test_entry_oracle.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.search import (
    build_inverted_index,
    search_all_terms,
)
from cassandra_slow_queries_spark.operators.skew import salted_join


def test_inverted_index_postings_distinct_and_lowercased(spark):
    docs = spark.createDataFrame(
        [(1, "Spark JOIN join spark"), (2, "shuffle  spark"), (3, "")],
        "doc_id long, text string",
    )
    idx = build_inverted_index(docs)
    rows = {(r["token"], r["doc_id"]) for r in idx.collect()}
    # repeated tokens collapse; case folds; empty text yields no postings
    assert rows == {("spark", 1), ("join", 1), ("shuffle", 2), ("spark", 2)}


def test_search_conjunction_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark join shuffle"),
            (2, "spark join"),
            (3, "join shuffle"),
            (4, "spark spark shuffle join"),
        ],
        "doc_id long, text string",
    )
    idx = build_inverted_index(docs)
    hits = sorted(
        r["doc_id"] for r in search_all_terms(idx, ["spark", "JOIN", "join"]).collect()
    )
    assert hits == [1, 2, 4]  # duplicate/differently-cased terms collapse
    assert sorted(
        r["doc_id"]
        for r in search_all_terms(idx, ["spark", "join", "shuffle"]).collect()
    ) == [1, 4]
    with pytest.raises(ValueError):
        search_all_terms(idx, ["", None] if False else [""])


def test_salted_join_exact_parity_with_plain_join(spark):
    left = spark.createDataFrame(
        [("hot", i * 1.0) for i in range(500)]
        + [("cold1", 1.0), ("cold2", 2.0), ("orphan", 3.0)],
        "k string, v double",
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("cold1", "C1"), ("cold2", "C2"), ("unused", "U")],
        "k string, tag string",
    )
    plain = left.join(right, "k").groupBy("k", "tag").count()
    salted = salted_join(left, right, "k", n_salts=8).groupBy("k", "tag").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    # left outer: orphan survives exactly once with a NULL tag
    lo = salted_join(left, right, "k", n_salts=8, how="left")
    orphans = lo.filter("k = 'orphan'").collect()
    assert len(orphans) == 1 and orphans[0]["tag"] is None


def test_salted_join_spreads_hot_key_and_rejects_outer(spark):
    left = spark.createDataFrame(
        [("hot", float(i)) for i in range(1000)], "k string, v double"
    )
    salts = (
        left.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)),
        )
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(salts) == 8
    assert max(r["count"] for r in salts) < 2 * 1000 / 8

    right = spark.createDataFrame([("hot", "H")], "k string, tag string")
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")
    with pytest.raises(ValueError):
        salted_join(left, right, "k", n_salts=0)


def test_salted_join_salt_cols_spreads_duplicate_payloads(spark):
    # One hot key whose payload collapses to TWO distinct values: the
    # default all-columns salt lands everything in at most 2 cells (the
    # round-6 driver flake), while salting on the unique row id spreads
    # uniformly over rows — and the join stays exact either way.
    left = spark.createDataFrame(
        [(i, "hot", float(i % 2)) for i in range(1600)],
        "row_id long, k string, v double",
    )
    right = spark.createDataFrame([("hot", "H")], "k string, tag string")

    def cells(cols):
        return (
            left.withColumn(
                "_salt",
                F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(16)),
            )
            .groupBy("_salt")
            .count()
            .collect()
        )

    payload_cells = cells(["k", "v"])
    assert len(payload_cells) <= 2  # degenerate spread
    id_cells = cells(["row_id"])
    assert len(id_cells) == 16
    assert max(r["count"] for r in id_cells) * 16 <= 2 * 1600

    salted = salted_join(left, right, "k", n_salts=16, salt_cols=["row_id"])
    assert salted.count() == 1600

    with pytest.raises(ValueError):
        salted_join(left, right, "k", salt_cols=[])


def test_bm25_scores_match_hand_formula(spark):
    import math

    from cassandra_slow_queries_spark.operators.search import (
        bm25_topk,
        build_scored_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),      # tf(apple)=2, len 3
            (2, "apple cherry"),            # tf(apple)=1, len 2
            (3, "cherry cherry banana"),    # no apple
        ],
        "doc_id long, text string",
    )
    idx = build_scored_index(docs)
    got = {r["doc_id"]: r["score"] for r in bm25_topk(idx, ["apple"], k=3).collect()}

    n, avg_len = 3, (3 + 2 + 3) / 3
    df = 2
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))

    def w(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))

    assert got.keys() == {1, 2}  # doc 3 has no query term
    assert got[1] == pytest.approx(round(w(2, 3), 6), abs=1e-6)
    assert got[2] == pytest.approx(round(w(1, 2), 6), abs=1e-6)
    # higher tf with comparable length outranks
    assert got[1] > got[2]

    with pytest.raises(ValueError):
        bm25_topk(idx, [])


def test_bm25_rare_term_outweighs_common(spark):
    from cassandra_slow_queries_spark.operators.search import (
        bm25_topk,
        build_scored_index,
    )

    rows = [(i, "common filler words here") for i in range(1, 20)]
    rows.append((100, "common rare filler here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_scored_index(docs)
    top = bm25_topk(idx, ["common", "rare"], k=1).collect()
    assert top[0]["doc_id"] == 100  # the only doc with the rare term wins


def test_tfidf_keywords_hand_formula(spark):
    import math

    from cassandra_slow_queries_spark.operators.search import (
        build_scored_index,
        tfidf_keywords,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple cherry cherry zebra"),
        ],
        "doc_id long, text string",
    )
    idx = build_scored_index(docs)
    # output order is undefined (no presentation sort at corpus scale)
    out = sorted(
        tfidf_keywords(idx, k=2).collect(),
        key=lambda r: (r["doc_id"], -r["score"], r["token"]),
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["token"], r["score"]))
    # N=3; df: apple 2, banana 2, cherry 2, zebra 1
    idf2 = math.log(4 / 3) + 1
    idf1 = math.log(4 / 2) + 1
    # doc 1: apple tf2 beats banana tf1
    assert by_doc[1][0] == ("apple", round(2 * idf2, 6))
    assert by_doc[1][1] == ("banana", round(1 * idf2, 6))
    # doc 2: equal scores -> token asc tiebreak
    assert [t for t, _ in by_doc[2]] == ["banana", "cherry"]
    # doc 3: rare zebra (idf1) outranks corpus-wide apple, cherry tf2 first
    assert by_doc[3][0] == ("cherry", round(2 * idf2, 6))
    assert by_doc[3][1] == ("zebra", round(1 * idf1, 6))


def test_tfidf_keywords_min_df_drops_hapax(spark):
    from cassandra_slow_queries_spark.operators.search import (
        build_scored_index,
        tfidf_keywords,
    )

    docs = spark.createDataFrame(
        [(1, "apple xqzt apple"), (2, "apple banana")],
        "doc_id long, text string",
    )
    idx = build_scored_index(docs)
    toks = {
        r["token"] for r in tfidf_keywords(idx, k=5, min_df=2).collect()
    }
    assert "xqzt" not in toks and "banana" not in toks
    assert toks == {"apple"}
    # a doc whose every term is filtered emits no rows
    solo = spark.createDataFrame([(9, "only once")], "doc_id long, text string")
    idx2 = build_scored_index(docs.unionByName(solo))
    out = tfidf_keywords(idx2, k=5, min_df=3)
    assert [r["doc_id"] for r in out.collect() if r["doc_id"] == 9] == []
