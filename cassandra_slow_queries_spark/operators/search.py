"""Inverted-index text retrieval.

The index is the posting-ROW form ``(token, doc_id)`` — one row per
distinct (token, document) occurrence — not per-token arrays: a hot
token's posting list at corpus scale is millions of ids, and a
``collect_list`` array would concentrate it into one row/one task,
the same hot-key failure every blocked operator in this repo avoids.
Rows bucket/partition cleanly by token, postings merge by union, and
conjunctive queries become joins the optimizer can reorder. (An array
form is a *compression* of this layout you might materialize per
partition at write time; the relational form is the source of truth.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(text_col):
    """Whitespace tokenization, lowercased, empty tokens dropped.

    Deliberately NOT the split the corpus text stats use:
    ``functions/text.py:tokens`` splits on a single literal space,
    keeps empty tokens, and preserves case (reference-parity
    semantics), while an index analyzer wants ``\\s+``, lowercase, and
    no empties. On text with tabs, newlines, or doubled spaces the two
    disagree by design — don't cross-check ``token_count`` against
    index ``doc_len``."""
    return F.filter(
        F.split(F.lower(text_col), r"\s+"), lambda t: t != F.lit("")
    )


def build_inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build the posting rows: ``(token, doc_id)``, one row per DISTINCT
    token-document pair (retrieval is set-membership; term frequency
    belongs to a scoring index, not this one). One explode + one
    distinct shuffle keyed on (token, doc_id); at scale, write the
    result bucketed by ``token`` so query-time term lookups prune to
    one bucket."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokenize(F.col(text_col))).alias("token"),
        )
        .distinct()
    )


def search_all_terms(
    index: DataFrame, terms: list[str]
) -> DataFrame:
    """Conjunctive (AND) keyword query against a posting-row index:
    doc_ids containing EVERY term in ``terms``.

    Plan: filter the index to the query terms (a tiny IN list the scan
    pushes down — on a token-bucketed index this prunes to |terms|
    buckets), then one groupBy(doc_id) keeping docs whose distinct
    matched-term count equals |terms|. No self-join chain: a k-term
    query is ONE shuffle of the ~k posting lists, not k-1 joins.
    Duplicate query terms collapse (AND is idempotent).
    """
    want = sorted({t.lower() for t in terms if t})
    if not want:
        raise ValueError("search needs at least one non-empty term")
    return (
        index.filter(F.col("token").isin(want))
        .groupBy("doc_id")
        .agg(F.count_distinct("token").alias("_hits"))
        .filter(F.col("_hits") == len(want))
        .select("doc_id")
    )


def scored_index_parts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """The scored index as its two normal-form parts:
    ``tf (token, doc_id, tf)`` and ``lens (doc_id, doc_len)``.

    r14 opt (guide §1.2/§2.4): :func:`bm25_topk`'s corpus constants
    (N, avg doc length) are a pure function of ``lens``, but when the
    caller only holds the joined ``tf ⋈ lens`` frame the constants
    re-execute the full posting-frame join plus a corpus-wide
    ``(doc_id, doc_len)`` distinct — two exchanges and a join spent
    recomputing a frame this function already built. Callers that
    score (the BM25 entries) should take the parts and hand ``lens``
    to :func:`bm25_topk`; :func:`build_scored_index` remains the
    joined-frame convenience for consumers that want posting rows.

    r13 opt (guide §5): the (token, doc) aggregation is the index and
    every retrieval consumer references it several times —
    unmaterialized, each reference re-ran the corpus explode. Persist
    it once (posting-list-sized; harness loops release via
    ``session.release_entry_storage``) and derive doc_len from it:
    Σ tf over a document's tokens counts exactly its token rows.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("token"),
    )
    tf = (
        toks.groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    lens = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    return tf, lens


def build_scored_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Posting rows WITH term statistics for ranked retrieval:
    ``(token, doc_id, tf, doc_len)`` — term frequency in the document
    and the document's token count. Same explode/shuffle shape as
    :func:`build_inverted_index`; tf comes from the (token, doc)
    groupBy rather than a distinct. Scoring consumers should prefer
    :func:`scored_index_parts` (see its r14 note)."""
    tf, lens = scored_index_parts(df, text_col, id_col)
    return tf.join(lens, "doc_id").select("token", "doc_id", "tf", "doc_len")


def tfidf_keywords(
    index: DataFrame,
    k: int = 5,
    min_df: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` characteristic terms PER DOCUMENT by smoothed TF-IDF
    over a :func:`build_scored_index` frame — the corpus-relative
    keyword tagger (what makes THIS document different), the document-
    side dual of :func:`bm25_topk`'s query-side ranking.

    ``score = tf · (ln((N+1)/(df+1)) + 1)`` (sklearn's smoothed idf:
    corpus-wide terms still score >0, no log-of-zero edge). ``min_df``
    drops terms seen in fewer than that many documents — OCR noise and
    typos masquerade as maximally-rare "keywords" without it. Ties
    break on token asc. Documents with no surviving terms emit no rows.

    Plan: df-per-term is one token-keyed aggregation of the posting
    rows; N is a 1-row crossJoin; the per-doc top-k is the shared
    grouped_top_k window. Everything is keyed aggregation over posting
    rows — vocabulary- and document-bounded, never corpus² anywhere.
    Output row order is NOT defined (the result is corpus-sized —
    N_docs × k rows — so a presentation orderBy would force a global
    range-shuffle sort most consumers immediately re-shuffle away;
    sort the collected frame yourself if you need one).
    """
    from cassandra_slow_queries_spark.operators.topk import grouped_top_k

    if k < 1:
        raise ValueError("k must be >= 1")
    n_docs = index.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("_n_docs")
    )
    df_per_term = index.groupBy("token").agg(
        F.count(F.lit(1)).alias("_df")
    )
    if min_df > 1:
        df_per_term = df_per_term.filter(F.col("_df") >= min_df)
    scored = (
        index.join(df_per_term, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("_n_docs") + 1.0) / (F.col("_df") + 1.0)
                    )
                    + 1.0
                ),
                round_digits,
            ).alias("score"),
        )
    )
    return grouped_top_k(
        scored, ["doc_id"], "score", k, tiebreaks=["token"]
    )


def bm25_topk(
    index: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    doc_lens: DataFrame | None = None,
) -> DataFrame:
    """BM25-ranked retrieval (Robertson-Spärck Jones; the Okapi BM25
    formula) over a :func:`build_scored_index` frame: top-``k``
    documents for a bag-of-words query, ties broken on doc_id.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avglen)),
    idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).

    Plan: the query-term filter prunes the index scan (|terms| posting
    lists); df per term and the corpus constants (N, avg doc length)
    are 1-row/tiny aggregates crossJoined in; per-posting scoring is
    pure arithmetic; the final top-k compiles to
    TakeOrderedAndProject. Duplicate query terms collapse — repeat
    weighting belongs to query-side tf, which a bag query of distinct
    terms doesn't need.
    """
    from cassandra_slow_queries_spark.operators.topk import top_n

    want = sorted({t.lower() for t in terms if t})
    if not want:
        raise ValueError("bm25 needs at least one non-empty term")
    # r14 opt (guide §1.2/§2.4): with the per-document length frame in
    # hand (scored_index_parts), the corpus constants are ONE tiny
    # aggregation of it; deriving them from the joined index instead
    # re-executes the full posting-frame join plus a corpus-wide
    # (doc_id, doc_len) distinct — a shuffle of every posting row spent
    # on two scalars. Identical values by construction: the index's
    # distinct (doc_id, doc_len) pairs ARE the doc_lens rows (doc_len
    # is functionally dependent on doc_id).
    if doc_lens is not None:
        consts = doc_lens.agg(
            F.count(F.lit(1)).alias("_n_docs"),
            F.avg("doc_len").alias("_avg_len"),
        )
    else:
        consts = index.select("doc_id", "doc_len").distinct().agg(
            F.count(F.lit(1)).alias("_n_docs"),
            F.avg("doc_len").alias("_avg_len"),
        )
    hits = index.filter(F.col("token").isin(want))
    df_per_term = hits.groupBy("token").agg(
        F.count(F.lit(1)).alias("_df")
    )
    scored = (
        hits.join(F.broadcast(df_per_term), "token")
        .crossJoin(consts)
        .withColumn(
            "_idf",
            F.log(
                1.0
                + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
            ),
        )
        .withColumn(
            "_w",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("doc_len") / F.col("_avg_len"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("_w"), 6).alias("score"))
    )
    return top_n(scored, "score", k, tiebreaks=["doc_id"]).orderBy(
        F.desc("score"), "doc_id"
    )


def with_rank(
    df: DataFrame, score_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Attach a 1-based ``rank`` (best first, ties broken on the id)
    to a ranked-list frame. Single-partition window BY DESIGN: inputs
    are top-k retrieval outputs (k rows), never corpus-scale frames —
    rank the corpus with a keyed window instead."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return df.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rrf_k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of ranked lists —
    the standard hybrid-search combiner for lexical (BM25) + vector
    (ANN) retrieval, robust to incomparable score scales because only
    RANK positions matter: ``rrf(d) = Σ_lists 1 / (rrf_k + rank_d)``.

    Output: top-``topk`` ``(doc_id, rrf_score, n_lists)`` — the score
    (rounded to 6) plus how many input lists contained the document.
    Documents missing from a list simply contribute nothing (the
    conventional formulation). Inputs are small top-k lists, so the
    union + hash aggregation is a few hundred rows regardless of corpus
    size; the final cut compiles to TakeOrderedAndProject.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    from functools import reduce

    from cassandra_slow_queries_spark.operators.topk import top_n

    contribs = [
        r.select(
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (rrf_k + F.col(rank_col))).alias("_c"),
        )
        for r in rankings
    ]
    fused = (
        reduce(lambda a, b: a.unionByName(b), contribs)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("_c"), 6).alias("rrf_score"),
            F.count(F.lit(1)).alias("n_lists"),
        )
    )
    return top_n(fused, "rrf_score", topk, tiebreaks=["doc_id"]).orderBy(
        F.desc("rrf_score"), "doc_id"
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lambda_: float = 0.7,
    id_col: str = "doc_id",
    score_col: str = "score",
    vec_col: str = "embedding",
    max_candidates: int = 1000,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) of a retrieval candidate list: greedily pick the item
    maximizing ``lambda·relevance − (1−lambda)·max_cosine_to_already_
    selected`` — the standard diversity pass that stops a result page
    (or a RAG context window) from filling up with near-duplicates of
    the top hit.

    MMR is inherently sequential (pick i+1 depends on picks 1..i) over
    a SMALL candidate list — the top-k output of a retrieval stage, not
    a corpus — so this runs the greedy loop driver-side on the
    collected candidates (the same bounded-driver-work contract as the
    k-means centroid loops in operators/similarity.py). A hard
    ``max_candidates`` guard raises rather than silently collecting a
    corpus-sized frame; re-rank AFTER retrieval, not instead of it.

    Returns a DataFrame ``(id_col, mmr_rank, mmr_score)`` — the id
    column keeps the input's data type — with ``mmr_rank`` 1-based in
    selection order and ``mmr_score`` the marginal objective at
    selection time (rounded to 6; the first pick's score is
    ``lambda·relevance`` — no diversity term exists yet). Selection
    ties break on the smaller id. Zero or NULL vectors contribute
    similarity 0; candidates with a NULL or NaN relevance score OR a
    NULL id are dropped (an unscored row has no place in a relevance
    re-rank; a NaN score poisons every greedy comparison and would
    stick as "best" forever; an id-less pick is unreturnable — and
    None is unorderable in the id tie-break). Mixed
    vector dimensions raise rather than silently truncating the dot
    product (the silent-dim-mismatch bug class the LSH bucketizer
    once hit).
    """
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError("lambda_ must be in [0, 1]")
    rows = (
        candidates.select(
            F.col(id_col).alias("_id"),
            F.col(score_col).cast("double").alias("_rel"),
            F.col(vec_col).alias("_v"),
        )
        .filter(
            F.col("_rel").isNotNull()
            & ~F.isnan(F.col("_rel"))
            & F.col("_id").isNotNull()
        )
        .limit(max_candidates + 1)
        .collect()
    )
    if len(rows) > max_candidates:
        raise ValueError(
            f"mmr_rerank got more than max_candidates={max_candidates} "
            "rows — re-rank a retrieval top-k list, not a corpus"
        )
    import math

    ids = [r["_id"] for r in rows]
    rel = [r["_rel"] for r in rows]
    # a vector with a NULL ELEMENT (failed feature join) is as unusable
    # as a NULL vector: treat it as missing (cosine 0) rather than
    # crashing on float(None)
    vecs = [
        []
        if r["_v"] is None or any(x is None for x in r["_v"])
        else [float(x) for x in r["_v"]]
        for r in rows
    ]
    dims = {len(v) for v in vecs if v}
    if len(dims) > 1:
        raise ValueError(
            f"mmr_rerank got mixed vector dimensions {sorted(dims)} — "
            "a truncated dot product would silently misorder diversity"
        )
    norms = [math.sqrt(sum(x * x for x in v)) for v in vecs]

    def cos(i: int, j: int) -> float:
        if norms[i] == 0.0 or norms[j] == 0.0:
            return 0.0
        d = sum(a * b for a, b in zip(vecs[i], vecs[j]))
        return d / (norms[i] * norms[j])

    remaining = list(range(len(rows)))
    picked: list[tuple] = []
    max_sim = [0.0] * len(rows)  # max cosine to the selected set
    while remaining and len(picked) < k:
        best = None
        for i in remaining:
            div = max_sim[i] if picked else 0.0
            obj = lambda_ * rel[i] - (1.0 - lambda_) * div
            key = (-obj, ids[i])
            if best is None or key < best[0]:
                best = (key, i, obj)
        _, sel, obj = best
        picked.append((ids[sel], len(picked) + 1, round(obj, 6)))
        remaining.remove(sel)
        for i in remaining:
            s = cos(i, sel)
            if s > max_sim[i]:
                max_sim[i] = s
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    id_type = candidates.schema[id_col].dataType
    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("mmr_rank", IntegerType()),
            StructField("mmr_score", DoubleType()),
        ]
    )
    spark = candidates.sparkSession
    return spark.createDataFrame(picked, schema)
