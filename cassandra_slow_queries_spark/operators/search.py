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
    """Whitespace tokenization, lowercased, empty tokens dropped — the
    same split the corpus text stats use (functions/text.py), so index
    terms and analysis terms agree."""
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
