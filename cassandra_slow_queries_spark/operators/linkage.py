"""Fuzzy record linkage by sorted-neighborhood blocking.

Entity resolution ("are these two registry rows the same real-world
thing?") needs candidate pairs without the all-pairs cross join. The
sorted-neighborhood method (Hernández & Stolfo 1995) sorts records by a
linkage key and compares only records whose SORT RANKS are within a
fixed window — dirty variants of the same entity (tail typos, appended
suffixes, dropped characters) sort next to their original, so a small
window catches them at linear cost. Recall is bounded by construction:
an edit that changes the sort prefix can move a record out of the
window (the classic SNM trade-off; run a second pass on a different
key to recover).

Scale shape: ranking is the distributed prefix-sum global row_number
(operators/merge.py:assign_global_ids — range exchange + per-range
local windows, never a single-task global window). The neighbor join
is a band join: band = rank div window, the left side explodes to its
own and the successor band (fan-out exactly 2), and a pair at rank
distance ≤ window lands in exactly one of the two band matches — the
same exactly-once banding as operators/rangejoin.py. Band population
is ``window`` consecutive ranks, so per-key join fan-out is bounded by
construction; no salting needed, no hot keys possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_col: str,
    window: int = 5,
    num_ranges: int | None = None,
) -> DataFrame:
    """Candidate pairs ``(a_id, a_<sort>, b_id, b_<sort>)`` whose global
    sort ranks (ordered by ``sort_col`` then ``id_col`` as the strict
    tiebreak) differ by 1..``window``. Each qualifying pair is emitted
    exactly once, with the lower-ranked record on the ``a_`` side."""
    if window < 1:
        raise ValueError("window must be >= 1")
    from cassandra_slow_queries_spark.operators.merge import assign_global_ids

    ranked = assign_global_ids(
        df.select(
            F.col(id_col).alias("_id"), F.col(sort_col).alias("_key")
        ),
        [F.col("_key"), F.col("_id")],
        out_col="_rn",
        num_ranges=num_ranges,
    )
    w = F.lit(int(window))
    band = F.expr("_rn div " + str(int(window)))
    left = ranked.select(
        F.col("_id").alias("a_id"),
        F.col("_key").alias("a_key"),
        F.col("_rn").alias("_arn"),
        F.explode(F.array(band, band + 1)).alias("_band"),
    )
    right = ranked.select(
        F.col("_id").alias("b_id"),
        F.col("_key").alias("b_key"),
        F.col("_rn").alias("_brn"),
        band.alias("_band"),
    )
    return (
        left.join(right, "_band")
        .filter(
            (F.col("_brn") > F.col("_arn"))
            & (F.col("_brn") <= F.col("_arn") + w)
        )
        .select("a_id", "a_key", "b_id", "b_key")
    )


def fuzzy_link(
    df: DataFrame,
    id_col: str,
    name_col: str,
    window: int = 5,
    max_distance: int = 1,
    num_ranges: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood linkage verified by edit distance: candidate
    pairs from :func:`sorted_neighborhood_pairs` on ``name_col``, kept
    when ``levenshtein(a, b) <= max_distance``. Returns
    ``(a_id, b_id, a_name, b_name, distance)`` with the lower-ranked
    record first. The verify runs on candidates only — cost is
    O(rows · window) comparisons, never all-pairs."""
    cand = sorted_neighborhood_pairs(
        df, id_col, name_col, window=window, num_ranges=num_ranges
    )
    dist = F.levenshtein(F.col("a_key"), F.col("b_key"))
    return (
        cand.withColumn("distance", dist)
        .filter(F.col("distance") <= max_distance)
        .select(
            "a_id",
            "b_id",
            F.col("a_key").alias("a_name"),
            F.col("b_key").alias("b_name"),
            "distance",
        )
    )


def multi_pass_link(
    df: DataFrame,
    id_col: str,
    name_col: str,
    passes: list[Column],
    window: int = 5,
    max_distance: int = 1,
    num_ranges: int | None = None,
) -> DataFrame:
    """Multi-pass sorted-neighborhood linkage: one SNM candidate pass
    per sort-key expression in ``passes``, candidate id pairs unioned
    (canonicalized lower-id-first, deduped), then ONE edit-distance
    verify over the union. The standard recall fix for single-pass
    SNM: a head edit ruins sort locality on the name but not on the
    REVERSED name, so ``[name, reverse(name)]`` covers both edit ends;
    more passes (soundex, zip+lastname, ...) are just more entries.

    Cost is linear per pass (each is a rank + band join), the union is
    candidate-sized, and the verify runs once on the deduped set —
    adding a pass never re-verifies pairs already found.
    """
    cand = None
    for expr in passes:
        keyed = df.select(
            F.col(id_col).alias("_mid"), expr.alias("_mkey")
        )
        p = sorted_neighborhood_pairs(
            keyed, "_mid", "_mkey", window=window, num_ranges=num_ranges
        )
        ids = p.select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
        )
        cand = ids if cand is None else cand.unionByName(ids)
    if cand is None:
        raise ValueError("passes must be non-empty")
    cand = cand.distinct()
    names_a = df.select(
        F.col(id_col).alias("a_id"), F.col(name_col).alias("a_name")
    )
    names_b = df.select(
        F.col(id_col).alias("b_id"), F.col(name_col).alias("b_name")
    )
    return (
        cand.join(names_a, "a_id")
        .join(names_b, "b_id")
        .withColumn("distance", F.levenshtein("a_name", "b_name"))
        .filter(F.col("distance") <= max_distance)
        .select("a_id", "b_id", "a_name", "b_name", "distance")
    )
