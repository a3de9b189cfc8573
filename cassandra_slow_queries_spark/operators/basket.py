"""Market-basket association rules (frequent pair mining).

"Customers whose basket contains A also tend to contain B" — support /
confidence / lift over co-occurring item pairs, the classic
recommendation and cross-sell query. The naive shape is an unbounded
per-basket self-join (|basket|² pairs per basket); at corpus scale both
classic Apriori prunes apply BEFORE any pair materializes:

- **min-support item pruning**: a pair can only reach ``min_pair_count``
  if BOTH its items individually do, so infrequent items are dropped
  first (one hash aggregation + a broadcast semi-join of the surviving
  item set — the frequent-item dimension is small by construction).
- **basket-size cap**: a handful of degenerate mega-baskets (a crawler
  account, a bulk order) otherwise dominate the fan-out; ``
  max_basket_size`` drops them with an observable row count, the same
  bounded-fan-out policy as the degree cap in
  ``operators/graph.py:triangle_counts``.

After pruning, pairs come from one equi-self-join on the basket id
(both sides shuffle-partitioned on the same key) with a canonical
``item_a < item_b`` predicate so each unordered pair materializes
exactly once, then one hash aggregation counts pair support. Rules are
emitted in both directions from the pair counts plus a broadcast join
back to the per-item counts — no second pass over the baskets.

Definitions (``n_baskets`` = baskets surviving the size cap):
``support(A→B) = count(A,B) / n_baskets``;
``confidence(A→B) = count(A,B) / count(A)``;
``lift(A→B) = confidence / (count(B) / n_baskets)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_count: int = 2,
    min_pair_count: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Mine pairwise association rules from (basket, item) rows.

    Returns one row per ordered rule ``antecedent → consequent`` whose
    underlying unordered pair co-occurs in at least ``min_pair_count``
    baskets (and whose items each appear in at least ``min_item_count``
    baskets): ``(antecedent, consequent, pair_count, support,
    confidence, lift)``. Duplicate (basket, item) rows count once.
    Ratios are exact double divisions of exact long counts.
    """
    if min_item_count < 1 or min_pair_count < 1:
        raise ValueError("min_item_count and min_pair_count must be >= 1")
    if max_basket_size is not None and max_basket_size < 1:
        raise ValueError("max_basket_size must be >= 1 (or None)")
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket_size is not None:
        sizes = items.groupBy("basket").agg(
            F.count(F.lit(1)).alias("_bsize")
        )
        items = (
            items.join(sizes, "basket")
            .filter(F.col("_bsize") <= max_basket_size)
            .drop("_bsize")
        )
    # persist: the distinct+capped basket frame feeds the item counts,
    # the basket total, and BOTH pair-join sides — unpersisted, the
    # whole distinct subtree re-executes per consumer (measured 42
    # exchanges vs 7 at sf0.01)
    items = items.persist()
    # Apriori prune: per-item basket counts; only frequent items can
    # participate in a frequent pair. The surviving item set is small
    # (min-support cuts the long tail), so it broadcasts.
    item_counts = items.groupBy("item").agg(
        F.count(F.lit(1)).alias("item_count")
    )
    # persist: frequent feeds the semi-prune and both broadcast
    # dimension joins
    frequent = item_counts.filter(
        F.col("item_count") >= min_item_count
    ).persist()
    pruned = items.join(
        F.broadcast(frequent.select("item")), "item", "left_semi"
    )
    # scalar basket total as a broadcast 1-row frame (no driver action:
    # the operator stays lazy end to end)
    totals = items.groupBy().agg(
        F.count_distinct("basket").cast("double").alias("_n_baskets")
    )
    a = pruned.select(
        F.col("basket"), F.col("item").alias("item_a")
    )
    b = pruned.select(
        F.col("basket"), F.col("item").alias("item_b")
    )
    # persist: pairs feed both rule directions
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
        .persist()
    )
    # both rule directions from the one pair table; per-item counts
    # broadcast back (the frequent-item dimension again)
    rules = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_count",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "pair_count",
        )
    )
    ante = frequent.select(
        F.col("item").alias("antecedent"),
        F.col("item_count").alias("_ante_count"),
    )
    cons = frequent.select(
        F.col("item").alias("consequent"),
        F.col("item_count").alias("_cons_count"),
    )
    n = F.col("_n_baskets")
    out = (
        rules.join(F.broadcast(ante), "antecedent")
        .join(F.broadcast(cons), "consequent")
        .crossJoin(F.broadcast(totals))
        .select(
            "antecedent",
            "consequent",
            "pair_count",
            (F.col("pair_count") / n).alias("support"),
            (
                F.col("pair_count")
                / F.col("_ante_count").cast("double")
            ).alias("confidence"),
            (
                (
                    F.col("pair_count")
                    / F.col("_ante_count").cast("double")
                )
                / (F.col("_cons_count") / n)
            ).alias("lift"),
        )
    )
    # materialize the (rule-sized) result while the caches are hot, then
    # release all three — bare persist() with no release accumulates
    # executor storage across calls in a long-lived session
    from cassandra_slow_queries_spark.operators.dedup import (
        _materialize_release,
    )

    return _materialize_release(out, pairs, frequent, items)
