"""Count-min sketch as a pure DataFrame composition.

Spark ships HyperLogLog (``approx_count_distinct`` /
``hll_sketch_agg``) and a quantile sketch (``approx_percentile``) but
no frequency sketch; the DataFrame-native form of Cormode &
Muthukrishnan's count-min (2005) needs nothing custom at all:

- **build**: every item row emits ``depth`` cells ``(row j, column
  xxhash64(item, j) mod width)`` via one ``explode`` over a literal
  row-index array, then ONE hash aggregation counts cell hits. The
  sketch IS a ``(j, col, cnt)`` DataFrame of at most ``depth × width``
  rows — mergeable by construction (union + re-aggregate = the sketch
  of the concatenated streams, exactly), partition-agnostic, and tiny
  (the classic ε-δ sizing: width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉ — a
  2720×5 sketch answers with ε=0.1% overcount at 99.3% confidence
  regardless of stream size).
- **query**: hash the probe items with the SAME expression, join the
  cell frame, take ``min(cnt)`` over the depth rows. Absent rows are
  zero hits on every level → estimate 0.

Guarantees (exact, not statistical, given the hash family):
``estimate ≥ true count`` always (collisions only ADD), and
``estimate ≤ true + ε·N`` with probability ≥ 1−δ over the hash draw —
here the "draw" is the seed offsets, so for a FIXED seed the estimate
is deterministic and replayable, the same property every other gate in
this repo leans on (no ``rand()``).

At 100 TB: the build is one linear scan + one map-side-combinable
aggregation into ≤ depth·width cells; merging shards/days/months is a
union + re-agg over cell frames (the ``x_sketch_rollup`` HLL pattern);
queries touch ``depth`` rows per probe against a broadcastable cell
frame. Nothing is proportional to the stream.

Reference scope note: the reference engine has no frequency sketch
either — this extends the sketch tier (SURVEY §2 extension table)
alongside the HLL rollup and the approx-percentile gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cm_col(item: Column, j: Column | int, width: int, seed: int) -> Column:
    """Column index of ``item`` on sketch row ``j`` — xxhash64 with the
    row index mixed in as an extra hash input (an independent-enough
    family for CM's pairwise-independence requirement in practice),
    pmod'd to the table width. Deterministic: same item, same row, same
    seed → same cell on any partitioning or engine run."""
    jcol = F.lit(j) if isinstance(j, int) else j
    return F.pmod(F.xxhash64(item, jcol, F.lit(seed)), F.lit(width))


def cm_build(
    df: DataFrame,
    item_col: str,
    width: int = 2048,
    depth: int = 5,
    seed: int = 41,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the count-min cell frame ``(j, col, cnt)`` for the items in
    ``df[item_col]`` (NULL items are skipped — they are not a value the
    sketch can answer for). ``weight_col`` makes it a weighted CM
    (counts advance by the weight instead of 1).

    One explode (×depth, a constant) + one aggregation; output ≤
    depth × width rows regardless of input size.
    """
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    item = F.col(item_col)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = (
        df.filter(item.isNotNull())
        .select(
            item.alias("_it"),
            w.alias("_w"),
            F.explode(F.lit(list(range(depth)))).alias("j"),
        )
        .select("j", _cm_col(F.col("_it"), F.col("j"), width, seed).alias("col"), "_w")
    )
    return rows.groupBy("j", "col").agg(F.sum("_w").alias("cnt"))


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge cell frames built with the SAME (width, depth, seed):
    union + re-aggregate. Exactly the sketch of the concatenated
    streams — the mergeability that makes per-shard/per-day builds
    roll up without rescanning (the HLL-rollup pattern)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "col").agg(F.sum("cnt").alias("cnt"))


def cm_query(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    width: int = 2048,
    depth: int = 5,
    seed: int = 41,
    out_col: str = "cm_count",
) -> DataFrame:
    """Point-query estimates for ``probes[item_col]``: min over the
    depth cells. The (width, depth, seed) MUST match the build — they
    are the sketch's identity, like an HLL's lgK. The sketch frame is
    at most depth×width rows, so Spark broadcasts the join side; a
    probe item absent from every level estimates 0 (left join +
    coalesce), preserving ``estimate ≥ true`` for unseen items too.

    Probe-frame hygiene (round-9 ADVICE): a NULL probe estimates NULL —
    ``cm_build`` skipped NULL items, and Spark's ``xxhash64`` IGNORES
    null inputs, so without the guard a NULL probe would hash as
    ``xxhash64(j, seed)`` and return whatever count that accidental
    cell holds. Duplicate probe rows are preserved (a synthetic unique
    row id joins the group-by, then drops), and the internal working
    columns are ``_cm_``-prefixed so probe frames that themselves carry
    ``j``/``col``/``cnt`` columns don't collide.
    """
    item = F.col(item_col)
    base = probes.withColumn("_cm_rid", F.monotonically_increasing_id())
    keyed = base.select(
        "*", F.explode(F.lit(list(range(depth)))).alias("_cm_j")
    ).withColumn(
        "_cm_col",
        F.when(item.isNotNull(), _cm_col(item, F.col("_cm_j"), width, seed)),
    )
    cells = sketch.select(
        F.col("j").alias("_cm_j"),
        F.col("col").alias("_cm_col"),
        F.col("cnt").alias("_cm_cnt"),
    )
    hits = keyed.join(F.broadcast(cells), ["_cm_j", "_cm_col"], "left")
    # Non-null probe: absent cell = 0 hits; null probe: stays NULL on
    # every level so MIN propagates NULL.
    level = F.when(
        item.isNotNull(), F.coalesce(F.col("_cm_cnt"), F.lit(0).cast("long"))
    )
    return (
        hits.groupBy(*base.columns)
        .agg(F.min(level).alias(out_col))
        .drop("_cm_rid")
    )


def mg_partition_summaries(
    df: DataFrame,
    item_col: str,
    k: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-partition Misra-Gries summaries: ``(item, cnt)`` with at most
    ``k`` rows PER PARTITION, regardless of partition size.

    The dual of :func:`cm_build`: MG counters never OVERcount
    (``cnt <= true``) and the per-partition undercount is bounded by
    ``n_p/(k+1)`` — each compress step subtracts the (k+1)-th largest
    counter value from every survivor, and the subtracted mass is
    charged against at least k+1 counted items (Misra & Gries 1982;
    the summary form and merge bound are Agarwal et al., "Mergeable
    Summaries", PODS 2012). Arrow batches arrive bounded, so the
    working dict holds at most k + batch-distinct entries.

    NULL items are skipped, matching cm_build. ``weight_col`` makes it
    weighted (bounds in total weight instead of rows).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for batch in batches:
            items = batch[item_col]
            w = (
                batch[weight_col]
                if weight_col
                else pd.Series(1, index=items.index)
            )
            # mask null weights alongside null items: Spark long nulls
            # arrive in pandas as NaN, would poison the group sum and
            # crash int(c) — cm_build (the documented dual) silently
            # skips null weights via F.sum, so MG matches.
            mask = items.notna() & w.notna()
            grouped = w[mask].groupby(items[mask]).sum()
            for it, c in grouped.items():
                counters[it] = counters.get(it, 0) + int(c)
            if len(counters) > k:
                # compress: subtract the (k+1)-th largest value from
                # every counter, drop the non-positive — the mergeable-
                # summaries step whose total decrement per partition is
                # <= n_p/(k+1)
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    it: c - cut for it, c in counters.items() if c - cut > 0
                }
        yield pd.DataFrame(
            {"item": list(counters), "cnt": list(counters.values())}
        )

    src = df.select(
        F.col(item_col).alias(item_col),
        *( [F.col(weight_col).cast("long").alias(weight_col)] if weight_col else [] ),
    )
    item_type = dict(zip(src.columns, [f.dataType.simpleString() for f in src.schema.fields]))[item_col]
    return src.mapInPandas(summarize, f"item {item_type}, cnt long")


def mg_topk_candidates(
    df: DataFrame,
    item_col: str,
    k: int = 256,
    weight_col: str | None = None,
    out_col: str = "mg_count",
) -> DataFrame:
    """Heavy-hitter candidates from merged per-partition MG summaries:
    ``(item, mg_count)`` where ``mg_count`` is a LOWER bound on the true
    count with ``true - mg_count <= N/(k+1)`` (sum of the per-partition
    bounds — absent counters contribute 0, which still respects each
    partition's bound). Consequences, both exactly testable:

    - never overcounts: ``mg_count <= true`` always;
    - complete above the threshold: every item with true count
      ``> N/(k+1)`` appears (its merged counter is positive).

    The scale shape: one linear scan emitting <= k rows per partition,
    one hash aggregation over <= k * n_partitions rows, nothing
    proportional to the stream or the item universe. The standard
    deployment verifies the candidates' EXACT counts with one semi-join
    pass (candidates are <= k * n_partitions rows, broadcastable);
    count-min answers point queries instead — the two sketches are
    complementary, not interchangeable.
    """
    summaries = mg_partition_summaries(df, item_col, k, weight_col)
    return (
        summaries.groupBy(F.col("item").alias(item_col))
        .agg(F.sum("cnt").alias(out_col))
        .filter(F.col(out_col) > 0)
    )
