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

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cm_col(item: Column, j: Column | int, width: int, seed: int) -> Column:
    """Column index of ``item`` on sketch row ``j`` — xxhash64 with the
    row index mixed in as an extra hash input (an independent-enough
    family for CM's pairwise-independence requirement in practice),
    pmod'd to the table width. Deterministic: same item, same row, same
    seed → same cell on any partitioning or engine run.

    The item is canonicalized to STRING before hashing: xxhash64 is
    type-sensitive (an int32 and an int64 holding the same value hash
    differently — the hazard :class:`BloomFilter` records key_type
    for), and the cell frame carries no type side channel, so a probe
    column typed differently from the build column would silently hash
    to cells the build never touched and estimate 0 — breaking the
    ``estimate ≥ true`` guarantee. String canonicalization makes any
    two columns that RENDER the same value hash identically (int32 5 ==
    int64 5; note double 5.0 renders "5.0" and stays distinct from
    integer 5, which is the honest reading of "different value")."""
    jcol = F.lit(j) if isinstance(j, int) else j
    return F.pmod(
        F.xxhash64(item.cast("string"), jcol, F.lit(seed)), F.lit(width)
    )


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
    summaries: DataFrame | None = None,
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

    ``summaries`` lets a caller that also needs the per-partition
    summary frame (e.g. for a size gate) build it once and share it
    — the merge is a pure function of the summaries, so passing a
    frame built by :func:`mg_partition_summaries` with the same
    arguments yields the identical result (r13 opt, guide §5: the
    unshared form re-executed the full input scan per consumer).
    """
    if summaries is None:
        summaries = mg_partition_summaries(df, item_col, k, weight_col)
    return (
        summaries.groupBy(F.col("item").alias(item_col))
        .agg(F.sum("cnt").alias(out_col))
        .filter(F.col(out_col) > 0)
    )


# ---------------------------------------------------------------------------
# Bloom filter (membership) — the semi-join pushdown sketch
# ---------------------------------------------------------------------------


class BloomFilter(NamedTuple):
    """A built Bloom filter: the packed bitmap plus the sizing and the
    BUILD KEY TYPE. ``key_type`` matters for correctness, not just
    documentation: ``xxhash64`` is type-sensitive (an int32 and an
    int64 holding the same value hash differently), so a probe column
    of a different type would silently void the zero-false-negative
    theorem — :func:`bloom_might_contain` casts every probe to this
    type before hashing."""

    words: list[int]
    m: int
    k: int
    n_keys: int
    key_type: str
    seed: int


def bloom_build(
    df: DataFrame,
    key_col: str,
    bits_per_key: int = 16,
    n_hashes: int = 6,
    seed: int = 97,
) -> BloomFilter:
    """Build a Bloom filter over ``df[key_col]`` as a bitmap of packed
    64-bit words: a :class:`BloomFilter` with ``m = next_pow2(
    bits_per_key · n_keys)`` bits and ``k = n_hashes`` hash functions
    (Bloom 1970).

    This is Spark's own runtime row-level-filtering pattern
    (``bloom_filter_agg`` exists but is NOT SQL-registered in 4.1) as
    explicit DataFrame ops: each key emits ``k`` bit positions
    ``xxhash64(key, i, seed) mod m`` through one explode, one hash
    aggregation ORs them into ≤ m/64 words, and the word frame (2 bytes
    per key at 16 bits/key — LINEAR in the build side but 4-32× smaller
    than shipping the key set, the entire point of the pushdown: 2 MiB
    per million keys) is collected and returned as a Python list for
    embedding as ONE array literal via :func:`bloom_might_contain`.
    Size the build side accordingly — a filter over billions of keys
    belongs in the engine's own runtime row-level filtering, not a
    driver-held literal.

    Guarantees: membership probes of TRUE members always pass (a
    member's bits were all set by construction — the zero-false-negative
    theorem that makes Bloom pruning safe: the real join afterwards
    removes false positives, so bloom-pruned join == exact join,
    EXACTLY); false-positive rate ≈ (1 − e^{−k·n/m})^k, ~0.1% at 16
    bits/key with k=6.

    At 100 TB: the dim-side build is one linear scan into a fixed-size
    bitmap; the fact side probes with pure bitwise expressions inside
    whole-stage codegen BEFORE the shuffle join, cutting shuffled rows
    to matches + εn — the classic semi-join pushdown without shipping
    the key set.

    NULL keys are skipped (a NULL never joins, so pruning it is
    correct). Raises on an empty/all-NULL build: an empty filter would
    prune EVERYTHING silently.
    """
    if n_hashes < 1:
        raise ValueError("n_hashes must be >= 1")
    if bits_per_key < 1:
        # a zero/negative budget would silently leave m at the 64-bit
        # floor: a saturated filter that prunes nothing while callers
        # believe they built a real one
        raise ValueError("bits_per_key must be >= 1")
    key_type = dict(
        zip(df.columns, [f.dataType.simpleString() for f in df.schema.fields])
    )[key_col]
    keys = df.select(F.col(key_col).alias("_bk")).filter(
        F.col("_bk").isNotNull()
    )
    n = keys.count()
    if n == 0:
        raise ValueError(
            f"bloom_build: no non-null keys in {key_col!r} — an empty "
            "filter would silently prune every probe"
        )
    m = 64
    while m < bits_per_key * n:
        m *= 2
    pos = keys.select(
        F.explode(
            F.array(*[
                F.pmod(F.xxhash64("_bk", F.lit(i), F.lit(seed)), F.lit(m))
                for i in range(n_hashes)
            ])
        ).alias("bit")
    )
    packed = (
        pos.select(
            (F.col("bit") / 64).cast("long").alias("word"),
            # call_function: the F.shiftleft wrapper requires a Python
            # int for numBits; the SQL function takes an expression
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("bit") % 64).cast("int"),
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()  # bounded: <= m/64 rows (128 longs per 8192 bits)
    )
    words = [0] * (m // 64)
    for r in packed:
        words[r["word"]] = r["bits"]
    return BloomFilter(words, m, n_hashes, n, key_type, seed)


def bloom_might_contain(bf: BloomFilter, key: Column) -> Column:
    """Membership-probe expression against a built filter: TRUE iff all
    ``k`` bit positions of ``key`` are set. Pure bitwise arithmetic on a
    broadcast array literal — stays inside whole-stage codegen, no UDF,
    no join.

    The probe is CAST to the filter's build key type first: xxhash64 is
    type-sensitive, so an int32 probe against an int64-built filter
    would otherwise compute different bit positions and silently break
    the zero-false-negative theorem. NULL keys — genuine NULLs and
    probes the cast cannot represent in the build type — probe NULL
    (three-valued logic: such a key can't equi-join the build side
    anyway, so pruning it is exact)."""
    # try_cast, not cast: under ANSI mode a malformed probe (e.g. a
    # string that can't be a bigint) must prune as NULL, not throw
    casted = key.try_cast(bf.key_type)
    # ONE array<bigint> Literal node, NOT F.array of m/64 F.lit nodes:
    # m scales with n_keys (16 bits/key), so a 1M-key build would
    # otherwise plant ~260k expression nodes per probe replica — the
    # plan-explosion class jl_project documents. One Literal keeps the
    # analyzer and codegen flat no matter the filter size.
    arr = F.lit(bf.words)
    checks = []
    for i in range(bf.k):
        bit = F.pmod(F.xxhash64(casted, F.lit(i), F.lit(bf.seed)), F.lit(bf.m))
        word = F.element_at(arr, (bit / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (bit % 64).cast("int")
        )
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return F.when(casted.isNull(), F.lit(None).cast("boolean")).otherwise(out)


# ---------------------------------------------------------------------------
# q-digest (rank / quantile) — the deterministic mergeable quantile sketch
# ---------------------------------------------------------------------------


def _qd_compress(counts: dict, t: int, level_bits: int) -> dict:
    """One bottom-up q-digest compression pass (Shrivastava et al.,
    SenSys 2004) over ``{(level, lo): cnt}`` with threshold ``t``:
    every (node, sibling, parent) triple whose total mass is below
    ``t`` folds into the parent. Post-conditions the theorems lean on:

    - mass is conserved exactly (folds only MOVE counts up);
    - any node that RECEIVED folded mass holds < t at that moment and
      can only grow through another fold, which again requires the
      triple (hence the result) to stay < t;
    - any surviving non-root node's triple was >= t when examined and
      triples only grow afterwards, which caps the node count at
      O(k) (see :func:`qd_merge` for the exact constant used).
    """
    for level in range(level_bits, 0, -1):
        width = 1 << (level_bits - level)
        for key in sorted(kk for kk in counts if kk[0] == level):
            if key not in counts:  # consumed as an earlier key's sibling
                continue
            _, lo = key
            sib = (level, lo ^ width)
            parent = (level - 1, min(lo, lo ^ width))
            tot = (
                counts[key]
                + counts.get(sib, 0)
                + counts.get(parent, 0)
            )
            if tot < t:
                counts[parent] = tot
                del counts[key]
                counts.pop(sib, None)
    return counts


def qd_partition_digests(
    df: DataFrame,
    value_col: str,
    k: int = 64,
    level_bits: int = 20,
) -> DataFrame:
    """Per-partition q-digest summaries over the integer domain
    ``[0, 2^level_bits)``: rows ``(level, lo, cnt)`` where the node at
    ``level`` covers the dyadic range ``[lo, lo + 2^(level_bits-level))``
    (level 0 = root, level ``level_bits`` = unit-width leaves).

    The third member of the mergeable-summaries family here (Agarwal
    et al., PODS 2012): count-min answers FREQUENCY, Misra-Gries
    answers HEAVY HITTERS, q-digest answers RANK/QUANTILES — and unlike
    sampling-based quantile sketches it is fully DETERMINISTIC (no
    random draws at all), so every gate on it is an exact theorem and
    replays identically under any seed, partitioning, or engine run.

    Each partition folds its value histogram with local threshold
    ``t_p = max(1, n_p // k)``, so it emits O(k) rows bounded by its
    own mass — one linear scan, nothing proportional to the stream.
    Working memory is bounded too: whenever the counter dict outgrows
    a small multiple of the final digest size, it is folded with the
    RUNNING threshold (``n_so_far // k``) — a fold at a smaller
    threshold still leaves every receiving parent below the FINAL
    threshold (later folds re-check the triple against the larger t),
    so the mass/anc/size theorems are unchanged while memory stays
    O(k·level_bits + batch_distinct) instead of O(distinct values).
    NULL values are skipped (the cm_build contract); values outside
    the domain are a CONTRACT ERROR (raise), because silently clamping
    them would corrupt rank answers near the domain edges.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not 1 <= level_bits <= 40:
        raise ValueError("level_bits must be in [1, 40]")
    import pandas as pd

    domain = 1 << level_bits
    # fold early once the dict outgrows this (≈ a few final digests);
    # 4096 floor keeps tiny-k builds from folding every batch
    compact_at = max(8 * k * level_bits, 4096)

    def summarize(batches):
        counts: dict = {}
        n = 0
        for batch in batches:
            vals = batch[value_col].dropna()
            if len(vals) == 0:
                continue
            iv = vals.astype("int64")
            if (iv != vals).any():
                raise ValueError(
                    f"qd_partition_digests: non-integral value in "
                    f"{value_col!r} (cast the column first)"
                )
            if int(iv.min()) < 0 or int(iv.max()) >= domain:
                raise ValueError(
                    f"qd_partition_digests: value outside [0, {domain}) "
                    f"in {value_col!r} — widen level_bits or clamp "
                    f"explicitly upstream"
                )
            n += len(iv)
            for v, c in iv.value_counts().items():
                key = (level_bits, int(v))
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > compact_at:
                counts = _qd_compress(counts, max(1, n // k), level_bits)
        counts = _qd_compress(counts, max(1, n // k), level_bits)
        yield pd.DataFrame(
            {
                "level": pd.Series(
                    [kk[0] for kk in counts], dtype="int32"
                ),
                "lo": pd.Series([kk[1] for kk in counts], dtype="int64"),
                "cnt": pd.Series(list(counts.values()), dtype="int64"),
            }
        )

    return df.select(value_col).mapInPandas(
        summarize, "level int, lo long, cnt long"
    )


def qd_merge(
    digests: DataFrame, k: int = 64, level_bits: int = 20
) -> DataFrame:
    """Merge per-partition (or per-shard / per-day) digest frames into
    ONE digest: a hash aggregation sums coinciding nodes, then a single
    bounded compress pass with the GLOBAL threshold ``t = max(1,
    n // k)`` re-establishes the size bound. The input is already O(k)
    rows per source partition, so the final single-group pass touches
    O(k · P) rows — bounded by construction, never by the stream
    (the mg_topk_candidates merge shape).

    Exact post-merge theorems (all gated in the catalog entry):

    - **mass**: sum(cnt) == number of non-null input values, exactly;
    - **rank sandwich**: for any probe x, ``rank_lo(x) <= |{v < x}| <=
      rank_lo(x) + anc(x)`` where ``rank_lo`` sums nodes entirely below
      x and ``anc`` sums x's strict ancestors (every value is counted
      in exactly one node, and a node's range either lies below x,
      contains x — i.e. is an ancestor of x's leaf — or lies above);
    - **uncertainty bound**: ``anc(x) < level_bits · (2n/k + P + 1)``
      — non-leaf counts stay below Σ_p t_p + t (partials contribute
      < t_p each; a fold leaves its parent < t), and x has at most
      ``level_bits`` strict ancestors;
    - **size**: at most ``8k + 1`` surviving nodes once n >= 2k (every
      surviving non-root triple held >= t when examined; the triple sum
      over all nodes is < 4n; t = n // k >= n / (2k) for n >= 2k).
    """
    summed = digests.groupBy("level", "lo").agg(F.sum("cnt").alias("cnt"))
    import pandas as pd

    def compress(pdf: "pd.DataFrame") -> "pd.DataFrame":
        counts = {
            (int(lv), int(lo)): int(c)
            for lv, lo, c in zip(pdf["level"], pdf["lo"], pdf["cnt"])
        }
        n = sum(counts.values())
        counts = _qd_compress(counts, max(1, n // k), level_bits)
        return pd.DataFrame(
            {
                "level": pd.Series([kk[0] for kk in counts], dtype="int32"),
                "lo": pd.Series([kk[1] for kk in counts], dtype="int64"),
                "cnt": pd.Series(list(counts.values()), dtype="int64"),
            }
        )

    return (
        summed.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(compress, "level int, lo long, cnt long")
    )


def qd_build(
    df: DataFrame,
    value_col: str,
    k: int = 64,
    level_bits: int = 20,
) -> DataFrame:
    """Per-partition digests + merge: the one-call build."""
    return qd_merge(
        qd_partition_digests(df, value_col, k, level_bits), k, level_bits
    )


def _qd_hi(level_bits: int) -> Column:
    """Inclusive upper bound of a digest node's dyadic range. pow() is
    exact here: level_bits <= 40 keeps every width below 2^52."""
    width = F.pow(F.lit(2.0), F.lit(level_bits) - F.col("level")).cast("long")
    return F.col("lo") + width - 1


def qd_rank_bounds(
    digest: DataFrame,
    probes: DataFrame,
    level_bits: int = 20,
    probe_col: str = "probe",
) -> DataFrame:
    """For each probe x: ``rank_lo`` (mass certainly below x) and
    ``anc`` (mass in x's strict ancestors — the exact rank
    uncertainty). The digest is O(k) rows, so the crossJoin broadcasts
    it against the probe frame — no shuffle of anything
    stream-proportional. The true rank |{v < x}| always lies in
    ``[rank_lo, rank_lo + anc]`` (see :func:`qd_merge`)."""
    hi = _qd_hi(level_bits)
    x = F.col(probe_col)
    is_probe_leaf = (F.col("level") == level_bits) & (F.col("lo") == x)
    j = probes.crossJoin(F.broadcast(digest))
    zero = F.lit(0).cast("long")
    return j.groupBy(probe_col).agg(
        F.coalesce(F.sum(F.when(hi < x, F.col("cnt"))), zero).alias(
            "rank_lo"
        ),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("lo") <= x) & (x <= hi) & ~is_probe_leaf,
                    F.col("cnt"),
                )
            ),
            zero,
        ).alias("anc"),
    )


def qd_quantiles(
    digest: DataFrame,
    quantiles: list[float],
    level_bits: int = 20,
) -> DataFrame:
    """Quantile answers from a built digest: for each q, the value
    ``hi`` of the first node in POST-ORDER (hi ascending, deeper —
    larger lo — first at equal hi) whose running mass reaches
    ``ceil(q·n)``. Exact straddle theorems (gated in the entry):
    ``|{v <= answer}| >= ceil(q·n)`` (every node at or before the
    answer in post-order lies entirely at or below it) and
    ``|{v < answer}| < ceil(q·n) + anc(answer)`` (mass before the
    target that the prefix missed can only sit in the answer's strict
    ancestors).

    The window here is single-partition BY CONSTRUCTION over the O(k)
    digest frame — bounded rows, not stream-proportional (the
    documented exception to the no-single-task-window rule)."""
    bad = [q for q in quantiles if not 0.0 <= q <= 1.0]
    if bad:
        # an out-of-range q would otherwise SILENTLY vanish from the
        # output (its ceil(q·n) target exceeds every prefix sum)
        raise ValueError(f"quantiles must be in [0, 1], got {bad}")
    from pyspark.sql import Window

    hi = _qd_hi(level_bits)
    w = (
        Window.orderBy(F.col("_hi").asc(), F.col("lo").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cummed = (
        digest.withColumn("_hi", hi)
        .withColumn("_cum", F.sum("cnt").over(w))
    )
    total = digest.agg(F.sum("cnt").alias("_n"))
    qs = F.array(*[F.lit(float(q)) for q in quantiles])
    targets = total.select(
        F.explode(qs).alias("q"), F.col("_n")
    ).select("q", F.ceil(F.col("q") * F.col("_n")).cast("long").alias("r_star"))
    # r_star <= n for every q <= 1 and the full post-order prefix sums
    # to n, so each target always finds a node — no outer join needed
    return (
        cummed.crossJoin(F.broadcast(targets))
        .filter(F.col("_cum") >= F.col("r_star"))
        .groupBy("q", "r_star")
        .agg(
            F.min(
                F.struct(F.col("_hi"), (-F.col("lo")).alias("_nlo"))
            ).alias("_best")
        )
        .select("q", "r_star", F.col("_best._hi").alias("value"))
    )
