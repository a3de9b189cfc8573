"""Corpus-curation operators for training-data pipelines (Tier 3).

The selection half of a data pipeline: after dedup and quality scoring
(operators/dedup.py, functions/text.py), a run still has to *choose*
what goes into the training mix. Four operators, all expression-first
and shuffle-conscious:

- **Deterministic stratified sampling** — per-stratum keep rates via a
  portable content hash. Reproducible across runs AND engines (the
  sampling decision is a pure function of the id), which is what makes
  a 100 TB sampling job restartable and auditable; ``df.sample`` is
  neither (seed × partitioning dependent).
- **Per-group capping** — at most N documents per source/domain, the
  standard anti-boilerplate guard (a crawl dump where one domain is 30%
  of the corpus would otherwise dominate the mix).
- **Token-budget selection** — take documents in priority order until a
  global token budget is exhausted: a distributed prefix-sum (range
  repartition → per-partition local window → broadcast partition
  offsets), NOT a single-partition global window, so it holds at
  corpus scale.
- **Contamination check** — n-gram overlap between the corpus and a
  (small) benchmark/eval set, the standard train-test leakage gate.
- **Sequence packing** — concat-and-chunk assignment of documents to
  fixed-size context windows (the training-batch layout step), built on
  the same distributed prefix-sum as the budget selector.
- **PII scrubbing** — regex redaction of emails / IPv4 / phone numbers
  with per-kind audit counts, pure ``regexp_replace`` chains (JVM-side,
  no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.functions.draws import md5_long, md5_uniform
from cassandra_slow_queries_spark.functions.quantize import qdec
from cassandra_slow_queries_spark.functions.text import word_shingles
from cassandra_slow_queries_spark.session import spread_input

try:  # pandas is baked into the target env; gate for safety. Module-level
    # so the pandas_udf type-hint strings (postponed annotations) resolve.
    import pandas as _pd
    from pyspark.sql.functions import pandas_udf as _pandas_udf

    _HAVE_ARROW = True
except ImportError:  # pragma: no cover
    _HAVE_ARROW = False

#: buckets for the sampling hash — rates are expressed out of 10_000
SAMPLE_BUCKETS = 10_000


def sample_bucket(id_col: Column | str) -> Column:
    """Deterministic, engine-portable bucket in [0, 10000): the first 15
    hex chars of md5(id-as-string) read as an integer, mod 10000.

    md5 (not xxhash64/hash) on purpose: the oracle must reproduce the
    exact same buckets in DuckDB — ``CAST('0x'||substr(md5(...),1,15) AS
    BIGINT) % 10000``. 15 hex chars = 60 bits, safely inside a long.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(md5_long(c.cast("string")), F.lit(SAMPLE_BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff ``bucket(id) < rate[stratum] · 10000``.

    ``rates`` maps stratum value → keep fraction (e.g. ``{"en": 0.1,
    "de": 0.5}``); unlisted strata use ``default_rate``. The rate table
    is a literal when-chain (driver-side dict, same pattern as the
    dispatch operator) — no join, no shuffle, the filter sits directly
    above the scan and combines with predicate pushdown. Expected-size
    accounting is exact in distribution: buckets are uniform over the
    id space, so a 0.37 rate keeps 37.00% ± binomial noise — which
    requires ``round``, not truncation: ``int(0.57 * 10000)`` is 5699
    (the float product lands just below the integer), silently keeping
    one bucket too few (assign_split rounds the same way).
    """
    threshold = F.lit(int(round(default_rate * SAMPLE_BUCKETS)))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == stratum,
            F.lit(int(round(rate * SAMPLE_BUCKETS))),
        ).otherwise(threshold)
    return df.filter(sample_bucket(id_col) < threshold)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_col: str,
    id_col: str,
    descending: bool = True,
) -> DataFrame:
    """Keep the top ``n`` rows per group by ``(order_col, id)`` — the
    per-domain cap of a crawl-curation pipeline.

    One hash-partitioned window per group key: groups (domains) are
    many and individually small relative to the corpus, so the shuffle
    is well distributed; a pathologically hot domain is exactly what the
    cap is for, and AQE's skew handling splits its sort. The id
    tiebreak makes the kept set deterministic.
    """
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(order, F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    key_col: str = "sample_key",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``k`` rows:
    inclusion probability proportional to ``weight_col`` (Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir").

    Each row draws a key ``u^(1/w)`` with ``u`` uniform in (0,1); the
    ``k`` largest keys are exactly a weighted sample without
    replacement. Instead of a PRNG, ``u`` comes from the same portable
    md5 draw as :func:`sample_bucket` — ``(md5_60bit(id) + 0.5) / 2^60``
    — so the sample is a pure function of the row ids: reproducible
    across runs, restarts, partitionings, and engines (a DuckDB oracle
    reproduces it bit-for-bit). Rows with non-positive weight are
    excluded (zero weight = never sampled, matching the limit of the
    E-S key as w→0⁺).

    The key is ROUNDED to 12 digits before ranking (id-asc tiebreak) —
    the catalog-wide float-ordering rule — and kept in the output
    (``key_col``) for audit.

    Scale: one global top-K — ``orderBy(...).limit(k)`` compiles to
    TakeOrderedAndProject (per-partition heaps + driver merge of k·P
    rows), no full sort, no shuffle of the corpus.
    """
    c = F.col(id_col)
    u = md5_uniform(c.cast("string"))
    w = F.col(weight_col).cast("double")
    key = F.round(F.pow(u, F.lit(1.0) / w), 12)
    return (
        df.filter(w > 0)
        .withColumn(key_col, key)
        .orderBy(F.col(key_col).desc(), c.asc())
        .limit(k)
    )


def group_percent_rank(
    df: DataFrame,
    score_col: str,
    group_col: str,
    out_col: str = "pct_rank",
) -> DataFrame:
    """``PERCENT_RANK() OVER (PARTITION BY group ORDER BY score)`` —
    fraction of the group's rows with a strictly smaller score — in a
    shape that survives few-but-huge groups.

    The naive window ranks ROWS, so a corpus with 5 languages sorts
    each language's billions of rows in one task. Scores, however, are
    usually low-cardinality (quality heuristics, token counts), so this
    computes the rank on the (group, score) CDF instead:

    1. aggregate to per-(group, score) cell counts — a normal hash agg
       over the corpus, fully parallel;
    2. one window over CELLS per group (bounded by distinct scores per
       group, not rows — the documented residual assumption);
    3. broadcast-join the tiny CDF back onto the corpus.

    Tie semantics match PERCENT_RANK exactly: equal scores share a
    rank. Single-row groups get rank 0.0 (the SQL convention n−1 → 0
    division guarded to 0).
    """
    from pyspark.sql import Window

    cells = df.groupBy(group_col, score_col).agg(F.count("*").alias("_c"))
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).asc())
    wg = Window.partitionBy(group_col)
    cdf = (
        cells.withColumn("_below", F.sum("_c").over(w) - F.col("_c"))
        .withColumn("_n", F.sum("_c").over(wg))
        .select(
            F.col(group_col).alias("_pr_g"),
            F.col(score_col).alias("_pr_s"),
            F.when(F.col("_n") > 1, F.col("_below") / (F.col("_n") - 1))
            .otherwise(F.lit(0.0))
            .alias(out_col),
        )
    )
    # null-safe back-join: the CDF frame HAS cells for NULL scores and
    # NULL groups (groupBy keeps them, and the asc window ranks NULL
    # scores first = rank 0.0, the SQL NULLS-FIRST peer group) — a
    # plain equi-join would hand exactly those rows a NULL rank, and
    # quantile_bins a NULL bin that falls out of every curriculum
    # phase filter
    return df.join(
        F.broadcast(cdf),
        F.col(group_col).eqNullSafe(F.col("_pr_g"))
        & F.col(score_col).eqNullSafe(F.col("_pr_s")),
        "left",
    ).drop("_pr_g", "_pr_s")


def scale_features(
    df: DataFrame,
    value_col: str,
    group_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group feature scaling: z-score and min-max columns in one
    pass — the normalization step before features from different groups
    (languages, sources, metrics) are comparable in a training mix.

    Appends ``zscore = (x - mean) / stddev_pop`` (0.0 for a
    zero-variance group) and ``minmax = (x - min) / (max - min)``
    (0.0 for a constant group), both rounded to ``round_digits``.
    Every input row is preserved: NULL groups scale within their own
    NULL group (null-safe join back), and NULL values pass through
    with NULL scaled columns while the group moments count only the
    non-null population.

    One hash aggregation of per-group moments (sum, sum of squares,
    count, min, max) broadcast back — never a per-group window over the
    rows. Moments use exact arithmetic when ``value_col`` is integral
    (sums of longs are exact, so the derived mean/std replay
    bit-for-bit in any engine — while Σx² stays under 2^63; the session
    runs ANSI mode, so a long overflow fails loudly rather than
    wrapping); for double features the sums are partial-aggregation
    order-dependent in the last ulps, fine within one engine but not an
    oracle-grade cross-engine contract.
    """
    x = F.col(value_col)
    # _n counts NON-NULL values (F.count(x)) so the moments describe the
    # population the sums actually cover; NULL-valued rows come through
    # with NULL scaled columns
    stats = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.sum(x).alias("_s"),
        F.sum(x * x).alias("_ss"),
        F.count(x).alias("_n"),
        F.min(x).alias("_lo"),
        F.max(x).alias("_hi"),
    )
    # null-safe equi-join: groupBy treats NULL as its own group, so the
    # join back must too — a plain equi-join would silently DROP every
    # NULL-group row
    joined = df.join(
        F.broadcast(stats), F.col(group_col).eqNullSafe(F.col("_g"))
    ).drop("_g")
    n = F.col("_n").cast("double")
    mean = F.col("_s") / n
    var = F.col("_ss") / n - mean * mean
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    span = (F.col("_hi") - F.col("_lo")).cast("double")
    # qdec, not ROUND: minmax is a terminating rational ((x-lo)/span over
    # 2-decimal inputs) that can land exactly on the half boundary where
    # engine ROUNDs disagree; zscore rides the same idiom so the oracle
    # mirrors one quantizer (functions/quantize.py)
    return joined.withColumn(
        "zscore",
        qdec(
            F.when(
                x.isNotNull(),
                F.when(sd > 0.0, (x - mean) / sd).otherwise(0.0),
            ),
            round_digits,
        ),
    ).withColumn(
        "minmax",
        qdec(
            F.when(
                x.isNotNull(),
                F.when(span > 0.0, (x - F.col("_lo")) / span).otherwise(
                    0.0
                ),
            ),
            round_digits,
        ),
    ).drop("_s", "_ss", "_n", "_lo", "_hi")


def quantile_bins(
    df: DataFrame,
    score_col: str,
    group_col: str,
    n_bins: int,
    out_col: str = "bin",
) -> DataFrame:
    """Equi-depth score bins per group — the curriculum-ordering /
    difficulty-tiering step (sort the corpus by a difficulty or quality
    score, train easy→hard in ``n_bins`` phases).

    Built on :func:`group_percent_rank`'s distributed CDF (hash agg on
    (group, score) cells + a per-group window over CELLS + broadcast
    back), so it survives few-but-huge groups where a row window would
    serialize. ``bin = min(floor(pct_rank * n_bins), n_bins - 1)`` —
    ties share a percent-rank, so equal scores always land in the same
    bin and the assignment is deterministic and re-ingest-stable.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    ranked = group_percent_rank(df, score_col, group_col, out_col="_pr")
    return ranked.withColumn(
        out_col,
        F.least(
            F.floor(F.col("_pr") * n_bins).cast("int"), F.lit(n_bins - 1)
        ),
    ).drop("_pr")


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window_words: int,
    stride_words: int,
) -> DataFrame:
    """``(id, pos, span, n_words)`` — OVERLAPPING fixed-width word
    windows, the standard long-document split for context-bounded
    training (window 512, stride 384 keeps 128 words of overlap so no
    sentence is ever cut without context on one side).

    Window ``i`` covers words ``[i*stride, i*stride + window)``; the
    last window starts at the last stride offset that still begins
    inside the document, so every word lands in at least one window and
    short documents yield exactly one. Pure expressions (``split`` +
    ``sequence`` + ``transform``/``slice`` + ``posexplode``) — the same
    no-Python contract as the non-overlapping
    ``operators/dedup.py:word_chunk_spans``; fan-out is
    ~tokens/stride rows per document, bounded by the caller's stride.
    """
    if window_words < 1 or stride_words < 1:
        raise ValueError("window_words and stride_words must be >= 1")
    if stride_words > window_words:
        raise ValueError(
            "stride_words must be <= window_words (gaps would drop words)"
        )
    words = F.split(F.col(text_col), " ", -1)
    # number of windows: 1 + ceil(max(n - window, 0) / stride)
    extra = F.greatest(F.size(words) - window_words, F.lit(0))
    n_win = (
        F.lit(1)
        + F.ceil(extra / F.lit(float(stride_words))).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.array_join(
            F.slice(words, i * stride_words + 1, window_words), " "
        ),
    )
    return spread_input(df, by=id_col).select(
        F.col(id_col).alias("id"),
        F.posexplode(chunks).alias("pos", "span"),
    ).withColumn("n_words", F.size(F.split(F.col("span"), " ", -1)))


#: bytes of (estimated) input per range partition when ``num_ranges``
#: is resolved adaptively — env-tunable; 32 MiB keeps a range's local
#: window sort comfortably in one task's execution memory while giving
#: a 100 TB corpus ~3M ranges (capped below) instead of a constant
_RANGE_TARGET_BYTES = 32 * 1024 * 1024
#: upper bound on adaptive range counts: the per-range driver offset
#: map stays O(cap) rows (collected once, broadcast back), and at the
#: cap a 100 TB input still only sees ~1.6 GB per range — a spilling
#: but safe local sort. Raise via SPARK_GRAFT_MAX_RANGES for clusters
#: that want strictly bounded per-range sorts at extreme scale.
_RANGE_CAP = 65536


def _resolve_num_ranges(df: DataFrame, num_ranges: int | None) -> int:
    """Resolve ``num_ranges=None`` to a scale-adaptive count.

    A constant range count is wrong at both ends: 32 ranges over a
    100 TB corpus is ~3 TB per range task (guide §2.5: input skew by
    construction), while 32 ranges over a few-MiB local frame pays 32
    tasks of pure scheduling overhead per stage. ``None`` derives the
    count from the optimizer's size estimate at ~32 MiB per range
    (``SPARK_GRAFT_RANGE_BYTES``), clamped to [1, 65536]
    (``SPARK_GRAFT_MAX_RANGES``). Estimates are coarse after complex
    transforms — acceptable here because ANY count is correct (the
    prefix-sum's values are invariant in the partitioning; property
    tests sweep counts 1..100) and the clamp bounds the damage of a
    bad estimate. Falls back to the legacy 32 when plan stats are
    unavailable (e.g. a Connect frame without a JVM handle)."""
    if num_ranges is not None:
        return num_ranges
    import os

    target = int(
        os.environ.get("SPARK_GRAFT_RANGE_BYTES", str(_RANGE_TARGET_BYTES))
    )
    cap = int(os.environ.get("SPARK_GRAFT_MAX_RANGES", str(_RANGE_CAP)))
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        # Catalyst reports spark.sql.defaultSizeInBytes (Long.MaxValue)
        # for plans it cannot size — treat the sentinel range (anything
        # past 2^60 ≈ 1 EiB, far above any real input) as "unknown"
        if size <= 0 or size >= 1 << 60:
            return 32
        return max(1, min(-(-size // target), cap))
    except Exception:
        return 32


def _distributed_prefix_sum(
    df: DataFrame,
    token_col: str,
    order: list[Column],
    num_ranges: int | None,
    out_col: str = "cum_tokens",
) -> tuple[DataFrame, DataFrame]:
    """Inclusive running sum of ``token_col`` over the GLOBAL ``order``,
    computed as a distributed prefix-sum rather than ``Window.orderBy``
    over an unpartitioned frame (which Spark executes on a single task —
    the classic scale trap for running totals):

    1. ``repartitionByRange`` on the order splits the corpus into
       ``num_ranges`` ordered, non-overlapping chunks;
    2. each range computes its LOCAL running sum with a window
       partitioned by the captured ``spark_partition_id()``. Honest
       shuffle accounting: RangePartitioning does NOT satisfy the
       window's ClusteredDistribution(_pid), so Catalyst inserts a
       second hash exchange on ``_pid`` — two full shuffles total, not
       one. That is still the scale-correct shape (parallelism stays
       ``num_ranges``-bounded either way — size ``num_ranges`` to the
       cluster, it is the parallelism knob of the whole primitive —
       and no single-task sort ever appears, which is what the plan
       pin guards); a JVM-only one-shuffle form does not exist without
       per-partition imperative state, and pushing the whole corpus
       through an Arrow seam to save the exchange costs more than the
       exchange for wide rows;
    3. per-partition totals (``num_ranges`` rows) come to the driver
       once and go back as a broadcast literal offset map — the only
       driver round-trip, O(num_ranges) bytes.

    Returns ``(summed, ranged)``: the frame with ``out_col`` added (and
    the transient ``_pid`` column dropped), plus the PERSISTED ranged
    intermediate — the caller materializes its output and then
    unpersists ``ranged`` (both existing callers do this via
    ``localCheckpoint``).
    """
    from pyspark.sql import Window

    num_ranges = _resolve_num_ranges(df, num_ranges)
    ranged = df.repartitionByRange(num_ranges, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.persist()
    try:
        # tiny: num_ranges rows; the ONLY data that visits the driver
        totals = {
            r["_pid"]: r["_t"]
            for r in ranged.groupBy("_pid")
            .agg(F.sum(F.col(token_col)).alias("_t"))
            .collect()
        }
    except Exception:
        # a failed totals job must not leak the cached intermediate —
        # the caller's try/finally only starts after we return
        ranged.unpersist()
        raise
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        # a range whose token values are ALL NULL sums to None — it
        # contributes nothing to later offsets rather than crashing
        acc += totals[pid] or 0
    # ROWS frame, not the default RANGE frame: with a strict total
    # order they are identical, but on order TIES the RANGE frame
    # aggregates the whole peer group into every peer — assign_global_ids
    # would mint DUPLICATE ids (order [5,5,7] → ids [2,2,3]) instead of
    # the documented arbitrary-but-unique tiebreak
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_sum = F.sum(F.col(token_col)).over(w)
    if len(offsets) <= 64:
        # small range counts: a when-chain compiles to one codegen'd
        # expression, no extra operator
        offset_expr: Column = F.lit(0).cast("long")
        for pid, off in offsets.items():
            offset_expr = (
                F.when(F.col("_pid") == pid, F.lit(off).cast("long"))
                .otherwise(offset_expr)
            )
        summed = ranged.withColumn(out_col, local_sum + offset_expr).drop(
            "_pid"
        )
    else:
        # large range counts (the adaptive path at real scale): a
        # when-chain is O(num_ranges) expression DEPTH — Catalyst
        # analysis and codegen blow up past a few hundred branches —
        # so ship the offsets back as a broadcast-joined (pid, offset)
        # frame instead: O(1) plan depth, and the broadcast hash join
        # on the already-partitioned frame adds no exchange
        off_df = df.sparkSession.createDataFrame(
            [(int(pid), int(off)) for pid, off in offsets.items()],
            "_pid int, _range_off long",
        )
        summed = (
            ranged.withColumn(out_col, local_sum)
            .join(F.broadcast(off_df), "_pid")
            .withColumn(out_col, F.col(out_col) + F.col("_range_off"))
            .drop("_pid", "_range_off")
        )
    return summed, ranged


def token_budget_select(
    df: DataFrame,
    budget: int,
    token_col: str,
    priority_col: str,
    id_col: str,
    num_ranges: int | None = None,
) -> DataFrame:
    """Select documents in (priority desc, id asc) order while the
    cumulative token count stays ≤ ``budget`` — "fill the training mix
    with the best documents first, stop at the budget".

    The cumulative sum is the distributed prefix-sum of
    :func:`_distributed_prefix_sum`; output keeps ``cum_tokens`` (the
    inclusive prefix sum) for audit.
    """
    order = [F.col(priority_col).desc(), F.col(id_col).asc()]
    summed, ranged = _distributed_prefix_sum(df, token_col, order, num_ranges)
    try:
        out = summed.filter(F.col("cum_tokens") <= budget)
        # the budget head is small by construction — materialize it so
        # the ranged cache can be released before returning
        out = out.localCheckpoint(eager=True)
    finally:
        ranged.unpersist()
    return out


def pack_sequences(
    df: DataFrame,
    window: int,
    token_col: str,
    id_col: str,
    num_ranges: int | None = None,
) -> DataFrame:
    """Sequence packing: lay documents end-to-end in ``id`` order and
    chunk the concatenated token stream into fixed-size context windows
    of ``window`` tokens — the training-batch layout step ("which
    sequence does each document start in, and at what offset").

    Built on the same distributed prefix-sum as
    :func:`token_budget_select` (the exclusive prefix ``start_offset`` is
    the inclusive sum minus the document's own tokens). Emitted per
    document:

    - ``start_offset`` — position of the document's first token in the
      concatenated stream;
    - ``pack_id`` — ``floor(start_offset / window)``: the context window
      the document STARTS in (greedy concat-and-chunk; a document may
      spill into the next window, which training-side attention masking
      handles — the standard layout);
    - ``pack_pos`` — offset within that window;
    - ``n_spans`` — how many windows the document touches (1 = fits
      without crossing a boundary; 0, uniformly, for zero-token
      documents — they occupy no tokens, but keep their ``pack_id`` /
      ``pack_pos`` so downstream layout knows where they WOULD start).

    Everything after the prefix sum is arithmetic on ``start_offset`` —
    no extra shuffle beyond the range exchange the sum already paid.
    """
    order = [F.col(id_col).asc()]
    summed, ranged = _distributed_prefix_sum(df, token_col, order, num_ranges)
    try:
        start = (F.col("cum_tokens") - F.col(token_col)).cast("long")
        end = (F.col("cum_tokens") - F.lit(1)).cast("long")  # last token
        out = (
            summed.withColumn("start_offset", start)
            .withColumn(
                "pack_id", F.floor(F.col("start_offset") / window).cast("long")
            )
            .withColumn(
                "pack_pos", F.pmod(F.col("start_offset"), F.lit(window)).cast("long")
            )
            .withColumn(
                "n_spans",
                F.when(F.col(token_col) <= 0, F.lit(0))
                .otherwise(F.floor(end / window) - F.col("pack_id") + F.lit(1))
                .cast("long"),
            )
            .drop("cum_tokens")
        )
        out = out.localCheckpoint(eager=True)
    finally:
        ranged.unpersist()
    return out


#: PII detectors, ordered — replacements are applied in this sequence.
#: Cross-engine-safe subset (works identically under Java regex and RE2/
#: DuckDB, the same constraint as functions/text.py's BPE_TOKEN_RE):
#: explicit character classes, no lookaround, no backreferences.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — the pragmatic redaction form, not full RFC 5322
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted quad with word boundaries so version strings ("1.2.3") and
    # longer digit runs don't half-match
    "ip": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    # international-prefix form: + then 8..16 digits/dashes ending in a
    # digit — conservative on purpose (bare 10-digit runs are usually ids,
    # not phones; over-redaction destroys training text)
    "phone": r"\+[0-9][0-9-]{6,14}[0-9]",
}


def pii_scrub(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """Redact emails / IPv4 addresses / phone numbers from ``text_col``,
    with per-kind audit counts — the standard curation-stage privacy
    pass before text enters a training mix.

    Pure ``regexp_replace`` / ``regexp_count`` chains: JVM-side, inside
    whole-stage codegen, no Python in the path, combinable with
    predicate pushdown (it's a projection). Replacements apply in
    ``PII_PATTERNS`` order, each kind to its ``<KIND>`` token, and each
    ``n_<kind>`` count is measured on the PROGRESSIVELY-scrubbed text —
    so counts always equal the ``<KIND>`` tokens actually emitted (a
    phone embedded in an email local part is consumed by the email
    replacement and counts as email, not phone). Adds ``n_<kind>``
    columns and writes the scrubbed text to ``out_col`` (default:
    replaces ``text_col`` in place).

    Known pragmatic limits (pinned by tests): the IPv4 pattern accepts
    out-of-range quads (``999.999.999.999`` → redacted: over-redaction
    is the safe direction for PII) and redacts the first four components
    of a 5-part dotted run — RE2/DuckDB compatibility forbids the
    lookaround needed to reject those, and the cross-engine oracle
    matters more than the edge.
    """
    out_col = out_col or text_col
    scrubbed = F.col(text_col)
    new_cols: dict[str, Column] = {}
    for kind, pat in PII_PATTERNS.items():
        new_cols[f"n_{kind}"] = F.regexp_count(scrubbed, F.lit(pat)).cast("long")
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    new_cols[out_col] = scrubbed
    return df.withColumns(new_cols)


def contamination_check(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Train-test leakage gate: for every corpus document sharing at
    least ``min_shared`` distinct n-gram shingles with any eval/benchmark
    document, report ``(id, eval_id, n_shared)``.

    The eval set is small by nature (a benchmark), so its shingle frame
    broadcasts; the corpus side streams through one explode with NO
    self-join — cost is O(corpus shingles), the same single-pass shape
    as the dedup blockers. Shingle width 8 (long shingles) keeps the
    signal precise: an 8-word verbatim overlap is quotation, not chance.
    """
    corpus_sh = (
        spread_input(docs, by=id_col)
        .select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(text_col, n)).alias("shingle"),
        )
        .distinct()
    )
    eval_sh = (
        eval_docs.select(
            F.col(id_col).alias("eval_id"),
            F.explode(word_shingles(text_col, n)).alias("shingle"),
        )
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def _max_multiplicity(arr: Column) -> Column:
    """Max element multiplicity of a non-empty array — the ``max(c)``
    of explode → count per (id, gram), without the explode.

    ``array_sort`` groups equal elements adjacently, so the max
    multiplicity is the longest run in the sorted array, found by ONE
    ``aggregate`` fold carrying ``(prev, run, best)``. The fold lambda
    touches only the accumulator and the element: HOF lambdas re-eval
    any embedded array subtree once PER ELEMENT (an index-based
    filter-over-``sequence`` formulation measured 30× slower than the
    explode pipelines on exactly this corpus), while the fold keeps the
    whole thing one O(n·log n) pass per row. Elements must be non-null
    (split/concat_ws output never is; ``prev`` is NULL only before the
    first element, starting the first run).
    """
    s = F.array_sort(arr)
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(acc.prev.isNull() | (acc.prev != x), F.lit(1))
        .otherwise(acc.run + F.lit(1))
        .alias("run"),
        F.greatest(
            acc.best,
            F.when(acc.prev.isNull() | (acc.prev != x), F.lit(1)).otherwise(
                acc.run + F.lit(1)
            ),
        ).alias("best"),
    )
    return F.aggregate(
        s,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        step,
        lambda acc: acc.best,
    )


def _repetition_cols(
    text_col: str, chunk_words: int
) -> tuple[Column, Column, Column]:
    """The three Gopher repetition fractions as pure per-row column
    expressions — ``(dup_chunk_frac, top_bigram_frac, top_word_frac)``,
    qdec-rounded, for a document whose id is unique in the frame.

    Exactly the values the r1-r13 explode → hash-aggregate pipelines
    produced (pinned by tests/test_properties.py's pure-Python
    differential and the hand-computed cases), including the edges the
    left-join + coalesce structure used to supply: NULL text → (1.0,
    0.0, 0.0) (the chunker emits one NULL span; count_distinct ignores
    NULLs), empty text → (0.0, 0.0, 1.0) (split('') is ['']), single
    word → top_bigram_frac 0.0.
    """
    if chunk_words < 1:
        # same contract as chunk_documents — the explode-era path
        # raised here via the chunker; the inline arithmetic would
        # otherwise divide by zero into silent NaN/NULL fractions
        raise ValueError("chunk_words must be >= 1")
    text = F.col(text_col)
    words = F.split(text, " ", -1)
    n_words = F.size(words)

    # chunk_documents' window arithmetic with stride == window — the
    # word_chunk_spans definition, without the posexplode round trip
    # (cross-pinned against word_chunk_spans by
    # tests/test_curation.py::test_repetition_chunks_match_word_chunk_spans
    # so the two copies of the window arithmetic cannot silently
    # diverge)
    extra = F.greatest(n_words - chunk_words, F.lit(0))
    n_win = F.lit(1) + F.ceil(extra / F.lit(float(chunk_words))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), " "
        ),
    )
    dup = F.when(text.isNull(), F.lit(1.0)).otherwise(
        F.lit(1) - F.size(F.array_distinct(chunks)) / F.size(chunks)
    )
    # zip_with evaluates both slice arrays ONCE and pairs elements —
    # an element_at(words, i) transform would re-split the text per
    # element (see _max_multiplicity on lambda-embedded subtrees)
    bigrams = F.zip_with(
        F.slice(words, 1, n_words - 1),
        F.slice(words, 2, n_words - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = F.when(text.isNull() | (n_words < 2), F.lit(0.0)).otherwise(
        _max_multiplicity(bigrams) / (n_words - 1)
    )
    wd = F.when(text.isNull(), F.lit(0.0)).otherwise(
        _max_multiplicity(words) / n_words
    )
    return qdec(dup), qdec(bg), qdec(wd)


def repetition_metrics(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_words: int = 4,
) -> DataFrame:
    """Within-document repetition profile — the Gopher repetition rules
    (Rae et al. 2021 §A1.1) adapted to span-structured text:
    ``(id, dup_chunk_frac, top_bigram_frac, top_word_frac)``.

    - ``dup_chunk_frac`` — fraction of the document's
      ``chunk_words``-word chunks that are repeats of an earlier chunk
      in the SAME document (``1 − distinct/total``); the "duplicate
      paragraph fraction" analogue for text without paragraph breaks.
    - ``top_bigram_frac`` — occurrences of the most frequent word
      bigram over total bigrams (0.0 for documents under two words).
    - ``top_word_frac`` — occurrences of the most frequent word over
      total words.

    High values flag degenerate, loop-generated, or keyword-stuffed
    documents that length/stopword heuristics (``quality_score``) miss.

    Scale shape: every metric is within-document, so the whole profile
    is ONE codegen'd projection over the scan (:func:`_repetition_cols`
    — sort each document's gram array and take the longest run instead
    of explode → count → max/sum). No shuffle beyond the input spread,
    no joins, no Python; cost stays linear in token count (the per-row
    ``array_sort`` is n·log n in DOCUMENT length, not corpus size).
    The r1-r12 shape — three explode → hash-aggregate pipelines joined
    on the id — recomputed the scan four times and paid seven
    shuffles for values that never cross document boundaries.
    Documents are assumed unique per id (the corpus invariant; the old
    join shape silently mixed grams across duplicate ids instead of
    erroring, so neither shape supports them).
    """
    dup, bg, wd = _repetition_cols(text_col, chunk_words)
    return spread_input(df, by=id_col).select(
        F.col(id_col).alias("id"),
        dup.alias("dup_chunk_frac"),
        bg.alias("top_bigram_frac"),
        wd.alias("top_word_frac"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_quality: float = 0.75,
    max_dup_chunk_frac: float = 0.5,
    max_top_bigram_frac: float = 0.1,
    lang: str = "en",
    chunk_words: int = 4,
) -> DataFrame:
    """C4/Gopher-style composed keep/drop decision per document:
    ``(id, quality, dup_chunk_frac, top_bigram_frac, pred_lang, keep)``.

    The standard pre-training filter chain — length/stopword quality
    score, within-document repetition profile, language ID — evaluated
    together so the decision (and WHY a document failed: each criterion
    column is carried, not collapsed) is one frame a pipeline can join,
    audit, or re-threshold without recomputing the signals. ``keep`` is
    the conjunction; flip thresholds per corpus.

    Scale shape: quality score, language ID AND the repetition profile
    (:func:`_repetition_cols`) are all within-document expressions, so
    the whole filter is one codegen'd projection over a single scan —
    no join, no aggregation, no Python. The r1-r12 shape joined a
    separate three-pipeline repetition frame back on the id, re-reading
    the corpus four times for per-row values.
    """
    from cassandra_slow_queries_spark.functions.text import (
        lang_id,
        quality_score,
    )

    dup, bg, _ = _repetition_cols(text_col, chunk_words)
    out = spread_input(df, by=id_col).select(
        F.col(id_col).alias("id"),
        F.round(quality_score(text_col), 6).alias("quality"),
        dup.alias("dup_chunk_frac"),
        bg.alias("top_bigram_frac"),
        lang_id(text_col).alias("pred_lang"),
    )
    keep = (
        (F.col("quality") >= min_quality)
        & (F.col("dup_chunk_frac") <= max_dup_chunk_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("pred_lang") == lang)
    )
    return out.withColumn("keep", keep)


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — ``compressed_bytes /
    raw_bytes`` of the UTF-8 text, rounded to 6 dp (NULL text → NULL,
    empty text → ratio NULL since there is nothing to measure).

    The cheap universal redundancy signal the quality-filter literature
    leans on (e.g. the C4/Gopher-style pipelines and their descendants):
    templated/boilerplate/repetitive documents compress far below
    natural prose, and machine-generated spam sits at the extremes on
    both sides. Complements :func:`repetition_metrics` — that one
    counts exact chunk repeats; DEFLATE also sees short-range and
    partial redundancy.

    This is a genuine Pandas-UDF seam (like the multimodal decoders):
    DEFLATE is a byte-level algorithm Spark's expression language
    cannot express. The UDF is Arrow-batched, per-document independent
    (no shuffle at all — a pure map over the corpus), and zlib output
    is deterministic for a fixed level across platforms, so the ratio
    is stable run to run.
    """
    import zlib

    if not _HAVE_ARROW:  # pragma: no cover
        raise RuntimeError("compression_ratio needs pandas/pyarrow")

    @_pandas_udf("double")
    def _ratio(texts: _pd.Series) -> _pd.Series:
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, level)) / len(raw)

        return texts.map(one)

    return df.select(
        F.col(id_col),
        F.round(_ratio(F.col(text_col)), 6).alias("compression_ratio"),
    )


def assign_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test assignment by hashed id:
    each row gets the label whose cumulative-fraction interval its
    :func:`sample_bucket` lands in. Hash-based (not random) splitting
    is the only correct choice for a corpus that gets re-ingested: a
    document keeps its split across runs, partial re-crawls, and
    engine versions, so test data can never migrate into train.
    For a GROUP-aware (leakage-safe) split — every document of one
    domain/author/session landing in the same split — pass that group
    column as ``id_col``: the hash is keyed on whatever identity must
    not straddle splits.

    ``fractions`` maps label → fraction, summing to 1.0 (validated);
    interval edges are computed at integer bucket granularity
    (1/10000), so labels are exact and portable — the DuckDB oracle
    reproduces the assignment bit-for-bit from the same md5 arithmetic.
    A pure projection: no shuffle, no join; the when-chain sits in
    whole-stage codegen next to the scan.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    if not fractions:
        raise ValueError("fractions must be non-empty")
    b = sample_bucket(id_col)
    expr = None
    edge = 0
    items = list(fractions.items())
    for label, frac in items[:-1]:
        edge += int(round(frac * SAMPLE_BUCKETS))
        cond = b < edge
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last_label = items[-1][0]
    expr = (
        F.lit(last_label) if expr is None else expr.otherwise(last_label)
    )
    # a NULL id must assign NULL, not the last label: every when-chain
    # condition evaluates NULL for it, so the bare otherwise() branch
    # would silently funnel all unidentifiable rows into the final
    # (typically held-out test) split
    expr = F.when(F.col(id_col).isNotNull(), expr)
    return df.withColumn(out_col, expr)


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    budget: int,
    weights: dict[str, float] | None = None,
    temperature: float | None = None,
    rate_col: str | None = None,
) -> DataFrame:
    """Deterministic source-mixture sampling: thin each source so the
    selected corpus approximates a TARGET MIXTURE under a global row
    ``budget`` — the data-mixing step of LLM training-set assembly
    (GPT-3-style fixed weights, or temperature-scaled smoothing that
    up-weights small sources: p_s ∝ n_s^temperature).

    Exactly one of ``weights`` (explicit source → target proportion,
    summing to 1; sources NOT listed get rate 0 and are dropped — an
    explicit mixture is also an allowlist) or ``temperature`` must be
    given. Per-source
    acceptance rates are ``r_s = min(1, budget·p_s / n_s)``; a row is
    kept iff its portable :func:`sample_bucket` falls below
    ``floor(r_s · 10000)`` — the same content-hash draw as
    :func:`stratified_sample`, so selection is reproducible across
    runs, engines, and partial re-ingests, and composes with
    :func:`assign_split` (independent md5 domains: split hashes the id,
    this hashes the id too — callers needing independence should salt
    one; the catalog entry documents the coupling). A source whose
    target share exceeds its size saturates at rate 1 (no upsampling:
    sampling without replacement cannot manufacture rows; the realized
    mixture then under-shoots that source and the audit columns make
    it visible).

    Scale shape: one hash aggregation for per-source counts (collapsed:
    |sources| rows), rates derived on that tiny frame and broadcast
    back for the filter — the corpus itself is touched by exactly one
    scan + one broadcast-join + filter. Bucket thresholds are computed
    at integer granularity (out of 10000) from exactly-representable
    arithmetic, so an oracle reproduces the decision bit-for-bit.

    Returns kept rows with audit columns ``rate_col`` (the float
    rate, under the caller's chosen name) and ``bucket_cut`` (the
    integer threshold actually applied). ``rate_col=None`` drops both
    audit columns.
    """
    if (weights is None) == (temperature is None):
        raise ValueError("give exactly one of weights= or temperature=")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n_s"))
    if weights is not None:
        total = sum(weights.values())
        if abs(total - 1.0) > 1e-9:
            raise ValueError(f"weights must sum to 1.0, got {total}")
        mapping = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv]
        )
        rates = counts.withColumn(
            "_p_s", mapping[F.col(source_col)]
        ).filter(F.col("_p_s").isNotNull())
    else:
        # p_s ∝ n_s^temperature, normalized on the collapsed frame.
        powed = counts.withColumn(
            "_w", F.pow(F.col("_n_s").cast("double"), F.lit(temperature))
        )
        denom = powed.agg(F.sum("_w").alias("_z"))
        rates = powed.crossJoin(F.broadcast(denom)).withColumn(
            "_p_s", F.col("_w") / F.col("_z")
        )
    rates = rates.withColumn(
        "_rate",
        F.least(
            F.lit(1.0),
            F.lit(budget) * F.col("_p_s") / F.col("_n_s"),
        ),
    ).withColumn(
        "_cut",
        F.floor(F.col("_rate") * F.lit(SAMPLE_BUCKETS)).cast("bigint"),
    )
    # null-safe join back: a NULL source is a real group under
    # temperature smoothing (groupBy kept it and its share sits in the
    # normalization denominator) — a plain equi-join would drop those
    # rows AFTER they consumed mixture budget, silently shrinking the
    # realized corpus. Weights mode is unaffected: NULL is never in the
    # allowlist, so its rates row was already filtered and the inner
    # join drops the rows either way.
    rates_sel = rates.select(
        F.col(source_col).alias("_mix_src"), "_rate", "_cut"
    )
    joined = df.join(
        F.broadcast(rates_sel),
        F.col(source_col).eqNullSafe(F.col("_mix_src")),
    ).drop("_mix_src")
    kept = joined.filter(sample_bucket(id_col) < F.col("_cut"))
    if rate_col is None:
        return kept.drop("_rate", "_cut")
    return kept.withColumnRenamed("_rate", rate_col).withColumnRenamed(
        "_cut", "bucket_cut"
    )


def padding_waste(
    df: DataFrame,
    length_col: str,
    batch_size: int,
    order: list[Column],
    num_ranges: int | None = None,
) -> DataFrame:
    """Padding-waste accounting for fixed-size training batches: rows
    are laid out in ``order``, chunked into batches of ``batch_size``,
    and every batch pads its members to the batch maximum — the
    standard dynamic-padding collator. Returns ONE row:
    ``(n_batches, total_tokens, padded_tokens, waste_frac)`` where
    ``padded_tokens = Σ_batch (batch_rows · batch_max)``.

    This is the measurement half of length-grouped batching: sort the
    corpus by length before chunking (pass the length as ``order``)
    and near-equal lengths share batches, collapsing the padding that
    arrival-order batching wastes (commonly 20-50% of compute on
    natural-length corpora). The layout rank comes from the
    distributed prefix-sum (operators/merge.py:assign_global_ids), NOT
    a single-partition window, so the accounting itself scales; the
    per-batch aggregation is one hash agg on batch ids, and the final
    rollup is one 1-row reduce. ``order`` must be a strict total order
    over ``df``'s columns (include a unique tiebreak — rank ties would
    otherwise make batch membership nondeterministic).
    """
    from cassandra_slow_queries_spark.operators.merge import (
        assign_global_ids,
    )

    ranked = assign_global_ids(
        df, order, out_col="_gid", num_ranges=num_ranges
    )
    per_batch = (
        ranked.withColumn(
            "_batch", ((F.col("_gid") - 1) / batch_size).cast("bigint")
        )
        .groupBy("_batch")
        .agg(
            F.count(F.lit(1)).alias("_rows"),
            F.sum(length_col).alias("_sum"),
            F.max(length_col).alias("_max"),
        )
    )
    return per_batch.agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("_sum").alias("total_tokens"),
        F.sum(F.col("_rows") * F.col("_max")).alias("padded_tokens"),
    ).select(
        "n_batches",
        "total_tokens",
        "padded_tokens",
        F.round(
            (F.col("padded_tokens") - F.col("total_tokens"))
            * 1.0
            / F.col("padded_tokens"),
            6,
        ).alias("waste_frac"),
    )


def assign_token_shards(
    df: DataFrame,
    token_col: str,
    order: list[Column],
    target_tokens: int,
    num_ranges: int | None = None,
    out_col: str = "shard",
) -> DataFrame:
    """Deterministic output sharding by TOKEN budget: rows laid out in
    ``order`` (a strict total order) are cut into shards of
    ``target_tokens`` each — ``shard = (inclusive-prefix-sum - 1) div
    target`` — the final write-out step of a curation pipeline, where
    downstream training wants shards of near-equal token mass, not
    near-equal row count (document lengths are heavy-tailed; row-count
    shards vary 2-3× in tokens).

    Built on the same distributed prefix-sum as token_budget_select /
    pack_sequences — range exchange, per-partition windows,
    O(num_ranges) driver offsets — so the layout decision itself scales.
    A document larger than ``target_tokens`` gets a shard of its own
    (its prefix interval spans the cut; it lands where its last token
    falls, and neighbors shift — the standard greedy contract). Write
    with ``df.write.partitionBy(out_col)`` and derive the manifest as
    ``groupBy(out_col).agg(count, sum(tokens))``.
    """
    summed, ranged = _distributed_prefix_sum(
        df, token_col, order, num_ranges, out_col="_cum"
    )
    # floor (not double-div + truncating cast: they disagree below 0),
    # and greatest(cum, 1): a zero-token document leading the order has
    # cum = 0 and must land in shard 0, not a phantom shard -1
    shard = F.floor(
        (F.greatest(F.col("_cum"), F.lit(1)) - 1) / F.lit(target_tokens)
    ).cast("bigint")
    try:
        out = summed.withColumn(out_col, shard).drop("_cum")
        out = out.localCheckpoint(eager=True)
    finally:
        ranged.unpersist()
    return out


def shard_manifest(
    sharded: DataFrame, token_col: str, shard_col: str = "shard"
) -> DataFrame:
    """The manifest a downstream consumer reads instead of listing
    files: ``(shard, n_docs, n_tokens)``, one hash aggregation."""
    return (
        sharded.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).alias("n_tokens"),
        )
        .orderBy(shard_col)
    )
