"""Corpus profiling: per-column statistics in one distributed pass.

The "know your corpus" step every training-data pipeline runs before
filtering decisions (which columns are null-ridden, what the key
cardinalities are, whether a date column spans what you think it does).
Equivalent in spirit to warehouse ``ANALYZE``/``SUMMARIZE``, but as a
plain DataFrame so the result can be joined, diffed across snapshots,
or gated in CI.

Scale shape: ``distinct="approx"`` (the 100 TB default) computes every
column's stats in ONE global aggregation — HyperLogLog++ sketches merge
like any other partial aggregate, so the pass is map-side combined with
no per-column scans and no expansion. ``distinct="exact"`` runs TWO
aggregations (plain stats; multi-column COUNT(DISTINCT)) crossJoined on
their single rows — Spark's multi-distinct rewrite expands every row
once per profiled column, and mixing the plain stats into that
expansion is the same measured pathology the sketch gate documents. The
catalog entry runs exact so the oracle hash-compare is value-stable;
the sketch-vs-exact tolerance itself is gated by ``x_sketch_gate``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pandas is baked into the target env; gate for safety
    import pandas as _pd

    _HAVE_ARROW = True
except ImportError:  # pragma: no cover
    _HAVE_ARROW = False


def profile_columns(
    df: DataFrame, cols: list[str], distinct: str = "approx"
) -> DataFrame:
    """Long-format profile of ``cols``:
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``.

    ``min_value``/``max_value`` are cast to string so heterogeneous
    column types share one output schema (the consumer is a human or a
    diff, not arithmetic). ``n_distinct`` excludes NULLs (SQL
    ``COUNT(DISTINCT ...)`` semantics).
    """
    if distinct not in ("exact", "approx"):
        raise ValueError(f"distinct must be 'exact' or 'approx', got {distinct!r}")
    stats = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        col = F.col(c)
        stats += [
            F.sum(col.isNull().cast("long")).alias(f"_{c}_nulls"),
            F.min(col).cast("string").alias(f"_{c}_min"),
            F.max(col).cast("string").alias(f"_{c}_max"),
        ]
    if distinct == "approx":
        # sketches merge like plain aggregates — genuinely one pass
        wide = df.agg(
            *stats,
            *[
                F.approx_count_distinct(c, rsd=0.02).alias(f"_{c}_distinct")
                for c in cols
            ],
        )
    else:
        # exact distincts live in their OWN aggregation: Spark rewrites
        # multi-column COUNT(DISTINCT) as an Expand (one copy of every
        # row per distinct column), and dragging the plain stats through
        # that expansion measured 5.6 s vs 1.8+1.6 s split at sf0.1 —
        # the same mixed-aggregate pathology as the sketch gate. Both
        # frames are single-row, so the crossJoin is free.
        wide = df.agg(*stats).crossJoin(
            df.agg(
                *[F.count_distinct(c).alias(f"_{c}_distinct") for c in cols]
            )
        )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_{c}_nulls").alias("n_nulls"),
                F.col(f"_{c}_distinct").alias("n_distinct"),
                F.col(f"_{c}_min").alias("min_value"),
                F.col(f"_{c}_max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def profile_embeddings(
    df: DataFrame, vec_col: str = "embedding", expected_dim: int | None = None
) -> DataFrame:
    """One-row QA profile of an embedding column — the checks a vector
    pipeline runs before indexing: ``(n_rows, n_nulls, min_dim, max_dim,
    n_dim_mismatch, n_zero_norm, avg_norm)``.

    A silent dim mismatch or a batch of zero vectors poisons every
    downstream cosine (the round-1 LSH bug class was exactly a dim
    mismatch); this surfaces both before any index is built.
    ``n_dim_mismatch`` counts rows whose dimensionality differs from
    ``expected_dim`` — or, when ``expected_dim`` is None, from the MAX
    dimensionality observed (derived in a 1-row aggregate crossJoined
    back, so the plan stays lazy and distributed). Norms are computed in
    double (the array is cast first) with a left-fold sum, so the value
    is bit-reproducible across engines that fold left.
    """
    v = F.col(vec_col)
    norm = F.sqrt(
        F.aggregate(
            v.cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    dim = F.size(v)
    if expected_dim is not None:
        src = df.withColumn("_want", F.lit(expected_dim))
    else:
        src = df.crossJoin(df.agg(F.max(dim).alias("_want")))
    return src.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(v.isNull().cast("long")).alias("n_nulls"),
        F.min(dim).cast("long").alias("min_dim"),
        F.max(dim).cast("long").alias("max_dim"),
        # outer coalesce-to-true: when expected_dim is None AND every
        # embedding is NULL, _want itself is NULL and the comparison is
        # NULL on every row — the sum would report NULL instead of
        # flagging the whole batch as mismatched
        F.sum(
            F.coalesce(
                F.coalesce(dim, F.lit(-1)) != F.col("_want"), F.lit(True)
            ).cast("long")
        ).alias("n_dim_mismatch"),
        F.sum((F.abs(norm) < 1e-12).cast("long")).alias("n_zero_norm"),
        F.round(F.avg(norm), 4).alias("avg_norm"),
    )


def histogram(
    df: DataFrame,
    col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: ``(bin, lo_edge,
    hi_edge, n)`` — every bin present (empty bins at n=0), NULLs
    excluded, values clamped into the edge bins (so out-of-range data
    shows up at the boundaries instead of silently vanishing).

    ``lo``/``hi`` default to the observed min/max, derived in a 1-row
    aggregate crossJoined back so the plan stays lazy and distributed
    (same idiom as :func:`profile_embeddings`). Fixed explicit bounds
    make the result engine-replayable (the catalog gate uses them); the
    whole pass is one scan + one ``bins``-group aggregate — the
    histogram shuffle is ``bins`` rows, nothing else. A degenerate
    range (lo == hi) puts everything in bin 0.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    x = F.col(col).cast("double")
    if lo is None or hi is None:
        bounds = df.agg(
            F.min(x).cast("double").alias("_lo"), F.max(x).cast("double").alias("_hi")
        )
        src = df.crossJoin(bounds)
    else:
        src = df.withColumn("_lo", F.lit(float(lo))).withColumn(
            "_hi", F.lit(float(hi))
        )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    raw_bin = F.floor((x - F.col("_lo")) / width)
    bin_id = F.when(width > 0, F.least(
        F.lit(bins - 1).cast("long"), F.greatest(F.lit(0).cast("long"), raw_bin)
    )).otherwise(F.lit(0).cast("long"))
    counted = (
        src.filter(x.isNotNull())
        .groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # 1-row bounds frame again so empty bins carry correct edges even
    # when derived bounds were used
    edges = (
        src.agg(F.min("_lo").alias("_lo"), F.max("_hi").alias("_hi"))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin"),
            "_lo",
            "_hi",
        )
    )
    w = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    return (
        edges.join(counted.select("bin", "n"), "bin", "left")
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.round(F.col("_lo") + F.col("bin") * w, 6).alias("lo_edge"),
            F.round(F.col("_lo") + (F.col("bin") + 1) * w, 6).alias("hi_edge"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("bin")
    )


def equi_depth_histogram(
    df: DataFrame,
    col: str,
    buckets: int = 8,
    digits: int = 6,
) -> DataFrame:
    """Equi-DEPTH histogram — the optimizer-statistics dual of
    :func:`histogram`: bucket EDGES sit at exact interpolated quantiles
    (``i/buckets`` for i in 0..buckets), so each bucket holds ~n/buckets
    rows regardless of the value distribution. Equi-width bins starve
    on skew (one bin holds everything); equi-depth bounds are what a
    cost-based optimizer stores for selectivity estimation and what a
    range-partitioner wants as split points at 100 TB.

    Returns ``(bucket, lo, hi, n)`` with every bucket present (empty at
    n=0). Assignment is deterministic and engine-replayable: a value
    lands in bucket = #(interior bounds strictly below it), with bounds
    quantized to ``digits`` decimals on BOTH engines before comparison
    (the h_percentiles parity pattern), so ties AT a bound fall to the
    lower bucket everywhere. NULLs are excluded.

    Scale shape: ONE exact-percentile aggregation for the bounds (1-row
    frame, crossJoined back so the plan stays lazy — at 100 TB swap in
    ``approx_percentile``, same plan shape) + one scan whose bucket id
    is a pure ``aggregate`` fold over the bounds array (no UDF, no
    join, no sort) + a ``buckets``-row group-by. Nothing is
    proportional to the data but the two scans."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    from cassandra_slow_queries_spark.functions.quantize import qdec

    x = F.col(col).cast("double")
    ps = [i / buckets for i in range(buckets + 1)]
    bounds = df.filter(x.isNotNull()).agg(
        F.array(
            *[
                qdec(F.expr(f"percentile({col}, {p!r})"), digits)
                for p in ps
            ]
        ).alias("_edges")
    )
    interior = F.slice(F.col("_edges"), 2, buckets - 1)  # bounds 1..b-1
    bucket_id = F.aggregate(
        interior,
        F.lit(0),
        lambda acc, t: acc + F.when(x > t, F.lit(1)).otherwise(F.lit(0)),
    )
    counted = (
        df.filter(x.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .groupBy(bucket_id.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    shell = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("bucket"),
        "_edges",
    )
    return (
        shell.join(counted, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.element_at("_edges", F.col("bucket").cast("int") + 1).alias("lo"),
            F.element_at("_edges", F.col("bucket").cast("int") + 2).alias("hi"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("bucket")
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    verify: bool = True,
) -> DataFrame:
    """Frequent-item (heavy-hitter) detection with the Misra-Gries
    summary (Misra & Gries 1982; the "MG sketch" of the streaming
    literature): ``(item, n_item)`` for every item whose exact
    frequency exceeds ``n/(k+1)`` of ``n`` total rows.

    Scale shape — the reason to not just GROUP BY: a full count needs a
    shuffle of EVERY distinct item (at 100 TB: billions of group keys
    for a handful of interesting answers). Here each partition keeps at
    most ``k`` counters (one ``mapInPandas`` pass, state carried across
    Arrow batches within the partition), and only the per-partition
    survivors — ≤ k·P candidate rows — are shuffled. Pigeonhole
    guarantee: an item with global frequency > n/(k+1) must exceed
    n_p/(k+1) in at least one partition, and Misra-Gries with k
    counters never evicts an item whose partition frequency is above
    that bound — so the candidate union provably contains every global
    heavy hitter. The verify stage (the same blocking+verify contract
    as the dedup family) then computes EXACT counts for candidates only
    (semi-join before the count) and applies the threshold, so the
    output is exact, not an estimate.

    ``verify=False`` returns the raw per-partition candidate summaries
    ``(item, est_count)`` — the mergeable-sketch half, useful when the
    caller wants to union summaries across corpora before verifying.
    NULL items are ignored (SQL COUNT semantics).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not _HAVE_ARROW:  # pragma: no cover
        raise RuntimeError("heavy_hitters needs pandas/pyarrow")
    src = df.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )

    def mg_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf["item"]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield _pd.DataFrame(
                {"item": list(counters), "est_count": list(counters.values())}
            )

    cand = src.mapInPandas(mg_partition, "item string, est_count long")
    if not verify:
        return cand
    # exact verify over candidates only; threshold n/(k+1) on exact counts
    cand_items = cand.select("item").distinct()
    totals = src.agg(F.count(F.lit(1)).alias("_n"))
    return (
        src.join(cand_items, "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
        .crossJoin(totals)
        .filter(F.col("n_item") * (k + 1) > F.col("_n"))
        .select("item", "n_item")
        .orderBy(F.desc("n_item"), "item")
    )


def token_distribution(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Unigram relative-frequency distribution of a corpus snapshot:
    ``(token, n, p)`` with ``p = n / Σ n``. Tokenization is the shared
    whitespace split (operators/search.py:tokenize) so retrieval,
    text-stats, and drift all agree on what a term is.

    Scale shape: one explode + one token-keyed aggregation (map-side
    combined); the total-count normalizer joins back as a broadcast of
    a single row. Output cardinality is the vocabulary, not the corpus.
    """
    from cassandra_slow_queries_spark.operators.search import tokenize

    toks = df.select(F.explode(tokenize(F.col(text_col))).alias("token"))
    # r13 opt (guide §5): ``counts`` feeds both the output and the
    # total-count normalizer; without materialization each reference
    # re-runs the corpus explode+aggregation (the final executed plan
    # carried one full "Scan → explode → agg" subtree PER reference —
    # AQE does not dedupe them). Vocabulary-sized, so the checkpoint
    # is bounded by the token universe, never the corpus (persist, not
    # checkpoint: measured cheaper at sf1 — no serialization barrier —
    # and it keeps lineage for executor-loss recovery).
    counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    total = counts.agg(F.sum("n").alias("_tot"))
    return counts.join(F.broadcast(total)).select(
        "token", "n", (F.col("n") / F.col("_tot")).alias("p")
    )


def distribution_drift(
    left: DataFrame, right: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-term Jensen-Shannon drift between two corpus snapshots'
    unigram distributions — the "did the crawl shift under me" check a
    training-data pipeline runs between ingests (corpus_diff answers
    *which documents* changed; this answers *how the language* changed).

    Returns one row per union-vocabulary term: ``(token, p, q, js)``
    where ``js`` is the term's contribution (in nats) to
    JS(P‖Q) = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m), m = (p+q)/2 — a missing
    term contributes only through the side that has it (the other
    side's p·ln(p/m) term is 0 by the 0·ln 0 = 0 convention). Summing
    the ``js`` column yields the total divergence, bounded by ln 2.

    Scale shape: two vocabulary-sized aggregates + one full outer join
    keyed on token. Nothing is proportional to corpus size after the
    per-snapshot token aggregation; a natural-language vocabulary's
    Zipf head is at most a few hot tokens within an already-collapsed
    frame, so no salting is needed.
    """
    pd_ = token_distribution(left, text_col).select(
        "token", F.col("p").alias("p")
    )
    qd_ = token_distribution(right, text_col).select(
        "token", F.col("p").alias("q")
    )
    joined = pd_.join(qd_, "token", "full_outer").select(
        "token",
        F.coalesce("p", F.lit(0.0)).alias("p"),
        F.coalesce("q", F.lit(0.0)).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    term = lambda c: F.when(  # noqa: E731 — 0·ln 0 = 0 convention
        F.col(c) > 0, F.col(c) * F.log(F.col(c) / m)
    ).otherwise(F.lit(0.0))
    return joined.withColumn("js", 0.5 * term("p") + 0.5 * term("q"))


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    pmi_digits: int | None = 6,
) -> DataFrame:
    """Collocation mining by pointwise mutual information over ADJACENT
    token bigrams: ``(x, y, n_xy, pmi)`` with
    pmi = ln( p(x,y) / (p(x)·p(y)) ) — high-PMI pairs are multiword
    units ("machine learning") worth single-token treatment; near-zero
    pairs co-occur by chance. Restricting to adjacent pairs keeps the
    pair count LINEAR in corpus size (within-document all-pairs
    co-occurrence is quadratic in document length — never do that).

    ``min_count`` filters rare bigrams BEFORE the unigram joins (PMI is
    notoriously noisy on low counts: a 1-occurrence pair of two rare
    words gets a huge score), which also shrinks the join input.

    Scale shape: bigram formation is a pure array expression per row
    (slice + transform — no posexplode self-join); then one bigram
    aggregation, one unigram aggregation, and two token-keyed joins of
    the collapsed count frames. Totals ride along as broadcast 1-row
    frames. All shuffles are on post-aggregation vocabulary-sized data.
    """
    # the SHARED guarded helper, not a local re-implementation: the
    # lm.py version carries the greatest(size-1, 0) guard without which
    # one empty/whitespace-only document (slice length -1) kills the
    # whole job — the copy here had drifted exactly that guard away
    from cassandra_slow_queries_spark.operators.lm import _adjacent_bigrams
    from cassandra_slow_queries_spark.operators.search import tokenize

    toked = df.select(tokenize(F.col(text_col)).alias("_toks"))
    pairs = _adjacent_bigrams(df, text_col, [])
    # r13 opt (guide §5): the unigram frame feeds three consumers (the
    # x-join, the y-join, the total) and the bigram frame two (the
    # filtered counts, the pair total) — unmaterialized, that is five
    # corpus explode+aggregation passes per run. Persist both
    # vocabulary-sized frames once; the pair total is the sum of the
    # unfiltered group counts (identical by definition).
    bi_raw = (
        pairs.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .persist()
    )
    bi = bi_raw.filter(F.col("n_xy") >= min_count)
    uni = (
        toked.select(F.explode("_toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_tok"))
        .persist()
    )
    n_uni = uni.agg(F.sum("n_tok").alias("_nu"))
    n_bi = bi_raw.agg(F.sum("n_xy").alias("_nb"))
    ux = uni.select(F.col("token").alias("x"), F.col("n_tok").alias("n_x"))
    uy = uni.select(F.col("token").alias("y"), F.col("n_tok").alias("n_y"))
    joined = (
        bi.join(ux, "x")
        .join(uy, "y")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    pmi = F.log(
        (F.col("n_xy") * 1.0 * F.col("_nu") * F.col("_nu"))
        / (F.col("_nb") * F.col("n_x") * F.col("n_y"))
    )
    if pmi_digits is not None:
        pmi = F.round(pmi, pmi_digits)
    return joined.select("x", "y", "n_xy", pmi.alias("pmi"))


def token_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    digits: int | None = 6,
) -> DataFrame:
    """Per-document unigram Shannon entropy (nats):
    H(doc) = −Σ_t p_t·ln p_t over the document's own token frequencies.
    A low-entropy document repeats a few tokens (keyword stuffing, SEO
    spam, boilerplate); entropy complements the repetition metrics
    (operators/curation.py) with a single scale-free number bounded by
    ln(distinct tokens).

    Scale shape: one explode + one (doc, token) aggregation + one doc
    aggregation — both shuffles key on the document id, so they
    co-partition and the second collapses within the first's layout.
    No driver round-trips, no joins; output is one row per document.
    """
    from cassandra_slow_queries_spark.operators.search import tokenize

    toks = df.select(
        F.col(id_col),
        F.explode(tokenize(F.col(text_col))).alias("_tok"),
    )
    per = toks.groupBy(id_col, "_tok").agg(F.count(F.lit(1)).alias("_c"))
    ent = (
        per.groupBy(id_col)
        .agg(
            F.sum("_c").alias("_n"),
            F.sum(F.col("_c") * F.log(F.col("_c") * 1.0)).alias("_clogc"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        # H = ln n − (Σ c·ln c)/n — one pass, no per-term p division
        .select(
            id_col,
            F.col("_n").alias("n_tokens"),
            "n_distinct",
            (F.log(F.col("_n") * 1.0) - F.col("_clogc") / F.col("_n")).alias(
                "_h"
            ),
        )
    )
    h = F.col("_h")
    if digits is not None:
        h = F.round(h, digits)
    return ent.select(id_col, "n_tokens", "n_distinct", h.alias("entropy"))
