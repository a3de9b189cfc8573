"""Deduplication operators for large-scale corpus curation (Tier 3).

Four families, all shuffle-conscious:

- **Exact**: content-hash groupBy — one shuffle on a 128-bit key, the
  cheapest possible dedup at any scale.
- **Shingle-candidate / n-gram Jaccard**: explode n-word shingles,
  self-join on shingle equality to find candidate pairs, then exact
  Jaccard on distinct-shingle sets. The explode fans out ~tokens-per-doc
  rows but the join key (shingle) is high-cardinality → well-distributed
  shuffle.
- **MinHash + LSH**: constant-size signatures (k minima over a seeded
  affine hash family) → banded bucket join. Join fan-out is bounded by
  band collisions instead of raw shingle multiplicity — this is the scale
  path for pairwise near-dup at 100 TB.
- **SimHash**: 64-bit bit-sign fingerprint; near-dups differ in few bits.

Everything is native expressions (xxhash64 + higher-order functions); no
Python on the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.functions.quantize import qdec

from cassandra_slow_queries_spark.functions.text import tokens, word_shingles
from cassandra_slow_queries_spark.session import spread_input

# Prime modulus for the affine MinHash family. 31-bit on purpose: ANSI mode
# (Spark 4 default) raises on long overflow, so a*h+b must stay < 2^63 —
# with h, a, b < 2^31 the affine step is overflow-safe in long arithmetic.
_MERSENNE31 = (1 << 31) - 1


def content_hash(text: Column | str) -> Column:
    """128-bit exact-content key (md5 hex — portable across engines)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


# Reserved index key for NULL text. md5 hex is exactly 32 hex chars, so
# an underscored token can never collide with a real content hash.
NULL_TEXT_SENTINEL = "__null_text__"


def index_content_hash(text: Column | str) -> Column:
    """:func:`content_hash` with NULL text mapped to a reserved non-NULL
    sentinel, for keys that must JOIN (equi-joins never match NULL=NULL).
    Used by the incremental dedup index so the one-group-one-keeper
    convention for NULL text holds ACROSS batches, not just within one —
    build the persisted history index with this same function (r10
    ADVICE: a NULL-keyed keeper could never enter the index, so every
    batch re-kept a fresh NULL-text keeper)."""
    return F.coalesce(content_hash(text), F.lit(NULL_TEXT_SENTINEL))


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    keeper (minimum id — deterministic) and the duplicate count."""
    return (
        df.select(F.col(id_col).alias("id"), content_hash(text_col).alias("h"))
        .groupBy("h")
        .agg(F.min("id").alias("keeper"), F.count("*").alias("n_dups"))
    )


def drop_exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Return df with only the keeper row per distinct content.

    Implemented as a window-free groupBy + semi join on (hash, keeper) so
    the heavy side shuffles once on the hash key.
    """
    keepers = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keeper").alias(id_col)
    )
    return df.join(keepers, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# Shingle candidates + exact n-gram Jaccard
# ---------------------------------------------------------------------------


def _distinct_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int, max_doc_freq: int | None
) -> DataFrame:
    """``(id, shingle)`` distinct pairs, with shingles whose document
    frequency exceeds ``max_doc_freq`` dropped BEFORE any self-join.

    The cap is the load-bearing scale guard: a boilerplate shingle shared
    by k documents (license header, template text) produces k·(k-1)/2
    join rows on ONE skewed key — quadratic fan-out that no AQE skew
    split can save at corpus scale. Capped shingles carry near-zero
    dedup signal anyway (they are corpus-common, not pair-specific);
    recall is only lost for pairs whose *every* shared shingle is
    corpus-hot. Both the candidate and the Jaccard operator treat the
    capped shingle universe as the ground set, so results stay
    self-consistent (and oracle-mirrorable). ``None`` disables the cap.

    The groupBy and semi-join both key on ``shingle``, so the cap costs
    one extra shuffle that is co-partitioned with the join it protects.
    """
    sh = (
        spread_input(df, by=id_col)
        .select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(text_col, n)).alias("shingle"),
        )
        .distinct()
    )
    if max_doc_freq is None:
        return sh
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_doc_freq)
        .select("shingle")
    )
    return sh.join(rare, "shingle", "left_semi")


def shingle_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    max_doc_freq: int | None = 100,
) -> DataFrame:
    """Pairs of documents sharing at least one n-word shingle with
    document frequency ≤ ``max_doc_freq``.

    This is exact LSH-with-full-bands: a shared long shingle is a strong
    near-dup signal. distinct() before the self-join collapses repeated
    shingles within a document so the join fan-out is bounded by true
    cross-document collisions; the doc-frequency cap bounds it against
    corpus-hot shingles (see :func:`_distinct_shingles`).
    """
    # persist: the capped shingle frame feeds both join sides — without
    # the cache each side re-runs the explode+distinct (+cap) over the
    # corpus, i.e. two full input passes instead of one
    sh = _distinct_shingles(df, text_col, id_col, n, max_doc_freq).persist()
    a = sh.alias("a")
    b = sh.alias("b")
    result = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _materialize_release(result, sh)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    threshold: float = 0.5,
    max_doc_freq: int | None = 100,
) -> DataFrame:
    """Exact Jaccard over distinct n-word shingle sets, computed from the
    candidate join itself (|A∩B| = shared-shingle count; |A∪B| derived),
    so no per-pair array materialization is needed.

    Set sizes are computed over the SAME capped shingle universe as the
    intersection (see :func:`_distinct_shingles`), so the reported value
    is the exact Jaccard of the capped sets — self-consistent, and what
    the oracle SQL mirrors.

    The sizes joins carry NO broadcast hint on purpose: ``sizes`` is one
    row per document — broadcasting it is a driver/executor OOM at
    corpus scale. The candidate side is the small one after thresholding;
    AQE picks a broadcast join at runtime exactly when it actually fits.
    """
    # persist: sh feeds the two self-join sides AND the sizes aggregate —
    # three corpus re-explodes without the cache
    sh = _distinct_shingles(df, text_col, id_col, n, max_doc_freq).persist()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    result = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_shingles": "size_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_shingles": "size_b"}), "id_b")
        # threshold on the UNROUNDED ratio (the round-6 value may sit just
        # below threshold while the exact ratio is above it, and vice
        # versa); round only in the output projection — matching both the
        # oracle SQL and the cosine operators' convention
        .withColumn(
            "jaccard_raw",
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard_raw") >= threshold)
        .select(
            "id_a", "id_b", qdec(F.col("jaccard_raw")).alias("jaccard")
        )
    )
    return _materialize_release(result, sh)


def _materialize_release(
    result: DataFrame, *intermediates: DataFrame
) -> DataFrame:
    """Eagerly materialize the (small) ``result`` via
    ``localCheckpoint``, then release the (large) cached
    ``intermediates``.

    The signature/fingerprint frames are read 3× per call, so caching
    them is right — but leaving them cached accumulates executor storage
    across calls in a long-lived session. Materializing the final pairs
    while the intermediate cache is hot lets us drop it immediately.
    ``localCheckpoint`` rather than ``persist`` on purpose: the
    checkpointed blocks (candidate-pair sized, tiny) are reclaimed by the
    ContextCleaner as soon as the returned frame is garbage collected, so
    one-shot callers owe no explicit ``unpersist()`` — the round-2 "caller
    owns unpersist" contract was honored by nobody and leaked.
    """
    result = result.localCheckpoint(eager=True)
    for intermediate in intermediates:
        intermediate.unpersist()
    return result


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _hash_family(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic affine family (aᵢ, bᵢ) derived from a seed via a
    splitmix-style mix — no RNG state, reproducible across runs."""
    params = []
    x = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(num_hashes):
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        a = (z % (_MERSENNE31 - 1)) + 1
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        b = x % _MERSENNE31
        params.append((a, b))
    return params


def minhash_signature(
    text: Column | str, num_hashes: int = 64, shingle_n: int = 5, seed: int = 42
) -> Column:
    """MinHash signature: arrayₖ( minₛ( (aₖ·h(s)+bₖ) mod M31 ) ).

    Shingle hashes are computed once (xxhash64, made non-negative), then
    each family member is a transform+array_min — all JVM-side. Empty
    shingle sets yield NULL signature.
    """
    sh = word_shingles(text, shingle_n)
    hashes = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE31)))

    def affine_min(a: int, b: int) -> Column:
        # factory, not default-arg lambda: PySpark derives the HOF arity
        # from the Python signature, so extra bound params break analysis
        return F.array_min(
            F.transform(
                hashes, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE31))
            )
        )

    sig_parts = [affine_min(a, b) for a, b in _hash_family(num_hashes, seed)]
    return F.when(F.size(hashes) > 0, F.array(*sig_parts))


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_n: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Signatures as ``(id, sig)`` via explode + one codegen'd hash
    aggregate with ``num_hashes`` ``min`` columns.

    Same math as :func:`minhash_signature`, but the per-shingle work runs
    inside whole-stage codegen with map-side partial aggregation — the
    higher-order-function fold is interpreted per element and measured
    ~10× slower at sf0.1. Documents with no shingles produce no row
    (mirrors the NULL-signature filter of the expression form).
    """
    ex = spread_input(df, by=id_col).select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("s"),
    ).select("id", F.pmod(F.xxhash64("s"), F.lit(_MERSENNE31)).alias("h"))
    family = _hash_family(num_hashes, seed)
    aggs = [
        F.min(
            F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_MERSENNE31))
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(family)
    ]
    return ex.groupBy("id").agg(*aggs).select(
        "id", F.array(*[f"m{i}" for i in range(num_hashes)]).alias("sig")
    )


def _cap_block_freq(
    blocked: DataFrame,
    keys: list[str],
    max_block_freq: int | None,
    observation: "Observation | None" = None,
) -> DataFrame:
    """Drop blocking keys whose document frequency exceeds
    ``max_block_freq`` BEFORE the self-join — the same load-bearing scale
    guard as :func:`_distinct_shingles`'s ``max_doc_freq``.

    A degenerate blocking key shared by k documents (empty docs,
    boilerplate-identical content — common in web corpora) produces
    k·(k-1)/2 join rows on ONE skewed key: quadratic fan-out that no AQE
    skew split can bound at corpus scale. A hot block carries near-zero
    pair-specific signal (its members are either exact duplicates — the
    job of :func:`drop_exact_duplicates`, which should run FIRST in a
    curation pipeline — or chance collisions); dropping it costs recall
    only for pairs whose *every* shared block is corpus-hot. The groupBy
    and semi-join key on the same columns as the self-join they protect,
    so the cap is co-partitioned with it. ``None`` (the default on both
    callers) disables.

    **Recall blind spot (why the cap is opt-in):** a genuine NEAR-dup —
    not byte-identical — cluster of more than ``max_block_freq`` members
    (templated web pages, mirrored articles) makes *every* block its
    members share corpus-hot, so the whole cluster is dropped and emits
    ZERO pairs — and exact dedup cannot catch it either. Enable the cap
    only after exact dedup has run, with a cap comfortably above the
    largest legitimate near-dup cluster you expect, and pass an
    ``observation`` so the loss is visible, not silent.

    ``observation`` (a ``pyspark.sql.Observation``): when given, the
    capped frame reports ``rows_in_hot_blocks`` (blocking rows dropped),
    ``n_hot_blocks`` (distinct keys dropped) and ``max_block_freq_seen``.
    The observed path uses an inner freq-join instead of the semi-join
    (same key, same shuffle) so dropped rows exist in the plan long
    enough to be counted, and then EAGERLY materializes the capped frame
    via ``localCheckpoint``: the callers self-join this frame, and a
    ``CollectMetrics`` node duplicated across both join sides corrupts
    the metrics row (``Observation.get`` dies in ``toPyRow``) — the
    checkpoint truncates the logical plan so the metrics node executes
    exactly once, and as a bonus the metrics are readable as soon as
    this function returns. Cost: the blocking frame (linear in corpus —
    bands·docs or 4·docs rows) lands in executor local storage; leave
    ``observation=None`` for production runs where that spill matters.
    """
    if max_block_freq is None:
        return blocked
    freq = blocked.groupBy(*keys).agg(F.count("*").alias("_bf"))
    if observation is None:
        small = freq.filter(F.col("_bf") <= max_block_freq).select(*keys)
        return blocked.join(small, keys, "left_semi")
    hot = F.col("_bf") > max_block_freq
    tagged = blocked.join(freq, keys).observe(
        observation, *_hot_block_metrics(hot)
    )
    return tagged.filter(~hot).drop("_bf").localCheckpoint(eager=True)


def _hot_block_metrics(hot: Column) -> list[Column]:
    """The ONE hot-block metric triple both capping paths report —
    factored so the drop and sample branches cannot drift apart."""
    return [
        F.sum(hot.cast("long")).alias("rows_in_hot_blocks"),
        # observe() forbids DISTINCT aggregates; a hot block contributes
        # exactly _bf rows, so Σ 1/_bf over hot rows == #distinct blocks
        F.round(
            F.sum(F.when(hot, F.lit(1.0) / F.col("_bf")).otherwise(F.lit(0.0)))
        ).cast("long").alias("n_hot_blocks"),
        F.max("_bf").alias("max_block_freq_seen"),
    ]


def _self_join_pairs(blocked: DataFrame, keys: list[str]) -> DataFrame:
    """Ordered ``(id_a, id_b)`` pairs from a self-join on block equality."""
    a = blocked.alias("a")
    b = blocked.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    for k in keys:
        cond = (F.col(f"a.{k}") == F.col(f"b.{k}")) & cond
    return a.join(b, cond).select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
    )


def _block_candidate_pairs(
    blocked: DataFrame,
    keys: list[str],
    max_block_freq: int | None = None,
    hot_block_policy: str = "drop",
    num_representatives: int = 8,
    observation: "Observation | None" = None,
) -> DataFrame:
    """Distinct ``(id_a, id_b)`` candidate pairs from an ``(id, *keys)``
    blocking frame, with a bounded strategy for hot blocks.

    Cold blocks (document frequency ≤ ``max_block_freq``) self-join as
    usual. For hot blocks, ``hot_block_policy`` picks between:

    - ``"drop"`` — discard the block entirely (the historical behavior,
      via :func:`_cap_block_freq`). Costs ALL recall on any genuine
      near-dup cluster larger than the cap.
    - ``"sample"`` — emit member×representative pairs instead of the full
      k·(k-1)/2 self-join: every member of a hot block is paired with a
      small representative set (the block's min id — guaranteed, chosen
      by a scale-safe partial-aggregating ``min`` — plus rows picked by a
      deterministic hash sample at expected rate
      ``num_representatives``/freq). Cost is O(k·R) per hot block instead
      of O(k²), yet the block's members stay *connected*: a
      larger-than-cap near-dup cluster (templated pages, mirrored
      articles — the blind spot of ``"drop"``) forms a star around its
      representatives, so verification + clustering still recover it as
      one component. Chance-collision hot blocks cost O(k·R) false
      candidates that exact verification disposes of. Representative
      choice is deterministic (id-hash), so results are reproducible.

    With an ``observation``, the same three metrics as
    :func:`_cap_block_freq` are reported; under ``"sample"`` the
    ``rows_in_hot_blocks`` rows are rerouted into representative stars
    rather than dropped. The tagged frame is eagerly
    ``localCheckpoint``-ed in sample mode — it is consumed by up to four
    subplans (cold self-join ×2, hot members, representative pick), and
    when observed the CollectMetrics node must execute exactly once.
    """
    if max_block_freq is None:
        return _self_join_pairs(blocked, keys).distinct()
    if hot_block_policy == "drop":
        capped = _cap_block_freq(blocked, keys, max_block_freq, observation)
        return _self_join_pairs(capped, keys).distinct()
    if hot_block_policy != "sample":
        raise ValueError(
            f"hot_block_policy must be 'drop' or 'sample', got {hot_block_policy!r}"
        )
    freq = blocked.groupBy(*keys).agg(F.count("*").alias("_bf"))
    hot = F.col("_bf") > max_block_freq
    tagged = blocked.join(freq, keys)
    if observation is not None:
        tagged = tagged.observe(observation, *_hot_block_metrics(hot))
    tagged = tagged.localCheckpoint(eager=True)
    cold_pairs = _self_join_pairs(tagged.filter(~hot).drop("_bf"), keys)
    hot_rows = tagged.filter(hot)
    min_rep = hot_rows.groupBy(*keys).agg(F.min("id").alias("rid"))
    sampled = hot_rows.filter(
        F.pmod(F.xxhash64(*keys, "id"), F.col("_bf"))
        < F.least(F.lit(num_representatives), F.col("_bf"))
    ).select(*keys, F.col("id").alias("rid"))
    reps = min_rep.unionByName(sampled).distinct()
    hot_pairs = (
        hot_rows.join(reps, keys)
        .filter(F.col("id") != F.col("rid"))
        .select(
            F.least("id", "rid").alias("id_a"),
            F.greatest("id", "rid").alias("id_b"),
        )
    )
    return cold_pairs.unionByName(hot_pairs).distinct()


def _band_keys(sig: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """Derive the LSH band keys ``(id, band, bh)`` from a signature
    frame ``(id, sig)`` — a pure per-row transform (``bands`` rows per
    doc), shared by the one-shot blocker and the incremental index so
    the banding arithmetic exists exactly once."""
    return sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col("sig"),
                                    bi * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def _sig_agreement(num_hashes: int) -> Column:
    """Estimated Jaccard from two signature columns ``sig_a``/``sig_b``:
    the fraction of agreeing minhash positions."""
    return F.round(
        F.size(
            F.filter(
                F.zip_with(
                    "sig_a", "sig_b", lambda x, y: (x == y).cast("int")
                ),
                lambda v: v == 1,
            )
        )
        / F.lit(float(num_hashes)),
        6,
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    seed: int = 42,
    max_block_freq: int | None = None,
    hot_block_policy: str = "drop",
    num_representatives: int = 8,
    observation: "Observation | None" = None,
) -> DataFrame:
    """Banded-LSH candidate pairs with estimated Jaccard.

    signature → ``bands`` band hashes → explode → self-join on
    (band, hash) → distinct pairs → signature-agreement estimate.
    Rows per doc after explode = ``bands`` (constant!), which is what
    makes this the 100 TB path vs. the shingle self-join — and
    ``max_block_freq`` bounds the one remaining quadratic exposure, a
    degenerate band bucket holding a huge identical-signature class.

    ``max_block_freq`` is OPT-IN (default off): with the default
    ``hot_block_policy="drop"`` capping discards every pair of a
    near-dup cluster larger than the cap — a recall loss exact dedup
    cannot recover. ``hot_block_policy="sample"`` removes that blind
    spot: hot blocks emit member×representative star pairs (O(k·R), R =
    ``num_representatives``) so oversized near-dup clusters stay
    connected while the quadratic fan-out stays bounded (see
    :func:`_block_candidate_pairs`). When enabling the cap, pass a
    ``pyspark.sql.Observation`` as ``observation`` to see how many
    blocking rows the cap dropped/sampled.
    """
    if num_hashes % bands != 0:
        # ValueError, not assert: python -O strips asserts, and a
        # short slice past the signature end TRUNCATES silently — the
        # silently-degraded-blocker class this module warns about
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, seed)
    sig = sig.persist()  # released below once the pairs are materialized
    banded = _band_keys(sig, bands, rows_per_band)
    cand = _block_candidate_pairs(
        banded,
        ["band", "bh"],
        max_block_freq,
        hot_block_policy,
        num_representatives,
        observation,
    )
    sa = sig.withColumnsRenamed({"id": "id_a", "sig": "sig_a"})
    sb = sig.withColumnsRenamed({"id": "id_b", "sig": "sig_b"})
    result = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", _sig_agreement(num_hashes))
        .select("id_a", "id_b", "est_jaccard")
    )
    return _materialize_release(result, sig)


def verified_near_dup_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 100,
) -> DataFrame:
    """Exact n-gram Jaccard verification restricted to candidate pairs —
    the production LSH pattern: approximate blocking proposes, exact
    similarity disposes.

    ``candidates`` is any ``(id_a, id_b)`` frame (minhash-LSH, simhash
    blocking, ...). Output is ``(id_a, id_b, jaccard)`` for pairs whose
    exact capped-universe Jaccard ≥ ``threshold`` — i.e. IF the blocker
    reaches recall 1.0 above the threshold, this equals the full exact
    all-pairs result while only ever scoring |candidates| pairs. That
    equality is the correctness gate: the catalog entries built on this
    are hash-compared against the ALL-PAIRS oracle SQL, so a silently
    degraded blocker (wrong dim, wrong banding — the round-1 LSH bug
    class) breaks the hash instead of returning plausible rows.

    Scale shape: the exact verify never self-joins the corpus — the
    shingle frame joins the (small) candidate pair list on id, so cost is
    O(shingles-of-candidate-docs), not O(corpus²). With
    ``max_doc_freq=None`` the input is additionally semi-joined to the
    candidate documents BEFORE the shingle explode, so the verify pass
    never even scans non-candidate text; a doc-frequency cap forces a
    full-corpus explode (frequencies are corpus-global by definition),
    so pass ``None`` when the blocker already bounds the join.
    """
    if max_doc_freq is None:
        cand_ids = (
            candidates.select(F.col("id_a").alias("_cid"))
            .union(candidates.select(F.col("id_b").alias("_cid")))
            .distinct()
        )
        df = df.join(cand_ids, F.col(id_col) == F.col("_cid"), "left_semi")
    # persist: sh feeds both intersection sides and the sizes aggregate
    sh = _distinct_shingles(df, text_col, id_col, n, max_doc_freq).persist()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    pairs = candidates.select("id_a", "id_b")
    a_sh = pairs.join(sh.withColumnsRenamed({"id": "id_a"}), "id_a")
    inter = (
        a_sh.join(sh.withColumnsRenamed({"id": "id_b"}), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    result = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_shingles": "size_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_shingles": "size_b"}), "id_b")
        # unrounded threshold, rounded output — see ngram_jaccard_pairs
        .withColumn(
            "jaccard_raw",
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard_raw") >= threshold)
        .select(
            "id_a", "id_b", qdec(F.col("jaccard_raw")).alias("jaccard")
        )
    )
    return _materialize_release(result, sh)


# ---------------------------------------------------------------------------
# Duplicate clustering (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


class ConvergenceError(RuntimeError):
    """Iterative algorithm exhausted its round budget with work pending.

    Raised instead of returning silently-wrong results: a label frame
    that stopped propagating mid-graph LOOKS valid (right schema, right
    row count) but assigns different cluster ids to connected vertices —
    the worst failure mode for a dedup pipeline (duplicates silently
    survive)."""


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of the undirected pair graph: ``(id, comp)``
    with ``comp`` = minimum id reachable from ``id``.

    Pairwise near-dup operators (MinHash-LSH, SimHash, embedding-cosine)
    emit *edges*; a curation pipeline needs *clusters* — keep one
    representative per component, drop the rest. This is the classic
    iterative min-label propagation: each round every vertex takes the
    minimum of its own label and its neighbors' labels, converging in
    ``diameter`` rounds. Near-dup components are near-cliques (diameter
    2-3 in practice), so the round count stays tiny even at corpus
    scale; for adversarial long-path graphs the large-star/small-star
    scheme (Kiveris et al., "Connected Components in MapReduce and
    Beyond") converges in O(log n) rounds — propagation is chosen here
    because dedup graphs are shallow and it needs one shuffle per round
    instead of two.

    Scale shape per round: one join of the (narrow, symmetrized) edge
    list with the label frame on the vertex key + one min-aggregate —
    both shuffle on the same key, and AQE coalesces the tiny tail as
    components collapse. ``localCheckpoint`` truncates the growing
    iteration lineage (without it every round re-plans all previous
    rounds and the plan explodes exponentially). The driver-side loop is
    plan-level only (one ``count()`` action per round for the
    convergence test — the same pattern as MLlib's iterative
    algorithms); no row data ever reaches the driver.

    Raises :class:`ConvergenceError` if labels are still changing after
    ``max_iter`` rounds — a partially-propagated label frame is
    silently WRONG (connected vertices with different labels), and a
    graph that deep means the input is not a near-dup graph: raise
    ``max_iter`` or switch to the O(log n) large-star/small-star scheme
    cited above.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("u").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    )
    try:
        converged = False
        for _ in range(max_iter):
            nbr_min = (
                sym.join(labels, sym["u"] == labels["id"])
                .groupBy(F.col("v").alias("_nid"))
                .agg(F.min("comp").alias("_nbr_comp"))
            )
            stepped = (
                labels.join(nbr_min, labels["id"] == F.col("_nid"), "left")
                .select(
                    "id",
                    F.least(
                        F.col("comp"), F.coalesce("_nbr_comp", "comp")
                    ).alias("comp"),
                    (F.coalesce("_nbr_comp", "comp") < F.col("comp")).alias(
                        "_changed"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            labels = stepped.select("id", "comp")
            if stepped.filter("_changed").limit(1).count() == 0:
                converged = True
                break
        if not converged:
            raise ConvergenceError(
                f"connected_components did not converge in {max_iter} "
                "rounds; the pair graph has a path longer than max_iter "
                "hops — raise max_iter or use connected_components_star "
                "(O(log n) rounds) for deep graphs"
            )
        return labels
    finally:
        sym.unpersist()


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star contraction round (Kiveris et al.,
    "Connected Components in MapReduce and Beyond").

    ``edges`` is the symmetric adjacency ``(u, v)``. For each center u
    with m = min(Γ(u) ∪ {u}):

    - large-star rewires every STRICTLY LARGER neighbor to m —
      ``(v, m) for v in Γ(u), v > u``;
    - small-star rewires every not-larger neighbor (and u itself) to
      the minimum of that subset — ``(v, m⁻) for v in Γ⁻(u) ∪ {u}``
      with Γ⁻ = neighbors ≤ u.

    Both are one groupBy + one join on the center key; self-loops are
    dropped on output. Alternating the two converges to stars (every
    vertex directly attached to its component minimum) in O(log n)
    rounds even on path/chain graphs.
    """
    if large:
        mins = (
            edges.select("u", "v")
            .union(edges.select(F.col("u"), F.col("u").alias("v")))
            .groupBy("u")
            .agg(F.min("v").alias("m"))
        )
        rewired = (
            edges.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
    else:
        lesser = edges.filter(F.col("v") <= F.col("u")).union(
            edges.select(F.col("u"), F.col("u").alias("v")).distinct()
        )
        mins = lesser.groupBy("u").agg(F.min("v").alias("m"))
        rewired = lesser.join(mins, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    return (
        rewired.filter(F.col("u") != F.col("v"))
        .union(rewired.filter(F.col("u") != F.col("v")).select(
            F.col("v").alias("u"), F.col("u").alias("v")
        ))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction — the O(log n)-round escape hatch for graphs too deep
    for :func:`connected_components`' min-label propagation (which
    needs ``diameter`` rounds and raises past ``max_iter``).

    Same contract as :func:`connected_components`: returns ``(id,
    comp)`` with ``comp`` = minimum id of the component, one row per
    vertex that appears in any edge. Near-dup graphs are near-cliques,
    so propagation (one shuffle/round) is the default; use this for
    adversarial shapes — long chains from transitive near-dup edges at
    low thresholds, or social/link graphs reused through this API.

    Scale shape per round: one min-aggregate + one join, both keyed on
    the center vertex (co-partitioned), edge set never grows beyond the
    input adjacency size (star-contraction is monotone); convergence is
    detected by the edge set reaching the star form (every edge already
    points at the component minimum — checked with one aggregate on the
    rewired frame, no driver-side data).

    Raises :class:`ConvergenceError` if ``max_rounds`` alternations do
    not reach star form (only possible for ``max_rounds`` ≪ log n).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # remember the true vertex universe: contraction drops vertices as
    # they attach to their root, so membership comes from the input
    vertices = sym.select(F.col("u").alias("id")).distinct().localCheckpoint(
        eager=True
    )
    cur = sym.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        if cur.limit(1).count() == 0:
            break
        stepped = _star_round(_star_round(cur, large=True), large=False)
        stepped = stepped.localCheckpoint(eager=True)
        # star-forest test (the fixpoint): in a star rooted at the
        # component minimum, the root has ONLY larger neighbors and each
        # child has EXACTLY ONE smaller neighbor (the root) and no
        # larger ones. Any vertex with >1 smaller neighbor, or with both
        # a smaller and a larger neighbor, means contraction must go on.
        not_star = (
            stepped.groupBy("u")
            .agg(
                F.sum((F.col("v") < F.col("u")).cast("int")).alias("n_lt"),
                F.sum((F.col("v") > F.col("u")).cast("int")).alias("n_gt"),
            )
            .filter(
                (F.col("n_lt") > 1)
                | ((F.col("n_lt") >= 1) & (F.col("n_gt") >= 1))
            )
            .limit(1)
            .count()
            > 0
        )
        cur = stepped
        if not not_star:
            break
    else:
        raise ConvergenceError(
            f"connected_components_star did not reach star form in "
            f"{max_rounds} rounds — raise max_rounds"
        )
    # star edges: (child, root) with root < child; roots label themselves
    labels = cur.filter(F.col("v") < F.col("u")).select(
        F.col("u").alias("id"), F.col("v").alias("comp")
    )
    return vertices.join(labels, "id", "left").select(
        "id", F.coalesce("comp", F.col("id")).alias("comp")
    )


def assign_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str, algorithm: str = "propagation"
) -> DataFrame:
    """Attach ``cluster_id``/``is_keeper`` to every document given a
    near-dup pair frame ``(id_a, id_b)``.

    Documents in no pair form singleton clusters (``cluster_id`` = own
    id). The keeper is the minimum id of the component — deterministic,
    mirrors :func:`exact_dedup_groups`. The component frame is
    pair-graph-sized (only docs that appear in some pair), so the final
    join is broadcast-sized in the common case where near-dups are a
    small fraction of the corpus; AQE picks the strategy at runtime.

    ``algorithm``: ``"propagation"`` (default — one shuffle/round,
    right for shallow near-clique dedup graphs), ``"star"``
    (:func:`connected_components_star`, O(log n) rounds for deep
    graphs), or ``"auto"`` — propagation first, and on
    :class:`ConvergenceError` (a path deeper than its round budget)
    transparently re-run with star contraction. Auto keeps the cheap
    one-shuffle-per-round path for the overwhelmingly common shallow
    case while making adversarial graph shapes a retry instead of a
    failure; the propagation rounds already spent are wasted work, so
    pipelines that KNOW their graphs are deep should ask for ``"star"``
    directly. The iteration loops are driver-side plan builders (their
    per-round convergence ``count()`` is the only action), so the
    failure surfaces here in the builder call, not mid-action later.
    """
    if algorithm not in ("propagation", "star", "auto"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if algorithm == "star":
        comp = connected_components_star(pairs)
    elif algorithm == "auto":
        try:
            comp = connected_components(pairs)
        except ConvergenceError:
            comp = connected_components_star(pairs)
    else:
        comp = connected_components(pairs)
    return (
        df.join(comp, df[id_col] == comp["id"], "left")
        .select(
            df["*"],
            F.coalesce("comp", df[id_col]).alias("cluster_id"),
        )
        .withColumn("is_keeper", F.col(id_col) == F.col("cluster_id"))
    )


def keep_cluster_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Near-dup dedup at the row level: keep exactly one representative
    (the minimum id) per connected component, all singletons included —
    the cluster-level analog of :func:`drop_exact_duplicates`."""
    clustered = assign_clusters(df, pairs, id_col)
    return clustered.filter(F.col("is_keeper")).drop("cluster_id", "is_keeper")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text: Column | str) -> Column:
    """64-bit SimHash over tokens: bit b is 1 iff Σ_tokens ±1 (sign of
    bit b of xxhash64(token)) is positive. Near-duplicate documents have
    small Hamming distance between fingerprints.

    Bit positions are unrolled with Python ints (``shiftright`` requires a
    literal shift), and the per-bit counts array is folded into the final
    long through ONE aggregate so the counts subtree appears once in the
    expression tree.
    """
    toks = F.filter(tokens(text), lambda t: F.length(t) > 0)

    def sign_bits(t: Column) -> Column:
        h = F.xxhash64(t)
        return F.array(
            *[
                F.when(
                    F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for i in range(64)
            ]
        )

    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), 64),
        lambda acc, t: F.zip_with(acc, sign_bits(t), lambda a, b: a + b),
    )
    # bit i contributes 2^i (bit 63 = long sign bit = min-long); summing
    # distinct powers of two == bitwise OR, and stays in long range
    pow2 = F.array(
        *[
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long")
            for i in range(64)
        ]
    )
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(64)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(F.element_at(counts, i) > 0, F.element_at(pow2, i)).otherwise(
            F.lit(0).cast("long")
        ),
    )


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two 64-bit fingerprints (popcount XOR)."""
    x = (F.col(a) if isinstance(a, str) else a).bitwiseXOR(
        F.col(b) if isinstance(b, str) else b
    )
    return F.bit_count(x)


def simhash_fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Fingerprints as ``(id, fp)`` via explode + one codegen'd hash
    aggregate with 64 bit-count sums.

    Same semantics as :func:`simhash` (bit b set iff the signed sum over
    tokens is positive: ``2·ones_b > n``), but runs as a whole-stage
    codegen hash aggregate with map-side combine instead of an
    interpreted per-token fold over a 64-wide expression — measured ~50×
    faster at sf0.1. ``explode_outer`` keeps token-less documents with
    fingerprint 0, matching the expression form.
    """
    toks = F.filter(tokens(text_col), lambda t: F.length(t) > 0)
    ex = spread_input(df, by=id_col).select(
        F.col(id_col).alias("id"), F.explode_outer(toks).alias("t")
    ).select(
        "id", F.xxhash64("t").alias("h"), F.col("t").isNotNull().alias("ok")
    )
    bit_sums = [
        F.sum(
            F.when(
                F.col("ok"), F.shiftright("h", i).bitwiseAND(F.lit(1))
            ).otherwise(F.lit(0))
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = ex.groupBy("id").agg(F.count(F.when(F.col("ok"), 1)).alias("n"), *bit_sums)
    fp = F.lit(0).cast("long")
    for i in range(64):
        weight = (1 << i) if i < 63 else -(1 << 63)
        fp = fp + F.when(
            F.col(f"b{i}") * 2 > F.col("n"), F.lit(weight).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return agg.select("id", fp.alias("fp"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_block_freq: int | None = None,
    hot_block_policy: str = "drop",
    num_representatives: int = 8,
    observation: "Observation | None" = None,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit fingerprint quarters
    (a pair within Hamming≤3 of 64 bits must agree on ≥1 of 4 quarters —
    pigeonhole), then verify exact Hamming distance.

    Two guards bound the self-join against degenerate fingerprints:

    - token-less documents (fingerprint 0 by construction — see
      :func:`simhash_fingerprints`) are EXCLUDED from blocking: every
      empty doc shares all four quarters with every other, and pairs of
      empty docs are exact duplicates — :func:`drop_exact_duplicates`
      territory, not near-dup detection;
    - ``max_block_freq`` (OPT-IN, default off) caps the per-(quarter,
      qh) document frequency: an identical-content class of k docs
      shares all four quarters → 4 hot keys × k·(k-1)/2 rows each.
      Route exact-identical content through exact dedup first; the cap
      makes the blocker survive it either way — under the default
      ``hot_block_policy="drop"`` at the cost of also dropping every
      pair of a GENUINE near-dup cluster larger than the cap, while
      ``"sample"`` keeps such clusters connected via member×representative
      star pairs at O(k·R) (see :func:`_block_candidate_pairs` for both
      policies and the ``observation`` metrics that make the hot-block
      load visible).

    ``fingerprints``: optionally pass a precomputed ``(id, fp)`` frame
    (ideally already materialized — a parquet-backed shared
    intermediate) so callers that run the blocker more than once (e.g.
    the dedup_simhash gate: capped production candidates + uncapped
    pigeonhole candidates) pay the corpus fingerprint pass ONCE. When
    provided, this function does not manage its storage lifecycle.
    """
    owns_fp = fingerprints is None
    fp = (
        simhash_fingerprints(df, text_col, id_col)
        if owns_fp
        else fingerprints
    )
    if owns_fp:
        fp = fp.persist()  # released below once the pairs are materialized
    blocked = fp.filter(F.col("fp") != 0).select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("quarter"),
                        F.shiftright(F.col("fp"), q * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("qh"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("qq"),
    ).select("id", "fp", F.col("qq.quarter").alias("quarter"), F.col("qq.qh").alias("qh"))
    cand = _block_candidate_pairs(
        blocked.select("id", "quarter", "qh"),
        ["quarter", "qh"],
        max_block_freq,
        hot_block_policy,
        num_representatives,
        observation,
    )
    # hamming verify on the (small) distinct candidate list: re-join the
    # persisted fingerprints instead of carrying fp through the blocking
    # self-join — same result (hamming is a pure function of the two fps)
    result = (
        cand.join(fp.withColumnsRenamed({"id": "id_a", "fp": "fp_a"}), "id_a")
        .join(fp.withColumnsRenamed({"id": "id_b", "fp": "fp_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            hamming64(F.col("fp_a"), F.col("fp_b")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    if owns_fp:
        return _materialize_release(result, fp)
    return _materialize_release(result)


# ---------------------------------------------------------------------------
# Span-level exact dedup (paragraph / fixed word-chunk granularity)
#
# Document-level dedup (everything above) cannot remove boilerplate that is
# EMBEDDED in otherwise-unique documents — navigation text, license headers,
# templated footers. The published fix (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better") removes duplicated substrings;
# the common distributed approximation — used here — works at span
# granularity: split every document into spans (paragraphs on a separator for
# real corpora, fixed-width word chunks for unstructured text), find spans
# that recur across >= min_dup_docs distinct documents with ONE corpus-wide
# groupBy, and rebuild each document without them. Everything is native
# expressions: explode -> hash aggregate -> anti-join -> ordered re-assembly.
# ---------------------------------------------------------------------------


def split_spans(
    df: DataFrame, text_col: str, id_col: str, sep: str = "\n\n"
) -> DataFrame:
    """``(id, pos, span)`` — one row per separator-delimited paragraph.

    ``pos`` is the 0-based paragraph index, which makes re-assembly
    (:func:`strip_duplicate_spans`) order-exact. Empty documents yield a
    single empty span, mirroring ``str.split`` semantics — and NULL
    documents are treated as empty for the same reason: ``split(NULL)``
    is a NULL array whose posexplode emits ZERO rows, which would
    silently drop the document from every downstream strip (violating
    the no-silent-row-loss contract there).
    """
    return spread_input(df, by=id_col).select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(
                F.coalesce(F.col(text_col), F.lit("")),
                # literal separator: F.split's pattern is a Java regex,
                # and a sep like '. ' or '||' would silently split on
                # any character / between every character
                F.lit("\\Q" + sep + "\\E"),
                F.lit(-1),
            )
        ).alias("pos", "span"),
    )


def word_chunk_spans(
    df: DataFrame, text_col: str, id_col: str, chunk_words: int = 4
) -> DataFrame:
    """``(id, pos, span)`` — fixed ``chunk_words``-word chunks.

    The span definition for corpora without paragraph structure: the
    token stream is cut into consecutive ``chunk_words``-wide windows
    (the last chunk may be shorter). Delegates to the one window-
    arithmetic implementation — ``operators/curation.py:
    chunk_documents`` with stride == window is exactly non-overlapping
    chunking (equality pinned by tests/test_curriculum_chunk.py), and
    Catalyst prunes the dropped ``n_words`` expression.
    """
    from cassandra_slow_queries_spark.operators.curation import (
        chunk_documents,
    )

    return chunk_documents(
        df, text_col, id_col, chunk_words, chunk_words
    ).drop("n_words")


def corpus_hot_spans(spans: DataFrame, min_dup_docs: int = 2) -> DataFrame:
    """Spans recurring across ``>= min_dup_docs`` DISTINCT documents:
    ``(span, n_docs, n_occurrences)``.

    One corpus-wide hash aggregate keyed on the span text. Map-side
    partial aggregation collapses within-partition repeats before the
    shuffle; at extreme scale, key on ``xxhash64(span)`` instead and
    carry ``min(span)`` if shuffle width on long spans ever dominates —
    the output contract is unchanged.
    """
    return (
        spans.groupBy("span")
        .agg(
            F.count_distinct("id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_dup_docs)
    )


def strip_duplicate_spans(
    spans: DataFrame,
    hot: DataFrame,
    joiner: str = " ",
) -> DataFrame:
    """Rebuild documents without corpus-duplicated spans:
    ``(id, n_spans, n_dup_spans, clean_text)``.

    ``spans`` is a ``(id, pos, span)`` frame; ``hot`` is
    :func:`corpus_hot_spans` output (only its ``span`` column is used).
    Kept spans re-assemble in original order via a per-document
    ``collect_list`` + ``array_sort`` on ``(pos, span)`` structs — a
    document's own spans always fit one aggregation buffer, so this is
    NOT a global sort. A document whose every span is hot survives with
    ``clean_text = ''``, so downstream length filters — not silent row
    loss — decide its fate.

    Plan shape: ONE pass over the span frame — a left join against the
    hot set marks each span, and a single per-document aggregate counts
    totals, counts hot marks, and collects only unmarked spans
    (``collect_list`` skips the NULLs the ``when`` leaves for hot
    rows). The naive anti-join + separate totals formulation costs an
    extra full evaluation of the span explode; at corpus scale that is
    one whole input pass saved.
    """
    marked = spans.join(
        hot.select("span").withColumn("_hot", F.lit(1)), "span", "left"
    )
    is_hot = F.col("_hot").isNotNull()
    return marked.groupBy("id").agg(
        F.count("*").alias("n_spans"),
        F.sum(is_hot.cast("long")).alias("n_dup_spans"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(~is_hot, F.struct("pos", "span")))
                ),
                lambda s: s["span"],
            ),
            joiner,
        ).alias("clean_text"),
    )


def strip_corpus_duplicate_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_words: int = 4,
    min_dup_docs: int = 2,
) -> DataFrame:
    """Convenience composition: chunk → find corpus-hot chunks → strip.

    Output ``(id, n_spans, n_dup_spans, clean_text)``; see
    :func:`strip_duplicate_spans` for the re-assembly contract.
    """
    # persist: the chunk-explode subtree feeds BOTH the corpus-hot
    # aggregate and the strip join — uncached it executes twice over
    # the whole corpus, wasting exactly the pass the building blocks
    # were designed to save; released via the module's standard
    # materialize-then-unpersist contract
    spans = word_chunk_spans(df, text_col, id_col, chunk_words).persist()
    hot = corpus_hot_spans(spans, min_dup_docs)
    return _materialize_release(strip_duplicate_spans(spans, hot), spans)


# ---------------------------------------------------------------------------
# Incremental (snapshot) exact dedup
# ---------------------------------------------------------------------------


def incremental_exact_dedup(
    incoming: DataFrame,
    history_index: DataFrame,
    text_col: str,
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW batch against a persistent content-hash index — the
    shape of a daily-intake pipeline, where re-hashing the full corpus
    per batch (what :func:`drop_exact_duplicates` over history ∪ batch
    would do) is a non-starter at 100 TB of history.

    ``history_index`` is a one-column frame ``(h)`` of
    :func:`index_content_hash` keys — md5 hex per doc (16 bytes — the
    only state the pipeline persists between batches), with NULL text
    mapped to :data:`NULL_TEXT_SENTINEL` so NULL-text dedup also holds
    across batches. Returns ``(kept, new_index)``:

    - ``kept`` — incoming rows that are neither within-batch duplicates
      (min-id keeper per hash) nor present in the index. One groupBy on
      the hash + one anti-join against the index, both keyed on ``h`` —
      co-partitioned, no corpus re-scan.
    - ``new_index`` — the index with the kept batch's hashes appended;
      write it back (e.g. a bucketed table on ``h`` — plans/layout.py)
      so the next batch's anti-join is co-located too.
    """
    # index_content_hash, not content_hash: NULL text hashes to a
    # reserved non-NULL sentinel so its keeper both (a) survives the
    # keeper groupBy like any other group and (b) ENTERS the index,
    # making the one-group-one-keeper convention hold across batches —
    # with a raw NULL key, the sentinel group could never anti-join
    # against history, so every batch re-kept a fresh NULL-text keeper
    # (r10 ADVICE). The history side must be built with
    # index_content_hash too (see the docstring).
    inc = incoming.withColumn("_h", index_content_hash(text_col))
    # the keeper semi-join keys on the ID alone (ids are unique rows,
    # so the keeper set IS the kept set) — keying on ["_h", id] is
    # equivalent now that _h is never NULL, but the id key is the
    # narrower shuffle.
    keepers = inc.groupBy("_h").agg(F.min(id_col).alias(id_col)).select(
        id_col
    )
    batch_kept = inc.join(keepers, id_col, "left_semi")
    kept = batch_kept.join(
        history_index.select(F.col("h").alias("_h")), "_h", "left_anti"
    )
    # materialize the kept batch ONCE: it feeds both return values (the
    # rows and the index update), and the caller's next step is writing
    # the index back anyway — without this, consuming both outputs
    # re-runs the hash + groupBy + anti-join lineage per consumer
    # (measured 7 source scans for the catalog entry vs 4 after)
    kept = kept.localCheckpoint(eager=True)
    # NO .distinct(): kept hashes are unique within the batch (one
    # keeper per hash) and disjoint from history (the anti-join), so
    # the union is duplicate-free by construction — a distinct here
    # would re-shuffle the ENTIRE history-scale index every batch,
    # exactly the rescan this function exists to avoid
    new_index = history_index.unionByName(
        kept.select(F.col("_h").alias("h"))
    )
    return kept.drop("_h"), new_index


def incremental_minhash_dedup(
    incoming: DataFrame,
    sig_index: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    seed: int = 42,
    est_threshold: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """NEAR-dup dedup of a new batch against a persistent signature
    index — :func:`incremental_exact_dedup`'s sibling for the
    templated/boilerplate duplicates a content hash cannot see, again
    without re-scanning history text.

    ``sig_index`` is ``(id, sig)`` — the minhash signatures of every
    previously kept document (``num_hashes`` longs ≈ 0.5 KB/doc, the
    only state persisted; band keys re-derive from it as a pure
    transform, and similarity is judged on SIGNATURE AGREEMENT, so the
    index needs no text). Returns ``(kept, new_index)``:

    - ``kept`` — incoming rows that match (estimated Jaccard ≥
      ``est_threshold``) neither a history document nor a smaller-id
      batch document. The batch-vs-history candidates come from an
      equi-join of band keys (at scale, write the index bucketed on
      ``id`` and materialize its band table bucketed on (band, bh) —
      plans/layout.py — so this join is co-located); within-batch
      candidates reuse the one blocking implementation. The
      drop-if-matching-any-smaller-id policy is deterministic and
      single-pass (no clustering step) — the same keeper rule as the
      exact sibling, extended transitively-conservatively.
    - ``new_index`` — the index plus the kept rows' signatures.

    Estimated (not exact-text) similarity is the deliberate trade for
    text-free state: with 64 hashes the estimator's σ at the 0.5
    threshold is ≈0.06, so set ``est_threshold`` with margin or keep
    history text reachable and verify the emitted matches exactly.

    Shingle-less documents (NULL text, or fewer than ``shingle_n``
    words) carry no similarity evidence: they produce no signature, are
    ALWAYS kept, and never enter the index — deliberately, since
    near-dup semantics are undefined for them. Exact duplicates among
    them (including repeated NULL text across batches) are the exact
    sibling's job: run :func:`incremental_exact_dedup` first, as a real
    intake pipeline does.
    """
    if num_hashes % bands != 0:
        # ValueError, not assert: python -O strips asserts, and a
        # short slice past the signature end TRUNCATES silently — the
        # silently-degraded-blocker class this module warns about
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    rows_per_band = num_hashes // bands
    inc_sig = minhash_signatures(
        incoming, text_col, id_col, num_hashes, shingle_n, seed
    ).persist()
    inc_bands = _band_keys(inc_sig, bands, rows_per_band)
    hist_bands = _band_keys(sig_index, bands, rows_per_band).select(
        F.col("id").alias("_old"), "band", "bh"
    )
    # batch vs history: band-key equi-join proposes, signature
    # agreement disposes
    cand_h = (
        inc_bands.join(hist_bands, ["band", "bh"])
        .select("id", "_old")
        .distinct()
    )
    sa = inc_sig.withColumnsRenamed({"sig": "sig_a"})
    sb = sig_index.select(
        F.col("id").alias("_old"), F.col("sig").alias("sig_b")
    )
    hist_dup_ids = (
        cand_h.join(sa, "id")
        .join(sb, "_old")
        .withColumn("_est", _sig_agreement(num_hashes))
        .filter(F.col("_est") >= est_threshold)
        .select("id")
        .distinct()
    )
    # within batch: canonical id_a < id_b pairs; drop the larger id
    cand_b = _block_candidate_pairs(
        inc_bands, ["band", "bh"], None, "drop", 8, None
    )
    batch_dup_ids = (
        cand_b.join(
            inc_sig.select(
                F.col("id").alias("id_a"), F.col("sig").alias("sig_a")
            ),
            "id_a",
        )
        .join(
            inc_sig.select(
                F.col("id").alias("id_b"), F.col("sig").alias("sig_b")
            ),
            "id_b",
        )
        .withColumn("_est", _sig_agreement(num_hashes))
        .filter(F.col("_est") >= est_threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    dropped = hist_dup_ids.unionByName(batch_dup_ids).distinct()
    kept = incoming.join(
        dropped.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
    kept_sigs = inc_sig.join(dropped, "id", "left_anti").select("id", "sig")
    # eagerly materialize only the BATCH-sized outputs, then release the
    # batch signature cache; new_index stays lazy (history ∪ checkpointed
    # batch sigs) — eagerly checkpointing the full index would rewrite
    # history-scale state every batch
    kept = kept.localCheckpoint(eager=True)
    kept_sigs = kept_sigs.localCheckpoint(eager=True)
    inc_sig.unpersist()
    return kept, sig_index.unionByName(kept_sigs)


# --------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
# algorithm): robust LOCAL fingerprinting for substring-level overlap.
# Where the span dedup above strips corpus-duplicated chunks at fixed
# paragraph/word boundaries, winnowing guarantees detection of ANY
# shared substring of at least (window + k - 1) characters regardless
# of alignment: every window of `window` consecutive k-gram hashes
# contributes its minimum, so two documents sharing a long-enough
# substring necessarily select at least one identical fingerprint.
# --------------------------------------------------------------------------


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Distinct ``(id, fp)`` winnowed fingerprints per document.

    Pure array expressions per row — char k-grams, a portable 60-bit
    md5 hash per gram (the same engine-portable construction as
    curation.sample_bucket, so an oracle replays it bit-for-bit), then
    the per-window minimum and a distinct. Expression cost is
    O(len·window) per row with NO shuffle; the only exchange is the
    final distinct on (id, fp). Documents shorter than ``window``
    k-grams contribute all their gram hashes (degenerate but correct:
    the guarantee only speaks to matches ≥ window+k-1 chars anyway).
    """
    from cassandra_slow_queries_spark.functions.text import char_ngrams

    # spread_input like every other per-row-heavy dedup featurizer: the
    # O(len·window) array expressions otherwise run on however few
    # splits the landing file has (r9 sf1 smoke: 22x wall at 10x data,
    # 2 splits carrying all 32 cores' work)
    toked = spread_input(df, by=id_col).select(
        F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("_t")
    )
    hashed = toked.select(
        "id",
        F.transform(
            char_ngrams(F.col("_t"), k),
            lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast(
                "bigint"
            ),
        ).alias("_h"),
    )
    w = int(window)
    fps = hashed.select(
        "id",
        F.explode(
            F.expr(
                f"CASE WHEN size(_h) >= {w} THEN array_distinct("
                f"  transform(sequence(1, size(_h)-{w}+1), "
                f"            i -> array_min(slice(_h, i, {w})))) "
                f"ELSE array_distinct(_h) END"
            )
        ).alias("fp"),
    )
    return fps.distinct()


def winnow_match_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_fp_freq: int | None = None,
) -> DataFrame:
    """Document pairs sharing at least ``min_shared`` winnowed
    fingerprints: ``(id_a, id_b, n_shared)`` with ``id_a < id_b`` —
    substring-level overlap candidates (plagiarism-style reuse,
    boilerplate injection, quotation) that whole-document MinHash
    misses when the shared run is a small fraction of each document.

    ``max_fp_freq`` is the usual hot-block guard: a fingerprint
    appearing in more than that many documents (site-wide boilerplate)
    is dropped BEFORE the self-join, bounding the quadratic exposure
    exactly like minhash_lsh_pairs' ``max_block_freq`` — opt-in,
    observable recall trade, same rationale. The self-join shuffles on
    the fingerprint key; ``n_shared`` is a count over the joined
    stream (one aggregation), so the whole operator is two shuffles.
    """
    # persist: the fingerprint subtree (O(len·window) array expressions
    # per row) feeds the frequency count, the cap join, and BOTH self-
    # join sides — uncached it re-evaluates four times (measured 8.6 s
    # vs ~1.5 s warm at sf0.1). persist() over localCheckpoint on
    # purpose: the default MEMORY_AND_DISK level spills rather than
    # recomputes under pressure, AND the CacheManager's plan matching
    # lets repeated invocations (bench passes, retried jobs) reuse the
    # materialized fingerprints — localCheckpoint re-materializes every
    # call (measured 4-5 s/run vs 1.2-1.5 s warm). CAVEAT of that
    # trade, explicit: nothing here ever unpersists, so a long-lived
    # session sweeping DIFFERENT inputs/parameters accumulates one
    # corpus-scale cache entry per distinct plan until LRU eviction —
    # such callers should spark.catalog.clearCache() between corpora.
    fps = winnow_fingerprints(
        df, text_col, id_col, k=k, window=window
    ).persist()
    if max_fp_freq is not None:
        fps = _cap_block_freq(fps, ["fp"], max_fp_freq)
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    threshold: float = 0.8,
    max_doc_freq: int | None = 100,
) -> DataFrame:
    """Near-CONTAINMENT pairs: documents whose smaller shingle set is
    mostly inside the other's — ``|A∩B| / min(|A|, |B|) >= threshold``.

    The asymmetric complement to :func:`ngram_jaccard_pairs`: a short
    document quoted whole inside a long one has tiny Jaccard (the
    union is dominated by the long side) but containment ≈ 1 — the
    quotation / subset-duplication / article-plus-boilerplate case
    Jaccard structurally cannot see. Broder's containment coefficient,
    computed over the same capped distinct-shingle universe as the
    Jaccard operator (set sizes and intersections agree with each
    other and with the oracle).

    Output: ``(id_a, id_b, n_common, size_a, size_b, containment)``
    with ``id_a < id_b`` and containment rounded to 6 dp (threshold
    applied to the UNROUNDED ratio, same convention as Jaccard/cosine).
    Identical scale shape to the Jaccard path: one capped shingle
    self-join + one count aggregation + two size joins left to AQE.
    """
    sh = _distinct_shingles(df, text_col, id_col, n, max_doc_freq).persist()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    ratio = F.col("n_common") / F.least(F.col("size_a"), F.col("size_b"))
    result = (
        inter.join(
            sizes.withColumnsRenamed({"id": "id_a", "n_shingles": "size_a"}),
            "id_a",
        )
        .join(
            sizes.withColumnsRenamed({"id": "id_b", "n_shingles": "size_b"}),
            "id_b",
        )
        .filter(ratio >= threshold)
        .select(
            "id_a",
            "id_b",
            "n_common",
            "size_a",
            "size_b",
            qdec(ratio).alias("containment"),
        )
    )
    # same release contract as every sibling blocker: the corpus-scale
    # shingle cache must not outlive the returned frame
    return _materialize_release(result, sh)
