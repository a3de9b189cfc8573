"""Extension-tier operator semantics: dedup families + similarity search."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.dedup import (
    drop_exact_duplicates,
    exact_dedup_groups,
    hamming64,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from cassandra_slow_queries_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)

DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_A2 = "the quick brown fox jumps over the lazy dog again and again tonight"
DOC_B = "completely different content about spark engines and shuffle plans here"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, DOC_A), (1, DOC_A2), (2, DOC_B), (3, DOC_A)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = {r.h: r for r in exact_dedup_groups(docs, "text", "doc_id").collect()}
    dups = [g for g in groups.values() if g.n_dups > 1]
    assert len(dups) == 1 and dups[0].keeper == 0 and dups[0].n_dups == 2
    kept = drop_exact_duplicates(docs, "text", "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [0, 1, 2]


def test_minhash_estimates_jaccard(spark, docs):
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=64, bands=32, shingle_n=3
        ).collect()
    }
    # identical docs: estimate 1.0
    assert pairs[(0, 3)] == 1.0
    # near-identical docs collide in some band and estimate high
    assert pairs[(0, 1)] > 0.5
    # unrelated docs never share a band
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_minhash_signature_deterministic(spark, docs):
    sig = docs.select(minhash_signature("text", 16, 3).alias("s"))
    a, b = sig.collect(), sig.collect()
    assert [r.s for r in a] == [r.s for r in b]


def test_ngram_jaccard_exact_values(spark, docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=0.0
        ).collect()
    }
    assert pairs[(0, 3)] == 1.0
    # A vs A2: 13 tokens, 11 3-shingles each, 10 shared → 10/12
    assert pairs[(0, 1)] == round(10 / 12, 6)


def test_simhash_identity_and_distance(spark, docs):
    fp = docs.select("doc_id", simhash("text").alias("fp")).collect()
    by_id = {r.doc_id: r.fp for r in fp}
    assert by_id[0] == by_id[3]
    near = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(docs, "text", "doc_id", max_hamming=64).collect()
    }
    assert near[(0, 3)] == 0
    assert near[(0, 1)] < near.get((0, 2), 64)


def test_aggregate_paths_match_expression_paths(spark, docs):
    """The codegen'd explode+groupBy signature/fingerprint builders must
    equal the per-row expression forms exactly."""
    from cassandra_slow_queries_spark.operators.dedup import (
        minhash_signatures,
        simhash_fingerprints,
    )

    expr_sig = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", minhash_signature("text", 32, 3).alias("s")
        ).collect()
    }
    agg_sig = {
        r.id: r.sig
        for r in minhash_signatures(docs, "text", "doc_id", 32, 3).collect()
    }
    assert agg_sig == {k: v for k, v in expr_sig.items() if v is not None}

    expr_fp = {
        r.doc_id: r.f
        for r in docs.select("doc_id", simhash("text").alias("f")).collect()
    }
    agg_fp = {
        r.id: r.fp for r in simhash_fingerprints(docs, "text", "doc_id").collect()
    }
    assert agg_fp == expr_fp

    empty = spark.createDataFrame([(9, ""), (10, None)], "doc_id long, text string")
    fps = {r.id: r.fp for r in simhash_fingerprints(empty, "text", "doc_id").collect()}
    assert fps == {9: 0, 10: 0}


def test_hamming64(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    [out] = df.select(hamming64("a", "b").alias("h")).collect()
    assert out.h == 2


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
        (4, [0.7, 0.7, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bruteforce_topk_ordering(spark, vectors):
    out = cosine_topk_bruteforce(
        vectors, vectors.filter(F.col("vec_id") == 0), k=3
    ).collect()
    assert [r.neighbor_id for r in out] == [1, 4, 2]
    assert out[0].sim > out[1].sim > out[2].sim


def test_lsh_topk_subset_of_exact(spark, vectors):
    exact = {
        (r.q_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(
            vectors, vectors.filter(F.col("vec_id") == 0), k=4
        ).collect()
    }
    approx = cosine_topk_lsh(
        vectors,
        vectors.filter(F.col("vec_id") == 0),
        k=4,
        dim=3,
        n_planes=2,
        n_tables=4,
    ).collect()
    assert len(approx) > 0
    assert {(r.q_id, r.neighbor_id) for r in approx} <= exact | {
        (0, 3)
    }  # LSH may surface the antipode candidate; sims still exact
    for r in approx:
        assert r.sim is not None


SF_SMALL = "/root/testdata/sf0.001"
_HAVE_TESTDATA = __import__("os").path.isdir(SF_SMALL)
needs_testdata = pytest.mark.skipif(
    not _HAVE_TESTDATA, reason="driver testdata not present"
)


@needs_testdata
def test_ann_recall_gate_on_testdata(spark):
    """Quality gate for the approximate ANN path: multiprobe LSH with the
    catalog config must reach recall@5 ≥ 0.9 vs exact brute force on the
    seeded embeddings. These embeddings are isotropic (top-5 cosine
    ≈0.3-0.4 — no cluster structure), the hardest case for sign-pattern
    LSH; this gate is what catches silent degeneration like the round-1
    dim-mismatch bug (every bucket identical → plausible rows, recall
    garbage)."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.q_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(emb, qs, k=5).collect()
    }
    lsh = {
        (r.q_id, r.neighbor_id)
        for r in cosine_topk_lsh(
            emb, qs, k=5, dim=64, n_planes=6, n_tables=12, multiprobe=1
        ).collect()
    }
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"recall@5 {recall:.3f} < 0.9"


@needs_testdata
def test_minhash_estimate_accuracy_on_testdata(spark):
    """est_jaccard from 32-hash signatures must track exact capped-universe
    Jaccard on the seeded near-dup pairs (they sit at ≈0.99/1.0, where the
    binomial std of a 32-hash estimate is tiny)."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=32, bands=16, shingle_n=3
        ).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=0.5, max_doc_freq=100
        ).collect()
    }
    assert exact, "seeded corpus must contain near-dup pairs"
    errs = [abs(est[p] - exact[p]) for p in exact if p in est]
    # every true pair must be a candidate, and estimates must be close
    assert len(errs) == len(exact)
    assert max(errs) <= 0.25 and sum(errs) / len(errs) <= 0.1


@needs_testdata
def test_verified_blocking_equals_exact_on_testdata(spark):
    """The blocking+verify pipelines (MinHash-LSH and SimHash) must equal
    the exact all-pairs Jaccard result above the threshold — recall 1.0
    through the blocker. This is the equality the catalog oracle gates."""
    from cassandra_slow_queries_spark.operators.dedup import (
        verified_near_dup_pairs,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")

    def pairs(df):
        return {(r.id_a, r.id_b): r.jaccard for r in df.collect()}

    # uncapped universe on both sides — mirrors the catalog entry (the
    # candidate-restricted verify path only activates with cap=None)
    exact3 = pairs(
        ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=0.5, max_doc_freq=None
        )
    )
    mh = pairs(
        verified_near_dup_pairs(
            docs,
            minhash_lsh_pairs(
                docs, "text", "doc_id", num_hashes=32, bands=16, shingle_n=3
            ),
            "text",
            "doc_id",
            n=3,
            threshold=0.5,
            max_doc_freq=None,
        )
    )
    assert mh == exact3


@needs_testdata
def test_simhash_blocking_recall_on_testdata(spark):
    """SimHash blocking recall ≥0.9 against exact 4-gram ground truth.

    NOT an equality gate: simhash bit thresholds are unstable for short
    tiny-vocab docs (a true pair at Jaccard 0.875 measured Hamming 31 —
    per-bit sums sit at the 0 boundary), so a couple of seeded pairs
    legitimately escape Hamming≤8. Also bounds the candidate set (≤5% of
    all pairs) so all-pairs degeneration can't fake recall."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", n=4, threshold=0.5
        ).collect()
    }
    cand = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(
            docs, "text", "doc_id", max_hamming=8
        ).collect()
    }
    n_docs = docs.count()
    assert exact
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.9, f"blocking recall {recall:.3f} < 0.9"
    assert len(cand) <= 0.05 * n_docs * (n_docs - 1) / 2


@needs_testdata
def test_embedding_near_dup_blocked_recall(spark):
    """LSH-blocked embedding near-dup vs the exact operator: blocked
    output must be a SUBSET with identical similarity values (the verify
    step is exact), recall ≥ 0.9 at threshold 0.4 even on these
    isotropic embeddings, and the candidate work must stay below the
    full pair space (blocking does something)."""
    from cassandra_slow_queries_spark.operators.similarity import (
        cosine_near_dup_pairs_blocked,
        cosine_near_dup_pairs_exact,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in cosine_near_dup_pairs_exact(emb, threshold=0.4).collect()
    }
    blocked = {
        (r.id_a, r.id_b): r.cos_sim
        for r in cosine_near_dup_pairs_blocked(emb, threshold=0.4).collect()
    }
    assert exact, "seeded embeddings must contain near-dup pairs at 0.4"
    assert set(blocked) <= set(exact)
    for p, v in blocked.items():
        assert v == exact[p]
    recall = len(blocked) / len(exact)
    assert recall >= 0.9, f"blocked recall {recall:.3f} < 0.9"


def test_multimodal_fake_features(spark):
    from cassandra_slow_queries_spark.operators.multimodal import (
        FEATURE_DIM,
        attach_binary_metadata,
        extract_features,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "")], "media_id long, text string"
    ).select("media_id", F.encode("text", "UTF-8").alias("content"))
    meta = attach_binary_metadata(df).collect()
    assert {r.media_id: r.n_bytes for r in meta} == {1: 11, 2: 0}
    feats = extract_features(df).collect()
    assert all(len(r.features) == FEATURE_DIM for r in feats)
    again = extract_features(df).collect()
    assert [r.features for r in feats] == [r.features for r in again]


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="Pillow installed: real tier active")
def test_multimodal_real_decoder_clear_error_without_pil(spark):
    """Without Pillow, decoder='real' fails at first batch with an
    actionable message naming the missing dependency — not a bare
    ImportError from executor depths."""
    from cassandra_slow_queries_spark.operators.multimodal import extract_features

    df = spark.createDataFrame([(1, b"\x00")], "media_id long, content binary")
    with pytest.raises(Exception, match="NotImplementedError|Pillow"):
        extract_features(df, decoder="real").collect()


def test_multimodal_real_decoder_with_pil(spark):
    """Where Pillow IS importable, decoder='real' genuinely decodes:
    a solid 8x8 PNG featurizes to FEATURE_DIM constant values and
    resizes to exactly width*height grayscale bytes.

    PINNED PERMANENT SKIP in this environment (r12 verdict item 6):
    Pillow is not installed and the container forbids pip/apt installs,
    so this is the suite's expected 1 perpetual skip. The sibling test
    above covers the no-Pillow contract (clear actionable error); the
    stub-decoder tier (deterministic fake, content-addressed) carries
    the oracle-gated coverage. If a future environment ships Pillow,
    this test activates and the sibling skips — no code change needed."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from cassandra_slow_queries_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        resize_media,
    )

    buf = io.BytesIO()
    PIL_Image.new("RGB", (8, 8), color=(200, 200, 200)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [(1, png)], "media_id long, content binary"
    )
    [feat] = extract_features(df, decoder="real").collect()
    assert len(feat.features) == FEATURE_DIM
    # solid image → every thumbnail pixel identical, in [0, 1]
    assert len(set(feat.features)) == 1 and 0.0 <= feat.features[0] <= 1.0
    [rs] = resize_media(df, 4, 2, decoder="real").collect()
    assert len(rs.content) == 8 and rs.n_bytes == 8


# ---------------------------------------------------------------------------
# Connected-components clustering
# ---------------------------------------------------------------------------


def test_connected_components_chain_and_islands(spark):
    """A path graph 1-2-3-4 (diameter 3 → needs >1 propagation round),
    a separate island (10, 11), and an untouched vertex universe."""
    from cassandra_slow_queries_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(2, 3), (1, 2), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_empty_edges(spark):
    from cassandra_slow_queries_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).count() == 0


def test_connected_components_nonconvergence_raises(spark):
    """A 30-node path graph cannot converge in 5 min-propagation rounds;
    the loop must raise instead of returning partially-propagated (and
    therefore wrong) labels."""
    from cassandra_slow_queries_spark.operators.dedup import (
        ConvergenceError,
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with pytest.raises(ConvergenceError, match="did not converge in 5"):
        connected_components(edges, max_iter=5)
    # with enough rounds the same graph resolves to one component
    got = connected_components(edges, max_iter=31).collect()
    assert {r["comp"] for r in got} == {0}


def test_simhash_degenerate_blocks_capped(spark):
    """1k identical docs + empty docs: blocking must stay bounded.

    Identical content collapses to one fingerprint → all four quarter
    blocks go hot → the block cap drops them (exact dedup's job);
    token-less docs (fingerprint 0) are excluded from blocking outright.
    Real near-dup pairs in the same corpus must still surface."""
    from cassandra_slow_queries_spark.operators.dedup import simhash_near_pairs

    rows = (
        [(i, "identical boilerplate page content here") for i in range(1000)]
        + [(2000, ""), (2001, "   "), (2002, "")]
        + [(3000, DOC_A), (3001, DOC_A2)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from pyspark.sql import Observation

    obs = Observation("hot-blocks")
    pairs = simhash_near_pairs(
        df, "text", "doc_id", max_hamming=8, max_block_freq=100,
        observation=obs,
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # bounded: no quadratic fan-out from the 1000-doc identical class
    # (499500 pairs) nor the empty docs — only the true near-dup pair
    assert got == {(3000, 3001)}
    # the recall loss is observable: the 1000-doc class floods all four
    # quarter blocks, each dropped and counted (4000 blocking rows)
    metrics = obs.get
    assert metrics["n_hot_blocks"] == 4
    assert metrics["rows_in_hot_blocks"] == 4000
    assert metrics["max_block_freq_seen"] == 1000
    # cap is OPT-IN: by default the identical class floods through (the
    # quadratic shape the cap exists to prevent; pins both the default
    # and that the cap is load-bearing when enabled)
    flood = simhash_near_pairs(
        df.filter("doc_id < 50 or doc_id >= 3000"),
        "text",
        "doc_id",
        max_hamming=8,
    )
    assert flood.count() == 50 * 49 // 2 + 1


def test_minhash_degenerate_bands_capped(spark):
    """Same guard on the MinHash band buckets: an identical-signature
    class larger than max_block_freq must not reach the self-join."""
    rows = [(i, "identical boilerplate page content here") for i in range(300)] + [
        (3000, DOC_A),
        (3001, DOC_A2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(
        df, "text", "doc_id", num_hashes=64, bands=32, shingle_n=3,
        max_block_freq=100,
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert got == {(3000, 3001)}


_TEMPLATE = (
    "breaking news article template header navigation sidebar footer "
    "copyright notice subscribe button share widget related stories "
    "advertising block comment section terms of service privacy policy"
)


@pytest.fixture(scope="module")
def oversized_near_dup_corpus(spark):
    """300 GENUINE near-dups (templated pages, per-doc mutation — NOT
    byte-identical, so exact dedup cannot catch them) + a control pair."""
    rows = [
        (i, f"{_TEMPLATE} story number {i} about topic {i % 7}")
        for i in range(300)
    ] + [(1000, DOC_A), (1001, DOC_A2)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _cluster_coverage(pairs) -> set[int]:
    covered = set()
    for r in pairs:
        covered.add(r.id_a)
        covered.add(r.id_b)
    return {i for i in covered if i < 300}


def test_hot_block_sample_policy_reconnects_oversized_cluster_minhash(
    spark, oversized_near_dup_corpus
):
    """The "drop" blind spot (ADVICE r5): a near-dup cluster larger than
    max_block_freq loses members because every block its members share is
    corpus-hot. "sample" reroutes hot blocks into member×representative
    stars — every member stays covered, clustering recovers ONE component,
    and the pair count stays far below the quadratic fan-out."""
    from cassandra_slow_queries_spark.operators.dedup import assign_clusters

    kw = dict(num_hashes=64, bands=16, shingle_n=3, max_block_freq=50)
    dropped = minhash_lsh_pairs(
        oversized_near_dup_corpus, "text", "doc_id",
        hot_block_policy="drop", **kw,
    ).collect()
    sampled_df = minhash_lsh_pairs(
        oversized_near_dup_corpus, "text", "doc_id",
        hot_block_policy="sample", **kw,
    )
    sampled = sampled_df.collect()
    # drop demonstrably loses cluster members (the blind spot)...
    assert len(_cluster_coverage(dropped)) < 300
    # ...sample covers every member
    assert len(_cluster_coverage(sampled)) == 300
    # star pairs are bounded: far below the 300*299/2 quadratic fan-out
    assert len(sampled) < 300 * 299 // 2 // 2
    # and the cluster comes back as a single connected component
    cl = assign_clusters(
        oversized_near_dup_corpus, sampled_df.select("id_a", "id_b"), "doc_id"
    )
    sizes = {
        r["cluster_id"]: r["n"]
        for r in cl.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    assert sizes[0] == 300  # min-id representative roots the component
    # control near-dup pair outside the hot cluster still found
    assert any(r.id_a == 1000 and r.id_b == 1001 for r in sampled)


def test_hot_block_sample_policy_reconnects_oversized_cluster_simhash(
    spark, oversized_near_dup_corpus
):
    kw = dict(max_hamming=8, max_block_freq=50)
    dropped = simhash_near_pairs(
        oversized_near_dup_corpus, "text", "doc_id",
        hot_block_policy="drop", **kw,
    ).collect()
    sampled = simhash_near_pairs(
        oversized_near_dup_corpus, "text", "doc_id",
        hot_block_policy="sample", **kw,
    ).collect()
    assert len(_cluster_coverage(dropped)) < 300
    assert len(_cluster_coverage(sampled)) == 300
    assert len(sampled) < 300 * 299 // 2 // 2
    # sample pairs are a superset of drop pairs (cold blocks unchanged)
    assert {(r.id_a, r.id_b) for r in dropped} <= {
        (r.id_a, r.id_b) for r in sampled
    }


def test_block_candidate_pairs_sample_mechanics(spark):
    """Hand-built blocking frame: one hot block (10 ids, cap 3) and one
    cold block (3 ids). Cold self-joins fully; hot emits only ordered
    member×representative pairs that all include a representative, and
    every hot member is covered."""
    from cassandra_slow_queries_spark.operators.dedup import (
        _block_candidate_pairs,
    )

    rows = [(i, 0, 7) for i in range(10)] + [(i, 1, 9) for i in (100, 101, 102)]
    blocked = spark.createDataFrame(rows, "id long, band int, bh long")
    pairs = {
        (r.id_a, r.id_b)
        for r in _block_candidate_pairs(
            blocked, ["band", "bh"], max_block_freq=3,
            hot_block_policy="sample", num_representatives=2,
        ).collect()
    }
    cold_expected = {(100, 101), (100, 102), (101, 102)}
    assert cold_expected <= pairs
    hot_pairs = pairs - cold_expected
    # every pair well-ordered; every hot member covered; bounded fan-out
    assert all(a < b for a, b in hot_pairs)
    covered = {x for p in hot_pairs for x in p}
    assert covered == set(range(10))
    # reps = min-id (0) plus expected ~2 hash-sampled: star, not clique
    reps = {a for a, _ in hot_pairs} & set(range(10))
    assert 0 in {min(p) for p in hot_pairs}  # min-id rep present
    assert len(hot_pairs) <= 10 * 4  # << 45-pair clique only for tiny caps,
    # but must stay strictly below the full self-join
    assert len(hot_pairs) < 45

    with pytest.raises(ValueError):
        _block_candidate_pairs(
            blocked, ["band", "bh"], max_block_freq=3,
            hot_block_policy="nonsense",
        )


def test_strip_duplicate_spans_paragraph_mode(spark):
    """Separator-paragraph mode: a license-header paragraph shared by
    two docs is stripped from both; unique paragraphs survive in order;
    a doc made ENTIRELY of boilerplate survives with empty clean_text."""
    from cassandra_slow_queries_spark.operators.dedup import (
        corpus_hot_spans,
        split_spans,
        strip_duplicate_spans,
    )

    boiler = "licensed under apache two"
    rows = [
        (0, f"{boiler}\n\nunique body alpha\n\nunique tail alpha"),
        (1, f"{boiler}\n\nunique body beta"),
        (2, boiler),
        (3, "no boilerplate here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = split_spans(df, "text", "doc_id", sep="\n\n")
    hot = corpus_hot_spans(spans, min_dup_docs=2)
    assert {r.span for r in hot.collect()} == {boiler}
    out = {
        r.id: (r.n_spans, r.n_dup_spans, r.clean_text)
        for r in strip_duplicate_spans(spans, hot, joiner="\n\n").collect()
    }
    assert out[0] == (3, 1, "unique body alpha\n\nunique tail alpha")
    assert out[1] == (2, 1, "unique body beta")
    assert out[2] == (1, 1, "")  # all-boilerplate doc NOT silently lost
    assert out[3] == (1, 0, "no boilerplate here at all")


def test_word_chunk_spans_shapes(spark):
    """Chunking: last chunk may be short; empty text yields one empty
    span (split semantics); reconstruction is order-exact."""
    from cassandra_slow_queries_spark.operators.dedup import word_chunk_spans

    df = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, "")], "doc_id long, text string"
    )
    rows = sorted(
        (r.id, r.pos, r.span)
        for r in word_chunk_spans(df, "text", "doc_id", chunk_words=3).collect()
    )
    assert rows == [
        (0, 0, "a b c"),
        (0, 1, "d e f"),
        (0, 2, "g"),
        (1, 0, ""),
    ]


def test_assign_clusters_singletons_and_keepers(spark, docs):
    from cassandra_slow_queries_spark.operators.dedup import (
        assign_clusters,
        keep_cluster_representatives,
    )

    pairs = spark.createDataFrame([(0, 1), (1, 3)], "id_a long, id_b long")
    out = assign_clusters(docs, pairs, "doc_id")
    rows = {r["doc_id"]: (r["cluster_id"], r["is_keeper"]) for r in out.collect()}
    assert rows[0] == (0, True)
    assert rows[1] == (0, False)
    assert rows[3] == (0, False)
    # untouched docs are their own singleton cluster
    assert rows[2] == (2, True)
    kept = keep_cluster_representatives(docs, pairs, "doc_id")
    assert set(kept.columns) == set(docs.columns)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert kept_ids == {0, 2}


def test_bpe_token_count_basics(spark):
    from cassandra_slow_queries_spark.functions.text import bpe_token_count

    df = spark.createDataFrame(
        [
            (1, "hello world"),          # 2 word tokens
            (2, "don't stop"),           # don + 't + stop
            (3, "abc123 x-y"),           # abc + 123 + x + - + y
            (4, ""),                     # no tokens
            (5, "   "),                  # whitespace only
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", bpe_token_count("text").alias("n")).collect()
    }
    assert got == {1: 2, 2: 3, 3: 5, 4: 0, 5: 0}


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------


def _clustered_vectors(spark, dim=8, per_cluster=20):
    """Three tight clusters around orthogonal axes — the geometry IVF is
    built for (near neighbors share a cell)."""
    rows = []
    vid = 0
    for axis in (0, 3, 6):
        for j in range(per_cluster):
            v = [0.0] * dim
            v[axis] = 1.0
            v[(axis + 1) % dim] = 0.01 * (j % 5)  # tiny deterministic jitter
            rows.append((vid, axis, v))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<float>"
    )


def test_ivf_recall_perfect_on_clustered_data(spark):
    from cassandra_slow_queries_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    vecs = _clustered_vectors(spark)
    queries = vecs.filter("vec_id IN (0, 20, 40)")
    exact = cosine_topk_bruteforce(vecs, queries, k=5, dim=None).select(
        "q_id", "neighbor_id"
    )
    approx = cosine_topk_ivf(
        vecs, queries, k=5, dim=8, n_centroids=3, n_probe=1, refine_iters=2
    ).select("q_id", "neighbor_id")
    exact_set = {(r["q_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_set = {(r["q_id"], r["neighbor_id"]) for r in approx.collect()}
    assert exact_set == approx_set  # recall 1.0 with a single probed cell


def test_ivf_cells_partition_clusters(spark):
    """After Lloyd refinement each true cluster maps to exactly one cell."""
    from pyspark.sql import functions as F

    from cassandra_slow_queries_spark.operators.similarity import (
        ivf_cell_udf,
        train_ivf_centroids,
    )

    vecs = _clustered_vectors(spark)
    cents = train_ivf_centroids(vecs, n_centroids=3, dim=8, refine_iters=2)
    assign = ivf_cell_udf(cents, n_probe=1)
    rows = vecs.select(
        "cluster", assign(F.col("embedding"))[0].alias("cell")
    ).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], set()).add(r["cell"])
    assert all(len(cells) == 1 for cells in by_cluster.values())
    assert len({c for s in by_cluster.values() for c in s}) == 3


def test_ivf_deterministic(spark):
    from cassandra_slow_queries_spark.operators.similarity import (
        cosine_topk_ivf,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id < 3")
    a = cosine_topk_ivf(emb, queries, k=5, n_centroids=8, n_probe=2).collect()
    b = cosine_topk_ivf(emb, queries, k=5, n_centroids=8, n_probe=2).collect()
    assert a == b


def test_ivf_precomputed_cells_match_default_path(spark):
    # r13 opt: a caller holding the materialized (id, cell) index passes
    # it via ``cells`` — the search must equal the internally-assigned
    # path row for row
    from pyspark.sql import functions as F

    from cassandra_slow_queries_spark.operators.similarity import (
        cosine_topk_ivf,
        ivf_cell_udf,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id < 3")
    cents = train_ivf_centroids(emb, n_centroids=8, refine_iters=1)
    assign = ivf_cell_udf(cents, n_probe=1)
    cells = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        assign(F.col("embedding"))[0].alias("cell"),
    )
    via_cells = cosine_topk_ivf(
        emb, queries, k=5, n_centroids=8, n_probe=2, centroids=cents,
        cells=cells,
    ).collect()
    default = cosine_topk_ivf(
        emb, queries, k=5, n_centroids=8, n_probe=2, centroids=cents
    ).collect()
    assert via_cells == default


def test_pq_adc_scores_match_numpy(spark):
    """The JVM-side ADC gather (zip_with codes/LUT + aggregate sum)
    reproduces the numpy LUT computation exactly: for each (query,
    corpus) pair, approx == Σ_s books[s][code_s]·q_sub[s] on unit
    vectors."""
    import numpy as np
    from pyspark.sql import functions as F

    from cassandra_slow_queries_spark.operators.similarity import (
        cosine_topk_pq,
        pq_encode,
        train_pq_codebooks,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter("vec_id < 60")
        .select("vec_id", "embedding")
    )
    books = train_pq_codebooks(emb, m=8, k=8, iters=1)
    enc = {r["vec_id"]: r["codes"] for r in pq_encode(emb, books).collect()}
    data = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    mats = [np.array(b) for b in books]
    dsub = 64 // 8
    # full PQ path with candidate depth >= corpus: candidates must be the
    # exact ADC ranking, so the re-ranked top-5 == exact top-5 among them
    out = cosine_topk_pq(
        emb,
        emb.filter("vec_id < 2"),
        k=5,
        m=8,
        n_codes=8,
        codebooks=books,
        n_candidates=100,
    )
    assert out.count() == 10  # 2 queries × top-5
    # spot-check the encoder against numpy argmin L2 per subspace
    for vid in (0, 17, 42):
        v = data[vid] / np.linalg.norm(data[vid])
        for s in range(8):
            sub = v[s * dsub : (s + 1) * dsub]
            want = int(((mats[s] - sub) ** 2).sum(axis=1).argmin())
            assert enc[vid][s] == want, (vid, s)


def test_pq_recall_high_on_clustered_data(spark):
    """On clustered geometry (the real use case) PQ with exact re-rank
    recovers the brute-force top-k."""
    from cassandra_slow_queries_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_pq,
    )

    vecs = _clustered_vectors(spark)
    queries = vecs.filter("vec_id IN (0, 20, 40)")
    exact = cosine_topk_bruteforce(vecs, queries, k=5, dim=None).select(
        "q_id", "neighbor_id"
    )
    approx = cosine_topk_pq(
        vecs, queries, k=5, dim=8, m=4, n_codes=8, n_candidates=20
    ).select("q_id", "neighbor_id")
    e = {(r["q_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.9


def test_pq_encode_compression_contract(spark):
    """The materialized index is m ints per vector — the compressed
    representation PQ exists for — and encoding is deterministic."""
    from cassandra_slow_queries_spark.operators.similarity import (
        pq_encode,
        train_pq_codebooks,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter("vec_id < 50")
        .select("vec_id", "embedding")
    )
    books = train_pq_codebooks(emb, m=16, k=8, iters=1)
    a = pq_encode(emb, books).collect()
    b = pq_encode(emb, books).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    assert all(len(r["codes"]) == 16 for r in a)
    assert all(0 <= c < 8 for r in a for c in r["codes"])


def test_semantic_dedup_matches_brute_force_rule(spark):
    """semantic_dedup == the SemDeDup removal rule computed by numpy
    brute force GIVEN the returned cell assignment: removed iff cosine
    ≥ threshold to some lower-id member of the same cell."""
    import numpy as np
    from pyspark.sql import functions as F

    from cassandra_slow_queries_spark.operators.similarity import semantic_dedup

    vecs = _clustered_vectors(spark)  # three tight orthogonal clusters
    out = semantic_dedup(
        vecs, threshold=0.9999, n_clusters=3, dim=8, refine_iters=2
    )
    rows = {r["vec_id"]: (r["cell"], r["removed"]) for r in out.collect()}
    assert len(rows) == 60  # one verdict per doc
    data = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in vecs.collect()
    }
    for vid, (cell, removed) in rows.items():
        mates = [
            o
            for o, (c, _) in rows.items()
            if c == cell and o < vid
        ]
        v = data[vid]
        expect = any(
            float(v @ data[o])
            / (np.linalg.norm(v) * np.linalg.norm(data[o]))
            >= 0.9999
            for o in mates
        )
        assert removed == expect, vid
    # the clustered fixture genuinely removes within-cluster duplicates
    # (jitter repeats every 5 ids → exact duplicates exist)
    assert any(removed for _, removed in rows.values())
    assert any(not removed for _, removed in rows.values())


def test_semantic_dedup_keeps_exact_copies_out(spark):
    """Planted exact copies are always removed, originals kept — the
    invariant the dedup_semantic catalog entry hash-gates at 1000 rows."""
    from pyspark.sql import functions as F

    from cassandra_slow_queries_spark.operators.similarity import semantic_dedup

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter("vec_id < 100")
        .select("vec_id", "embedding")
    )
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    )
    out = semantic_dedup(corpus, threshold=0.999, n_clusters=4)
    verdicts = {r["vec_id"]: r["removed"] for r in out.collect()}
    assert all(not verdicts[i] for i in verdicts if i < 1000)
    assert all(verdicts[i] for i in verdicts if i >= 1000)


def test_resize_media_contract(spark):
    """Resize stub: one row per input, content exactly w*h bytes,
    deterministic and content-dependent; real decoder raises."""
    from cassandra_slow_queries_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [(0, b"abcdef"), (1, b"Z"), (2, b""), (3, b"abcdef"), (4, None)],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in resize_media(df, 8, 4).collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert len(r.content) == 32 and r.n_bytes == 32
    # tiling is content-dependent + deterministic
    assert bytes(rows[0].content) == bytes(rows[3].content)
    assert bytes(rows[0].content) != bytes(rows[1].content)
    assert bytes(rows[0].content) == (b"abcdef" * 6)[:32]
    assert bytes(rows[2].content) == b"\x00" * 32
    # NULL payload tiles like empty — no executor TypeError
    assert bytes(rows[4].content) == b"\x00" * 32

    if not _pil_available():
        with pytest.raises(Exception, match="NotImplementedError|Pillow"):
            resize_media(df, 2, 2, decoder="real").collect()


def test_frame_sample_plan_indices(spark):
    from cassandra_slow_queries_spark.operators.multimodal import (
        FEATURE_DIM,
        frame_sample_plan,
    )

    df = spark.createDataFrame([(0, "x" * 200)], "media_id long, text string")
    [row] = frame_sample_plan(df, every_n=7).collect()
    assert row.sample_frames == list(range(0, 7 * FEATURE_DIM, 7))


def test_star_cc_matches_propagation_and_handles_deep_graphs(spark):
    """large-star/small-star contraction: same labels as propagation on
    shallow graphs, and converges in O(log n) rounds on a path graph
    deep enough that propagation raises."""
    from cassandra_slow_queries_spark.operators.dedup import (
        ConvergenceError,
        connected_components,
        connected_components_star,
    )

    # shallow mixed graph: triangle + chain + island + 2-cycle edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (5, 6), (6, 7), (10, 11), (20, 21), (21, 20)],
        "id_a long, id_b long",
    )
    prop = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    star = {r["id"]: r["comp"] for r in connected_components_star(edges).collect()}
    assert star == prop == {
        1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 5, 10: 10, 11: 10, 20: 20, 21: 20
    }

    # 120-hop path: propagation at max_iter=10 raises; star contraction
    # resolves it in <= 10 alternations (log2(120) ~ 7)
    deep = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "id_a long, id_b long"
    )
    with pytest.raises(ConvergenceError):
        connected_components(deep, max_iter=10)
    got = connected_components_star(deep, max_rounds=10).collect()
    assert len(got) == 121 and {r["comp"] for r in got} == {0}

    # empty edge frame
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components_star(empty).count() == 0


def test_assign_clusters_auto_falls_back_to_star(spark, docs):
    """algorithm="auto": propagation's ConvergenceError on a deep path
    graph transparently retries with star contraction instead of
    failing the pipeline (round-5 verdict item 8)."""
    from cassandra_slow_queries_spark.operators.dedup import assign_clusters

    # a 500-hop path: diameter far beyond propagation's 25-round budget
    deep = spark.createDataFrame(
        [(i, i + 1) for i in range(500)], "id_a long, id_b long"
    )
    members = spark.range(0, 501).withColumnRenamed("id", "doc_id")
    out = assign_clusters(members, deep, "doc_id", algorithm="auto")
    rows = out.collect()
    assert len(rows) == 501
    assert all(r["cluster_id"] == 0 for r in rows)
    assert sum(r["is_keeper"] for r in rows) == 1
    # shallow graphs stay on the cheap propagation path and agree
    pairs = spark.createDataFrame([(0, 1), (1, 3)], "id_a long, id_b long")
    auto = assign_clusters(docs, pairs, "doc_id", algorithm="auto")
    prop = assign_clusters(docs, pairs, "doc_id", algorithm="propagation")
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, prop.collect()))


def test_as_of_join_semantics(spark):
    """Union+window as-of join: at-or-before matching, same-instant
    quote visible, NULL before the first quote, probe payload carried."""
    from cassandra_slow_queries_spark.operators.asof import as_of_join

    quotes = spark.createDataFrame(
        [("a", 10, 100), ("a", 20, 200), ("b", 15, 900)],
        "k string, ts long, state long",
    )
    probe = spark.createDataFrame(
        [
            ("a", 5, 1),    # before any quote → NULL
            ("a", 10, 2),   # same instant → sees 100
            ("a", 19, 3),   # between → sees 100
            ("a", 25, 4),   # after both → sees 200
            ("b", 30, 5),
            ("c", 7, 6),    # key with no quotes at all → NULL
        ],
        "k string, ts long, payload long",
    )
    rows = {
        r.payload: (r.asof_state, r.asof_ts)
        for r in as_of_join(probe, quotes, ["k"], "ts").collect()
    }
    assert rows == {
        1: (None, None),
        2: (100, 10),
        3: (100, 10),
        4: (200, 20),
        5: (900, 15),
        6: (None, None),
    }
    # every probe row survives exactly once (left semantics)
    assert len(rows) == 6


def test_interval_join_semantics(spark):
    """Bucket-banded interval join: half-open boundaries, intervals
    wider than a bucket, empty intervals, left-join NULL survival, and
    exactly-once pair production."""
    from cassandra_slow_queries_spark.operators.rangejoin import interval_join

    intervals = spark.createDataFrame(
        [
            (1, 0, 10),     # within one bucket
            (2, 5, 200),    # spans many buckets (w=8)
            (3, 10, 10),    # empty: matches nothing
            (4, 64, 65),    # width 1, exactly a bucket boundary
        ],
        "iv_id long, lo long, hi long",
    )
    points = spark.createDataFrame(
        [(0, 0), (1, 9), (2, 10), (3, 64), (4, 199), (5, 200), (6, 500)],
        "p_id long, v long",
    )
    inner = {
        (r.p_id, r.iv_id)
        for r in interval_join(
            points, intervals, "v", bucket_width=8, spread=False
        ).collect()
    }
    assert inner == {
        (0, 1),            # 0 in [0,10)
        (1, 1), (1, 2),    # 9 in both
        (2, 2),            # 10: excluded from [0,10) (half-open), in [5,200)
        (3, 2), (3, 4),    # 64 in [5,200) and [64,65)
        (4, 2),            # 199 in [5,200)
        # 200 excluded from [5,200); 500 matches nothing
    }
    left = interval_join(
        points, intervals, "v", bucket_width=8, how="left", spread=False
    )
    rows = left.collect()
    # every inner pair once + the two unmatched points with NULLs
    assert len(rows) == len(inner) + 2
    unmatched = {r.p_id for r in rows if r.iv_id is None}
    assert unmatched == {5, 6}


def test_interval_join_exact_buckets_above_2_53(spark):
    """Bucket ids must be exact long arithmetic: double division rounds
    values above 2^53, so a point and its containing interval can land
    in DIFFERENT buckets — a silently dropped match the residual filter
    cannot recover. Also pins negative-coordinate floor semantics."""
    from cassandra_slow_queries_spark.operators.rangejoin import interval_join

    big = 1 << 60  # doubles round to multiples of 256 up here
    intervals = spark.createDataFrame(
        [(1, big + 1, big + 5), (2, big + 64, big + 80), (3, -130, -120)],
        "iv_id long, lo long, hi long",
    )
    points = spark.createDataFrame(
        [(big + 3,), (big + 70,), (big + 5,), (-125,), (-120,)], "v long"
    )
    got = {
        (r.v, r.iv_id)
        for r in interval_join(
            points, intervals, "v", bucket_width=64, spread=False
        ).collect()
    }
    assert got == {
        (big + 3, 1),    # would be lost to double rounding
        (big + 70, 2),
        (-125, 3),       # floor (not truncate-toward-zero) bucketing
        # big+5 excluded (half-open); -120 excluded (half-open)
    }


def test_interval_join_spread_true_matches_spread_false(spark):
    """The production-default spread path (round-robin points exchange
    ahead of the bucket join) must be a pure placement change: exactly
    the same pairs as spread=False, on a frame big and skewed enough
    that a row lost or duplicated by the repartition would show. The
    semantic call sites above all pass spread=False for speed (r11
    ADVICE), so this is the one test that keeps the default path's
    RESULTS — not just its plan shape — pinned; the r11 scale bug
    lived precisely in this path."""
    from cassandra_slow_queries_spark.operators.rangejoin import interval_join

    # 2000 points clustered hard at one value (skew the round-robin
    # must not collapse on) + a spread tail; 40 overlapping intervals
    rows = [(i, 500) for i in range(1200)] + [
        (1200 + i, i * 7 % 3000) for i in range(800)
    ]
    points = spark.createDataFrame(rows, "p_id long, v long").coalesce(1)
    intervals = spark.createDataFrame(
        [(j, j * 60, j * 60 + 150) for j in range(40)],
        "iv_id long, lo long, hi long",
    )
    fast = {
        (r.p_id, r.iv_id)
        for r in interval_join(
            points, intervals, "v", bucket_width=64, spread=False
        ).collect()
    }
    spread = {
        (r.p_id, r.iv_id)
        for r in interval_join(
            points, intervals, "v", bucket_width=64, spread=True
        ).collect()
    }
    assert len(fast) > 2000  # the hot cluster matches multiple intervals
    assert spread == fast


def test_incremental_exact_dedup(spark):
    """New-batch dedup against a persistent hash index: within-batch
    duplicates collapse to the min-id keeper, index hits drop entirely,
    and the returned index gains exactly the kept hashes."""
    from cassandra_slow_queries_spark.operators.dedup import (
        content_hash,
        incremental_exact_dedup,
    )

    history = spark.createDataFrame(
        [(0, "seen before"), (2, "also seen")], "doc_id long, text string"
    )
    index = history.select(content_hash("text").alias("h")).distinct()
    incoming = spark.createDataFrame(
        [
            (11, "brand new"),
            (13, "brand new"),     # within-batch dup → 11 wins
            (15, "seen before"),   # index hit → dropped
            (17, "also new"),
        ],
        "doc_id long, text string",
    )
    kept, new_index = incremental_exact_dedup(incoming, index, "text", "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [11, 17]
    assert new_index.count() == 4  # 2 historical + 2 kept
    # idempotence: replaying the same batch against the new index keeps 0
    kept2, _ = incremental_exact_dedup(incoming, new_index, "text", "doc_id")
    assert kept2.count() == 0


def test_simhash_pigeonhole_guarantee_hamming3(spark):
    """Quarter blocking GUARANTEES (pigeonhole over 4 x 16-bit blocks)
    that any fingerprint pair within Hamming<=3 becomes a candidate —
    the structural floor under the probabilistic Hamming<=8 recall the
    dedup_simhash gate measures (0.88-0.92 across SFs)."""
    from pyspark.sql import functions as F

    from cassandra_slow_queries_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_near_pairs,
    )

    # near-identical LONG docs: with 1000 tokens the per-bit sums are
    # large, so a 1-2 token edit flips only the few bits whose sums sit
    # near zero (measured Hamming 1-2 for this fixture)
    base = " ".join(f"tok{i}" for i in range(1000))
    rows = [
        (1, base),
        (2, base.replace("tok500 ", "tok500x ")),
        (3, base.replace("tok7 ", "zz7 ").replace("tok800 ", "zz800 ")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r["id"]: r["fp"]
        for r in simhash_fingerprints(df, "text", "doc_id").collect()
    }
    close = {
        (a, b)
        for a in fps
        for b in fps
        if a < b and bin((fps[a] ^ fps[b]) & (2**64 - 1)).count("1") <= 3
    }
    if not close:  # the construction should produce at least one
        raise AssertionError(f"fixture produced no Hamming<=3 pair: {fps}")
    cand = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            df, "text", "doc_id", max_hamming=3
        ).collect()
    }
    assert close <= cand


def _inc_minhash(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_minhash_dedup_batch_vs_history(spark):
    from pyspark.sql import functions as F

    from cassandra_slow_queries_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    base = " ".join(f"w{i}" for i in range(80))
    history = _inc_minhash(spark, [(1, base), (2, "totally different " * 20)])
    index = minhash_signatures(history, "text", "doc_id", 64, 5, 42)
    batch = _inc_minhash(
        spark,
        [
            (10, base.replace("w3 ", "w3x ")),       # near-dup of history 1
            (11, " ".join(f"u{i}" for i in range(60))),            # novel
            (12, " ".join(f"u{i}" for i in range(60)).replace(
                "u30 ", "u30x ")),                     # near-dup of 11
        ],
    )
    kept, new_index = incremental_minhash_dedup(
        batch, index, "text", "doc_id"
    )
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == {11}, kept_ids
    # index grew by exactly the kept rows
    assert new_index.count() == 2 + 1
    assert {r["id"] for r in new_index.collect()} == {1, 2, 11}


def test_incremental_minhash_dedup_idempotent(spark):
    from cassandra_slow_queries_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    docs = _inc_minhash(
        spark,
        [(i, f"unique document number {i} " * 12) for i in range(6)],
    )
    empty_index = minhash_signatures(
        docs.limit(0), "text", "doc_id", 64, 5, 42
    )
    kept1, idx1 = incremental_minhash_dedup(docs, empty_index, "text", "doc_id")
    assert kept1.count() == 6
    # replaying the SAME batch against the updated index drops everything
    kept2, idx2 = incremental_minhash_dedup(docs, idx1, "text", "doc_id")
    assert kept2.count() == 0
    assert idx2.count() == idx1.count()


def test_incremental_minhash_matches_oneshot_blocking(spark):
    """Empty index ⇒ the within-batch path must agree with the one-shot
    minhash_lsh_pairs blocker on WHICH docs survive (smaller-id keeper)."""
    from cassandra_slow_queries_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    base = " ".join(f"tok{i}" for i in range(60))
    docs = _inc_minhash(
        spark,
        [
            (1, base),
            (2, base.replace("tok7 ", "tok7x ")),
            (3, "another cluster entirely " * 10),
            (4, "another cluster entirely " * 10 + " tail"),
            (5, "solo document with its own words " * 8),
        ],
    )
    empty_index = minhash_signatures(docs.limit(0), "text", "doc_id", 64, 5, 42)
    kept, _ = incremental_minhash_dedup(docs, empty_index, "text", "doc_id")
    kept_ids = {r["doc_id"] for r in kept.collect()}
    pairs = minhash_lsh_pairs(docs, "text", "doc_id").filter(
        "est_jaccard >= 0.5"
    ).collect()
    dropped = {p["id_b"] for p in pairs}
    assert kept_ids == {1, 2, 3, 4, 5} - dropped


def test_ann_paths_tolerate_null_embeddings(spark):
    """The approximate operators must not be stricter than the exact
    ones they stand in for: a corpus with a NULL embedding row used to
    crash every Arrow UDF (np.stack on None) while the exact paths
    handled it — NULL vectors now produce NULL buckets/cells/codes and
    simply fall out of the candidate joins."""
    from cassandra_slow_queries_spark.operators.similarity import (
        bucket_ids_udf,
        ivf_cell_udf,
        pq_code_udf,
    )

    rows = [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(20)]
    rows.append((99, None))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    buckets = dict(
        df.select(
            "vec_id",
            bucket_ids_udf([[[1.0] * 8, [-1.0] * 8]])(F.col("embedding")).alias("b"),
        ).collect()
    )
    cells = dict(
        df.select(
            "vec_id",
            ivf_cell_udf([[1.0] * 8, [0.5] * 8], n_probe=1)(F.col("embedding")).alias("c"),
        ).collect()
    )
    codes = dict(
        df.select(
            "vec_id",
            pq_code_udf([[[1.0] * 4, [0.0] * 4], [[1.0] * 4, [2.0] * 4]])(
                F.col("embedding")
            ).alias("p"),
        ).collect()
    )
    for d in (buckets, cells, codes):
        assert d[99] is None
        assert all(v is not None for k, v in d.items() if k != 99)
    # an all-NULL batch also survives
    nulls = spark.createDataFrame([(1, None)], "vec_id long, embedding array<double>")
    assert nulls.select(
        bucket_ids_udf([[[1.0] * 8]])(F.col("embedding")).alias("b")
    ).collect()[0]["b"] is None


# ---------------------------------------------------------------------------
# NULL-text and literal-separator regressions (extension-session review)
# ---------------------------------------------------------------------------


def test_incremental_exact_dedup_null_text_keeps_one_keeper(spark):
    from cassandra_slow_queries_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    from cassandra_slow_queries_spark.operators.dedup import (
        NULL_TEXT_SENTINEL,
    )

    incoming = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], "doc_id long, text string"
    )
    history = spark.createDataFrame([("zz",)], "h string").filter("h != h")
    kept, new_index = incremental_exact_dedup(
        incoming, history, "text", "doc_id"
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    # NULL text follows the drop_exact_duplicates convention: one
    # group, one keeper (min id) — the old hash-keyed semi-join
    # dropped EVERY null-text row, keeper included
    assert ids == [1, 2, 4]
    # the NULL-text keeper enters the index under the reserved sentinel
    # (r10 ADVICE: with a raw NULL hash it could never enter, so every
    # later batch re-kept another NULL-text keeper)
    hashes = [r["h"] for r in new_index.collect()]
    assert all(h is not None for h in hashes)
    assert NULL_TEXT_SENTINEL in hashes
    assert new_index.count() == 3

    # cross-batch: a second batch with NULL-text rows anti-joins them
    # away against the sentinel, same as any real hash
    batch2 = spark.createDataFrame(
        [(5, None), (6, "c")], "doc_id long, text string"
    )
    kept2, index2 = incremental_exact_dedup(batch2, new_index, "text", "doc_id")
    assert sorted(r["doc_id"] for r in kept2.collect()) == [6]
    assert index2.count() == 4


def test_strip_corpus_chunks_null_text_survives(spark):
    from cassandra_slow_queries_spark.operators.dedup import (
        strip_corpus_duplicate_chunks,
    )

    df = spark.createDataFrame(
        [(1, "x y x y"), (2, "x y z q"), (3, None)],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in strip_corpus_duplicate_chunks(
        df, "text", "doc_id", chunk_words=2, min_dup_docs=2
    ).collect()}
    assert set(out) == {1, 2, 3}  # the NULL doc is not silently lost
    assert out[3]["clean_text"] == ""


def test_split_spans_sep_is_literal_not_regex(spark):
    from cassandra_slow_queries_spark.operators.dedup import split_spans

    df = spark.createDataFrame([(1, "ab. cd. ef")], "doc_id long, t string")
    spans = [r["span"] for r in split_spans(df, "t", "doc_id", sep=". ")
             .orderBy("pos").collect()]
    # a regex '.' would swallow the char before every space
    assert spans == ["ab", "cd", "ef"]


def test_tokens_sep_is_literal_not_regex(spark):
    from cassandra_slow_queries_spark.functions.text import tokens
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a||b||c",)], "t string")
    [r] = df.select(tokens("t", sep="||").alias("tk")).collect()
    assert r["tk"] == ["a", "b", "c"]


def test_lsh_bands_must_divide_num_hashes_raises(spark):
    import pytest as _pt

    from cassandra_slow_queries_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    with _pt.raises(ValueError, match="must divide"):
        minhash_lsh_pairs(df, "text", "doc_id", num_hashes=60, bands=16)


def test_incremental_minhash_shingleless_rows_kept_not_indexed(spark):
    """The documented contract for rows with no shingles (NULL text or
    too-short text): no similarity evidence -> always kept, never
    indexed. Exact-content dedup of such rows belongs to
    incremental_exact_dedup (which the pipeline runs first)."""
    from cassandra_slow_queries_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    base = " ".join(f"w{i}" for i in range(40))
    incoming = spark.createDataFrame(
        [(1, base), (2, None), (3, "too short")],
        "doc_id long, text string",
    )
    empty_index = spark.createDataFrame(
        [], "id long, sig array<long>"
    )
    kept, new_index = incremental_minhash_dedup(
        incoming, empty_index, "text", "doc_id",
        num_hashes=16, bands=4, shingle_n=5,
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 3]
    # only the signed doc enters the index
    assert [r["id"] for r in new_index.collect()] == [1]
    # a second batch of shingle-less rows is kept again (per contract)
    batch2 = spark.createDataFrame(
        [(4, None)], "doc_id long, text string"
    )
    kept2, idx2 = incremental_minhash_dedup(
        batch2, new_index, "text", "doc_id",
        num_hashes=16, bands=4, shingle_n=5,
    )
    assert [r["doc_id"] for r in kept2.collect()] == [4]
    assert idx2.count() == 1


@needs_testdata
def test_mm_suite_rows_equal_all_four_standalone_entries(spark):
    """The staged r14 consolidation contract, pinned ahead of promotion
    (the volume-top-suite precedent): every harmonized suite row must
    equal its standalone entry's output — meta/resize/features_gate on
    all columns, frames on the shared columns (the suite adds the
    window length; the digest and index must agree row-for-row)."""
    from cassandra_slow_queries_spark.plans.catalog import (
        q_mm_binary_meta,
        q_mm_fake_features,
        q_mm_frame_sample,
        q_mm_resize,
        q_mm_suite,
    )

    sf = SF_SMALL
    suite = {}
    for r in q_mm_suite(spark, sf).collect():
        suite.setdefault(r["method"], []).append(r)

    meta = q_mm_binary_meta(spark, sf).collect()
    assert sorted((r["media_id"], r["n_bytes"], r["sha256"]) for r in meta) == \
        sorted((r["media_id"], r["n_bytes"], r["sha"]) for r in suite["meta"])

    [g] = q_mm_fake_features(spark, sf).collect()
    [sg] = suite["features_gate"]
    assert (sg["media_id"], sg["n_bytes"], sg["sha"]) == (
        g["n_media"], g["total_bytes"],
        str(bool(g["dims_ok"] and g["bounds_ok"])).lower(),
    )

    frames = q_mm_frame_sample(spark, sf).collect()
    assert sorted((r["media_id"], r["frame_idx"], r["frame_sha"]) for r in frames) == \
        sorted((r["media_id"], r["k"], r["sha"]) for r in suite["frame"])

    resize = q_mm_resize(spark, sf).collect()
    assert sorted((r["media_id"], r["n_bytes"], r["content_sha"]) for r in resize) == \
        sorted((r["media_id"], r["n_bytes"], r["sha"]) for r in suite["resize"])
