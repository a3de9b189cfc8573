"""Physical-plan audits for the LLM-pipeline heavy hitters — the 100 TB
claims each operator's docstring makes, pinned mechanically the same way
test_pipeline_plans.py pins the flagship: read the executed plan and
assert the structure that makes the operator survive a 1000-executor
corpus, so a refactor that silently degrades the plan (a theta-join
degenerating to a cartesian, a prefix-sum collapsing to one partition, a
scorer growing a shuffle) fails CI rather than a 100 TB run.

Assertions deliberately avoid size-dependent strategy choices (AQE may
broadcast any side of an equi-join on toy data); they pin only what the
operator itself forces: join *family*, partitioning columns, rank-limit
pushdown, and Python-boundary counts.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators import dedup as D
from cassandra_slow_queries_spark.operators.curation import (
    _distributed_prefix_sum,
)
from cassandra_slow_queries_spark.operators.quality_model import score_quality
from cassandra_slow_queries_spark.operators.similarity import (
    cosine_topk_bruteforce,
)
from cassandra_slow_queries_spark.operators.topk import grouped_top_k


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(30)))
        for i in range(80)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_candidate_join_is_equi_not_cartesian(spark, docs):
    """The banded self-join must stay an equi-join on (band, band-hash).
    If the join condition ever stops being an equality (e.g. someone
    folds the estimated-Jaccard filter into the join predicate), Catalyst
    plans a cartesian/nested-loop product — O(N²) over the corpus."""
    sig = D.minhash_signatures(docs, "text", "doc_id")
    banded = D._band_keys(sig, 16, 4)
    cand = D._block_candidate_pairs(banded, ["band", "bh"])
    plan = _plan(cand)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "mapInPandas" not in plan and "BatchEvalPython" not in plan


def test_prefix_sum_never_collapses_to_one_partition(spark, docs):
    """The curation tier's cumulative sums (token budget, packing, shard
    ids) run as range-partition → per-partition window → tiny per-range
    totals; a naive `Window.orderBy(...)` with no partitionBy plans an
    Exchange SinglePartition that funnels the whole corpus through one
    task. The audit pins the distributed shape: the corpus window is
    partitioned by the range id and no SinglePartition exchange exists
    anywhere in the frame that carries corpus rows."""
    tok = docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    summed, ranged = _distributed_prefix_sum(
        tok, "n_tokens", [F.col("doc_id").asc()], 8
    )
    try:
        plan = _plan(summed)
    finally:
        ranged.unpersist()
    assert "Exchange SinglePartition" not in plan
    assert "windowspecdefinition(_pid" in plan


def test_quality_scorer_is_one_arrow_stage_no_shuffle(spark, docs):
    """Model-scored quality is a pure map: ONE Arrow-batched Python
    boundary (the hashed-n-gram GEMM), zero exchanges, zero row-wise
    Python. A second Python boundary (e.g. softmax drifting into the
    UDF) doubles the Arrow serialization cost; any Exchange would mean
    the scorer stopped being embeddable in other pipelines' stages."""
    W = np.ones((64, 2)) * 0.01
    scored = score_quality(docs, W, [0.0, 0.0], ["bad", "good"], ngram=2)
    plan = _plan(scored)
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_bruteforce_ann_pushes_rank_limit_below_shuffle(spark):
    """Exact cosine top-K: queries broadcast against the corpus (never
    the reverse — the corpus side must stay partitioned), and the
    per-query rank limit runs as a PARTIAL WindowGroupLimit before the
    q_id shuffle, so each task ships at most k rows per query, not its
    whole corpus slice."""
    emb = spark.createDataFrame(
        [(i, [float((i + j) % 5) for j in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    out = cosine_topk_bruteforce(emb, emb.limit(3), k=4)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    partials = [
        l for l in plan.splitlines()
        if "WindowGroupLimit" in l and "Partial" in l
    ]
    assert partials, plan
    assert "hashpartitioning(q_id" in plan


def test_grouped_top_k_rank_pushdown(spark, docs):
    """grouped_top_k's row_number window must also carry the Partial
    WindowGroupLimit (Spark's rank-limit pushdown) — the difference
    between shipping k rows and shipping the full group per key."""
    tok = docs.select(
        "doc_id",
        (F.col("doc_id") % 5).alias("grp"),
        F.length("text").alias("score"),
    )
    out = grouped_top_k(tok, ["grp"], "score", 3, tiebreaks=["doc_id"])
    plan = _plan(out)
    partials = [
        l for l in plan.splitlines()
        if "WindowGroupLimit" in l and "Partial" in l
    ]
    assert partials, plan
    assert "Exchange SinglePartition" not in plan


def test_featurize_once_buckets_path_plans(spark, docs):
    """The featurize-once seam (r8): scoring and DSIR-weighing off a
    precomputed gram-bucket column must plan WITHOUT re-hashing text —
    still exactly one Arrow boundary each (the gather+reduceat GEMM),
    zero exchanges, and the bucket column feeding the UDF instead of
    the text column. If a refactor silently re-featurizes inside the
    UDF, the corpus pays one tokenization pass per model again — at
    100 TB that is the difference between one scan and five."""
    from cassandra_slow_queries_spark.operators.dsir import dsir_log_weights
    from cassandra_slow_queries_spark.operators.quality_model import (
        gram_buckets_udf,
    )

    bucketed = docs.withColumn(
        "_b", gram_buckets_udf(64, 2)(F.col("text"))
    ).select("doc_id", "_b")  # text column GONE: re-hashing can't compile
    W = np.ones((64, 2)) * 0.01
    scored = score_quality(
        bucketed, W, [0.0, 0.0], ["bad", "good"], buckets_col="_b"
    )
    plan = _plan(scored.select("doc_id", "q_score"))
    # Spark FUSES the chained pandas UDFs (bucket featurization → GEMM)
    # into a single ArrowEvalPython node — one Python boundary total,
    # evaluated in sequence inside one Arrow exchange with the JVM
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan

    weighted = dsir_log_weights(
        bucketed, np.zeros(64), buckets_col="_b"
    )
    plan_w = _plan(weighted)
    assert plan_w.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan_w


def test_count_min_build_is_one_aggregation(spark, docs):
    """The CM cell frame must come from ONE hash aggregation over the
    exploded (j, col) rows — no joins, no windows, no Python — and the
    query side must broadcast the (≤ depth×width)-row sketch."""
    from cassandra_slow_queries_spark.operators.sketches import (
        cm_build,
        cm_query,
    )

    sketch = cm_build(docs, "text", width=256, depth=3)
    plan = _plan(sketch)
    assert plan.count("HashAggregate") >= 1
    assert "Join" not in plan and "Window" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    q = cm_query(sketch, docs.select("text").distinct(), "text", width=256, depth=3)
    assert "BroadcastHashJoin" in _plan(q)


def test_bloom_probe_is_pure_codegen_no_join(spark):
    """The Bloom prune's value at 100 TB is that the fact-side probe is
    a pure bitwise expression over a broadcast literal — no join, no
    shuffle, no Python — applied at the scan before the real join. If
    the probe ever degenerates into a join against the bit table or a
    UDF, the pushdown costs what it saves."""
    from cassandra_slow_queries_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    dim = spark.range(0, 300).select((F.col("id") * 3).alias("key"))
    bf = bloom_build(dim, "key")
    fact = spark.range(0, 5000).select((F.col("id") % 900).alias("key"))
    pruned = fact.filter(bloom_might_contain(bf, F.col("key")))
    plan = _plan(pruned)
    for node in ("Join", "Exchange", "BatchEvalPython", "ArrowEvalPython",
                 "mapInPandas"):
        assert node not in plan, f"{node} leaked into the probe plan:\n{plan}"
    assert "Filter" in plan


def test_equi_depth_assignment_is_fold_not_join(spark):
    """Equi-depth's bucket id must be a pure `aggregate` fold over the
    broadcast 1-row bounds frame — a per-row join against an exploded
    bounds table or a Python seam would put an O(buckets) join (or
    Arrow hop) on the full-corpus scan."""
    from cassandra_slow_queries_spark.operators.profile import (
        equi_depth_histogram,
    )

    df = spark.range(0, 5000).select((F.col("id") % 97).cast("double").alias("v"))
    out = equi_depth_histogram(df, "v", buckets=8)
    plan = _plan(out)
    for node in ("BatchEvalPython", "ArrowEvalPython", "mapInPandas",
                 "SortMergeJoin", "CartesianProduct"):
        assert node not in plan, f"{node} leaked into the plan:\n{plan}"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan \
        or "Broadcast" in plan  # the 1-row bounds crossJoin broadcasts


def test_qdigest_build_shape_and_query_broadcasts(spark):
    """The q-digest build must be: Python ONLY at the two documented
    Arrow seams (per-partition fold, single-group final compress) with
    ONE hash aggregation merging partials between them — no windows, no
    joins, nothing proportional to the stream. The rank-probe side must
    broadcast the O(k) digest (BroadcastNestedLoopJoin is correct here:
    the crossJoin against a bounded frame), never shuffle it."""
    from cassandra_slow_queries_spark.operators.sketches import (
        qd_build,
        qd_rank_bounds,
    )

    df = spark.range(0, 4000).select((F.col("id") * 37 % 1024).alias("v"))
    digest = qd_build(df, "v", k=32, level_bits=10)
    plan = _plan(digest)
    assert plan.count("HashAggregate") >= 1
    # exactly the two sanctioned Python seams, not one per gate
    assert plan.count("MapInPandas") == 1
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "Window" not in plan and "SortMergeJoin" not in plan
    probes = spark.createDataFrame([(10,), (500,)], "probe long")
    q = qd_rank_bounds(digest, probes, 10)
    qplan = _plan(q)
    assert "BroadcastNestedLoopJoin" in qplan or "BroadcastHashJoin" in qplan
    assert "CartesianProduct" not in qplan


def test_bootstrap_ci_is_one_aggregation_no_python(spark):
    """All B resamples must ride ONE hash aggregation of fixed-width sum
    columns — md5/CDF-ladder weights are codegen expressions, so the
    plan must contain no Python seam, no window, no join, and no more
    aggregations than the single group-by (partial + final pair)."""
    from cassandra_slow_queries_spark.operators.analytics import (
        poisson_bootstrap_ci,
    )

    df = spark.range(0, 3000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") % 97).alias("v"),
    )
    out = poisson_bootstrap_ci(df, "v", "event_id", ["g"], replicates=16)
    plan = _plan(out)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "Window", "Join"):
        assert node not in plan, f"{node} leaked into the plan:\n{plan}"
    # one logical aggregation = at most a partial/final HashAggregate
    # pair (plus AQE wrappers), never a per-replicate aggregation chain
    assert 1 <= plan.count("HashAggregate") <= 2


def test_mg_candidates_plan_one_python_seam_one_agg(spark):
    """Misra-Gries' 100 TB contract: the per-partition summary is ONE
    Arrow seam emitting <= k rows per partition, merged by ONE hash
    aggregation over <= k * n_partitions rows — no join, no window,
    and never a second Python pass. A refactor that grew a per-item
    shuffle or a second seam would scale with the stream instead of
    with k * partitions."""
    from cassandra_slow_queries_spark.operators.sketches import (
        mg_topk_candidates,
    )

    df = spark.range(0, 5000).select((F.col("id") % 37).alias("item"))
    out = mg_topk_candidates(df, "item", k=8)
    plan = _plan(out)
    assert plan.count("MapInPandas") == 1, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "Window", "Join"):
        assert node not in plan, f"{node} leaked into the plan:\n{plan}"
    # the merge is one logical aggregation (partial/final pair at most)
    assert 1 <= plan.count("HashAggregate") <= 2, plan


def test_spread_input_widens_narrow_scans_only(spark):
    """spread_input's contract: a scan with fewer splits than the
    session's shuffle parallelism gets ONE row-level exchange up to
    that parallelism (before any fan-out runs on it); an already-wide
    frame passes through untouched — so a real many-file corpus pays
    nothing. This seam is what keeps broadcast-side-driven fan-out
    parallel (x_range_join: the intervals side broadcasts, so join
    parallelism IS the points scan's split count; a single-row-group
    landing file serialized billions of sf3 pair rows onto one core
    before the entry adopted the seam)."""
    from cassandra_slow_queries_spark.session import spread_input

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    narrow = spark.range(0, 1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    spread = spread_input(narrow, by="id")
    assert spread.rdd.getNumPartitions() == target
    wide = spark.range(0, 1000).repartition(target + 4)
    assert spread_input(wide, by="id") is wide


def test_spread_input_min_bytes_floor(spark, tmp_path):
    """The size floor under the split check (r12): a narrow scan whose
    plan-stats size is BELOW min_bytes passes through untouched (the
    tiny-tier case, where the exchange costs more than it buys — and
    what keeps the sf0.01 oracle plans byte-identical after the text
    family adopted the guard), while a narrow scan ABOVE the floor
    still spreads to shuffle parallelism (the sf1+/real-corpus case,
    measured 1.6-8x on the text entries). min_bytes=0 keeps the
    pre-r12 behavior exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cassandra_slow_queries_spark.session import spread_input

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    small_path = str(tmp_path / "small.parquet")
    pq.write_table(pa.table({"id": list(range(100))}), small_path)
    big_path = str(tmp_path / "big.parquet")
    import random as _random

    _rng = _random.Random(5)
    pq.write_table(
        pa.table(
            {
                "id": list(range(5000)),
                # incompressible payload: the floor reads the FILE size
                # via plan stats, so a constant pad would compress under
                # the floor and test nothing
                "pad": [
                    "%0960x" % _rng.getrandbits(3840) for _ in range(5000)
                ],
            }
        ),
        big_path,
    )  # ~4.8 MB of high-entropy strings in ONE row group

    small = spark.read.parquet(small_path)
    assert small.rdd.getNumPartitions() < target
    assert spread_input(small, by="id", min_bytes=2 << 20) is small
    assert (
        spread_input(small, by="id").rdd.getNumPartitions() == target
    )  # min_bytes=0: unchanged contract

    big = spark.read.parquet(big_path)
    assert big.rdd.getNumPartitions() < target
    spread = spread_input(big, by="id", min_bytes=2 << 20)
    assert spread.rdd.getNumPartitions() == target
    assert spread.count() == 5000


def test_spread_floor_constant_boundary(spark, tmp_path):
    """Pin the PRODUCTION floor constant at the boundary it was chosen
    for: a single-row-group file just UNDER SPREAD_FLOOR_BYTES stays
    plain, one just OVER spreads. Guards the bench-tier plan-stability
    invariant directly — the other floor tests use their own explicit
    values, so a silent change to the constant (or a drifted generator
    crossing it) would otherwise go unpinned. The sf0.1 tiers sit at
    0.59 MiB (documents) / 2.05 MiB (events), both safely under the
    4 MiB constant; this test fails loudly if someone moves the
    constant into that band."""
    import random as _random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cassandra_slow_queries_spark.plans.catalog import SPREAD_FLOOR_BYTES
    from cassandra_slow_queries_spark.session import spread_input

    assert SPREAD_FLOOR_BYTES > int(2.1 * 1024 * 1024), (
        "floor moved under the sf0.1 events size — bench-tier plans "
        "would start spreading; re-measure before lowering it"
    )
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    _rng = _random.Random(6)

    def file_of(n_bytes, name):
        n_rows = max(1, n_bytes // 960)
        path = str(tmp_path / name)
        pq.write_table(
            pa.table(
                {
                    "id": list(range(n_rows)),
                    "pad": ["%0960x" % _rng.getrandbits(3840) for _ in range(n_rows)],
                }
            ),
            path,
        )
        return spark.read.parquet(path)

    under = file_of(int(SPREAD_FLOOR_BYTES * 0.7), "under.parquet")
    over = file_of(int(SPREAD_FLOOR_BYTES * 1.4), "over.parquet")
    assert under.rdd.getNumPartitions() < target
    assert spread_input(under, by="id", min_bytes=SPREAD_FLOOR_BYTES) is under
    spread = spread_input(over, by="id", min_bytes=SPREAD_FLOOR_BYTES)
    assert spread.rdd.getNumPartitions() == target


def test_spread_floor_fallback_warns_exactly_once(spark):
    """The stats-unavailable fallback warning is once-per-process by a
    module flag, not the warnings-module dedup (which keys on message
    text — a message embedding the exception re-fires per distinct
    exception, and per call under -W always configs)."""
    import warnings

    from cassandra_slow_queries_spark import session as S

    df = spark.range(4).repartition(1)
    real = df._jdf

    class FlakyJdf:
        def queryExecution(self):
            raise RuntimeError("planted stats failure")

        def __getattr__(self, name):
            return getattr(real, name)

    df._jdf = FlakyJdf()
    old = S._SIZE_FLOOR_WARNED
    S._SIZE_FLOOR_WARNED = False
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            S.spread_input(df, min_bytes=1)
            S.spread_input(df, min_bytes=1)  # distinct call, same process
        floor_warnings = [
            w for w in caught if "size floor unavailable" in str(w.message)
        ]
        assert len(floor_warnings) == 1, [str(w.message) for w in caught]
    finally:
        S._SIZE_FLOOR_WARNED = old
        df._jdf = real


def test_text_entries_keep_plain_plans_below_floor(spark):
    """EVERY entry routed through the size-floored spread — the
    load_documents_wide consumers plus the e2e flagship's events scan —
    must carry NO repartition at the oracle/bench tiers, where the
    corpus sits far under SPREAD_FLOOR_BYTES: the guard may not tax the
    small tiers it was measured not to help. The one exclusion is
    cur_quality_filter, whose repetition_metrics core carries its OWN
    un-floored operator-level spread (curation.py: the r11 embedded
    guard for callers that pass narrow frames directly) — its plan
    legitimately repartitions at every tier and its r12 A/B was
    measured with that exchange in place."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"testdata {sf_dir} not present")
    from cassandra_slow_queries_spark.plans.catalog import CATALOG

    for name in (
        "text_quality",
        "text_stats",
        "text_langid",
        "text_clean",
        "text_perplexity",
        "text_entropy",
        "text_collocations",
        "text_fingerprint",
        "text_compression",
        "e2e_query_pk_report",
        "x_int8_quant",
        "ann_hard_negatives",
        "mm_frame_sample",
        "mm_fake_features",
    ):
        plan = (
            CATALOG[name]
            .spark(spark, sf_dir)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "Repartition" not in plan, (name, plan)


def test_range_join_entry_points_side_is_spread(spark):
    """The x_range_join catalog entry must carry the points-side spread
    exchange when the landing file is narrow (the driver testdata is
    single-row-group): without it the broadcast-hash join fans out the
    full pair volume at scan parallelism. The guard is a documented
    no-op on wide scans, so the exchange is only asserted when the scan
    is actually narrow."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"testdata {sf_dir} not present")
    from cassandra_slow_queries_spark.plans.catalog import CATALOG

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    scan_parts = spark.read.parquet(f"{sf_dir}/events.parquet").rdd.getNumPartitions()
    plan = _plan(CATALOG["x_range_join"].spark(spark, sf_dir))
    if scan_parts < target:
        # round-robin spread (no unique hash column inside the operator)
        assert "roundrobinpartitioning" in plan.lower(), plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_mm_suite_plans_exactly_one_sort(spark):
    """The mm_suite consolidation's branches build from the standalone
    entries' UNORDERED cores: an inner per-branch orderBy would range-
    exchange a documents-scale branch only for the outer sort to
    discard the order (found as 3 Sort nodes in review; now pinned at
    the single final sort)."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"testdata {sf_dir} not present")
    from cassandra_slow_queries_spark.plans.catalog import DEFERRED_CATALOG

    plan = _plan(DEFERRED_CATALOG["mm_suite"].spark(spark, sf_dir))
    assert plan.count("Sort ") == 1, plan


def test_interval_agg_joins_the_histogram_not_the_corpus(spark):
    """interval_agg's join input must be the per-VALUE aggregation of
    the points side (a HashAggregate below the join), so pair volume is
    bounded by |distinct values ∩ interval| instead of the quadratic
    true-match volume (the r13 x_range_join finding: 11.3 G pairs at
    sf3 on a fixed value domain). If a refactor joined the raw corpus
    and aggregated only after, this pin fails."""
    from cassandra_slow_queries_spark.operators.rangejoin import interval_agg

    pts = spark.range(2000).select(
        F.col("id").alias("p_id"), (F.col("id") % 50).alias("v")
    )
    ivs = spark.createDataFrame(
        [(i, i * 5, i * 5 + 7) for i in range(8)], "iv_id long, lo long, hi long"
    )
    out = interval_agg(pts, ivs, "v", sum_cols=["v"], bucket_width=8,
                       spread=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # two aggregation LAYERS: per-value below the join, per-interval
    # above it (each layer is a partial+final HashAggregate pair)
    join_pos = min(
        p for p in (plan.find("SortMergeJoin"), plan.find("HashJoin"))
        if p >= 0
    )
    below = plan[join_pos:]
    assert "HashAggregate" in below, plan
    # rows entering the final agg are distinct-value matches, not pairs:
    # 2000 rows over 50 distinct v → at most 50 histogram rows join
    n = out.count()
    assert n == ivs.filter("hi > lo").count()  # every interval matched
