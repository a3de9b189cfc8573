"""Similarity search over embedding columns (Tier 3).

Two tiers, as the north star prescribes:

- **Brute-force cosine top-K** — the exact baseline. Query side is small
  and broadcast; the corpus streams through one narrow stage (cosine is
  a JVM higher-order-function expression) into a per-query top-K window.
  O(N·Q) work but zero shuffle of the corpus: for a handful of queries
  over 100 TB this is actually the right plan.
- **Random-hyperplane LSH top-K** — the scale path for many queries:
  both sides hash into sign-pattern buckets (with multiple tables for
  recall); candidates are joined per bucket, exact cosine re-ranks.
  Corpus shuffle is bounded by (tables × corpus) bucket rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.functions.vectors import dot, norm
from cassandra_slow_queries_spark.operators.topk import grouped_top_k
from cassandra_slow_queries_spark.session import spread_input

try:  # numpy/pandas are baked into the target env; gate for safety
    import numpy as _np
    import pandas as _pd
    from pyspark.sql.functions import pandas_udf as _pandas_udf

    _HAVE_ARROW = True
except ImportError:  # pragma: no cover
    _HAVE_ARROW = False


def _masked_stack(v):
    """``(positions, matrix)`` for an Arrow batch that may hold NULL
    embeddings: the row positions of non-null vectors and their stacked
    float64 matrix (``(0, 0)``-shaped when every row is NULL).

    Every vectorized UDF in this module must route batches through this
    (and emit None at the null positions) — ``np.stack`` on a raw batch
    crashes the executor on the first NULL embedding, while the exact
    expression paths (cosine_topk_bruteforce etc.) tolerate NULLs via
    F.when; the approximate twins must not be stricter than the exact
    operators they stand in for."""
    mask = v.notna().to_numpy()
    pos = _np.nonzero(mask)[0]
    if len(pos) == 0:
        return pos, _np.zeros((0, 0), dtype=_np.float64)
    return pos, _np.stack(v.iloc[pos].to_numpy()).astype(_np.float64)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-K neighbors per query vector (self-matches excluded).

    Output: (q_id, neighbor_id, sim) with sim rounded to 6 dp and
    deterministic (sim desc, neighbor_id asc) ranking.

    Norms are precomputed once per side (N+Q norm evaluations instead of
    2·N·Q), so each pair costs exactly one dot product. ``dim`` opts into
    the unrolled dot (functions/vectors.py) — worthwhile only when the
    input is large enough to amortize the much bigger codegen compile;
    at bench scale the fold form wins.

    The corpus (stream) side of the broadcast cross join is spread past
    the input's split count — the N·Q dot-product folds otherwise run
    on however few splits the landing file has (the r9 sf1 lesson on
    the PQ trainer; same guard as cosine_near_dup_pairs_exact).
    """
    c = spread_input(corpus, by=id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        norm(vec_col, dim).alias("_cn"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qv"),
        norm(vec_col, dim).alias("_qn"),
    )
    d = dot(F.col("_qv"), F.col("_cv"), dim)
    sim = F.when(
        (F.col("_qn") > 0) & (F.col("_cn") > 0), d / (F.col("_qn") * F.col("_cn"))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", F.round(sim, 6).alias("sim"))
    )
    return grouped_top_k(scored, ["q_id"], "sim", k, tiebreaks=["neighbor_id"]).orderBy(
        "q_id", F.col("sim").desc(), "neighbor_id"
    )


def _hyperplanes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes (Box-Muller over a
    splitmix stream) — plain literals, no RNG library dependency."""
    planes: list[list[float]] = []
    x = seed & 0xFFFFFFFFFFFFFFFF

    def nxt() -> float:
        nonlocal x
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        return (z >> 11) / float(1 << 53)  # uniform [0,1)

    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            u1 = max(nxt(), 1e-12)
            u2 = nxt()
            row.append(math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2))
        planes.append(row)
    return planes


def hyperplane_bucket(vec_col: str, planes: list[list[float]]):
    """Sign-pattern bucket id (one bit per plane) as a long.

    A dim mismatch or NULL vector RAISES / yields NULL instead of
    silently collapsing into bucket 0: ``zip_with`` pads the shorter
    side with NULL, which NULLs the whole dot product — caught once as
    a dim=32 config against 64-wide embeddings, where LSH silently
    degenerated to an undetected brute-force quadratic. The guard is
    the same raise_error contract as :func:`jl_project`. Summing the
    distinct power-of-two bit weights is the bitwise OR. The fold form
    is deliberate: a fully unrolled multiply-add chain generates ~2 300
    expression nodes here, and whole-stage codegen compile time
    (janino) dominates every stage that embeds it — measured 7× slower
    than the interpreted fold at sf0.1."""
    v = F.col(vec_col).cast("array<double>")
    dim = len(planes[0])
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(c)) for c in plane])
        d = F.aggregate(
            F.zip_with(v, lit_plane, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )
        bucket = bucket + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return (
        F.when(v.isNull(), F.lit(None).cast("long"))
        .when(F.size(v) == dim, bucket)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("hyperplane_bucket: vector width "),
                    F.size(v).cast("string"),
                    F.lit(f" != plane dim {dim}"),
                )
            ).cast("long")
        )
    )


def cosine_near_dup_pairs_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact: every (id_a < id_b)
    pair with cosine ≥ ``threshold``.

    O(N²) by definition — this is the small-N baseline and the ground
    truth for :func:`cosine_near_dup_pairs_blocked` (the LSH-bucketed
    scale path), the same exact/approximate split as
    :func:`cosine_topk_bruteforce` vs :func:`cosine_topk_lsh`. Norms are
    precomputed per side so each pair costs one dot product; the filter
    applies to the UNROUNDED similarity (the rounded value is only for
    cross-engine display parity).

    The LEFT side of the nested-loop pair join is spread to session
    parallelism: the NL join iterates per left partition, so a
    single-split input (one small parquet file) would evaluate every
    pairwise dot product on one core — measured 9× slower at sf0.1.
    """
    a = spread_input(df, by=id_col).select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        norm(vec_col).alias("_na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        norm(vec_col).alias("_nb"),
    )
    d = dot(F.col("_va"), F.col("_vb"))
    sim = F.when(
        (F.col("_na") > 0) & (F.col("_nb") > 0), d / (F.col("_na") * F.col("_nb"))
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("_sim", sim)
        .filter(F.col("_sim") >= threshold)
        .select("id_a", "id_b", F.round("_sim", 6).alias("cos_sim"))
    )


def cosine_near_dup_pairs_blocked(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 12,
    multiprobe: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via hyperplane-LSH blocking +
    exact cosine verification — the 100 TB path: the corpus shuffles as
    narrow ``(id, table, bucket)`` rows, candidate pairs come from
    bucket collisions (one side multiprobed), and only candidates pay a
    dot product.

    Recall depends on the corpus geometry: clustered near-dups (the real
    use case) land in the same bucket with high probability; on the
    driver's ISOTROPIC embeddings recall at threshold 0.4 measures ~0.95
    with the default parameters while scanning well under the full pair
    space (pinned in tests/test_dedup_similarity.py, alongside equality
    of the verified values with the exact operator on the found pairs).
    """
    tables = [
        _hyperplanes(n_planes, dim, seed + 1000 * t) for t in range(n_tables)
    ]
    bucketize = bucket_ids_udf(tables)
    base = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(bucketize(F.col(vec_col))).alias("table", "bucket"),
    )
    probed = _multiprobe(base, n_planes, multiprobe, "id")
    a = probed.alias("a")
    b = base.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        norm(vec_col).alias("_na"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        norm(vec_col).alias("_nb"),
    )
    d = dot(F.col("_va"), F.col("_vb"))
    sim = F.when(
        (F.col("_na") > 0) & (F.col("_nb") > 0), d / (F.col("_na") * F.col("_nb"))
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("_sim", sim)
        .filter(F.col("_sim") >= threshold)
        .select("id_a", "id_b", F.round("_sim", 6).alias("cos_sim"))
    )


def _probe_masks(n_planes: int, radius: int) -> list[int]:
    """XOR masks for every bucket within Hamming distance ≤ ``radius`` of
    the home bucket (mask 0 = the bucket itself). ``radius`` is a genuine
    count: radius 1 adds the ``n_planes`` one-bit flips, radius 2 adds the
    ``C(n_planes, 2)`` two-bit flips, and so on — the standard multiprobe
    ladder (probe count grows combinatorially, so radius > 2 is rarely
    worth it over adding a table)."""
    from itertools import combinations

    masks = [0]
    for r in range(1, min(radius, n_planes) + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def _multiprobe(
    bucketed: DataFrame, n_planes: int, radius: int, *cols: str
) -> DataFrame:
    """Explode a ``(*cols, table, bucket)`` frame to its Hamming ≤ radius
    probe neighborhood; radius 0 is the identity (no explode)."""
    if radius <= 0:
        return bucketed
    probes = F.array(
        *[
            F.col("bucket").bitwiseXOR(F.lit(m))
            for m in _probe_masks(n_planes, radius)
        ]
    )
    return bucketed.select(
        *cols, "table", F.explode(probes).alias("bucket")
    )


def bucket_ids_udf(tables: list[list[list[float]]]):
    """Arrow-vectorized bucketizer: ``embedding → array<long>`` of one
    sign-pattern bucket id per table, computed as ONE numpy matmul per
    batch.

    The expression form (:func:`hyperplane_bucket`) evaluates
    ``n_tables × n_planes`` interpreted HOF folds *per row* — measured
    slower than the brute-force scan it is meant to beat. Here the whole
    plane bank is a ``(n_tables·n_planes, dim)`` matrix; a batch of B
    vectors costs one ``(B, dim) @ (dim, T·P)`` GEMM plus a bit-pack,
    amortized over the Arrow batch. This is the sanctioned Pandas-UDF
    seam: a dense matrix product is exactly what Spark's expression
    language cannot express efficiently.
    """
    flat = _np.array(
        [plane for planes in tables for plane in planes], dtype=_np.float64
    )  # (n_tables*n_planes, dim)
    n_tables = len(tables)
    n_planes = len(tables[0])
    weights = (1 << _np.arange(n_planes, dtype=_np.int64))  # bit weights

    @_pandas_udf("array<bigint>")
    def _buckets(v: _pd.Series) -> _pd.Series:
        pos, mat = _masked_stack(v)  # NULL embeddings → NULL buckets
        out: list = [None] * len(v)
        if len(pos):
            signs = (mat @ flat.T) >= 0.0  # (B, T*P)
            per_table = signs.reshape(len(mat), n_tables, n_planes)
            ids = per_table @ weights  # (B, T) int64
            for p, row in zip(pos, ids):
                out[p] = row
        return _pd.Series(out)

    return _buckets


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 32,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-K: candidates from ``n_tables`` independent
    hyperplane tables, exact cosine re-rank within candidates.

    Recall is tunable via (n_planes, n_tables); at 2^n_planes buckets per
    table the corpus-side shuffle is n_tables rows per vector.
    ``multiprobe`` is the Hamming probe RADIUS on the QUERY side: radius
    1 probes the ``n_planes`` one-bit-flip buckets, radius 2 additionally
    the ``C(n_planes, 2)`` two-bit flips, etc. (query rows ×
    |Hamming ≤ r ball| — still tiny, still broadcast; the corpus side
    stays at one bucket per table). This is the standard
    recall lever when the corpus is isotropic: the driver testdata's
    embeddings have NO cluster structure (top-5 cosine ≈ 0.3-0.4, i.e.
    ~70° angles — see tests/test_dedup_similarity.py recall gate), which
    is the worst case for sign-pattern LSH; single-probe recall there
    caps out near 0.5 regardless of table count, while one-bit multiprobe
    reaches ≥0.9 at a measured ~60% candidate fraction.

    Plan shape (the 100 TB design):

    - bucketing is a narrow Arrow-batched matmul (:func:`bucket_ids_udf`)
      producing ``(id, table, bucket)`` rows WITHOUT the vectors — the
      corpus embedding column never rides through the explode/join;
    - the bucket join keys on (table, bucket) with the tiny query side
      broadcast; candidates dedupe on the narrow (q_id, neighbor_id)
      pair, not on 2·dim doubles;
    - vectors are fetched back only for the surviving candidates (AQE
      broadcasts the candidate side when it fits, which it does by
      construction — |candidates| ≤ queries × tables × bucket size);
    - exact cosine re-ranks candidates; ties broken on neighbor_id.
    """
    tables = [
        _hyperplanes(n_planes, dim, seed + 1000 * t) for t in range(n_tables)
    ]
    bucketize = bucket_ids_udf(tables)

    def bucket_rows(df: DataFrame, id_alias: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(id_alias),
                F.posexplode(bucketize(F.col(vec_col))).alias("table", "bucket"),
            )
        )

    c_b = bucket_rows(corpus, "neighbor_id")
    q_b = _multiprobe(bucket_rows(queries, "q_id"), n_planes, multiprobe, "q_id")
    cand = (
        c_b.join(F.broadcast(q_b), on=["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id")
        .distinct()
    )
    return _rerank_candidates(corpus, queries, cand, k, id_col, vec_col)


def _rerank_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    cand: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact cosine top-K over a ``(q_id, neighbor_id)`` candidate frame —
    the shared re-rank tail of every blocked ANN path (LSH, IVF).

    Vectors are fetched back only for surviving candidates; the query
    side is broadcast by construction. Ties break on neighbor_id."""
    c_vec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        norm(vec_col).alias("_cn"),
    )
    q_vec = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qv"),
        norm(vec_col).alias("_qn"),
    )
    d = dot(F.col("_qv"), F.col("_cv"))
    sim = F.when(
        (F.col("_qn") > 0) & (F.col("_cn") > 0), d / (F.col("_qn") * F.col("_cn"))
    )
    scored = (
        cand.join(c_vec, "neighbor_id")
        .join(F.broadcast(q_vec), "q_id")
        .select("q_id", "neighbor_id", F.round(sim, 6).alias("sim"))
    )
    return grouped_top_k(scored, ["q_id"], "sim", k, tiebreaks=["neighbor_id"]).orderBy(
        "q_id", F.col("sim").desc(), "neighbor_id"
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    refine_iters: int = 1,
    seed: int = 42,
):
    """Spherical-k-means coarse quantizer: deterministic seeds + Lloyd
    refinement, returning ``n_centroids`` L2-normalized centroid rows as
    plain Python lists.

    - **Seeds**: the ``n_centroids`` corpus vectors minimizing
      ``xxhash64(id, seed)`` — a deterministic uniform sample computed
      with one TakeOrderedAndProject pass (no RNG state, reproducible
      across runs/partitionings, unlike ``df.sample``).
    - **Refinement**: each Lloyd iteration assigns every vector to its
      argmax-cosine centroid via the Arrow GEMM bucketizer (one matmul
      per batch), then recomputes per-cell means with a whole-stage
      codegen hash aggregate of ``dim`` avg columns — the same
      explode-free fixed-width-agg shape as the MinHash signature path,
      i.e. one shuffle of C×dim doubles per iteration regardless of
      corpus size. Cells that lose all members keep their old centroid.
    - Only the C×dim centroid matrix ever reaches the driver
      (collect of ``n_centroids`` rows — the k-means contract; MLlib
      does the same).
    """
    seeds = (
        corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(n_centroids)
        .collect()
    )
    cents = _np.array([list(r["v"]) for r in seeds], dtype=_np.float64)
    cents /= _np.maximum(_np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    # spread past the input's split count: a single-row-group landing
    # file would serialize every Lloyd pass onto 1-2 cores (the r9 sf1
    # smoke finding on train_pq_codebooks; same shape here)
    spread = spread_input(corpus.select(F.col(vec_col).alias("v")))
    if refine_iters > 1:
        spread = spread.persist()
    try:
        for _ in range(refine_iters):
            assign = ivf_cell_udf(cents, n_probe=1)
            means = (
                spread.select(assign(F.col("v"))[0].alias("cell"), "v")
                .groupBy("cell")
                .agg(*[F.avg(F.col("v")[i]).alias(f"c{i}") for i in range(dim)])
                .collect()
            )
            new = cents.copy()
            for r in means:
                new[r["cell"]] = [r[f"c{i}"] for i in range(dim)]
            new /= _np.maximum(_np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
            cents = new
    finally:
        if refine_iters > 1:
            spread.unpersist()
    return [[float(x) for x in row] for row in cents]


def ivf_cell_udf(centroids, n_probe: int = 1):
    """Arrow-vectorized cell assignment: ``embedding → array<int>`` of
    the ``n_probe`` nearest centroids by cosine, best first. One
    ``(B, dim) @ (dim, C)`` GEMM per batch — the same sanctioned
    Pandas-UDF seam as :func:`bucket_ids_udf`; ties break on the lower
    cell id via a stable sort so assignment is deterministic."""
    cmat = _np.asarray(centroids, dtype=_np.float64)
    cmat = cmat / _np.maximum(_np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
    probe = min(n_probe, len(cmat))

    @_pandas_udf("array<int>")
    def _cells(v: _pd.Series) -> _pd.Series:
        pos, mat = _masked_stack(v)  # NULL embeddings → NULL cells
        out: list = [None] * len(v)
        if len(pos):
            sims = mat @ cmat.T  # (B, C); argmax cosine == argmax dot
            # stable descending sort → deterministic lowest-id tie-break
            order = _np.argsort(-sims, axis=1, kind="stable")[:, :probe]
            for p, row in zip(pos, order.astype(_np.int32)):
                out[p] = row
        return _pd.Series(out)

    return _cells


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 16,
    k: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 3,
    seed: int = 42,
):
    """Train product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split the
    ``dim`` dimensions into ``m`` contiguous subspaces of ``dim/m`` and
    k-means each subspace to ``k`` codes. Returns ``m × k × dim/m``
    plain floats — the full codebook is m·k·(dim/m) = k·dim values, the
    same driver footprint class as the IVF centroid matrix.

    Training is distributed the same way as :func:`train_ivf_centroids`:
    deterministic seeds (the ``k`` corpus vectors minimizing
    ``xxhash64(id, seed)``, sliced per subspace), then Lloyd iterations
    where assignment is one Arrow-batched numpy pass over the corpus
    (:func:`pq_code_udf`) and the per-(subspace, code) means come from
    ONE hash aggregate of m·k groups × dim/m avg columns — a shuffle of
    m·k·(dim/m) doubles per iteration regardless of corpus size. Codes
    that lose all members keep their previous centroid.

    Vectors are L2-normalized before subspacing so the quantizer
    approximates the COSINE geometry the search paths use (dot product
    of unit vectors); zero vectors pass through unnormalized.
    """
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    seeds = (
        corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(k)
        .collect()
    )
    smat = _np.array([list(r["v"]) for r in seeds], dtype=_np.float64)
    smat /= _np.maximum(_np.linalg.norm(smat, axis=1, keepdims=True), 1e-12)
    books = [smat[:, s * dsub : (s + 1) * dsub].copy() for s in range(m)]

    # Materialize the normalized corpus ONCE, spread past the input's
    # split count, and keep it cached across the Lloyd iterations: the
    # unguarded loop re-read the parquet and re-ran the 64-element norm
    # fold every iteration on however many splits the file happened to
    # have — a single-row-group landing file serializes the whole
    # training pass onto 1-2 cores (measured 281 s vs 21 s for this
    # function at the sf1 smoke; the round-9 scale finding).
    prep = spread_input(
        corpus.select(_unit_vec_expr(vec_col).alias("_u"))
    ).persist()
    try:
        for _ in range(iters):
            codes = pq_code_udf(books)
            assigned = prep.select(
                F.posexplode(codes(F.col("_u"))).alias("sub", "code"),
                F.col("_u"),
            )
            means = (
                assigned.groupBy("sub", "code")
                .agg(
                    *[
                        F.avg(
                            F.element_at(
                                F.col("_u"), F.col("sub") * dsub + i + 1
                            )
                        ).alias(f"c{i}")
                        for i in range(dsub)
                    ]
                )
                .collect()
            )
            for r in means:
                books[r["sub"]][r["code"]] = [r[f"c{i}"] for i in range(dsub)]
    finally:
        prep.unpersist()
    return [[list(map(float, row)) for row in b] for b in books]


def _unit_vec_expr(vec_col: str):
    """L2-normalize an array column JVM-side (zero vectors unchanged)."""
    v = F.col(vec_col).cast("array<double>")
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)


def pq_code_udf(codebooks):
    """Arrow-vectorized PQ encoder: ``embedding → array<int>`` of the
    ``m`` nearest-code ids (L2, per subspace). One small GEMM per
    subspace per batch — argmin ||x−c||² computed as argmax (x·c −
    ||c||²/2); ties break on the LOWER code id because numpy's plain
    ``argmax`` returns the first (lowest-index) maximum — that built-in
    behavior IS the deterministic tie-break, no extra flip needed."""
    mats = [_np.asarray(b, dtype=_np.float64) for b in codebooks]
    halfn = [0.5 * (b * b).sum(axis=1) for b in mats]
    m = len(mats)
    dsub = mats[0].shape[1]

    @_pandas_udf("array<int>")
    def _codes(v: _pd.Series) -> _pd.Series:
        pos, mat = _masked_stack(v)  # NULL embeddings → NULL codes
        out: list = [None] * len(v)
        if len(pos):
            codes = _np.zeros((len(mat), m), dtype=_np.int32)
            for s in range(m):
                sub = mat[:, s * dsub : (s + 1) * dsub]
                score = sub @ mats[s].T - halfn[s]  # (B, k)
                codes[:, s] = score.argmax(axis=1)
            for p, row in zip(pos, codes):
                out[p] = row
        return _pd.Series(out)

    return _codes


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode a corpus to ``(id_col, codes)`` — ``m`` small ints per
    vector. This is the materialized PQ index: at 100 TB the search
    scan reads m·4 bytes per vector instead of dim·4 (16× here), which
    is the point of PQ — the compressed index fits where the raw
    vectors cannot. Vectors are unit-normalized before encoding (cosine
    geometry)."""
    codes = pq_code_udf(codebooks)
    return df.select(
        F.col(id_col), codes(_unit_vec_expr(vec_col)).alias("codes")
    )


def cosine_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 16,
    n_codes: int = 32,
    n_candidates: int = 100,
    iters: int = 3,
    seed: int = 42,
    codebooks=None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """PQ approximate top-K with asymmetric distance computation (ADC)
    and exact re-rank — the compressed-index ANN path.

    Plan shape (the 100 TB design):

    - the corpus is scanned as its PQ CODES (``encoded``, or encoded on
      the fly) — m ints per vector; the raw embedding column never
      rides through the scoring stage;
    - each query carries its ADC lookup table — LUT[s][j] = (query
      subvector s)·(code j) — computed once per query row by an Arrow
      UDF (m·k dot products on the tiny broadcast side);
    - the approximate score is JVM-side: ``zip_with(codes, lut)`` gathers
      one partial dot per subspace, ``aggregate`` sums them — no Python
      in the N·Q hot path, and the shuffle-free broadcast join keeps the
      corpus streaming;
    - the top ``n_candidates`` per query by ADC score (one
      TakeOrderedAndProject-shaped window) are re-ranked with exact
      cosine over the fetched-back vectors (:func:`_rerank_candidates`),
      so returned similarities are exact and recall is governed by the
      candidate depth.
    """
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, m, n_codes, id_col, vec_col, dim, iters, seed
        )
    if encoded is None:
        encoded = pq_encode(corpus, codebooks, id_col, vec_col)

    mats = [_np.asarray(b, dtype=_np.float64) for b in codebooks]
    n_sub = len(mats)
    dsub = mats[0].shape[1]

    @_pandas_udf("array<array<double>>")
    def _lut(v: _pd.Series) -> _pd.Series:
        pos, q = _masked_stack(v)  # NULL query embeddings → NULL LUTs
        out: list = [None] * len(v)
        if len(pos):
            norms = _np.maximum(_np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            q = q / norms
            for p, row in zip(pos, q):
                out[p] = [
                    list(mats[s] @ row[s * dsub : (s + 1) * dsub])
                    for s in range(n_sub)
                ]
        return _pd.Series(out)

    q_side = queries.select(
        F.col(id_col).alias("q_id"), _lut(F.col(vec_col)).alias("_lut")
    )
    gathered = F.zip_with(
        F.col("codes"),
        F.col("_lut"),
        lambda c, l: F.element_at(l, c.cast("int") + 1),
    )
    approx = F.aggregate(gathered, F.lit(0.0), lambda acc, x: acc + x)
    scored = (
        encoded.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(q_side), F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", approx.alias("_approx"))
    )
    cand = grouped_top_k(
        scored, ["q_id"], "_approx", n_candidates, tiebreaks=["neighbor_id"]
    ).select("q_id", "neighbor_id")
    return _rerank_candidates(corpus, queries, cand, k, id_col, vec_col)


def semantic_dedup(
    df: DataFrame,
    threshold: float,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    refine_iters: int = 1,
    seed: int = 42,
    centroids=None,
) -> DataFrame:
    """Semantic deduplication over an embedding column — the SemDeDup
    recipe (Abbas et al., 2023, arXiv:2303.09540): k-means the corpus
    into ``n_clusters`` cells, then WITHIN each cell remove every
    document whose cosine to some lower-id cell-mate is ≥ ``threshold``
    (the lowest id in each semantic near-dup neighborhood survives as
    the representative — the paper's keep-one-per-ε-ball rule, applied
    by index order).

    Output: ``(id_col, cell, removed)`` — one row per input document.
    ``cell`` is the k-means assignment (exposed so callers and tests can
    audit cluster balance); ``removed`` is the dedup verdict.

    Scale shape (the reason SemDeDup exists): cosine comparisons happen
    only WITHIN a cell, so the pair space is Σ|cell|² instead of N² —
    at 100 TB you scale ``n_clusters`` with the corpus to hold |cell|
    roughly constant, making the per-cell work bounded and the whole
    pass one shuffle on ``cell``. The pair join keys on the cell id, so
    Spark hash-partitions cells across executors; the embedding rides
    the join once per side with norms precomputed (one dot product per
    surviving pair). Cluster training visits the driver only for the
    C×dim centroid matrix (see :func:`train_ivf_centroids`). A
    degenerate corpus (everything in one cell) degrades toward the
    exact quadratic — the same posture as every blocked dedup in
    operators/dedup.py, where hot-block caps/sampling are the
    documented mitigation.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            df, n_clusters, id_col, vec_col, dim, refine_iters, seed
        )
    assign = ivf_cell_udf(centroids, n_probe=1)
    base = df.select(
        F.col(id_col).alias("_id"),
        assign(F.col(vec_col))[0].alias("cell"),
        F.col(vec_col).alias("_v"),
        norm(vec_col).alias("_n"),
    )
    a = base.select(
        F.col("_id").alias("_id_a"),
        F.col("cell"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = base.select(
        F.col("_id").alias("_id_b"),
        F.col("cell"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    d = dot(F.col("_va"), F.col("_vb"))
    sim = F.when(
        (F.col("_na") > 0) & (F.col("_nb") > 0), d / (F.col("_na") * F.col("_nb"))
    )
    removed_ids = (
        a.join(b, ["cell"])
        .filter(F.col("_id_a") < F.col("_id_b"))
        .filter(sim >= threshold)
        .select(F.col("_id_b").alias("_id"))
        .distinct()
        .withColumn("_removed", F.lit(True))
    )
    return (
        base.select("_id", "cell")
        .join(removed_ids, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "cell",
            F.coalesce(F.col("_removed"), F.lit(False)).alias("removed"),
        )
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
    n_probe: int = 4,
    refine_iters: int = 1,
    seed: int = 42,
    centroids=None,
    cells: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-K: coarse-quantize the corpus into
    ``n_centroids`` cells, probe the ``n_probe`` best cells per query,
    exact-cosine re-rank within the probed cells.

    The 100 TB shape: the corpus is scanned once into narrow
    ``(id, cell)`` rows (at real scale you would persist this as the
    index, partitioned by cell — pass precomputed ``centroids`` to skip
    training and reuse an index); each query then touches ~n_probe/C of
    the corpus. Expected recall on *clustered* corpora (the real use
    case — near-dup neighbors share a cell) is high at small n_probe
    (pinned at 1.0 on a clustered fixture in
    tests/test_dedup_similarity.py); on ISOTROPIC data (the driver
    testdata — ANN's worst case) cell membership of true neighbors is
    nearly independent of the query's, so recall ≈ n_probe/C, the scan
    fraction. That floor plus index invariants (balanced cells, bounded
    candidate count) is what the ``ann_cosine_ivf`` catalog gate pins —
    an assignment/probe bug (wrong dim, degenerate centroids) collapses
    cells or zeroes recall and breaks the driver hash.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids, id_col, vec_col, dim, refine_iters, seed
        )
    probe = ivf_cell_udf(centroids, n_probe=n_probe)
    if cells is not None:
        # r13 opt (guide §4/§5): a caller holding the materialized
        # (neighbor_id, cell) index — built with ivf_cell_udf(centroids,
        # n_probe=1) over the same corpus — passes it in so the
        # assignment UDF does not re-scan the corpus; this is the
        # "persist the index" reuse path the docstring describes.
        c_cells = cells
    else:
        assign = ivf_cell_udf(centroids, n_probe=1)
        c_cells = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            assign(F.col(vec_col))[0].alias("cell"),
        )
    q_cells = queries.select(
        F.col(id_col).alias("q_id"), F.explode(probe(F.col(vec_col))).alias("cell")
    )
    cand = (
        c_cells.join(F.broadcast(q_cells), "cell")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id")
        .distinct()
    )
    return _rerank_candidates(corpus, queries, cand, k, id_col, vec_col)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training: per
    query vector, the top-``k`` most-similar corpus vectors carrying a
    DIFFERENT label — the near-misses a bi-encoder must learn to push
    away (random negatives are trivially far; training signal lives in
    the hard ones). Output ``(q_id, q_label, neighbor_id,
    neighbor_label, sim)``, sim rounded to 6 dp, deterministic
    (sim desc, neighbor_id) ranking.

    Same shape and cost discipline as :func:`cosine_topk_bruteforce`:
    norms precomputed per side, query side broadcast (callers mine for
    a bounded query batch — mining for the WHOLE corpus at once should
    go through the ANN paths above as candidate generators instead),
    one dot product per pair, grouped top-K via the rank window. Rows
    with NULL labels are excluded from BOTH sides: a NULL label can't
    certify a negative.
    """
    c = corpus.filter(F.col(label_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("_cv"),
        norm(vec_col, dim).alias("_cn"),
    )
    q = queries.filter(F.col(label_col).isNotNull()).select(
        F.col(id_col).alias("q_id"),
        F.col(label_col).alias("q_label"),
        F.col(vec_col).alias("_qv"),
        norm(vec_col, dim).alias("_qn"),
    )
    d = dot(F.col("_qv"), F.col("_cv"), dim)
    sim = F.when(
        (F.col("_qn") > 0) & (F.col("_cn") > 0),
        d / (F.col("_qn") * F.col("_cn")),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(
            (F.col("neighbor_id") != F.col("q_id"))
            & (F.col("neighbor_label") != F.col("q_label"))
        )
        .select(
            "q_id",
            "q_label",
            "neighbor_id",
            "neighbor_label",
            F.round(sim, 6).alias("sim"),
        )
    )
    return grouped_top_k(
        scored, ["q_id"], "sim", k, tiebreaks=["neighbor_id"]
    ).orderBy("q_id", F.col("sim").desc(), "neighbor_id")


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    code_col: str = "codes",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: ``scale =
    max(|x|)/127``, ``code_i = round(x_i / scale)`` ∈ [-127, 127] — 4×
    memory over float32 (vs PQ's ~32× lossy compression above; int8
    is the standard first rung: cheap, near-lossless for cosine).
    All-zero vectors get scale 0 and all-zero codes; NULL vectors pass
    through NULL. Pure array expressions (transform + array_max), no
    shuffle — the codes ride the scan into whatever index wants them.

    Dequantization is ``code_i · scale``; :func:`dequantize_cosine`
    measures the cosine between original and reconstruction, the
    fidelity number a deployment gates on (int8 typically ≥ 0.999).
    """
    v = F.col(vec_col)
    mx = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    # codes reference the MATERIALIZED scale column, not the mx
    # expression: a lambda body is interpreted per ELEMENT with no
    # subexpression elimination, so inlining mx would re-run the
    # O(dim) max-abs scan dim times per row (O(dim²)); the column
    # reference blocks CollapseProject from re-inlining (verified: one
    # array_max in the optimized plan) and evaluates once per row.
    out = df.withColumn(scale_col, (mx / F.lit(127.0)).alias(scale_col))
    codes = F.when(
        F.col(scale_col) == 0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            v,
            lambda x: F.round(x.cast("double") / F.col(scale_col), 0)
            .cast("int"),
        )
    )
    return out.withColumn(code_col, codes)


def dequantize_cosine(
    vec_col: str = "embedding",
    code_col: str = "codes",
    scale_col: str = "scale",
    digits: int = 6,
) -> Column:
    """cos(original, code·scale), rounded — the quantization-fidelity
    projection, as a pure column expression over the named columns
    (the :func:`bloom_might_contain` signature shape — no DataFrame
    parameter, because none was ever used). NULL when either norm is
    zero (degenerate vectors have no direction to preserve)."""
    recon = F.transform(
        F.col(code_col), lambda c: c.cast("double") * F.col(scale_col)
    )
    orig = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    d = dot(orig, recon, None)
    no = norm(orig, None)
    nr = norm(recon, None)
    return F.round(
        F.when((no > 0) & (nr > 0), d / (no * nr)), digits
    )


def jl_project(
    df: DataFrame,
    dim: int,
    out_dim: int = 64,
    vec_col: str = "embedding",
    out_col: str = "projected",
    seed: int = 42,
    engine: str = "auto",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: compress ``vec_col``
    from ``dim`` to ``out_dim`` coordinates with a seeded Gaussian
    matrix so pairwise Euclidean geometry survives within 1±ε w.h.p.
    for ``out_dim`` = O(log n / ε²) (Johnson & Lindenstrauss 1984;
    Gaussian entries per Indyk & Motwani 1998 — the same guarantee
    family the hyperplane LSH above leans on).

    The third rung of the compression ladder: int8 shrinks bytes per
    coordinate (4×, near-lossless), PQ shrinks to code words (~32×,
    index-only), JL shrinks the COORDINATE COUNT itself — so every
    downstream pass that is linear in vector width (brute-force cosine,
    k-means training for IVF/PQ/SemDeDup, near-dup verify) gets
    ``dim/out_dim``× cheaper, not just smaller on disk. The standard
    play at corpus scale is: project once on ingest, run candidate
    generation in the narrow space, re-rank survivors with the original
    vectors (same propose/dispose contract as every blocker in this
    module).

    The matrix is ``out_dim × dim`` floats generated driver-side from
    the same splitmix/Box-Muller stream as the LSH hyperplanes — a few
    KB embedded as ONE ``array<array<double>>`` plan literal (shipped
    with the plan itself, no broadcast variable to manage). The whole
    projection is a single ``transform(matrix, row -> aggregate(
    zip_with(v, row, *), 0, +))`` expression: O(1) plan nodes at ANY
    ``dim × out_dim``, zero Python, zero shuffle — a map-only pass
    that pipelines into the scan. (The first cut unrolled each output
    coordinate into a literal multiply-add chain — "pure codegen" —
    but ``dim × out_dim`` expression NODES made Catalyst analysis +
    janino the bottleneck: measured 43 s of driver-side work for a
    500-row frame at 64→56, with codegen falling back past 64 KB
    anyway, and minutes-to-OOM at the advertised 768→32; the same
    lesson hyperplane_bucket's docstring records. The fold form plans
    in milliseconds regardless of width.)

    ``engine`` picks the execution strategy: ``"expr"`` is the pure-
    expression fold above (zero Python — right for narrow matrices);
    ``"arrow"`` is one numpy GEMM per Arrow batch through the same
    sanctioned Pandas-UDF seam as :func:`bucket_ids_udf` (a dense
    ``(B, dim) @ (dim, out_dim)`` product is exactly what the
    expression language cannot express efficiently — the interpreted
    fold pays dim·out_dim boxed lambda calls PER ROW, measured ~7 ms/
    row at 768→32). ``"auto"`` (default) switches to arrow once
    ``dim·out_dim ≥ 4096`` and numpy is importable. Both engines share
    semantics exactly: coordinates scaled by 1/√out_dim so squared
    norms (hence distances) are preserved in expectation, not just up
    to a constant; NULL vectors project to NULL; a non-NULL
    vector whose width differs from the declared ``dim`` RAISES at
    execution time instead of silently projecting to all-NULL
    coordinates (``zip_with`` pads the short side with NULL and NULLs
    the whole fold — without the guard a wrong ``dim`` or a few
    corrupt short vectors would make those documents vanish from every
    downstream top-K with zero signal: the same silent-dim-mismatch
    bug class mmr_rerank and the LSH bucketizer guard against).
    """
    if out_dim < 1 or dim < 1:
        raise ValueError("dim and out_dim must be >= 1")
    if engine not in ("auto", "expr", "arrow"):
        raise ValueError(f"unknown engine {engine!r}")
    planes = _hyperplanes(out_dim, dim, seed)
    scale = 1.0 / math.sqrt(out_dim)
    if engine == "auto":
        # gate on _HAVE_ARROW, not `_np is not None`: if the guarded
        # import failed at numpy, _np was never BOUND (NameError, not
        # None), and if numpy imported but pandas/pandas_udf didn't,
        # the arrow path would crash on the undefined decorator
        engine = "arrow" if dim * out_dim >= 4096 and _HAVE_ARROW else "expr"

    if engine == "arrow":
        projected = _jl_project_udf(planes, dim, scale)(F.col(vec_col))
    else:
        v = F.col(vec_col).cast("array<double>")
        matrix = F.lit(planes)  # ONE array<array<double>> Literal node
        proj = F.transform(
            matrix,
            lambda row: F.aggregate(
                F.zip_with(v, row, lambda x, p: x * p),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * F.lit(scale),
        )
        projected = (
            F.when(v.isNull(), F.lit(None).cast("array<double>"))
            .when(F.size(v) == dim, proj)
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("jl_project: vector width "),
                        F.size(v).cast("string"),
                        F.lit(f" != declared dim={dim}"),
                    )
                )
            )
        )
    return df.withColumn(out_col, projected)


def _jl_project_udf(planes: list[list[float]], dim: int, scale: float):
    """Arrow GEMM engine for :func:`jl_project`: one
    ``(B, dim) @ (dim, out_dim)`` product per batch (the
    :func:`bucket_ids_udf` pattern), with the same NULL-through /
    raise-on-width-mismatch semantics as the expression fold."""
    mat = _np.array(planes, dtype=_np.float64).T * scale  # (dim, out_dim)

    @_pandas_udf("array<double>")
    def _proj(v: _pd.Series) -> _pd.Series:
        mask = v.notna()
        if not mask.any():
            return _pd.Series([None] * len(v), dtype="object")
        vecs = v[mask].to_numpy()
        widths = {len(x) for x in vecs}
        if widths != {dim}:
            bad = sorted(widths - {dim})
            raise ValueError(
                f"jl_project: vector width {bad[0]} != declared dim={dim}"
            )
        proj = iter(_np.stack(vecs).astype(_np.float64) @ mat)
        return _pd.Series(
            [next(proj).tolist() if m else None for m in mask],
            dtype="object",
        )

    return _proj


def cosine_topk_projected(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    out_dim: int = 16,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-K via :func:`jl_project`: both sides project
    through the SAME seeded matrix, candidates come from a brute-force
    top-``k·oversample`` in the narrow space, and the exact cosine
    re-rank (the shared :func:`_rerank_candidates` tail) scores only
    the survivors with the ORIGINAL vectors.

    The narrow pass keeps brute force's best property — zero corpus
    shuffle, one broadcast of the query side — while cutting the
    dominant O(N·Q·dim) scoring term to O(N·Q·out_dim): at 768→32
    that is ~24× less arithmetic on the full-corpus pass, with the
    full-width work bounded by |queries|·k·oversample pairs. JL
    preserves inner products within additive ε‖x‖‖y‖, so rank
    inversions happen only between near-tied neighbors — exactly what
    ``oversample`` absorbs (recall is gated in pytest, same contract
    as the LSH/IVF/PQ paths: measured 1.0 at 8× compression on a
    clustered corpus, 0.75 on the fully isotropic worst case where
    EVERY neighbor is a near-tie — structureless vectors need
    ``out_dim`` close to ``dim``, and the pytest pins both regimes).
    """
    proj_c = jl_project(corpus, dim, out_dim, vec_col, "_jl", seed)
    proj_q = jl_project(queries, dim, out_dim, vec_col, "_jl", seed)
    cand = cosine_topk_bruteforce(
        proj_c, proj_q, k * oversample, id_col, "_jl"
    ).select("q_id", "neighbor_id")
    return _rerank_candidates(corpus, queries, cand, k, id_col, vec_col)


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Majority-vote k-nearest-neighbor classification over the
    embedding column: each query takes the most common label among its
    ``k`` nearest LABELED corpus vectors (cosine; self-matches
    excluded, so running the corpus against itself is leave-one-out
    evaluation for free).

    Output: ``(q_id, predicted_label, votes, n_neighbors)``. Vote ties
    break on the smaller label — counts only, no float accumulations,
    so the decision is exactly replayable. NULL-labeled corpus rows are
    excluded BEFORE the neighbor search (an unlabeled vector must not
    occupy a neighbor slot and then abstain).

    Plan: the neighbor search is :func:`cosine_topk_bruteforce`
    (broadcast queries, precomputed norms — swap in the IVF/LSH path
    for corpus-scale k-NN); the Q×k hit list is small by construction,
    so the label join broadcasts the hits, and voting is one hash
    aggregation + a per-query top-1.
    """
    labeled = corpus.filter(F.col(label_col).isNotNull())
    hits = cosine_topk_bruteforce(labeled, queries, k, id_col, vec_col)
    lbl = labeled.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("_lbl"),
    )
    votes = (
        lbl.join(F.broadcast(hits), "neighbor_id")
        .groupBy("q_id", "_lbl")
        .agg(
            F.count(F.lit(1)).alias("votes"),
        )
    )
    totals = votes.groupBy("q_id").agg(
        F.sum("votes").alias("n_neighbors")
    )
    best = grouped_top_k(votes, ["q_id"], "votes", 1, tiebreaks=["_lbl"])
    return (
        best.join(F.broadcast(totals), "q_id")
        .select(
            "q_id",
            F.col("_lbl").alias("predicted_label"),
            "votes",
            "n_neighbors",
        )
    )
