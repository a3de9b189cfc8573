"""Curation operators: sampling / capping / budgeting / contamination.

The catalog entries are value-hash-gated against DuckDB by the driver;
these tests pin the operator-level semantics the oracle can't see —
rate accuracy, determinism across partitionings, prefix-sum equivalence
with the single-window form, and the eval-set broadcast shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.curation import (
    SAMPLE_BUCKETS,
    cap_per_group,
    contamination_check,
    sample_bucket,
    stratified_sample,
    token_budget_select,
    weighted_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"w{i} " * 3 + "common tail text here", ["en", "de", "fr"][i % 3], f"s{i % 5}", 10 + i % 7)
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_sample_bucket_is_stable_and_uniform(spark, docs):
    b = docs.select(sample_bucket("doc_id").alias("b"))
    vals = [r.b for r in b.collect()]
    assert all(0 <= v < SAMPLE_BUCKETS for v in vals)
    # deterministic: same ids → same buckets on a differently-partitioned frame
    vals2 = [
        r.b
        for r in docs.repartition(7).select(sample_bucket("doc_id").alias("b"))
        .collect()
    ]
    assert sorted(vals) == sorted(vals2)


def test_stratified_rates_within_binomial_noise(spark, docs):
    out = stratified_sample(docs, "lang", {"en": 1.0, "de": 0.5, "fr": 0.0}, "doc_id")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("en") == 100  # rate 1.0 keeps everything
    assert "fr" not in counts  # rate 0.0 keeps nothing
    assert 25 <= counts.get("de", 0) <= 75  # 0.5 of 100 ± binomial noise


def test_stratified_default_rate_applies_to_unlisted(spark, docs):
    out = stratified_sample(docs, "lang", {"en": 1.0}, "doc_id", default_rate=1.0)
    assert out.count() == 300


def test_cap_per_group_keeps_top_n_deterministically(spark, docs):
    out = cap_per_group(docs, "source", 3, "n_chars", "doc_id")
    assert out.groupBy("source").count().agg(F.max("count")).first()[0] <= 3
    # the kept set is the lexicographically-first under (n_chars desc, id asc)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    import itertools

    rows = docs.select("doc_id", "source", "n_chars").collect()
    expected = set()
    key = lambda r: r.source
    for _, grp in itertools.groupby(sorted(rows, key=key), key=key):
        grp = sorted(grp, key=lambda r: (-r.n_chars, r.doc_id))[:3]
        expected |= {r.doc_id for r in grp}
    assert kept == expected


@pytest.mark.parametrize("num_ranges", [1, 4, 32])
def test_token_budget_equals_global_window(spark, docs, num_ranges):
    """The distributed prefix-sum must equal the single-window form for
    ANY range count (partition boundaries are an implementation detail)."""
    from pyspark.sql import Window

    out = token_budget_select(
        docs, 500, "n_chars", "n_chars", "doc_id", num_ranges=num_ranges
    ).select("doc_id", "cum_tokens")
    w = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    ref = (
        docs.withColumn("cum_tokens", F.sum("n_chars").over(w))
        .filter(F.col("cum_tokens") <= 500)
        .select("doc_id", "cum_tokens")
    )
    got = {(r.doc_id, r.cum_tokens) for r in out.collect()}
    want = {(r.doc_id, r.cum_tokens) for r in ref.collect()}
    assert got == want and len(want) > 0


def test_weighted_sample_deterministic_across_partitionings(spark, docs):
    a = weighted_sample(docs, "n_chars", 50, "doc_id")
    b = weighted_sample(docs.repartition(13), "n_chars", 50, "doc_id")
    rows_a = sorted((r.doc_id, r.sample_key) for r in a.collect())
    rows_b = sorted((r.doc_id, r.sample_key) for r in b.collect())
    assert rows_a == rows_b
    assert len(rows_a) == 50


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10), (4, 10)], "doc_id long, w long"
    )
    out = weighted_sample(df, "w", 10, "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [3, 4]


def test_weighted_sample_overwhelming_weight_always_kept(spark):
    # E-S key u^(1/w): w=10^9 pushes the key to ~1 regardless of the
    # hash draw, so the heavy row must land in any top-1 sample.
    rows = [(i, 1) for i in range(500)] + [(999, 10**9)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = weighted_sample(df, "w", 1, "doc_id")
    assert [r.doc_id for r in out.collect()] == [999]


def test_token_budget_zero_budget_empty(spark, docs):
    assert token_budget_select(docs, 0, "n_chars", "n_chars", "doc_id").count() == 0


def test_contamination_finds_verbatim_overlap(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),                      # eval doc
        (1, "prefix " + base),          # contains all 8-grams of base
        (2, "totally unrelated words that do not overlap at all here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ev = df.filter(F.col("doc_id") == 0)
    out = contamination_check(df, ev, "text", "doc_id", n=8)
    got = {(r.id, r.eval_id) for r in out.filter(F.col("id") != F.col("eval_id")).collect()}
    assert got == {(1, 0)}


def test_contamination_plan_broadcasts_eval_side(spark):
    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(50)], "doc_id long, text string"
    )
    ev = df.filter(F.col("doc_id") < 2)
    plan = contamination_check(df, ev, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("num_ranges", [1, 4, 32])
def test_pack_sequences_equals_global_window(spark, docs, num_ranges):
    """Packing layout must equal the single-window form for ANY range
    count (same contract as token_budget_select)."""
    from pyspark.sql import Window

    from cassandra_slow_queries_spark.operators.curation import pack_sequences

    out = pack_sequences(
        docs, window=64, token_col="n_chars", id_col="doc_id",
        num_ranges=num_ranges,
    ).select("doc_id", "start_offset", "pack_id", "pack_pos", "n_spans")
    w = Window.orderBy(F.col("doc_id").asc())
    start = F.sum("n_chars").over(w) - F.col("n_chars")
    end = F.sum("n_chars").over(w) - F.lit(1)
    ref = docs.select(
        "doc_id",
        start.alias("start_offset"),
        F.floor(start / 64).alias("pack_id"),
        F.pmod(start, F.lit(64)).alias("pack_pos"),
        F.when(F.col("n_chars") <= 0, F.lit(0))
        .otherwise(F.floor(end / 64) - F.floor(start / 64) + 1)
        .alias("n_spans"),
    )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in ref.collect()}
    assert got == want and len(want) == 300


def test_pack_sequences_invariants(spark, docs):
    """start_offset contiguity, token conservation, n_spans arithmetic."""
    from cassandra_slow_queries_spark.operators.curation import pack_sequences

    rows = sorted(
        pack_sequences(docs, window=100, token_col="n_chars", id_col="doc_id")
        .select("doc_id", "n_chars", "start_offset", "pack_id", "pack_pos", "n_spans")
        .collect(),
        key=lambda r: r.doc_id,
    )
    # contiguity: each doc starts exactly where the previous one ended
    offset = 0
    for r in rows:
        assert r.start_offset == offset
        offset += r.n_chars
    # conservation: the final offset is the total token count
    assert offset == sum(r.n_chars for r in rows)
    for r in rows:
        assert r.pack_id == r.start_offset // 100
        assert r.pack_pos == r.start_offset % 100
        last = r.start_offset + r.n_chars - 1
        assert r.n_spans == last // 100 - r.start_offset // 100 + 1


def test_pack_sequences_zero_token_docs_uniform(spark):
    """Zero-token documents get n_spans = 0 regardless of whether their
    start_offset is window-aligned (the ADVICE-flagged inconsistency)."""
    from cassandra_slow_queries_spark.operators.curation import pack_sequences

    rows = [(0, 64), (1, 0), (2, 30), (3, 0), (4, 34), (5, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = {
        r.doc_id: r
        for r in pack_sequences(
            df, window=64, token_col="n_chars", id_col="doc_id"
        ).collect()
    }
    # doc 1 window-aligned (offset 64), doc 3 mid-window (offset 94),
    # doc 5 window-aligned again (offset 128): all must report 0 spans
    assert out[1].start_offset == 64 and out[1].n_spans == 0
    assert out[3].start_offset == 94 and out[3].n_spans == 0
    assert out[5].start_offset == 128 and out[5].n_spans == 0
    assert out[0].n_spans == 1 and out[2].n_spans == 1
    # doc 4 spans tokens 94..127 — ends exactly at the window-2 boundary
    # without crossing it, so a single span
    assert out[4].n_spans == 1


@pytest.mark.parametrize(
    "text,expect_scrubbed,expect_counts",
    [
        (
            "mail me at a.b+c@example.org today",
            "mail me at <EMAIL> today",
            {"n_email": 1, "n_ip": 0, "n_phone": 0},
        ),
        (
            "host 192.168.0.1 and 8.8.8.8 up",
            "host <IP> and <IP> up",
            {"n_email": 0, "n_ip": 2, "n_phone": 0},
        ),
        # version strings must NOT be redacted (3 parts, not 4)
        (
            "upgrade to v1.2.3 now",
            "upgrade to v1.2.3 now",
            {"n_email": 0, "n_ip": 0, "n_phone": 0},
        ),
        # 5-part dotted run: first four components match (documented limit)
        (
            "build 1.2.3.4.5 shipped",
            "build <IP>.5 shipped",
            {"n_email": 0, "n_ip": 1, "n_phone": 0},
        ),
        # out-of-range quad still redacts (over-redaction is the safe side)
        (
            "fake 999.999.999.999 addr",
            "fake <IP> addr",
            {"n_email": 0, "n_ip": 1, "n_phone": 0},
        ),
        (
            "call +1-202-555-0147 now",
            "call <PHONE> now",
            {"n_email": 0, "n_ip": 0, "n_phone": 1},
        ),
        # bare digit runs are ids, not phones — conservative by design
        (
            "order 12345678901 confirmed",
            "order 12345678901 confirmed",
            {"n_email": 0, "n_ip": 0, "n_phone": 0},
        ),
        # phone inside an email local part: consumed by the email pass,
        # so counts equal emitted tokens (no phantom n_phone)
        (
            "reach +1234567890@x.com ok",
            "reach <EMAIL> ok",
            {"n_email": 1, "n_ip": 0, "n_phone": 0},
        ),
    ],
)
def test_pii_scrub_table(spark, text, expect_scrubbed, expect_counts):
    from cassandra_slow_queries_spark.operators.curation import pii_scrub

    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = pii_scrub(df, "text").collect()[0]
    assert row.text == expect_scrubbed
    for col, want in expect_counts.items():
        assert getattr(row, col) == want, (col, row)


def test_pii_scrub_out_col_preserves_original(spark):
    from cassandra_slow_queries_spark.operators.curation import pii_scrub

    df = spark.createDataFrame([(0, "a@b.co x")], "doc_id long, text string")
    row = pii_scrub(df, "text", out_col="clean").collect()[0]
    assert row.text == "a@b.co x" and row.clean == "<EMAIL> x"


def test_repetition_metrics_hand_computed(spark):
    """Gopher-style repetition profile on hand-built docs:

    - doc 0: "x y x y x y x y" — one bigram dominates; chunks
      ("x y x y", "x y x y") are within-doc duplicates.
    - doc 1: all-distinct words — no repetition anywhere.
    - doc 2: single word — no bigrams (frac 0.0 by convention).
    - doc 3: empty text — one empty token, one empty chunk.
    """
    from cassandra_slow_queries_spark.operators.curation import (
        repetition_metrics,
    )

    rows = [
        (0, "x y x y x y x y"),
        (1, "a b c d e f g h"),
        (2, "solo"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.id: (r.dup_chunk_frac, r.top_bigram_frac, r.top_word_frac)
        for r in repetition_metrics(df, "text", "doc_id", chunk_words=4).collect()
    }
    # doc 0: 8 words → 2 chunks, both "x y x y" → dup 1/2; bigrams:
    # 7 total, "x y" appears 4× → 4/7; words: "x" 4 of 8 → 1/2
    assert out[0] == (0.5, round(4 / 7, 6), 0.5)
    assert out[1] == (0.0, round(1 / 7, 6), 0.125)
    assert out[2] == (0.0, 0.0, 1.0)
    assert out[3] == (0.0, 0.0, 1.0)


def test_repetition_metrics_null_text_and_ties(spark):
    """Edges the r13 single-projection rewrite must keep from the
    explode-pipeline era:

    - NULL text → (1.0, 0.0, 0.0): the chunker emitted one NULL span
      and count_distinct ignored NULLs (1 − 0/1), while the word and
      bigram pipelines produced no rows (coalesce → 0.0).
    - modal TIES (two words with equal max multiplicity) → max
      multiplicity, not first-seen or sum: "a a b b" → 2/4.
    - the longest-run fold is order-independent: scattered repeats
      count the same as adjacent ones ("a b a b a" → "a" 3/5).
    """
    from cassandra_slow_queries_spark.operators.curation import (
        repetition_metrics,
    )

    rows = [(0, None), (1, "a a b b"), (2, "a b a b a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.id: (r.dup_chunk_frac, r.top_bigram_frac, r.top_word_frac)
        for r in repetition_metrics(
            df, "text", "doc_id", chunk_words=2
        ).collect()
    }
    assert out[0] == (1.0, 0.0, 0.0)
    # doc 1: chunks "a a"/"b b" distinct → 0.0; bigrams a a, a b, b b
    # all once → 1/3; words tie at 2 → 2/4
    assert out[1] == (0.0, round(1 / 3, 6), 0.5)
    # doc 2: chunks "a b"/"a b"/"a" → dup 1/3; bigram "a b" 2/4;
    # word "a" 3/5 despite never being adjacent to itself
    assert out[2] == (round(1 / 3, 6), 0.5, 0.6)


def test_repetition_and_quality_filter_plans_are_single_pass(spark):
    """The r13 rewrite contract: repetition_metrics and quality_filter
    are ONE projection over ONE scan — no explode (Generate), no
    aggregation, no join may reappear in their optimized plans. The
    values themselves are pinned by the pure-Python differential
    (test_properties) and the oracle; this pins the SHAPE the 5-6×
    sf1/sf3 win came from."""
    from cassandra_slow_queries_spark.operators.curation import (
        quality_filter,
        repetition_metrics,
    )

    df = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f")], "doc_id long, text string"
    )
    for frame in (
        repetition_metrics(df, "text", "doc_id"),
        quality_filter(df, "text", "doc_id"),
    ):
        plan = frame._jdf.queryExecution().optimizedPlan().toString()
        for op in ("Generate", "Aggregate", "Join"):
            assert op not in plan, (op, plan)


def test_group_percent_rank_equals_row_window(spark):
    from pyspark.sql import Window

    from cassandra_slow_queries_spark.operators.curation import (
        group_percent_rank,
    )

    rows = [(i, f"g{i % 4}", (i * 3) % 7) for i in range(100)] + [(900, "solo", 5)]
    df = spark.createDataFrame(rows, "id long, g string, score long")
    got = {
        r["id"]: r["pct_rank"]
        for r in group_percent_rank(df, "score", "g").collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("score").asc())
    want = {
        r["id"]: r["pr"]
        for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])
    assert got[900] == 0.0  # single-row group convention


def test_compression_ratio_signal(spark):
    """Repetitive text compresses far below varied prose; NULL/empty
    yield NULL; the value is deterministic across invocations."""
    from cassandra_slow_queries_spark.operators.curation import (
        compression_ratio,
    )

    df = spark.createDataFrame(
        [
            (1, "spam " * 200),
            (2, " ".join(f"w{i}x{i * 7 % 13}" for i in range(200))),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(df).collect()
    }
    assert out[3] is None and out[4] is None
    assert 0 < out[1] < 0.1          # boilerplate: extreme redundancy
    assert out[2] > 3 * out[1]       # varied text compresses much worse
    again = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(df).collect()
    }
    assert out == again


def test_assign_split_partitions_and_is_deterministic(spark):
    from cassandra_slow_queries_spark.operators.curation import assign_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_split(df, "doc_id", fr)
    rows = {r.doc_id: r.split for r in out.collect()}
    # every row labeled, labels from the declared set
    assert set(rows.values()) <= {"train", "val", "test"}
    assert len(rows) == 2000
    # roughly proportional (md5 is uniform; 2000 rows, loose bounds)
    from collections import Counter

    c = Counter(rows.values())
    assert 1400 < c["train"] < 1800
    assert 100 < c["val"] < 320 and 100 < c["test"] < 320
    # deterministic across invocations AND across subsets: a row keeps
    # its split when the corpus around it changes
    sub = assign_split(
        df.filter("doc_id % 3 = 0"), "doc_id", fr
    ).collect()
    assert all(rows[r.doc_id] == r.split for r in sub)


def test_assign_split_validates_fractions(spark):
    import pytest as _pytest

    from cassandra_slow_queries_spark.operators.curation import assign_split

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with _pytest.raises(ValueError):
        assign_split(df, "doc_id", {"train": 0.5, "test": 0.4})


# ---------------------------------------------------------------------------
# NULL-handling and rounding regressions (extension-session review)
# ---------------------------------------------------------------------------


def test_assign_split_null_id_is_null_not_last_label(spark):
    from cassandra_slow_queries_spark.operators.curation import assign_split

    df = spark.createDataFrame(
        [(1,), (None,), (2,)], "doc_id long"
    )
    got = {
        r["doc_id"]: r["split"]
        for r in assign_split(
            df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    # a NULL id must not silently land in the held-out test split
    assert got[None] is None
    assert got[1] in ("train", "val", "test")


def test_mixture_temperature_keeps_null_source_group(spark):
    from cassandra_slow_queries_spark.operators.curation import (
        mixture_sample,
    )

    rows = [(i, "a") for i in range(50)] + [(i + 50, None) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    kept = mixture_sample(
        df, "src", "doc_id", budget=100, temperature=1.0
    )
    by_src = {
        r["src"]: r["cnt"]
        for r in kept.groupBy("src").agg(F.count("*").alias("cnt")).collect()
    }
    # the NULL source consumed half the mixture share — it must also
    # RECEIVE it, not vanish in the rates back-join
    assert by_src.get("a", 0) == 50
    assert by_src.get(None, 0) == 50


def test_stratified_rate_threshold_rounds_not_truncates(spark):
    import hashlib

    from cassandra_slow_queries_spark.operators.curation import (
        stratified_sample,
    )

    # find an id whose portable bucket is exactly 5699: kept at rate
    # 0.57 only if the threshold rounds to 5700 (int() truncated to
    # 5699 and dropped it)
    def bucket(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 10000

    edge_id = next(i for i in range(100_000) if bucket(i) == 5699)
    df = spark.createDataFrame([(edge_id, "en")], "doc_id long, lang string")
    kept = stratified_sample(df, "lang", {"en": 0.57}, "doc_id").count()
    assert kept == 1


def test_group_percent_rank_null_cells_get_ranks(spark):
    from cassandra_slow_queries_spark.operators.curation import (
        group_percent_rank,
    )

    rows = [("g", None), ("g", 1.0), ("g", 2.0), (None, 5.0)]
    df = spark.createDataFrame(rows, "grp string, score double")
    out = group_percent_rank(df, "score", "grp").collect()
    assert len(out) == 4
    by = {(r["grp"], r["score"]): r["pct_rank"] for r in out}
    # NULL score ranks first (the SQL NULLS-FIRST peer group), and the
    # NULL group ranks within itself — neither gets a NULL rank
    assert by[("g", None)] == 0.0
    assert by[("g", 1.0)] == 0.5
    assert by[("g", 2.0)] == 1.0
    assert by[(None, 5.0)] == 0.0


def test_prefix_sum_adaptive_and_large_range_paths(spark):
    """r13 opt: ``num_ranges=None`` resolves adaptively from plan-stats
    size (small local frames → few ranges, never an error), and a range
    count past the 64-branch when-chain limit takes the broadcast-join
    offset path — both must produce the exact global running sum."""
    from pyspark.sql import Window

    from cassandra_slow_queries_spark.operators.curation import (
        _distributed_prefix_sum,
        _resolve_num_ranges,
    )

    df = spark.createDataFrame(
        [(i, (i * 7) % 13 + 1) for i in range(500)], "id long, tok long"
    )
    # adaptive resolution: a tiny frame resolves to a small positive count
    n = _resolve_num_ranges(df, None)
    assert 1 <= n <= 32
    assert _resolve_num_ranges(df, 7) == 7  # explicit always wins

    order = [F.col("tok").desc(), F.col("id").asc()]
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("tok").over(w)).collect()
    }
    # None (adaptive) and 100 (> 64 → broadcast-join offsets) must both
    # equal the single-window truth
    for num_ranges in (None, 100):
        summed, ranged = _distributed_prefix_sum(
            df, "tok", order, num_ranges
        )
        try:
            got = {
                r["id"]: r["cum_tokens"]
                for r in summed.select("id", "cum_tokens").collect()
            }
        finally:
            ranged.unpersist()
        assert got == want, f"num_ranges={num_ranges}"


def test_repetition_chunk_words_validated(spark):
    """ADVICE r13: the inline chunk arithmetic must reject
    chunk_words < 1 exactly like chunk_documents — the explode-era path
    raised via the chunker; silent division by zero would yield
    NaN/NULL fractions instead."""
    from cassandra_slow_queries_spark.operators.curation import (
        quality_filter,
        repetition_metrics,
    )

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    for bad in (0, -3):
        with pytest.raises(ValueError, match="chunk_words"):
            repetition_metrics(df, "text", "doc_id", chunk_words=bad)
        with pytest.raises(ValueError, match="chunk_words"):
            quality_filter(df, "text", "doc_id", chunk_words=bad)


def test_repetition_chunks_match_word_chunk_spans(spark):
    """ADVICE r13 cross-pin: _repetition_cols duplicates
    chunk_documents' window/slice arithmetic inline (the single-
    projection rewrite). If either copy changes, dup_chunk_frac would
    silently diverge from the chunker — so pin, over varied
    (n_words, chunk_words), that the inline chunk array equals
    word_chunk_spans' spans exactly (same count, same text, same
    order)."""
    from cassandra_slow_queries_spark.operators.curation import (
        _repetition_cols,  # the inline arithmetic under test
    )
    from cassandra_slow_queries_spark.operators.dedup import (
        word_chunk_spans,
    )

    texts = [
        "",  # split('') == [''] — one empty chunk
        "w",
        "a b",
        "a b c",
        "a b c d",
        "a b c d e",
        "a b c d e f g h i",
        "x y x y x y x y",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for cw in (1, 2, 3, 4, 7):
        # expose the inline chunk array via the same transform
        # expression _repetition_cols builds internally
        words = F.split(F.col("text"), " ", -1)
        extra = F.greatest(F.size(words) - cw, F.lit(0))
        n_win = F.lit(1) + F.ceil(extra / F.lit(float(cw))).cast("int")
        inline = df.select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), n_win - 1),
                lambda i: F.array_join(F.slice(words, i * cw + 1, cw), " "),
            ).alias("chunks"),
        )
        got = {r.doc_id: r.chunks for r in inline.collect()}
        spans = word_chunk_spans(df, "text", "doc_id", chunk_words=cw)
        want: dict[int, list[str]] = {i: [] for i, _ in rows}
        for r in spans.orderBy("id", "pos").collect():
            want[r.id].append(r.span)
        assert got == want, f"chunk_words={cw}"
        # and dup_chunk_frac itself agrees with a fraction computed
        # from the chunker's spans
        dup_col, _, _ = _repetition_cols("text", cw)
        got_dup = {
            r.doc_id: r.dup
            for r in df.select("doc_id", dup_col.alias("dup")).collect()
        }
        for i, _ in rows:
            expect = round(1 - len(set(want[i])) / len(want[i]), 6)
            assert got_dup[i] == expect, (i, cw)
