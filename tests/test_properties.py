"""Property-based invariants over random log corpora (SURVEY.md §5.4).

hypothesis generates message corpora; invariants checked:
- Σ volume.count == number of parsed rows (no row lost or duplicated by
  the five-report fan-out),
- every report row's count ≥ min_count (HAVING),
- volume_top emits ≤ rows_per_minute rows per minute,
- avg_duration is always the truncating quotient.

One Spark run per example would be minutes; instead hypothesis drives a
single sampled corpus per settings profile (max_examples kept tiny) —
the point is randomized structure, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.config import AnalysisConfig
from cassandra_slow_queries_spark.operators.aggregates import five_reports, prepare_fact

STATEMENTS = [
    "SELECT * FROM ks1.t1 WHERE a=? LIMIT 1;",
    "SELECT x FROM ks2.t2;",
    "INSERT INTO ks1.t1 (a) VALUES (1)",
    "BEGIN BATCH APPLY",
    "DELETE FROM ks1.t1",
    "UPDATE ks1.t1 SET a=2",
]

row_strategy = st.tuples(
    st.integers(min_value=0, max_value=9),     # minute bucket
    st.integers(min_value=0, max_value=59),    # second
    st.sampled_from(STATEMENTS),
    st.integers(min_value=1, max_value=5000),  # duration
    st.sampled_from(["", "pk1", "pk2", "pk3"]),
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row_strategy, min_size=1, max_size=60))
def test_five_report_invariants(spark, rows):
    data = [
        (
            f"2024-01-01 10:0{minute}:{second:02d}",
            "SELECT" if stmt.lower().startswith("select")
            else "INSERT" if stmt.lower().startswith("insert")
            else "BATCH" if stmt.lower().startswith("begin batch")
            else "DELETE" if stmt.lower().startswith("delete")
            else "UPDATE",
            stmt,
            dur,
            pk if stmt.lower().startswith(("select", "insert")) else None,
        )
        for minute, second, stmt, dur, pk in rows
    ]
    fact = spark.createDataFrame(
        data, "ts_s string, type string, query string, duration long, primary_key string"
    ).select(
        F.to_timestamp("ts_s").alias("ts"),
        "type",
        "duration",
        "query",
        F.create_map().cast("map<string,string>").alias("bound_values"),
        F.array().cast("array<string>").alias("tags"),
        F.lit(None).cast("string").alias("keyspace"),
        F.lit(None).cast("string").alias("column_family"),
        "primary_key",
    )
    cfg = AnalysisConfig(min_count=2, rows_per_minute=3, top_n=50)
    prepared = prepare_fact(fact).persist()
    reports = five_reports(prepared, cfg)

    n_parsed = prepared.count()
    volume = reports["volume"].collect()
    # Σ volume.count == parsed rows (volume has no row filter; HAVING may
    # drop sparse minutes, so compare against the unfiltered grouping)
    unfiltered = prepared.groupBy("minute").count().agg(F.sum("count")).first()[0]
    assert unfiltered == n_parsed
    for name, rep in reports.items():
        for r in rep.collect():
            assert r["count"] >= cfg.min_count, f"{name} violates HAVING"
            assert r["avg_duration"] == r["duration"] // r["count"], (
                f"{name} violates truncating average"
            )
    per_minute = {}
    for r in reports["volume_top"].collect():
        per_minute[r.minute] = per_minute.get(r.minute, 0) + 1
    assert all(v <= cfg.rows_per_minute for v in per_minute.values())
    prepared.unpersist()


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tokens=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=80),
    window=st.integers(min_value=1, max_value=256),
)
def test_pack_sequences_properties(spark, tokens, window):
    """Random token lists: offsets are contiguous, tokens conserved,
    n_spans matches the boundary arithmetic, zero-token docs always 0."""
    from cassandra_slow_queries_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        list(enumerate(tokens)), "doc_id long, n_chars long"
    )
    rows = sorted(
        pack_sequences(df, window=window, token_col="n_chars", id_col="doc_id",
                       num_ranges=4).collect(),
        key=lambda r: r.doc_id,
    )
    offset = 0
    for r, t in zip(rows, tokens):
        assert r.start_offset == offset
        assert r.pack_id == offset // window
        assert r.pack_pos == offset % window
        if t == 0:
            assert r.n_spans == 0
        else:
            assert r.n_spans == (offset + t - 1) // window - offset // window + 1
        offset += t
    assert offset == sum(tokens)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet="abc @.+-0123456789\n", min_size=0, max_size=60
        ),
        min_size=1,
        max_size=20,
    )
)
def test_pii_scrub_idempotent_and_counts_match_tokens(spark, texts):
    """Scrubbing is idempotent (the <KIND> tokens never re-match any
    pattern) and every audit count equals the tokens actually emitted."""
    from cassandra_slow_queries_spark.operators.curation import pii_scrub

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    once = pii_scrub(df, "text").collect()
    for r, original in zip(sorted(once, key=lambda r: r.doc_id), texts):
        assert r.text.count("<EMAIL>") == r.n_email
        assert r.text.count("<IP>") == r.n_ip
        assert r.text.count("<PHONE>") == r.n_phone
    twice = pii_scrub(
        spark.createDataFrame(
            [(r.doc_id, r.text) for r in once], "doc_id long, text string"
        ),
        "text",
    ).collect()
    assert {(r.doc_id, r.text) for r in twice} == {
        (r.doc_id, r.text) for r in once
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tokens=st.lists(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=40
    ),
    num_ranges=st.sampled_from([1, 2, 7, 40, 100]),
)
def test_distributed_prefix_sum_matches_single_window(spark, tokens, num_ranges):
    """The distributed prefix-sum (range repartition + local windows +
    broadcast offsets) must equal a single global running sum for EVERY
    partitioning — including the adversarial range counts: 1 (all local),
    2 (one boundary), row-count, and > row-count (empty ranges).

    Partition boundaries are exactly where the offset bookkeeping can go
    wrong; equal keys straddling a range boundary are exercised by the
    narrow token domain."""
    from pyspark.sql import Window

    from cassandra_slow_queries_spark.operators.curation import (
        _distributed_prefix_sum,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "id long, tok long"
    )
    order = [F.col("tok").desc(), F.col("id").asc()]
    summed, ranged = _distributed_prefix_sum(df, "tok", order, num_ranges)
    try:
        got = {
            r["id"]: r["cum_tokens"]
            for r in summed.select("id", "cum_tokens").collect()
        }
    finally:
        ranged.unpersist()
    w = Window.orderBy(*order)  # single-task global window: the oracle
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn(
            "cum", F.sum("tok").over(w)
        ).select("id", "cum").collect()
    }
    assert got == want


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    quotes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # key
            st.integers(min_value=0, max_value=50),  # ts
            st.integers(min_value=0, max_value=99),  # state
        ),
        max_size=15,
    ),
    probes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=20,
    ),
)
def test_as_of_join_matches_bruteforce(spark, quotes, probes):
    """Union+window as-of join equals the brute-force per-probe scan
    ("latest quote at or before, per key") on random inputs — including
    duplicate probe timestamps and keys with no quotes."""
    from cassandra_slow_queries_spark.operators.asof import as_of_join

    # dedupe quotes per (key, ts) deterministically (max state), as the
    # operator contract requires
    qmap = {}
    for k, ts, state in quotes:
        qmap[(k, ts)] = max(state, qmap.get((k, ts), -1))
    qrows = [(k, ts, v) for (k, ts), v in qmap.items()]
    qdf = spark.createDataFrame(qrows or [(99, 0, 0)], "k long, ts long, state long")
    pdf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(probes)],
        "p_id long, k long, ts long",
    )
    got = {
        r.p_id: r.asof_state
        for r in as_of_join(pdf, qdf, ["k"], "ts").collect()
    }
    want = {}
    for i, (k, ts) in enumerate(probes):
        cands = [(qts, v) for (qk, qts), v in qmap.items() if qk == k and qts <= ts]
        want[i] = max(cands)[1] if cands else None
    assert got == want
    # the salted (time-banded) variant is row-identical to the unsalted
    # path — including band counts larger than the distinct-ts count,
    # where most bands are empty and carry-in does all the work
    for n_bands in (2, 7, 64):
        salted = {
            r.p_id: r.asof_state
            for r in as_of_join(
                pdf, qdf, ["k"], "ts", salt_bands=n_bands
            ).collect()
        }
        assert salted == want, f"salt_bands={n_bands}"


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=25),
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=300),  # lo
            st.integers(min_value=0, max_value=80),   # width (0 → empty)
        ),
        max_size=12,
    ),
    width=st.sampled_from([1, 7, 64, 512, None]),
)
def test_interval_join_matches_bruteforce(spark, points, intervals, width):
    """Bucket-banded interval join equals the brute-force containment
    scan for every bucket width — including widths smaller than, equal
    to, and far larger than the intervals, and the self-tuned
    median-length default (``None``)."""
    from cassandra_slow_queries_spark.operators.rangejoin import interval_join

    ivs = [(i, lo, lo + w) for i, (lo, w) in enumerate(intervals)]
    pdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(points)], "p_id long, v long"
    )
    idf = spark.createDataFrame(
        ivs or [(99, 0, 0)], "iv_id long, lo long, hi long"
    )
    got = {
        (r.p_id, r.iv_id)
        for r in interval_join(
            pdf, idf, "v", bucket_width=width, spread=False
        ).collect()
    }
    want = {
        (pi, ii)
        for pi, v in enumerate(points)
        for ii, lo, hi in ivs
        if lo <= v < hi
    }
    assert got == want


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "ee"]),
            min_size=0,
            max_size=17,
        ).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    chunk_words=st.sampled_from([1, 3, 4]),
    min_dup_docs=st.sampled_from([2, 3]),
)
def test_strip_duplicate_chunks_matches_pure_python(
    spark, texts, chunk_words, min_dup_docs
):
    """Span-level exact dedup equals a direct Python re-implementation
    on random small-alphabet corpora (heavy chunk collisions by
    construction): chunking boundaries, hot-span selection by DISTINCT
    doc count, order-exact reconstruction, and all-hot documents
    surviving with empty clean_text."""
    from cassandra_slow_queries_spark.operators.dedup import (
        strip_corpus_duplicate_chunks,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.id: (r.n_spans, r.n_dup_spans, r.clean_text)
        for r in strip_corpus_duplicate_chunks(
            df, "text", "doc_id", chunk_words, min_dup_docs
        ).collect()
    }

    def chunks(t: str) -> list[str]:
        words = t.split(" ")
        return [
            " ".join(words[i : i + chunk_words])
            for i in range(0, len(words), chunk_words)
        ]

    from collections import defaultdict

    docs_per_span = defaultdict(set)
    for i, t in enumerate(texts):
        for c in chunks(t):
            docs_per_span[c].add(i)
    hot = {c for c, d in docs_per_span.items() if len(d) >= min_dup_docs}
    want = {}
    for i, t in enumerate(texts):
        cs = chunks(t)
        kept = [c for c in cs if c not in hot]
        want[i] = (len(cs), len(cs) - len(kept), " ".join(kept))
    assert got == want


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["x", "y", "zz"]), min_size=0, max_size=14
        ).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    chunk_words=st.sampled_from([2, 4]),
)
def test_repetition_metrics_match_pure_python(spark, texts, chunk_words):
    """Gopher repetition fractions equal a direct Python re-computation
    on random tiny-alphabet corpora (maximal repetition by construction):
    within-doc duplicate chunks, modal bigram, modal word — including
    empty and single-word documents."""
    from collections import Counter

    from cassandra_slow_queries_spark.operators.curation import (
        repetition_metrics,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.id: (r.dup_chunk_frac, r.top_bigram_frac, r.top_word_frac)
        for r in repetition_metrics(
            df, "text", "doc_id", chunk_words
        ).collect()
    }
    for i, t in enumerate(texts):
        words = t.split(" ")
        chunks = [
            " ".join(words[j : j + chunk_words])
            for j in range(0, len(words), chunk_words)
        ]
        dup = round(1 - len(set(chunks)) / len(chunks), 6)
        bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        bg = (
            round(Counter(bigrams).most_common(1)[0][1] / len(bigrams), 6)
            if bigrams
            else 0.0
        )
        wd = round(Counter(words).most_common(1)[0][1] / len(words), 6)
        assert got[i] == (dup, bg, wd), (i, t)


# ---------------------------------------------------------------------------
# merge_upsert / scd2_history (operators/merge.py) vs pure-Python oracles
# ---------------------------------------------------------------------------

change_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key
        st.integers(min_value=0, max_value=20),  # version
        st.booleans(),                           # tombstone
    ),
    min_size=0,
    max_size=40,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snap=change_strategy, chg=change_strategy)
def test_merge_upsert_matches_bruteforce(spark, snap, chg):
    from cassandra_slow_queries_spark.operators.merge import merge_upsert

    # give every row a unique seq so (version, seq) is a strict order
    snap_rows = [(k, v, i) for i, (k, v, _t) in enumerate(snap)]
    chg_rows = [
        (k, v, 1000 + i, t) for i, (k, v, t) in enumerate(chg)
    ]
    snap_df = spark.createDataFrame(
        snap_rows or [], "k long, v long, seq long"
    ) if snap_rows else spark.createDataFrame([], "k long, v long, seq long")
    chg_df = spark.createDataFrame(
        chg_rows or [], "k long, v long, seq long, dead boolean"
    ) if chg_rows else spark.createDataFrame(
        [], "k long, v long, seq long, dead boolean"
    )
    out = merge_upsert(
        snap_df, chg_df, keys=["k"], version_cols=["v", "seq"],
        tombstone_col="dead",
    )
    got = {r["k"]: (r["v"], r["seq"]) for r in out.collect()}

    # brute force: per key, max (v, seq, change-priority); drop tombstones
    best: dict[int, tuple] = {}
    for k, v, seq in snap_rows:
        cand = (v, seq, 0, False)
        if k not in best or cand[:3] > best[k][:3]:
            best[k] = cand
    for k, v, seq, dead in chg_rows:
        cand = (v, seq, 1, dead)
        if k not in best or cand[:3] > best[k][:3]:
            best[k] = cand
    want = {k: (v, seq) for k, (v, seq, _p, dead) in best.items() if not dead}
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(chg=change_strategy)
def test_scd2_intervals_partition_each_key_timeline(spark, chg):
    from cassandra_slow_queries_spark.operators.merge import scd2_history

    rows = [(k, v, i) for i, (k, v, _t) in enumerate(chg)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "k long, v long, seq long")
    hist = scd2_history(df, keys=["k"], version_cols=["v", "seq"])
    by_key: dict[int, list] = {}
    for r in hist.collect():
        by_key.setdefault(r["k"], []).append(r)
    for k, intervals in by_key.items():
        intervals.sort(key=lambda r: (r["v"], r["seq"]))
        # exactly one open (current) interval per key, and it is the last
        currents = [r for r in intervals if r["is_current"]]
        assert len(currents) == 1 and intervals[-1]["is_current"]
        # intervals chain: each valid_to equals the next valid_from
        for a, b in zip(intervals, intervals[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["valid_from"] == a["v"]
        assert intervals[-1]["valid_to"] is None


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    acts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),    # user
            st.integers(min_value=0, max_value=14),   # day offset
        ),
        min_size=1,
        max_size=60,
    ),
    window=st.integers(min_value=1, max_value=5),
)
def test_stickiness_matches_bruteforce(spark, acts, window):
    """stickiness's explode-linearized trailing distinct-actives must
    equal the brute-force per-day window recount."""
    import datetime

    from cassandra_slow_queries_spark.operators.analytics import stickiness

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (u, base + datetime.timedelta(days=d, hours=u % 3))
        for u, d in acts
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["day"]: (r["dau"], r["mau"])
        for r in stickiness(df, "user_id", "ts", window_days=window).collect()
    }
    day_users: dict[datetime.date, set] = {}
    for u, d in acts:
        day_users.setdefault((base + datetime.timedelta(days=d)).date(), set()).add(u)
    for day, users in day_users.items():
        trailing = set()
        for back in range(window):
            trailing |= day_users.get(day - datetime.timedelta(days=back), set())
        assert got[day] == (len(users), len(trailing)), day
    assert set(got) == set(day_users)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    acts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),    # user
            st.integers(min_value=0, max_value=20),   # day offset
        ),
        min_size=1,
        max_size=50,
    ),
)
def test_cohort_retention_matches_bruteforce(spark, acts):
    import datetime

    from cassandra_slow_queries_spark.operators.analytics import (
        cohort_retention,
    )

    base = datetime.datetime(2024, 3, 4)  # a Monday
    rows = [
        (u, base + datetime.timedelta(days=d, minutes=u))
        for u, d in acts
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort"].date(), r["offset"]): (r["n_active"], r["cohort_size"])
        for r in cohort_retention(df, "user_id", "ts", "week").collect()
    }
    def week(d):
        dt = (base + datetime.timedelta(days=d)).date()
        return dt - datetime.timedelta(days=dt.weekday())
    first_week = {}
    for u, d in acts:
        w = week(d)
        if u not in first_week or w < first_week[u]:
            first_week[u] = w
    expect: dict[tuple, set] = {}
    for u, d in acts:
        off = (week(d) - first_week[u]).days // 7
        expect.setdefault((first_week[u], off), set()).add(u)
    sizes = {}
    for u, w in first_week.items():
        sizes[w] = sizes.get(w, 0) + 1
    assert set(got) == set(expect)
    for key, users in expect.items():
        assert got[key] == (len(users), sizes[key[0]]), key


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    baskets=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),   # basket
            st.integers(min_value=0, max_value=5),   # item
        ),
        min_size=1,
        max_size=60,
    ),
    cap=st.integers(min_value=1, max_value=6),
)
def test_association_rules_match_bruteforce(spark, baskets, cap):
    from itertools import combinations

    from cassandra_slow_queries_spark.operators.basket import (
        association_rules,
    )

    df = spark.createDataFrame(baskets, "basket long, item long")
    got = {
        (r["antecedent"], r["consequent"]): r["pair_count"]
        for r in association_rules(
            df, "basket", "item",
            min_item_count=1, min_pair_count=1, max_basket_size=cap,
        ).collect()
    }
    sets: dict[int, set] = {}
    for b, i in baskets:
        sets.setdefault(b, set()).add(i)
    kept = {b: s for b, s in sets.items() if len(s) <= cap}
    pairs: dict[tuple, int] = {}
    for s in kept.values():
        for a, b in combinations(sorted(s), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    expect = {}
    for (a, b), c in pairs.items():
        expect[(a, b)] = c
        expect[(b, a)] = c
    assert got == expect


# ---------------------------------------------------------------------------
# q-digest compress invariants (pure Python — no Spark session needed,
# so hypothesis can afford real example counts here)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=255), min_size=1, max_size=400
    ),
    k=st.integers(min_value=1, max_value=64),
)
def test_qd_compress_invariants_pure_python(vals, k):
    """The theorems the Spark gates lean on, fuzzed directly over the
    fold: mass conservation, non-leaf counts below the threshold, the
    rank sandwich at EVERY domain value, and the size bound."""
    from cassandra_slow_queries_spark.operators.sketches import _qd_compress

    L = 8  # domain [0, 256)
    n = len(vals)
    t = max(1, n // k)
    counts: dict = {}
    for v in vals:
        counts[(L, v)] = counts.get((L, v), 0) + 1
    digest = _qd_compress(dict(counts), t, L)

    assert sum(digest.values()) == n  # mass, exactly
    # non-leaf counts stay below the threshold (the anc-bound engine)
    for (lev, _lo), c in digest.items():
        if lev < L:
            assert c < t or t == 1 and c < 2 * t, (lev, c, t)
    # size theorem: <= 4n/t + 1 nodes (the documented charging bound)
    assert len(digest) <= 4 * n / t + 1
    # rank sandwich at every value in the domain
    import bisect

    sv = sorted(vals)
    for x in range(256):
        rank_lo = 0
        anc = 0
        for (lev, lo), c in digest.items():
            hi = lo + (1 << (L - lev)) - 1
            if hi < x:
                rank_lo += c
            elif lo <= x <= hi and not (lev == L and lo == x):
                anc += c
        exact = bisect.bisect_left(sv, x)
        assert rank_lo <= exact <= rank_lo + anc, (x, rank_lo, exact, anc)


@settings(max_examples=200, deadline=None)
@given(
    a=st.lists(st.integers(min_value=0, max_value=127), max_size=200),
    b=st.lists(st.integers(min_value=0, max_value=127), max_size=200),
    k=st.integers(min_value=2, max_value=32),
)
def test_qd_merge_of_folds_keeps_sandwich_pure_python(a, b, k):
    """Mergeability fuzzed: fold each half with its own local threshold,
    sum coinciding nodes, re-fold with the global threshold — mass and
    the rank sandwich must survive (the per-shard rollup path)."""
    from cassandra_slow_queries_spark.operators.sketches import _qd_compress

    L = 7
    merged: dict = {}
    for half in (a, b):
        counts: dict = {}
        for v in half:
            counts[(L, v)] = counts.get((L, v), 0) + 1
        dg = _qd_compress(counts, max(1, len(half) // k), L)
        for key, c in dg.items():
            merged[key] = merged.get(key, 0) + c
    n = len(a) + len(b)
    digest = _qd_compress(merged, max(1, n // k), L)
    assert sum(digest.values()) == n
    import bisect

    sv = sorted(a + b)
    for x in (0, 1, 31, 63, 64, 100, 127):
        rank_lo = sum(
            c
            for (lev, lo), c in digest.items()
            if lo + (1 << (L - lev)) - 1 < x
        )
        anc = sum(
            c
            for (lev, lo), c in digest.items()
            if lo <= x <= lo + (1 << (L - lev)) - 1
            and not (lev == L and lo == x)
        )
        exact = bisect.bisect_left(sv, x)
        assert rank_lo <= exact <= rank_lo + anc, (x, rank_lo, exact, anc)


@settings(max_examples=300, deadline=None)
@given(u=st.floats(min_value=0.0, max_value=1.0, exclude_max=True))
def test_poisson_ladder_matches_direct_cdf_pure_python(u):
    """The Poisson(1) inverse-CDF ladder (shared by the Spark expression
    and the DuckDB oracle through the same literals) against a direct
    computation."""
    import math

    from cassandra_slow_queries_spark.operators.analytics import (
        POISSON1_CDF,
    )

    # direct inverse CDF
    expect = 9
    for i, c in enumerate(POISSON1_CDF):
        if u < c:
            expect = i
            break
    # recompute the CDF independently and clamp identically
    s, direct = 0.0, 9
    for i in range(9):
        s += math.exp(-1) / math.factorial(i)
        if u < s:
            direct = i
            break
    assert expect == direct


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    quotes=st.lists(
        st.tuples(
            st.integers(0, 30),
            st.one_of(st.none(), st.integers(0, 9)),
            st.one_of(st.none(), st.integers(0, 9)),
        ),
        min_size=1,
        max_size=25,
    ),
    probes=st.lists(st.integers(0, 40), min_size=1, max_size=10),
)
def test_banded_asof_null_columns_match_unsalted(spark, quotes, probes):
    """The salted path must stay row-identical to the unsalted one even
    when carried columns contain NULLs (last-ignorenulls looks THROUGH
    a newer NULL to an older value — a struct carry would not)."""
    from cassandra_slow_queries_spark.operators.asof import as_of_join

    qdf = spark.createDataFrame(
        [("k", t, a, b) for t, a, b in quotes],
        "key string, ts long, a int, b int",
    )
    pdf = spark.createDataFrame(
        [("k", t) for t in probes], "key string, ts long"
    )
    base = sorted(
        map(tuple, as_of_join(
            pdf, qdf, ["key"], ts_col="ts", value_cols=["a", "b"]
        ).collect())
    )
    banded = sorted(
        map(tuple, as_of_join(
            pdf, qdf, ["key"], ts_col="ts", value_cols=["a", "b"],
            salt_bands=4,
        ).collect())
    )
    assert base == banded


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(
        st.integers(min_value=0, max_value=12),  # tiny domain → heavy dups
        min_size=1,
        max_size=40,
    ),
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),  # lo
            st.integers(min_value=0, max_value=6),   # width (0 → empty)
        ),
        max_size=10,
    ),
    width=st.sampled_from([1, 7, 64, None]),
)
def test_interval_agg_matches_bruteforce(spark, points, intervals, width):
    """interval_agg (histogram-collapsed distributive aggregates) equals
    the brute-force per-interval count/sum for every width, on a domain
    chosen to force heavy value duplication — the regime where the pair
    plan is quadratic and the histogram path must still be EXACT.
    Inner-join semantics: zero-match intervals absent from both."""
    from cassandra_slow_queries_spark.operators.rangejoin import interval_agg

    ivs = [(i, lo, lo + w) for i, (lo, w) in enumerate(intervals)]
    pdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(points)], "p_id long, v long"
    )
    idf = spark.createDataFrame(
        ivs or [(99, 0, 0)], "iv_id long, lo long, hi long"
    )
    got = {
        r.iv_id: (r.n_points, r.sum_v, r.min_v, r.max_v)
        for r in interval_agg(
            pdf, idf, "v", sum_cols=["v"], min_cols=["v"], max_cols=["v"],
            bucket_width=width, spread=False
        ).collect()
    }
    want = {}
    for ii, lo, hi in ivs:
        inside = [v for v in points if lo <= v < hi]
        if inside:
            want[ii] = (len(inside), sum(inside), min(inside), max(inside))
    assert got == want

    # left variant: SQL `intervals LEFT JOIN points .. GROUP BY` — one
    # row per DISTINCT interval tuple, zero-match rows kept with count
    # 0 and NULL sum/min/max
    got_left = {
        r.iv_id: (r.n_points, r.sum_v, r.min_v, r.max_v)
        for r in interval_agg(
            pdf, idf, "v", sum_cols=["v"], min_cols=["v"], max_cols=["v"],
            bucket_width=width, spread=False, keep_empty_intervals=True
        ).collect()
    }
    want_left = {
        ii: want.get(ii, (0, None, None, None))
        for ii, lo, hi in (ivs or [(99, 0, 0)])
    }
    assert got_left == want_left


def test_interval_agg_duplicate_interval_tuples_collapse_like_sql(spark):
    """Duplicate interval ROWS are one GROUP BY group in the SQL shape
    `intervals LEFT JOIN points .. GROUP BY interval-cols`, with counts
    seeing every duplicate's matches (each point matches each duplicate
    row). interval_agg must reproduce that in both modes."""
    from cassandra_slow_queries_spark.operators.rangejoin import interval_agg

    pdf = spark.createDataFrame([(i, v) for i, v in enumerate([1, 2, 5])],
                                "p_id long, v long")
    idf = spark.createDataFrame(
        [(7, 0, 3), (7, 0, 3), (8, 10, 12)], "iv_id long, lo long, hi long"
    )
    inner = {r.iv_id: (r.n_points, r.sum_v) for r in interval_agg(
        pdf, idf, "v", sum_cols=["v"], bucket_width=2, spread=False
    ).collect()}
    assert inner == {7: (4, 6)}  # two duplicate rows x two matches
    left = {r.iv_id: (r.n_points, r.sum_v) for r in interval_agg(
        pdf, idf, "v", sum_cols=["v"], bucket_width=2, spread=False,
        keep_empty_intervals=True
    ).collect()}
    assert left == {7: (4, 6), 8: (0, None)}
