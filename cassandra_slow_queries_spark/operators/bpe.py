"""Distributed BPE tokenizer training (Tier 3).

Byte-pair-encoding merge training (Sennrich et al. 2016) is the
canonical tokenizer-construction step of an LLM data pipeline, and its
expensive half — counting adjacent symbol pairs over the corpus — is
exactly one Spark aggregation. The classic algorithm:

1. collapse the corpus to its WORD VOCABULARY with frequencies (one
   corpus-sized aggregation — the only pass that ever touches corpus
   rows);
2. split each vocabulary word into character symbols, with an
   end-of-word marker on the final character;
3. repeat: count adjacent symbol pairs weighted by word frequency,
   pick the most frequent pair, merge every (leftmost-first,
   non-overlapping) occurrence.

Scale shape: step 1 is linear in corpus size; every iteration of step 3
runs over the *collapsed vocabulary frame* (|unique words| rows — a few
million for a 100 TB web corpus, i.e. a small fraction of corpus size),
so N merges cost N cheap jobs plus one corpus pass, and the only
driver-side data is ONE (pair, count) row per iteration. Pair counting
is the same slice/transform adjacent-pair expression as
operators/profile.py:bigram_pmi — no posexplode self-join — and the
merge itself is a pure ``aggregate`` (fold) array expression, so the
whole loop stays JVM-side with zero Python UDFs.

End-of-word marker: appended to the last character as a suffix
(``w i d e s t</w>`` style, following the original paper) so merges
distinguish word-final from word-internal contexts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.operators.search import tokenize

try:  # pandas is baked into the target env; gate for safety
    import pandas as _pd
    from pyspark.sql.functions import pandas_udf as _pandas_udf
except ImportError:  # pragma: no cover
    _pd = None

#: end-of-word marker appended to each word's final character symbol
EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → ``(word, n_word)`` vocabulary frame. The single
    corpus-sized pass of BPE training; everything after runs on this
    collapsed frame."""
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_word"))
    )


def initial_symbols(word_col: str = "word") -> Column:
    """Split a word into single-character symbols, end-of-word marker
    suffixed onto the final character — a pure array expression.
    Takes a column NAME (it is interpolated into SQL text)."""
    sql = word_col
    return F.expr(
        f"transform(sequence(1, length({sql})), i -> "
        f"  CASE WHEN i = length({sql}) "
        f"       THEN substring({sql}, i, 1) || '{EOW}' "
        f"       ELSE substring({sql}, i, 1) END)"
    )


def pair_counts(vocab: DataFrame, symbols_col: str = "symbols") -> DataFrame:
    """Adjacent symbol-pair counts over the vocabulary frame, weighted
    by word frequency: ``(a, b, n_pair)``. One slice/transform explode
    + one hash aggregation on the vocabulary-sized input."""
    pairs = vocab.select(
        "n_word",
        F.explode(
            F.expr(
                f"transform(slice({symbols_col}, 1, size({symbols_col})-1), "
                f"(s, i) -> struct(s AS a, {symbols_col}[i+1] AS b))"
            )
        ).alias("_p"),
    ).select("_p.a", "_p.b", "n_word")
    return pairs.groupBy("a", "b").agg(F.sum("n_word").alias("n_pair"))


def top_pair(counts: DataFrame) -> tuple[str, str, int] | None:
    """Most frequent pair, ties broken lexicographically — the one
    deliberate driver round-trip per iteration: a single row."""
    rows = counts.orderBy(F.desc("n_pair"), "a", "b").limit(1).collect()
    if not rows:
        return None
    r = rows[0]
    return (r["a"], r["b"], r["n_pair"])




def _sql_quote(sym: str) -> str:
    """Escape a symbol for interpolation into a SQL string literal:
    backslashes FIRST, then quotes (quote-only escaping turns a
    trailing backslash into an escaped quote — malformed SQL)."""
    return sym.replace("\\", "\\\\").replace("'", "\\'")


def apply_merge(symbols_col: str, a: str, b: str) -> Column:
    """Merge every adjacent (a, b) into the single symbol ``a||b`` —
    leftmost-first and non-overlapping, which is exactly what a left
    fold gives: ``aaa`` under merge (a,a) becomes ``[aa, a]``, never
    ``[a, aa]`` or a double-merge. Pure ``aggregate`` expression; no
    Python."""
    qa, qb = (_sql_quote(a), _sql_quote(b))
    return F.expr(
        f"aggregate({symbols_col}, CAST(array() AS ARRAY<STRING>), "
        f"(acc, s) -> CASE WHEN size(acc) > 0 "
        f"                  AND element_at(acc, -1) = '{qa}' AND s = '{qb}' "
        f"             THEN concat(slice(acc, 1, size(acc)-1), "
        f"                         array('{qa}' || '{qb}')) "
        f"             ELSE concat(acc, array(s)) END)"
    )


def train_bpe_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 1,
) -> list[tuple[str, str, int]]:
    """The full training loop: returns the ordered merge table
    ``[(a, b, n_pair), ...]`` — the artifact a tokenizer ships.

    One corpus pass (word_counts), then ``n_merges`` vocabulary-frame
    jobs. The evolving vocabulary is localCheckpoint()ed each iteration
    so lineage doesn't deepen linearly with merge count (at the
    production 30k–50k merges an unbroken lineage would overwhelm the
    planner). Stops early when no pair reaches ``min_pair_count``.
    """
    vocab = word_counts(df, text_col).withColumn(
        "symbols", initial_symbols("word")
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = top_pair(
            pair_counts(vocab).filter(F.col("n_pair") >= min_pair_count)
        )
        if best is None:
            break
        a, b, _n = best
        merges.append(best)
        vocab = vocab.withColumn(
            "symbols", apply_merge("symbols", a, b)
        ).localCheckpoint(eager=True)
    return merges


def encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    engine: str = "auto",
) -> DataFrame:
    """Apply a trained merge table to a corpus: per row, tokenize,
    split words to symbols, fold each merge in training order.

    ``engine="expr"`` compiles the merge chain into ONE nested array
    expression PER MERGE — zero Python, but plan depth grows with the
    table, so it only fits the modest merge counts used in tests (the
    same plan-node-explosion class jl_project once hit). ``"arrow"``
    keeps tokenization and NULL semantics Spark-side (the shared
    :func:`tokenize` split feeds both engines) and folds the merges in
    an Arrow-batched UDF with a per-batch unique-word memo — Zipf means
    a handful of encodes cover most of a batch — applying the SAME
    sequential training-order fold, so the two engines agree exactly
    for ANY merge table, not just well-formed trained ones (a rank-
    greedy encoder à la GPT-2 is faster per word but only equivalent
    for tables whose pairs appear in constituent-creation order).
    ``"auto"`` (default) switches to arrow once the table has ≥ 32
    merges. A true 30k+-merge production encoder still belongs in this
    seam wrapping a real tokenizer library (tiktoken/sentencepiece —
    not in this container; same gate as operators/multimodal.py's
    decoders)."""
    if engine not in ("auto", "expr", "arrow"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "auto":
        engine = "arrow" if len(merges) >= 32 and _pd is not None else "expr"
    words = df.withColumn("_words", tokenize(F.col(text_col)))
    if engine == "arrow":
        if _pd is None:
            # the explicit-arrow path would otherwise hit an unbound
            # _pandas_udf NameError instead of an actionable gate error
            raise ValueError(
                "engine='arrow' requires pandas (not importable here) — "
                "use engine='expr' or 'auto'"
            )
        return words.withColumn(
            out_col, _encode_words_udf(merges)(F.col("_words"))
        ).drop("_words")
    sym = F.expr(
        "transform(_words, w -> transform(sequence(1, length(w)), i -> "
        f"  CASE WHEN i = length(w) THEN substring(w, i, 1) || '{EOW}' "
        "        ELSE substring(w, i, 1) END))"
    )
    out = words.withColumn("_sym", sym)
    col = "_sym"
    for a, b, _n in merges:
        qa, qb = (_sql_quote(a), _sql_quote(b))
        out = out.withColumn(
            "_sym",
            F.expr(
                f"transform({col}, ws -> "
                f"aggregate(ws, CAST(array() AS ARRAY<STRING>), "
                f"(acc, s) -> CASE WHEN size(acc) > 0 "
                f"                  AND element_at(acc, -1) = '{qa}' "
                f"                  AND s = '{qb}' "
                f"             THEN concat(slice(acc, 1, size(acc)-1), "
                f"                         array('{qa}' || '{qb}')) "
                f"             ELSE concat(acc, array(s)) END))"
            ),
        )
    return out.withColumn(out_col, F.flatten(F.col("_sym"))).drop(
        "_words", "_sym"
    )


def _merge_pass(syms: list[str], a: str, b: str) -> list[str]:
    """One leftmost-first non-overlapping merge pass — the Python twin
    of :func:`apply_merge`'s fold (kept scan-shaped so the equivalence
    is visible: both consume left to right and never re-examine the
    merged output within the pass)."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _encode_words_udf(merges: list[tuple[str, str, int]]):
    """Arrow engine for :func:`encode`: ``array<string>`` of words →
    flat ``array<string>`` of BPE tokens. Sequential training-order
    fold per UNIQUE word (memoized per batch); a merge is skipped in
    O(1) when either symbol is absent from the word's current symbol
    set, so the common case costs two set probes, not a scan."""
    pairs = [(a, b) for a, b, *_ in merges]

    def encode_word(word: str) -> list[str]:
        syms = list(word[:-1]) + [word[-1] + EOW]
        symset = set(syms)
        for a, b in pairs:
            if a not in symset or b not in symset:
                continue
            merged = _merge_pass(syms, a, b)
            if len(merged) != len(syms):
                syms = merged
                symset = set(syms)
        return syms

    @_pandas_udf("array<string>")
    def _enc(words: _pd.Series) -> _pd.Series:
        memo: dict[str, list[str]] = {}

        def row(ws):
            if ws is None:
                return None
            out: list[str] = []
            for w in ws:
                t = memo.get(w)
                if t is None:
                    t = encode_word(w)
                    memo[w] = t
                out.extend(t)
            return out

        return words.map(row)

    return _enc
