"""Text-analysis expressions for the large-scale data-pipeline tier
(BASELINE.json north star): tokenization, quality scoring, language-ID
heuristics, shingling, fingerprinting.

All pure Catalyst expressions — the 100 TB posture is the same as the
parse layer: no Python per row. Tokenization splits on a single space
(the documents testdata is space-separated; swap the pattern for real
corpora), keeping empty tokens exactly like ``str.split``/DuckDB
``string_split`` so oracle checks line up.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English stopword core — enough signal for ratio heuristics.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "from", "this",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str, sep: str = " ") -> Column:
    """Split into tokens on the LITERAL separator (keeps empty tokens —
    ``split`` limit -1). ``F.split`` treats its pattern as a Java
    regex, so the separator is ``\\Q…\\E``-quoted: a caller passing
    ``'. '`` (sentence split) or ``'||'`` would otherwise get
    any-character / between-every-character splits silently."""
    return F.split(_col(text), "\\Q" + sep + "\\E", -1)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def char_count(text: Column | str) -> Column:
    return F.length(_col(text)).cast("long")


def avg_token_length(text: Column | str) -> Column:
    """Mean length of non-empty tokens; NULL for all-empty input."""
    toks = F.filter(tokens(text), lambda t: F.length(t) > 0)
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    return F.when(F.size(toks) > 0, total / F.size(toks))


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords — the core of both quality
    scoring and language-ID (a document with ~0 English stopwords is
    either non-English or low-quality boilerplate)."""
    words = stopwords if stopwords is not None else EN_STOPWORDS
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    + reasonable mean token length. Deliberately simple and fully
    SQL-expressible so it stays oracle-checkable."""
    t = _col(text)
    len_ok = (F.length(t) >= 50) & (F.length(t) <= 20000)
    sw = stopword_ratio(t)
    atl = avg_token_length(t)
    return (
        len_ok.cast("double") * 0.4
        + F.coalesce((sw > 0.05).cast("double"), F.lit(0.0)) * 0.3
        + F.coalesce(((atl >= 2) & (atl <= 12)).cast("double"), F.lit(0.0)) * 0.3
    )


# GPT-2-style pre-tokenizer pattern, constrained to constructs shared by
# Java regex (Spark) and RE2 (DuckDB): contraction suffixes, then
# optional-leading-space letter runs / digit runs / punctuation runs.
# Deliberately NO lookahead (RE2 has none) and no \p classes (kept ASCII
# so both engines agree on class membership). Whitespace itself is not a
# token — runs between matches are simply skipped, which is the
# "BPE-ish" approximation: real BPE merges whitespace into the following
# token, which the ``" ?"`` prefixes model.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def bpe_token_count(text: Column | str) -> Column:
    """Approximate LLM-token count via the GPT-2 pre-tokenizer regex —
    the standard corpus-budget unit for training-data pipelines (real
    BPE then splits each pre-token further, so this is a stable lower
    bound proportional to true token counts). One JVM-side
    ``regexp_extract_all`` + ``size``; no Python per row."""
    return F.size(
        F.regexp_extract_all(_col(text), F.lit(BPE_TOKEN_RE), 0)
    ).cast("long")


def word_shingles(text: Column | str, n: int = 8) -> Column:
    """All n-word shingles (space-joined) — the dedup candidate unit.
    Documents shorter than n words yield an empty array."""
    toks = tokens(text)
    count = F.size(toks) - F.lit(n - 1)
    return F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams(text: Column | str, n: int = 5) -> Column:
    """Character n-grams (for n-gram Jaccard similarity)."""
    t = _col(text)
    count = F.length(t) - F.lit(n - 1)
    return F.when(
        count > 0,
        F.transform(F.sequence(F.lit(1), count), lambda i: F.substr(t, i, F.lit(n))),
    ).otherwise(F.array().cast("array<string>"))


def fingerprint(text: Column | str) -> Column:
    """64-bit document fingerprint: xxhash of the token stream with
    order sensitivity (token hash mixed with its position). Cheap
    content-identity for exact/near-exact dedup at scale."""
    toks = tokens(text)
    return F.aggregate(
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
            lambda t, i: F.xxhash64(t, i),
        ),
        F.lit(0).cast("long"),
        lambda acc, h: F.xxhash64(acc, h),
    )


# Marker-word sets per language for the n-gram/stopword language-ID
# heuristic. Tiny on purpose: language-ID over opaque synthetic text is a
# scoring mechanism, not a linguistic model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}


def lang_scores(text: Column | str) -> Column:
    """Map language → marker-hit ratio."""
    toks = tokens(text)

    def ratio(words: list[str]) -> Column:
        # factory, not default-arg lambda (PySpark reads HOF arity from
        # the Python signature)
        hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))
        return hits.cast("double") / F.greatest(F.size(toks), F.lit(1))

    entries = [
        F.struct(F.lit(lang).alias("key"), ratio(words).alias("value"))
        for lang, words in LANG_MARKERS.items()
    ]
    return F.map_from_entries(F.array(*entries))


def lang_id(text: Column | str, threshold: float = 0.01) -> Column:
    """Argmax language by marker ratio with deterministic tie order
    (LANG_MARKERS declaration order); 'und' when below threshold."""
    scores = lang_scores(text)
    best = None
    best_score = None
    for lang in LANG_MARKERS:
        s = scores[F.lit(lang)]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score >= threshold, best).otherwise(F.lit("und"))


def clean_text(text: Column | str) -> Column:
    """Normalization pass every web corpus needs before tokenization:

    1. drop C0/C1 control characters (except ``\\t`` / ``\\n`` / ``\\r``,
       which step 3 folds as whitespace) and DEL;
    2. drop zero-width code points (ZWSP/ZWNJ/ZWJ/BOM) — invisible
       characters that silently split tokens and break exact-hash
       dedup;
    3. collapse every whitespace run (including tab/newline) to one
       space and trim the ends.

    Three ``regexp_replace`` passes in whole-stage codegen — the same
    chain is expressible verbatim in ANSI SQL (DuckDB needs the ``'g'``
    flag: its regexp_replace is first-match-only by default, Spark's is
    global — the one cross-engine trap here). Case is NOT touched:
    lowercasing is tokenization policy, not cleaning.
    """
    t = _col(text)
    t = F.regexp_replace(
        t, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]", ""
    )
    t = F.regexp_replace(t, "[\\u200b\\u200c\\u200d\\ufeff]", "")
    t = F.regexp_replace(t, "\\s+", " ")
    return F.trim(t)
