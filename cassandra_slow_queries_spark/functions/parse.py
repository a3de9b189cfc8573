"""Log-line / CQL parsing as native Spark expressions (SURVEY.md §2.4).

Every function here returns a :class:`pyspark.sql.Column` built solely from
``pyspark.sql.functions`` — the whole parse stage compiles into Catalyst
expressions inside whole-stage codegen, with zero Python on the executor
hot path. That is the load-bearing design decision for 100 TB scale: the
reference does the identical work row-at-a-time in CPython
(analyze_slow_queries.py:939-983, :454-476), which is exactly the
anti-pattern Spark's vectorized JVM expressions replace.

Semantics are pinned to the reference (file:line cites on each function);
unit tests in tests/test_parse.py table-drive the edge cases.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Markers from the reference log grammar (analyze_slow_queries.py:950-975).
SLOW_MARKER = "Query too slow, took "
MS_MARKER = " ms: "


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def str_slice(col: Column | str, before: str, after: str) -> Column:
    """Substring strictly between the first ``before`` and the first
    ``after`` that follows it; NULL if either marker is missing.

    Expression form of the reference's find/slice helper
    (analyze_slow_queries.py:295-316). ``locate`` is 1-indexed; 0 means
    "not found", mirroring ``str.find() == -1``.
    """
    s = _col(col)
    start = F.locate(before, s)  # 1-based position of `before`, 0 if absent
    rest = F.substring(s, start + F.lit(len(before)), F.lit(2147483647))
    end = F.locate(after, rest)
    return (
        F.when((start > 0) & (end > 0), F.substring(rest, 1, end - 1))
        .otherwise(F.lit(None).cast("string"))
    )


def str_slice_nonempty(col: Column | str, before: str, after: str) -> Column:
    """:func:`str_slice`, but an EMPTY slice (the two markers adjacent)
    is a miss → NULL. This is the reference's ``if not table`` fallback
    reading — empty string and not-found are both falsy — folded INTO
    the slice condition (``end > 1``).

    Exists so the table-segment fallback chains can stay plain
    ``coalesce``: the round-7 fix wrapped each candidate in
    ``nullif(slice, '')``, which expands to ``CASE WHEN slice='' …
    ELSE slice`` and DUPLICATES the whole locate/substring tree per
    candidate — the parse family measurably doubled (p5 1.0→1.9 s,
    stream_e2e_parse 3.8→8.4 s at sf0.1, the expression-width lesson
    again). One extra comparison here costs nothing.
    """
    s = _col(col)
    start = F.locate(before, s)
    rest = F.substring(s, start + F.lit(len(before)), F.lit(2147483647))
    end = F.locate(after, rest)
    return (
        F.when((start > 0) & (end > 1), F.substring(rest, 1, end - 1))
        .otherwise(F.lit(None).cast("string"))
    )


def parse_timestamp(col: Column | str) -> Column:
    """``'%Y-%m-%dT%H:%M:%S.%fZ'`` → timestamp (analyze_slow_queries.py:913).

    ``try_to_timestamp``, not ``to_timestamp``: under Spark 4's default
    ANSI mode the latter raises CANNOT_PARSE_TIMESTAMP on the first
    malformed ``@timestamp`` and kills the job, whereas the reference
    catches the per-row strptime error and skips the row (:1296-1300).
    NULL here flows into the caller's validity filter and the
    ``n_bad_ts`` observe() counter.
    """
    return F.try_to_timestamp(_col(col), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))


def get_log(message: Column | str) -> Column:
    """Positional parse of the slow-query log line → struct
    ``(duration string, counts string, bound_values string, query string)``.

    Reference grammar (analyze_slow_queries.py:939-983)::

        ... Query too slow, took <duration> ms: [N bound values] <CQL>; [k:'v', ...]

    - ``duration``: text between ``'Query too slow, took '`` and the first
      ``' ms: '`` after it (NULL if either marker is missing — the
      reference raises and the row is dropped upstream; here the caller
      filters on ``duration IS NOT NULL``).
    - ``counts``: the ``[N bound values]`` block **including** brackets,
      present only when the char right after ``' ms: '`` is ``[``
      (:959-965).
    - ``bound_values``: from ``'; ['``/``'] ['`` + 2 to end of line,
      searched only when ``counts`` was present (:967-975).
    - ``query``: the text between; includes the terminating ``;``/``]``
      character exactly as the reference slices it (:975-977).
    """
    msg = _col(message)
    slow_pos = F.locate(SLOW_MARKER, msg)
    after_slow = F.substring(msg, slow_pos + F.lit(len(SLOW_MARKER)), F.lit(2147483647))
    ms_pos = F.locate(MS_MARKER, after_slow)
    duration = F.when(
        (slow_pos > 0) & (ms_pos > 0), F.substring(after_slow, 1, ms_pos - 1)
    ).otherwise(F.lit(None).cast("string"))
    # remainder of the line after ' ms: '
    tail = F.substring(after_slow, ms_pos + F.lit(len(MS_MARKER)), F.lit(2147483647))

    has_counts = F.substring(tail, 1, 1) == "["
    counts_end = F.locate("]", tail)  # first ']' (reference :961)
    counts = F.when(has_counts & (counts_end > 0), F.substring(tail, 1, counts_end))
    # reference: ptr = end + 2 → skip ']' and the following space (:963)
    body = F.when(
        has_counts & (counts_end > 0),
        F.substring(tail, counts_end + F.lit(2), F.lit(2147483647)),
    ).otherwise(tail)

    # bound values are only looked for when a counts block existed (:969)
    semi_pos = F.locate("; [", body)
    brkt_pos = F.locate("] [", body)
    bv_pos = F.when(semi_pos > 0, semi_pos).when(brkt_pos > 0, brkt_pos)
    bound_values = F.when(
        has_counts & bv_pos.isNotNull(),
        F.substring(body, bv_pos + F.lit(2), F.lit(2147483647)),
    )
    # query = body[:bv_pos] inclusive of the ';'/']' char (reference rptr = start + 1)
    query = F.when(
        has_counts & bv_pos.isNotNull(), F.substring(body, 1, bv_pos)
    ).otherwise(body)

    valid = duration.isNotNull()
    return F.struct(
        duration.alias("duration"),
        F.when(valid, counts).alias("counts"),
        F.when(valid, bound_values).alias("bound_values"),
        F.when(valid, query).alias("query"),
    )


def add_log_columns(df, message: str = "message"):
    """Staged DataFrame form of :func:`get_log`: appends ``_duration_str``,
    ``_counts``, ``_bv_str``, ``_raw_query`` (identical values to the
    struct fields of ``get_log``).

    Why this exists: building the parse as ONE struct and extracting four
    fields lets ``SimplifyExtractValueOps`` inline the whole
    locate/substring tree once per field — ~4× the per-row string work,
    measured ~70µs/row at sf0.1. Staging each shared intermediate
    (``_after_slow``, ``_tail``, ``_body``) as a real column in its own
    projection keeps it computed once: ``CollapseProject`` refuses to
    merge projections that would duplicate non-cheap expressions, and
    within whole-stage codegen each projection's output is a local
    variable. This is the hot-path form; ``get_log`` remains for
    single-expression contexts and as the semantic spec (equality pinned
    in tests/test_parse.py).
    """
    big = F.lit(2147483647)
    msg = F.col(message)
    df = df.withColumn("_slow_pos", F.locate(SLOW_MARKER, msg))
    df = df.withColumn(
        "_after_slow",
        F.substring(msg, F.col("_slow_pos") + F.lit(len(SLOW_MARKER)), big),
    )
    df = df.withColumn("_ms_pos", F.locate(MS_MARKER, F.col("_after_slow")))
    df = df.withColumn(
        "_duration_str",
        F.when(
            (F.col("_slow_pos") > 0) & (F.col("_ms_pos") > 0),
            F.substring(F.col("_after_slow"), 1, F.col("_ms_pos") - 1),
        ).otherwise(F.lit(None).cast("string")),
    )
    df = df.withColumn(
        "_tail",
        F.substring(
            F.col("_after_slow"), F.col("_ms_pos") + F.lit(len(MS_MARKER)), big
        ),
    )
    df = df.withColumn(
        "_has_counts", F.substring(F.col("_tail"), 1, 1) == "["
    ).withColumn("_counts_end", F.locate("]", F.col("_tail")))
    df = df.withColumn(
        "_counts_raw",
        F.when(
            F.col("_has_counts") & (F.col("_counts_end") > 0),
            F.substring(F.col("_tail"), 1, F.col("_counts_end")),
        ),
    )
    df = df.withColumn(
        "_body",
        F.when(
            F.col("_has_counts") & (F.col("_counts_end") > 0),
            F.substring(F.col("_tail"), F.col("_counts_end") + F.lit(2), big),
        ).otherwise(F.col("_tail")),
    )
    df = df.withColumn("_semi_pos", F.locate("; [", F.col("_body"))).withColumn(
        "_brkt_pos", F.locate("] [", F.col("_body"))
    )
    df = df.withColumn(
        "_bv_pos",
        F.when(F.col("_semi_pos") > 0, F.col("_semi_pos")).when(
            F.col("_brkt_pos") > 0, F.col("_brkt_pos")
        ),
    )
    valid = F.col("_duration_str").isNotNull()
    df = df.withColumn(
        "_bv_str",
        F.when(
            valid & F.col("_has_counts") & F.col("_bv_pos").isNotNull(),
            F.substring(F.col("_body"), F.col("_bv_pos") + F.lit(2), big),
        ),
    )
    df = df.withColumn(
        "_raw_query",
        F.when(
            valid,
            F.when(
                F.col("_has_counts") & F.col("_bv_pos").isNotNull(),
                F.substring(F.col("_body"), 1, F.col("_bv_pos")),
            ).otherwise(F.col("_body")),
        ),
    )
    df = df.withColumn("_counts", F.when(valid, F.col("_counts_raw")))
    return df.drop(
        "_slow_pos", "_after_slow", "_ms_pos", "_tail", "_has_counts",
        "_counts_end", "_counts_raw", "_body", "_semi_pos", "_brkt_pos",
        "_bv_pos",
    )


def parse_bound_values(col: Column | str) -> Column:
    """``[k:'v', k2:'v2']`` → ``map<string,string>``.

    Reference semantics (analyze_slow_queries.py:454-476): strip ALL
    ``[``/``]`` anywhere, split on bare ``,``, each piece split on the
    first ``:``; key trimmed of spaces, value stripped of leading/trailing
    single quotes; pieces without ``:`` are dropped. (Values containing
    commas therefore break exactly as they do in the reference — pinned
    behavior, see tests.) NULL input → empty map (caller guard,
    :636-638).
    """
    raw = _col(col)
    cleaned = F.regexp_replace(raw, r"[\[\]]", "")
    pairs = F.split(cleaned, ",")
    entries = F.filter(pairs, lambda p: F.locate(":", p) > 0)
    kv = F.transform(
        entries,
        lambda p: F.struct(
            F.trim(F.substring_index(p, ":", 1)).alias("key"),
            # value = everything after the FIRST ':' (split(':', 1) in the
            # reference), single quotes stripped from both ends
            F.regexp_replace(
                F.substr(p, F.locate(":", p) + F.lit(1)), r"^'+|'+$", ""
            ).alias("value"),
        ),
    )
    result = F.map_from_entries(kv)
    empty = F.create_map().cast("map<string,string>")
    return F.when(raw.isNotNull(), F.coalesce(result, empty)).otherwise(empty)


def select_table_segment(query: Column | str) -> Column:
    """Table segment of a SELECT: between ``' FROM '`` and the next space,
    with ``' from '`` and ``';'``-terminated fallbacks, tried in the
    reference's exact order (analyze_slow_queries.py:686-694).

    Note the reference tries ``(' FROM ', ' ')`` before ``(' FROM ', ';')``
    — so ``SELECT a FROM t;`` (no trailing space) resolves via the third
    attempt, and a query with BOTH gives the space-terminated slice.

    The chain uses :func:`str_slice_nonempty`: the reference's ``if not
    table`` guard treats an EMPTY slice as a miss and keeps trying later
    terminators (found by the round-7 differential fuzz on
    ``'SELECT a FROM  t;'`` double-space queries, where the reference
    resolves ``' t'`` via the ``';'`` fallback). All-falsy yields NULL
    (the reference returns ``''``/None there; both are dropped by every
    caller's guard).
    """
    q = _col(query)
    return F.coalesce(
        str_slice_nonempty(q, " FROM ", " "),
        str_slice_nonempty(q, " from ", " "),
        str_slice_nonempty(q, " FROM ", ";"),
        str_slice_nonempty(q, " from ", ";"),
    )


def insert_table_segment(query: Column | str) -> Column:
    """Table segment of an INSERT: after ``'INSERT INTO '`` up to the next
    space (analyze_slow_queries.py:766-769); empty slice = miss, see
    :func:`select_table_segment`."""
    q = _col(query)
    return F.coalesce(
        str_slice_nonempty(q, "INSERT INTO ", " "),
        str_slice_nonempty(q, "insert into ", " "),
    )


def dml_table_segment(query: Column | str) -> Column:
    """Table segment of a DELETE or UPDATE — the reference's own TODO
    (analyze_slow_queries.py:57 "Parse primary key out of DELETE and
    UPDATE statements"; its processors at :771-803 and :806-838 emit only
    type+duration+query). Beyond-parity extension:

    - ``UPDATE ks.cf SET ...`` carries the table straight after the
      keyword, mirroring INSERT's prefix slice;
    - ``DELETE [col, ...] FROM ks.cf WHERE ...`` shares SELECT's
      ``' FROM '`` slice chain (tried second, so an UPDATE never reaches
      it and a DELETE never matches the UPDATE prefix).
    """
    q = _col(query)
    return F.coalesce(
        str_slice_nonempty(q, "UPDATE ", " "),
        str_slice_nonempty(q, "update ", " "),
        select_table_segment(q),
    )


#: dotted-quad matcher shared with operators/curation.py PII scrubbing —
#: cross-engine-safe (no lookaround), word-bounded
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def coordinator_ip(message: Column | str) -> Column:
    """First IPv4 literal in the log message — the coordinator node that
    reported the slow query (Cassandra logs it as ``/10.0.1.2``-style).
    NULL when the message carries no address. Implements the reference's
    TODO chain at analyze_slow_queries.py:64-68 ("Pull coordinator IP
    out of log message" + downstream reports/filters); the reference
    never shipped it, so the extraction shape (first dotted quad) is
    ours, pinned by tests and the x_coordinator_report oracle."""
    m = _col(message)
    hit = F.regexp_extract(m, IPV4_RE, 0)
    return F.when(hit != "", hit)


def split_keyspace_cf(table: Column | str) -> Column:
    """``ks.cf`` → struct ``(keyspace, column_family)``, both lowercased;
    a bare ``cf`` yields NULL keyspace (to be filled by the
    keyspace-guess join, operators/enrich.py).

    Reference (analyze_slow_queries.py:518-525) splits on ``'.'`` and
    unpacks exactly two parts — a table with >1 dot raises there (row
    dropped); here the same shape yields NULLs via the two-part guard.
    """
    t = _col(table)
    parts = F.split(t, r"\.")
    two = F.size(parts) == 2
    return F.struct(
        F.when(two, F.lower(parts[0])).alias("keyspace"),
        F.when(two, F.lower(parts[1]))
        .otherwise(F.when(F.size(parts) == 1, F.lower(t)))
        .alias("column_family"),
    )


def minute_bucket(ts: Column | str) -> Column:
    """Timestamp → ``'yyyy-MM-dd HH:mm'`` string grouping key
    (analyze_slow_queries.py:1010). String form is kept for CSV parity;
    the streaming variant groups on ``F.window(ts, '1 minute')`` instead.
    """
    return F.date_format(F.date_trunc("minute", _col(ts)), "yyyy-MM-dd HH:mm")


def assemble_primary_key(bound_values: Column | str, pk_fields: Column | str) -> Column:
    """Join the bound values of the schema's partition-key fields with
    ``'-'``, skipping fields missing from the map.

    Reference (analyze_slow_queries.py:491-500): iterate
    ``schema[ks][cf]['primary_key']`` in declared order, look each up in
    ``bound_values``, join found values with ``'-'`` (missing fields are
    skipped with a warning; zero found fields → empty string). NULL
    ``pk_fields`` (no schema row for ks.cf) → NULL, matching the
    reference's ``return None`` on KeyError (:501-504).
    """
    bv = _col(bound_values)
    fields = _col(pk_fields)
    vals = F.filter(
        F.transform(fields, lambda f: bv.getItem(f)), lambda v: v.isNotNull()
    )
    return F.when(fields.isNotNull(), F.concat_ws("-", vals))
