"""Differential fuzz of the log-line parser against the REFERENCE
implementation itself (analyze_slow_queries.py:939-983 ``get_log``),
executed side by side on a seeded 800-message corpus.

The reference file is Python-2 syntax at module level, but ``get_log``'s
body is version-neutral, so the test carves the function's source out at
runtime and ``exec``s it — no reference code is copied into the repo,
and the test skips wherever the reference checkout is absent.

Established by round-7 fuzzing (802 messages): the ONLY divergence
family is a counts block that is opened but never closed
(``... ms: [truncated``). There the reference's ``end = buff.find(']')``
returns -1, making ``counts = buff[ptr:0] = ''`` and ``ptr = end+2 = 1``
— the returned query is ``message[1:]``, i.e. garbage sliced from the
SECOND character of the whole line. The repo deliberately keeps the
sane reading (counts NULL, query = the unconsumed tail). Both readings
start with a non-statement prefix, so neither dispatches and the row is
dropped end-to-end either way — pinned below as the parity argument.
"""

from __future__ import annotations

import os
import random
import re

import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.functions.parse import get_log
from cassandra_slow_queries_spark.operators.dispatch import statement_type

REF_PATH = "/root/reference/analyze_slow_queries.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH), reason="reference checkout not present"
)


def _carve(after: str, header: str, path: str = REF_PATH) -> str:
    """Source of the first ``def <header>`` found after marker ``after``
    (empty = file start), dedented to top level. The reference file is
    Python-2 at module level (a tuple-unpacking lambda), so whole-module
    import is impossible — but these specific bodies are version-neutral."""
    import textwrap

    src = open(path).read()
    start = src.index(after) if after else 0
    m = re.search(
        rf"^(    )?(def {header}\(.*?)(?=\n(?:    @|    def |\ndef |\nclass |\n[A-Za-z_]))",
        src[start:],
        re.S | re.M,
    )
    assert m, f"reference {header} not found after {after!r}"
    body = m.group(2)
    return textwrap.dedent(body) if m.group(1) else body


def _ref_fn(after: str, header: str, name: str):
    import logging

    ns: dict = {"logging": logging}
    if name != "str_slice":
        exec(_carve("", "str_slice"), ns)  # dependency of the processors
    exec(_carve(after, header), ns)  # noqa: S102 — test-only, trusted local file
    return ns[name]


def _ref_get_log():
    return _ref_fn("", "get_log", "get_log")


def _corpus() -> list[str]:
    """Seeded adversarial message generator: grammar fragments crossed
    with marker mutations, truncations, and bracket/semicolon traps."""
    rng = random.Random(42)
    frags = [
        "SELECT * FROM ks.cf WHERE a=? LIMIT 10",
        "INSERT INTO t (a) VALUES (1)",
        "BEGIN BATCH x",
        "junk ] text [ with ; brackets",
        "",
        "; [nested:'v']",
        "SELECT x FROM a.b",
    ]
    durs = ["123", "5", "abc", "", "12.5", "-3", "999999999999"]
    counts_blocks = [
        "[1 bound values] ", "[42 bound values] ", "[weird] ",
        "[unclosed ", "[] ",
    ]
    bvs = ["; [k:'v']", "] [a:'1', b:'2']", "; [x:'y'] extra", "", "; [", "] ["]
    msgs = []
    for _ in range(800):
        pre = rng.choice(["INFO ", "WARN node1 ", "", "x Query too slow y "])
        d = rng.choice(durs)
        c = rng.choice(counts_blocks) if rng.random() < 0.6 else ""
        q = rng.choice(frags)
        b = rng.choice(bvs) if rng.random() < 0.7 else ""
        msg = f"{pre}Query too slow, took {d} ms: {c}{q}{b}"
        if rng.random() < 0.1:
            msg = msg.replace(" ms: ", rng.choice([" ms:", " MS: ", " ms: ms: "]))
        if rng.random() < 0.05:
            msg = pre + "Query too slow nothing else"
        if rng.random() < 0.03:
            msg = msg[: rng.randrange(len(msg))]
        msgs.append(msg)
    msgs.append("Query too slow, took 5 ms: ")  # reference IndexError edge
    msgs.append("Query too slow, took 5 ms:")
    return msgs


_DISPATCH_PREFIXES = (
    "SELECT", "select", "BEGIN BATCH", "begin batch",
    "INSERT", "insert", "DELETE", "delete", "UPDATE", "update",
)


def _unclosed_counts(msg: str) -> bool:
    """True when the char after ' ms: ' opens a counts block that never
    closes — the one divergent family (see module docstring)."""
    pos = msg.find("Query too slow, took ")
    if pos == -1:
        return False
    ms = msg.find(" ms: ", pos)
    if ms == -1 or len(msg) <= ms + 5 or msg[ms + 5] != "[":
        return False
    return msg.find("]", ms + 5) == -1


def test_get_log_matches_reference_on_fuzz_corpus(spark):
    ref_fn = _ref_get_log()
    msgs = _corpus()
    ref: list = []
    for msg in msgs:
        try:
            r = ref_fn(msg)
            ref.append((r["duration"], r["counts"], r["bound_values"], r["query"]))
        except Exception:
            ref.append(None)  # reference caller drops the row (:1296-1300)

    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(msgs)], "i long, message string"
    )
    rows = (
        df.select(
            "i",
            get_log("message").alias("g"),
            statement_type(get_log("message")["query"]).alias("stype"),
        )
        .orderBy("i")
        .collect()
    )

    exact = dropped_parity = divergent = 0
    for row, expect in zip(rows, ref):
        g = row["g"]
        got = (g["duration"], g["counts"], g["bound_values"], g["query"])
        msg = msgs[row["i"]]
        if expect is None:
            # reference drops; the repo row must be undispatchable or
            # have an unusable duration — dropped either way
            numeric = (got[0] or "").lstrip("-").isdigit()
            assert not (numeric and row["stype"] is not None), (msg, got)
            dropped_parity += 1
        elif _unclosed_counts(msg):
            # the pinned divergence: reference counts='' / query=msg[1:],
            # repo counts=NULL / query=tail. Neither query dispatches.
            assert got[1] is None
            assert expect[1] == ""
            assert not expect[3].startswith(_DISPATCH_PREFIXES)
            assert row["stype"] is None
            divergent += 1
        else:
            assert got == expect, (msg, got, expect)
            exact += 1
    # the corpus must actually exercise all three regimes
    assert exact > 600 and dropped_parity > 20 and divergent > 10, (
        exact, dropped_parity, divergent
    )


def _batch_eval(spark, values: list, expr_fn) -> list:
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, v string")
    return [
        r["out"]
        for r in df.select("i", expr_fn(F.col("v")).alias("out")).orderBy("i").collect()
    ]


def test_str_slice_matches_reference(spark):
    from cassandra_slow_queries_spark.functions.parse import str_slice

    ref = _ref_fn("", "str_slice", "str_slice")
    rng = random.Random(7)
    alphabet = "ab F;.x"
    strings = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 24)))
        for _ in range(300)
    ] + ["", " FROM ", "x FROM y z", "FROM FROM  "]
    expect = [ref(s, " F", ";") for s in strings]
    got = _batch_eval(spark, strings, lambda c: str_slice(c, " F", ";"))
    assert got == expect


def test_bound_values_match_reference(spark):
    from cassandra_slow_queries_spark.functions.parse import parse_bound_values

    ref = _ref_fn("class MessageProcessor", "_get_bound_values", "_get_bound_values")
    rng = random.Random(11)
    pieces = [
        "k:'v'", "a:'1'", " b : 'x y' ", "noseparator", "q:''", "k:'v,w'",
        "in(", "truncated output", "c:''d''", "k:v:w", "[inner]", "'q':1",
    ]
    strings = [
        "["
        + ", ".join(rng.choice(pieces) for _ in range(rng.randrange(0, 5)))
        + "]"
        for _ in range(300)
    ] + ["[]", "", "[,]", "k:'v'", "]["]
    expect = [ref(None, s) for s in strings]
    got = _batch_eval(spark, strings, parse_bound_values)
    assert got == expect


def test_table_segments_match_reference(spark):
    from cassandra_slow_queries_spark.functions.parse import (
        insert_table_segment,
        select_table_segment,
    )

    ref_sel = _ref_fn("class SelectMessageProcessor", "_get_table", "_get_table")
    ref_ins = _ref_fn("class InsertMessageProcessor", "_get_table", "_get_table")
    rng = random.Random(13)
    frags = [
        "SELECT a FROM ks.cf WHERE x", "SELECT a FROM t;", "select a from t2 x",
        "SELECT a FROMt", "SELECT * FROM ", "INSERT INTO ks.cf (a) VALUES",
        "insert into t(a)", "INSERT INTO x;", "FROM a; from b ",
        "SELECT a FROM b FROM c d",
    ]
    qs = [rng.choice(frags) + rng.choice(["", ";", " tail", " FROM z q"]) for _ in range(300)]
    # the reference returns None for a falsy '' slice; the repo's
    # coalesce chain does the same via the `if not table` fallbacks
    assert _batch_eval(spark, qs, select_table_segment) == [
        ref_sel(None, q) for q in qs
    ]
    assert _batch_eval(spark, qs, insert_table_segment) == [
        ref_ins(None, q) for q in qs
    ]


def test_query_pattern_rewrite_matches_reference(spark):
    """QueryPattern.process (:861-899) vs the expression rewrite
    (operators/enrich.py): rewritten query AND extracted bound values."""
    from cassandra_slow_queries_spark.operators.enrich import (
        apply_query_patterns,
    )

    ref_proc = _ref_fn("class QueryPattern", "process", "process")
    pattern = {"start": "SELECT a FROM t WHERE", "parameters": ["uid", "day"]}
    rng = random.Random(17)
    vals = ["'u1'", "7", "'x y'", "''", "n,m", "last"]
    qs = []
    for _ in range(200):
        parts = ["SELECT a FROM t WHERE"]
        for name in ("uid", "day"):
            if rng.random() < 0.8:
                parts.append(
                    f"{name}={rng.choice(vals)}{rng.choice([' ', ',', ';', ''])}"
                )
        qs.append(" ".join(parts) + rng.choice(["", " AND z=1;"]))
    expect = [ref_proc(None, q, pattern) for q in qs]
    df = spark.createDataFrame(
        [(i, q) for i, q in enumerate(qs)], "i long, v string"
    )
    rows = (
        df.select(
            "i", apply_query_patterns(F.col("v"), [pattern]).alias("s")
        )
        .orderBy("i")
        .collect()
    )
    got = [(r["s"]["query"], dict(r["s"]["bound_values"])) for r in rows]
    assert got == [(q, bv) for q, bv in expect]


def _ref_schema_processor():
    """Reconstruct SchemaProcessor.process as a plain function chain."""
    import logging

    ns: dict = {"logging": logging}
    exec(_carve("", "str_slice"), ns)
    for header in ("_parse_create_table", "_parse_keys", "_parse_primary_column"):
        exec(_carve("class SchemaProcessor", header, ), ns)

    def process(schema: str) -> dict:
        ret: dict = {}
        keyspace = column_family = None
        for line in schema.splitlines():
            if "CREATE TABLE" in line:
                keyspace, column_family = ns["_parse_create_table"](None, line)
                ret.setdefault(keyspace, {}).setdefault(column_family, {})
            if "PRIMARY KEY (" in line:
                if not keyspace or not column_family:
                    raise Exception(line)
                pk, ck = ns["_parse_keys"](None, line)
                ret[keyspace][column_family] = {
                    "primary_key": pk, "clustering_key": ck,
                }
                keyspace = column_family = None
            elif "PRIMARY KEY" in line:
                if not keyspace or not column_family:
                    raise Exception(line)
                col = ns["_parse_primary_column"](None, line)
                ret[keyspace][column_family] = {
                    "primary_key": [col], "clustering_key": [],
                }
                keyspace = column_family = None
        return ret

    return process


def test_schema_parser_matches_reference():
    """Differential fuzz of parse_cql_schema vs SchemaProcessor
    (analyze_slow_queries.py:319-418), with the two DELIBERATE
    divergence families classified and asserted separately:

    1. one-line ``CREATE TABLE ... PRIMARY KEY ...`` statements — the
       reference leaks the column list into the key arrays (round-7
       verify finding; the repo parses the keys correctly);
    2. INDENTED composite key lines (``    PRIMARY KEY ((a, b), c)``,
       the layout ``DESCRIBE`` actually emits) — the reference's
       ``startswith('((')`` sees the leading spaces and silently
       flat-parses the composite (partition key = ``(a`` etc.); the
       repo lstrips first and parses the composite as written.
    Everything else — including raise-on-orphan-key behavior — must
    match the reference exactly.
    """
    from cassandra_slow_queries_spark.sources.cql_schema import parse_cql_schema

    ref_process = _ref_schema_processor()
    rng = random.Random(23)

    def make_table(i: int) -> tuple[str, str]:
        """(ddl fragment, family tag)"""
        ks, cf = f"ks{i % 4}", f"cf{i}"
        style = rng.randrange(6)
        if style == 0:  # multi-line flat pk
            ind = rng.choice(["", "    "])
            return (
                f"CREATE TABLE {ks}.{cf} (\n    a text, b text,\n"
                f"{ind}PRIMARY KEY (a, b)\n);",
                "plain",
            )
        if style == 1:  # multi-line inline pk
            return (
                f"CREATE TABLE {ks}.{cf} (\n    id uuid PRIMARY KEY,\n"
                f"    v text\n);",
                "plain",
            )
        if style == 2:  # unindented composite (both parse it composite)
            return (
                f"CREATE TABLE {ks}.{cf} (\n    a text, b text, c text,\n"
                f"PRIMARY KEY ((a, b), c)\n);",
                "plain",
            )
        if style == 3:  # indented composite — divergence family 2
            return (
                f"CREATE TABLE {ks}.{cf} (\n    a text, b text, c text,\n"
                f"    PRIMARY KEY ((a, b), c)\n);",
                "indented_composite",
            )
        if style == 4:  # one-line — divergence family 1
            return (
                f"CREATE TABLE {ks}.{cf} (a int, b int, PRIMARY KEY (a, b));",
                "one_line",
            )
        return (f"CREATE TABLE {ks}.{cf} (\n    x int\n);", "plain")  # no pk

    plain = divergent = 0
    for trial in range(60):
        tables = [make_table(trial * 10 + j) for j in range(rng.randrange(1, 5))]
        ddl = "\n".join(t[0] for t in tables)
        tags = {t[1] for t in tables}
        got = parse_cql_schema(ddl)
        if tags == {"plain"}:
            assert got == ref_process(ddl), ddl
            plain += 1
        else:
            divergent += 1
    assert plain > 10 and divergent > 10

    # the divergence families, pinned one table at a time
    one_line = "CREATE TABLE ks.t (a int, b int, PRIMARY KEY (a, b));"
    assert parse_cql_schema(one_line)["ks"]["t"] == {
        "primary_key": ["a"], "clustering_key": ["b"],
    }
    ref_one = ref_process(one_line)["ks"]["t"]
    assert ref_one["primary_key"] != ["a"]  # reference leaks the column list

    indented = (
        "CREATE TABLE ks.t (\n    a text, b text, c text,\n"
        "    PRIMARY KEY ((a, b), c)\n);"
    )
    assert parse_cql_schema(indented)["ks"]["t"] == {
        "primary_key": ["a", "b"], "clustering_key": ["c"],
    }
    ref_ind = ref_process(indented)["ks"]["t"]
    assert ref_ind["primary_key"] != ["a", "b"]  # reference flat-parses

    # orphan PRIMARY KEY raises on both sides
    with pytest.raises(Exception):
        ref_process("PRIMARY KEY (a, b)")
    with pytest.raises(ValueError):
        parse_cql_schema("PRIMARY KEY (a, b)")


def test_three_dot_table_divergence_pinned(spark):
    """The last known end-to-end divergence, pinned: a table segment
    with more than one dot makes the reference's ``table.split('.')``
    two-target unpack raise (:518-519), and process_message's blanket
    catch (:1296-1300) then drops the whole row — it vanishes from
    EVERY report, including the pattern-count ones that never needed
    the keyspace. The repo keeps the row with NULL keyspace/cf
    (split_keyspace_cf's two-part guard): the row still counts in the
    query-pattern aggregates and falls out of the pk-keyed reports via
    the NULL guards, which is the analysis intent — a malformed table
    name shouldn't erase the slow query itself. The e2e DuckDB oracles
    encode the repo reading."""
    from cassandra_slow_queries_spark.functions.parse import split_keyspace_cf

    df = spark.createDataFrame(
        [("a.b.c",), ("ks.cf",), ("bare",)], "v string"
    )
    rows = {
        r["v"]: (r["s"]["keyspace"], r["s"]["column_family"])
        for r in df.select("v", split_keyspace_cf(F.col("v")).alias("s")).collect()
    }
    assert rows["a.b.c"] == (None, None)  # kept, un-enriched
    assert rows["ks.cf"] == ("ks", "cf")
    assert rows["bare"] == (None, "bare")

    # and the reference really does blow up on the same segment
    import logging

    ns: dict = {"logging": logging}
    exec(_carve("", "str_slice"), ns)
    exec(_carve("class MessageProcessor", "_get_keyspace_cf", ), ns)

    class _Cfg:
        tags: dict = {}

    with pytest.raises(ValueError):
        ns["_get_keyspace_cf"](None, "a.b.c", [], _Cfg())


def test_analysis_layer_matches_reference(spark):
    """The WHOLE aggregation layer differentially: the reference's
    ``analyze(data, config)`` (:986-1124) executed on generated
    processed-row dicts vs ``five_reports_shared_shuffle`` on the same
    rows as a fact frame. Timestamps are strictly increasing in data
    order, so the reference's first-seen carried dims coincide with the
    repo's deterministic earliest-timestamp rule, and every report can
    be compared row for row. Reference 'volume' arrives unsorted (the
    :55 TODO); it is compared as a multiset, with the repo's
    minute-sorted intent asserted separately."""
    import datetime as dt
    import itertools
    import logging

    from cassandra_slow_queries_spark.config import AnalysisConfig
    from cassandra_slow_queries_spark.operators.aggregates import (
        five_reports_shared_shuffle,
    )

    class _Timer:
        @classmethod
        def start(cls, name):  # noqa: ARG003
            pass

        end = start

    ns: dict = {"logging": logging, "itertools": itertools, "Timer": _Timer}
    exec(_carve("", "analyze"), ns)
    ref_analyze = ns["analyze"]

    rng = random.Random(31)
    queries = [f"SELECT * FROM ks{i % 3}.cf{i % 4} WHERE a=? LIMIT {i};" for i in range(12)]
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    data = []
    for i in range(400):
        q = rng.choice(queries)
        pk = rng.choice(["", "1", "2", "3", "44", ""])
        ks = rng.choice(["ks1", "ks2", ""]) if pk else rng.choice(["ks1", ""])
        cf = rng.choice(["cf1", "cf2", ""])
        data.append(
            {
                "type": "SELECT",
                # strictly increasing, unique: first-seen == earliest-ts
                "timestamp": base + dt.timedelta(seconds=7 * i, minutes=i // 40),
                "duration": rng.randrange(1, 999),
                "query": q,
                "bound_values": {},
                "primary_key": pk,
                "keyspace": ks,
                "column_family": cf,
            }
        )

    class _Cfg:
        min_count = 2
        top_n = 5
        order_by = "duration"
        rows_per_minute = 50  # non-binding: per-minute tie order is
        # insertion-dependent in the reference, so the cut must not bind

    ref = ref_analyze([dict(d) for d in data], _Cfg)

    cfg = AnalysisConfig(
        min_count=2, top_n=5, order_by="duration", rows_per_minute=50
    )
    fact = spark.createDataFrame(
        [
            (
                d["timestamp"], d["type"], d["duration"], d["query"],
                d["primary_key"] or None, d["keyspace"] or None,
                d["column_family"] or None,
            )
            for d in data
        ],
        "ts timestamp, type string, duration long, query string, "
        "primary_key string, keyspace string, column_family string",
    ).persist()
    reports = five_reports_shared_shuffle(fact, cfg)

    def rows_of(name, cols):
        return [tuple(r[c] for c in cols) for r in reports[name].collect()]

    # A1 query report: the top_n=5 cut binds — sums must be unique so
    # the reference's stable-sort tie order is well-defined
    ref_q = ref["query"]
    assert len({v["duration"] for v in ref_q}) == len(ref_q)
    got_q = rows_of(
        "query",
        ["query", "count", "duration", "keyspace", "column_family", "avg_duration"],
    )
    assert got_q == [
        (v["query"], v["count"], v["duration"], v["keyspace"],
         v["column_family"], v["avg_duration"])
        for v in ref_q
    ]

    ref_qpk = ref["query_pk"]
    assert len({v["duration"] for v in ref_qpk}) == len(ref_qpk)
    got_qpk = rows_of(
        "query_pk",
        ["query", "primary_key", "count", "duration", "keyspace",
         "column_family", "avg_duration"],
    )
    assert got_qpk == [
        (v["query"], v["primary_key"], v["count"], v["duration"],
         v["keyspace"], v["column_family"], v["avg_duration"])
        for v in ref_qpk
    ]

    ref_pk = ref["primary_key"]
    assert len({v["duration"] for v in ref_pk}) == len(ref_pk)
    got_pk = rows_of(
        "primary_key",
        ["keyspace", "column_family", "primary_key", "count", "duration",
         "avg_duration"],
    )
    assert got_pk == [
        (v["keyspace"], v["column_family"], v["primary_key"], v["count"],
         v["duration"], v["avg_duration"])
        for v in ref_pk
    ]

    # volume: reference emits dict-insertion order (the unsorted-report
    # TODO); multiset equality + repo's sorted-by-minute intent
    got_vol = rows_of("volume", ["minute", "count", "duration", "avg_duration"])
    ref_vol = sorted(
        (v["minute"], v["count"], v["duration"], v["avg_duration"])
        for v in ref["volume"]
    )
    assert sorted(got_vol) == ref_vol
    assert got_vol == sorted(got_vol, key=lambda t: t[0])

    got_top = rows_of(
        "volume_top",
        ["minute", "query", "primary_key", "count", "duration", "avg_duration"],
    )
    ref_top = sorted(
        (v["minute"], v["query"], v["primary_key"], v["count"],
         v["duration"], v["avg_duration"])
        for v in ref["volume_top"]
    )
    assert sorted(got_top) == ref_top
    fact.unpersist()


REF_DL_PATH = "/root/reference/download_slow_queries.py"


def test_extractor_helpers_match_reference(tmp_path):
    """download_slow_queries.py helpers executed side by side with
    sources/es_extract.py: msearch body/header construction, curl
    scraping, total-hits peek + page planning, landing-zone filenames.
    (get_time_interval needs the `arrow` package — absent here — and is
    covered by its own reference-semantics unit tests instead.)"""
    import datetime as dt
    import json as json_mod
    import logging
    import math

    from cassandra_slow_queries_spark.sources import es_extract as E

    ns: dict = {"json": json_mod, "logging": logging, "math": math}
    for header in (
        "build_request_body", "build_request_header", "_from_curl",
        "_determine_pages", "_get_filename",
    ):
        exec(_carve("", header, path=REF_DL_PATH), ns)

    class _ArrowStandIn:
        """arrow<1.0 exposes .timestamp as an int attribute and
        .format('MM_DD'); mirror just those."""

        def __init__(self, d: dt.datetime):
            self._d = d
            self.timestamp = int(d.timestamp())

        def format(self, fmt):
            assert fmt == "MM_DD"
            return self._d.strftime("%m_%d")

    start = dt.datetime(2024, 3, 5, 5, 0, 0)
    end = dt.datetime(2024, 3, 5, 12, 0, 0)
    for size, from_, query in [
        (500, 0, None), (500, 1500, "cass-node1"), (10, 3, 'with "quotes"'),
    ]:
        ref_body = ns["build_request_body"](
            "Query too slow", _ArrowStandIn(start), _ArrowStandIn(end),
            size, from_, query,
        )
        got_body = E.build_request_body(
            start, end, size=size, from_=from_, query=query,
            message="Query too slow",
        )
        assert json_mod.loads(got_body) == json_mod.loads(ref_body)

    assert json_mod.loads(E.build_request_header("idx:log*")) == json_mod.loads(
        ns["build_request_header"]("idx:log*")
    )

    curl = (
        "curl 'https://es.example.com/es/_msearch' -H 'Accept: */*' "
        "-H 'Cookie: access_token=abc123; theme=dark' --data-binary "
        "$'{\"index\":\"es-index:log*\",\"ignore_unavailable\":true}\\n' "
        "--compressed"
    )
    curl_file = tmp_path / "cmd.curl"
    curl_file.write_text(curl)
    assert E.parse_curl_command(curl) == ns["_from_curl"](str(curl_file))

    # total-hits peek + page planning off the same landing file
    resp = '{"responses":[{"hits":{"total":12345,"hits":[]}}]}'
    page_file = tmp_path / "03_05_0.json"
    page_file.write_text(resp)
    assert E.plan_pages(E.peek_total_hits(resp), 500) == ns["_determine_pages"](
        500, str(page_file)
    )
    # the 10M sanity cap raises on both sides
    big = '{"responses":[{"hits":{"total":10000000,"hits":[]}}]}'
    big_file = tmp_path / "big.json"
    big_file.write_text(big)
    with pytest.raises(ValueError):
        E.peek_total_hits(big)
    with pytest.raises(Exception):
        ns["_determine_pages"](500, str(big_file))

    assert E.page_filename(start, 7) == ns["_get_filename"](_ArrowStandIn(start), 7)


def test_reference_grammar_golden_examples(spark):
    """A few exact reference outputs spot-pinned independently of the
    generator (belt to the fuzz suspenders)."""
    ref_fn = _ref_get_log()
    cases = [
        "INFO Query too slow, took 123 ms: [2 bound values] "
        "SELECT x FROM a.b; [k:'v']",
        "x Query too slow, took 9 ms: SELECT 1 FROM t",
        "Query too slow, took 7 ms: [1 bound values] "
        "INSERT INTO t (a) VALUES (?)] [a:'3']",
    ]
    expected = []
    for c in cases:
        r = ref_fn(c)
        expected.append((r["duration"], r["counts"], r["bound_values"], r["query"]))
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, message string")
    got = [
        (g["duration"], g["counts"], g["bound_values"], g["query"])
        for g in [
            r["g"]
            for r in df.select("i", get_log("message").alias("g")).orderBy("i").collect()
        ]
    ]
    assert got == expected


REF_PK_PATH = "/root/reference/find_pk_nodes.py"


def test_find_pk_nodes_matches_reference(spark, tmp_path, capsys):
    """find_pk_nodes.py executed side by side with the repo pipeline
    (sources/csv_keys.py → operators/endpoints.py): CSV row filtering
    (read_csv :26-50), the per-key endpoint gather loop (:53-87, nodetool
    stubbed with the deterministic fake provider), and the printed CSV
    report (:90-117).

    Two reference quirks pinned rather than copied:

    - nodetool output is split on '\\n' WITHOUT stripping (:85), so every
      endpoint list carries a trailing '' and every printed row a trailing
      comma. The repo's typed array column has no empty slot; the assert
      adds the ',' back explicitly.
    - a failing nodetool (CalledProcessError) logs and DROPS the key
      (:86-88, then :109 skips endpoints=None rows). Silently losing rows
      is the wrong default for a distributed job, so the repo's nodetool
      provider raises instead (endpoints.py check=True) and the fake
      provider is total; the drop is asserted on the reference side only.
    """
    import csv as csv_mod
    import logging
    import subprocess as subprocess_mod

    from cassandra_slow_queries_spark.operators.endpoints import (
        attach_endpoints,
        endpoints_report,
        fake_endpoints,
    )
    from cassandra_slow_queries_spark.sources.csv_keys import read_slow_keys_csv

    rng = random.Random(1139)
    rows = []
    for i in range(60):
        ks = f"ks{rng.randrange(4)}"
        cf = f"cf_{rng.randrange(6)}"
        pick = rng.random()
        if pick < 0.12:
            rows.append([ks, cf, f"pk{i} <truncated output>"])  # marker → drop
        elif pick < 0.2:
            rows.append([ks])  # short row → drop
        elif pick < 0.28:
            rows.append([ks, cf, f'pk,"quoted" {i}', "extra", "cols"])
        else:
            rows.append([ks, cf, f"pk-{i}"])
    csv_file = tmp_path / "slow_primary_keys.csv"
    with open(csv_file, "w", newline="") as fh:
        w = csv_mod.writer(fh)
        w.writerow(["keyspace", "column_family", "primary_key"])
        w.writerows(rows)

    ns: dict = {"csv": csv_mod, "logging": logging}
    for header in ("read_csv", "gather_endpoints", "get_endpoints", "print_endpoints"):
        exec(_carve("", header, path=REF_PK_PATH), ns)

    # ---- read_csv: identical surviving (ks, cf, pk) triples, in order
    ref_keys = ns["read_csv"](str(csv_file))
    got = read_slow_keys_csv(spark, str(csv_file)).toPandas()
    assert [
        (k["keyspace"], k["column_family"], k["primary_key"]) for k in ref_keys
    ] == list(zip(got["keyspace"], got["column_family"], got["primary_key"]))

    # ---- gather + print: nodetool stubbed to emit the fake ring with the
    # reference's real output shape (one endpoint per line, trailing \n);
    # one key is made to fail to pin the reference's drop-on-error path.
    fail_key = next(
        (k["keyspace"], k["column_family"], k["primary_key"]) for k in ref_keys
    )

    class _Proc:
        CalledProcessError = subprocess_mod.CalledProcessError

        @staticmethod
        def check_output(cmd):
            assert cmd[:3] == ["nodetool", "getendpoints", "--"]
            ks, cf, pk = cmd[3:]
            if (ks, cf, pk) == fail_key:
                raise subprocess_mod.CalledProcessError(1, cmd)
            return "\n".join(fake_endpoints(ks, cf, pk, 6, 3)) + "\n"

    ns["subprocess"] = _Proc
    ref_keys = ns["gather_endpoints"](ref_keys)
    ns["print_endpoints"](ref_keys)
    ref_lines = capsys.readouterr().out.strip().splitlines()
    assert ref_lines[0].split(",")[:3] == ["Keyspace", "Column Family", "Primary Key"]

    enriched = attach_endpoints(
        read_slow_keys_csv(spark, str(csv_file)), provider="fake", n_nodes=6, rf=3
    )
    report = endpoints_report(enriched, max_endpoints=6).toPandas()
    got_lines = []
    for _, r in report.iterrows():
        if (r["keyspace"], r["column_family"], r["primary_key"]) == fail_key:
            continue  # reference drops the nodetool-failed key
        eps = [r[f"Endpoint{i}"] for i in range(6) if r[f"Endpoint{i}"] is not None]
        got_lines.append(
            ",".join([r["keyspace"], r["column_family"], r["primary_key"], *eps]) + ","
        )
    assert ref_lines[1:] == got_lines


def test_malformed_tags_divergence_pinned(spark):
    """Malformed tag→keyspace maps, fuzzed through both engines — the
    last unpinned edge of the r9 tags-shape contract. The reference's
    ``_guess_keyspace`` (:528-551) never validates ``config.tags``: a
    non-string VALUE is returned verbatim and silently propagated as
    "keyspace" into every downstream report key; a non-string KEY just
    never matches any log tag (tags are strings) and is silently
    ignored. The repo instead raises a contract-stating TypeError at
    plan-build time for BOTH shapes — a deliberate, pinned divergence:
    silent tuple-typed keyspace keys corrupt every report they touch,
    and Spark's own failure (UNSUPPORTED_FEATURE.LITERAL_TYPE from
    ``F.lit(tuple)``) would surface lazily, mid-action, naming no
    argument. Well-formed maps must agree end-to-end (parity case
    last)."""
    from cassandra_slow_queries_spark.config import AnalysisConfig
    from cassandra_slow_queries_spark.operators.enrich import (
        resolve_keyspace_cf,
    )

    ns: dict = {}
    exec(_carve("class MessageProcessor", "_guess_keyspace"), ns)

    class _RefCls:
        # prefilled index so _build_keyspace_guesses never runs; the
        # probe cf is absent -> the tag map path is always consulted
        CF_KEYSPACES = {"other_cf": "ks_other"}

    class _RefCfg:
        def __init__(self, tags):
            self.tags = tags
            self.schema = {}

    df = spark.createDataFrame(
        [("some_cf", ["prod", "canary"])],
        "table_segment string, tags array<string>",
    )

    malformed = [
        {"prod": ("ks1", "cf1")},   # tuple value
        {"prod": ["ks1"]},          # list value
        {"prod": None},             # None value
        {"prod": 7},                # int value
        {3: "ks1"},                 # int key
        {"ok": "ks9", "prod": ()},  # one good entry does not excuse it
    ]
    for tags in malformed:
        # reference: never raises — returns the garbage value verbatim
        # when a log tag matches, else falls through to None
        ref = ns["_guess_keyspace"](_RefCls, "some_cf", ["prod"], _RefCfg(tags))
        str_keyed = {k: v for k, v in tags.items() if isinstance(k, str)}
        assert ref == str_keyed.get("prod"), (tags, ref)
        # repo: contract error at plan-build time, naming config.tags
        with pytest.raises(TypeError, match="config.tags"):
            resolve_keyspace_cf(df, spark, AnalysisConfig(schema={}, tags=tags))

    # parity on a well-formed map: both engines resolve the first
    # matching tag's keyspace for an unindexed cf
    good = {"canary": "ks_canary", "prod": "ks_prod"}
    ref = ns["_guess_keyspace"](_RefCls, "some_cf", ["prod", "canary"], _RefCfg(good))
    out = resolve_keyspace_cf(
        df, spark, AnalysisConfig(schema={}, tags=good)
    ).collect()[0]
    assert ref == "ks_prod" == out["keyspace"]
    assert out["column_family"] == "some_cf"


def test_primary_key_assembly_matches_reference(spark):
    """Differential fuzz of P8 (PK assembly) — the one MessageProcessor
    helper without a direct side-by-side test until r12. The reference
    ``_get_primary_key`` (analyze_slow_queries.py:479-505) iterates
    ``schema[ks][cf]['primary_key']`` in declared order, skips fields
    missing from bound_values (warn), joins with '-', and returns None
    when the schema has no (ks, cf) row. The repo expression is
    functions/parse.py:assemble_primary_key under attach_primary_key's
    schema guard. 400 seeded cases sweep: composite/flat key lists,
    missing/extra/empty bound values, absent schema rows, hyphens and
    empty strings INSIDE values (the join must not re-split them), and
    case-sensitive field names."""
    import logging

    ns: dict = {"logging": logging, "incidentLogger": logging.getLogger("t")}
    exec(_carve("class MessageProcessor", "_get_primary_key"), ns)  # noqa: S102
    ref_pk = ns["_get_primary_key"]

    class _Cfg:
        def __init__(self, schema):
            self.schema = schema
            self.tags = []

    rng = random.Random(99)
    field_pool = ["user_id", "USER_ID", "ts", "k", "a-b", ""]
    value_pool = ["u1", "", "x-y", "9", "v'q", "UPPER"]
    schema = {
        "ks1": {
            "cf1": {"primary_key": ["user_id", "ts"]},
            "cf2": {"primary_key": ["k"]},
            "cf3": {"primary_key": []},
            "cf4": {"primary_key": ["a-b", "USER_ID", "user_id"]},
        },
        "ks2": {"cf1": {"primary_key": ["user_id"]}},
    }
    cfg = _Cfg(schema)

    cases = []
    for _ in range(400):
        ks = rng.choice(["ks1", "ks2", "ks_missing"])
        cf = rng.choice(["cf1", "cf2", "cf3", "cf4", "cf_missing"])
        bv = {
            rng.choice(field_pool): rng.choice(value_pool)
            for _ in range(rng.randrange(0, 4))
        }
        if rng.random() < 0.5:
            # bias toward hits: seed the cf's own key fields so the
            # joined-PK regime is actually exercised, not just misses
            meta = schema.get(ks, {}).get(cf)
            for f in (meta or {}).get("primary_key", []):
                if rng.random() < 0.8:
                    bv[f] = rng.choice(value_pool)
        cases.append((ks, cf, bv))

    expect = [ref_pk(None, bv, ks, cf, cfg) for ks, cf, bv in cases]

    # repo side: the same guard + expression attach_primary_key uses —
    # pk_fields comes from the schema dimension join (NULL when the
    # (ks, cf) row is absent), then assemble_primary_key
    from cassandra_slow_queries_spark.functions.parse import assemble_primary_key

    pk_rows = [
        (ks, cf, meta["primary_key"])
        for ks, cfs in schema.items()
        for cf, meta in cfs.items()
    ]
    dim = spark.createDataFrame(
        pk_rows, "ks string, cf string, pk_fields array<string>"
    )
    facts = spark.createDataFrame(
        [(i, ks, cf, bv) for i, (ks, cf, bv) in enumerate(cases)],
        "i long, ks string, cf string, bv map<string,string>",
    )
    got = [
        r["pk"]
        for r in facts.join(F.broadcast(dim), ["ks", "cf"], "left")
        .select(
            "i", assemble_primary_key(F.col("bv"), F.col("pk_fields")).alias("pk")
        )
        .orderBy("i")
        .collect()
    ]
    assert got == expect
    # the sweep must exercise all regimes: real keys, skipped fields,
    # empty-key-list '' results, and schema-absent None results
    assert expect.count(None) > 30
    assert sum(1 for e in expect if e) > 30
    assert expect.count("") > 30
