"""CQL DDL dump → schema dimension (SURVEY.md S5/P10).

The schema file is tiny (KBs) and is consumed as a broadcast dimension, so
it is parsed once on the driver — deliberately NOT a distributed job. The
parse reproduces the reference's line-oriented state machine
(analyze_slow_queries.py:319-418): a ``CREATE TABLE ks.cf`` line opens a
table, the following ``PRIMARY KEY`` line closes it, with three accepted
forms::

    PRIMARY KEY ((pk1, pk2), ck1)     -- composite partition key
    PRIMARY KEY (pk, ck1, ck2)        -- flat: first col is the partition key
    col type PRIMARY KEY              -- inline single-column form

Output dimension schema:
``keyspace string, column_family string, primary_key array<string>,
clustering_key array<string>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)


def _slice_between(s: str, before: str, after: str) -> str | None:
    start = s.find(before)
    if start == -1:
        return None
    s = s[start + len(before) :]
    end = s.find(after)
    if end == -1:
        return None
    return s[:end]


def parse_cql_schema(schema_text: str) -> dict:
    """DDL text → ``{keyspace: {cf: {primary_key: [...], clustering_key: [...]}}}``.

    Mirrors analyze_slow_queries.py:324-364 including its quirks: a
    ``CREATE TABLE`` with no ``PRIMARY KEY`` line leaves an empty dict for
    that table; a ``PRIMARY KEY`` line with no open table raises.

    Two deliberate intent-over-bug divergences, both pinned by the
    differential fuzz in tests/test_reference_differential.py:
    an INDENTED composite line (``    PRIMARY KEY ((a, b), c)`` — the
    layout DESCRIBE emits) is lstripped before the ``((`` check, where
    the reference's ``startswith`` sees the spaces and silently
    flat-parses the composite; and a one-line ``CREATE TABLE ... PRIMARY
    KEY ...`` parses its keys correctly instead of leaking the column
    list into the key arrays.
    """
    ret: dict = {}
    keyspace = None
    column_family = None
    for line in schema_text.splitlines():
        if "CREATE TABLE" in line:
            keyspace = _slice_between(line, "CREATE TABLE ", ".")
            # the table name ends at the first space OR opening paren:
            # a compact `CREATE TABLE ks.cf(` has no space, and the
            # old space-only slice registered a None table whose later
            # PRIMARY KEY line then raised on perfectly valid DDL
            # (third documented intent-over-bug divergence)
            tail = line.split(".", 1)[1] if "." in line else ""
            column_family = tail.split(" ")[0].split("(")[0].strip() or None
            if keyspace is not None and column_family is not None:
                ret.setdefault(keyspace, {}).setdefault(column_family, {})
        if "PRIMARY KEY (" in line:
            if not keyspace or not column_family:
                raise ValueError(f"Unable to process schema line {line!r}")
            # Slice from the keyword: identical for the reference's
            # multi-line DESCRIBE layout (the line starts at PRIMARY
            # KEY), and keeps a compact one-line CREATE TABLE from
            # leaking its column list into the key parse.
            pk, ck = _parse_compound_keys(line[line.find("PRIMARY KEY") :])
            ret[keyspace][column_family] = {"primary_key": pk, "clustering_key": ck}
            keyspace = column_family = None
        elif "PRIMARY KEY" in line:
            if not keyspace or not column_family:
                raise ValueError(f"Unable to process schema line {line!r}")
            # Inline form: the pk column is the first token of the
            # `col type PRIMARY KEY` clause — the last '('/','-delimited
            # chunk before the keyword, so `CREATE TABLE ks.cf (id uuid
            # PRIMARY KEY, ...` on one line names `id`, not `CREATE`.
            before = line[: line.find("PRIMARY KEY")]
            chunk = before.replace("(", ",").split(",")[-1].strip(" ,")
            col = chunk.split(" ")[0]
            ret[keyspace][column_family] = {"primary_key": [col], "clustering_key": []}
            keyspace = column_family = None
    return ret


def _pk_clause(line: str) -> str:
    """Truncate at the balanced close of the PRIMARY KEY parens: a
    one-line ``... PRIMARY KEY (a, b)) WITH gc_grace_seconds = ...``
    would otherwise leak the table options into the last clustering
    key name (which then silently matches no real column downstream)."""
    start = line.find("(")
    if start < 0:
        return line
    depth = 0
    for i in range(start, len(line)):
        if line[i] == "(":
            depth += 1
        elif line[i] == ")":
            depth -= 1
            if depth == 0:
                return line[: i + 1]
    return line


def _parse_compound_keys(line: str) -> tuple[list[str], list[str]]:
    """``PRIMARY KEY ((a, b), c)`` → ([a, b], [c]);
    ``PRIMARY KEY (a, b, c)`` → ([a], [b, c])."""
    body = _pk_clause(line).replace("PRIMARY KEY ", "")
    if body.lstrip().startswith("(("):
        body = body.lstrip()
        close = body.find(")")
        partition = body[:close].replace("((", "")
        pk = [v.strip() for v in partition.split(",")]
        clustering = (
            body[close + 1 :].replace(")", "").replace("(", "").replace(";", "")
        )
        ck = [v.strip() for v in clustering.split(",") if v.strip()]
    else:
        flat = body.replace("(", "").replace(")", "").replace(";", "")
        keys = [v.strip() for v in flat.split(",") if v.strip()]
        pk, ck = keys[:1], keys[1:]
    return pk, ck


DIM_SCHEMA = StructType(
    [
        StructField("keyspace", StringType()),
        StructField("column_family", StringType()),
        StructField("primary_key", ArrayType(StringType())),
        StructField("clustering_key", ArrayType(StringType())),
    ]
)


def schema_dimension(spark: SparkSession, schema: dict | str) -> DataFrame:
    """Schema dict (or raw DDL text) → broadcast-ready dimension DataFrame."""
    if isinstance(schema, str):
        schema = parse_cql_schema(schema)
    rows = [
        (
            ks,
            cf,
            meta.get("primary_key"),
            meta.get("clustering_key"),
        )
        for ks, cfs in schema.items()
        for cf, meta in cfs.items()
    ]
    return spark.createDataFrame(rows, DIM_SCHEMA)


def cf_keyspace_dimension(spark: SparkSession, schema: dict | str) -> DataFrame:
    """Inverted cf → keyspace guess dimension with the collision sentinel.

    Reference (analyze_slow_queries.py:553-567): a column family appearing
    in more than one keyspace is poisoned to ``'unknown'`` at build time.
    Built here with a deterministic aggregate instead of dict iteration
    order.
    """
    from pyspark.sql import functions as F

    dim = schema_dimension(spark, schema)
    return dim.groupBy("column_family").agg(
        F.when(F.count_distinct("keyspace") > 1, F.lit("unknown"))
        .otherwise(F.min("keyspace"))
        .alias("guessed_keyspace")
    )
