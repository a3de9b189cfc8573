"""Enrichment: pattern rewrite, keyspace/CF resolution, PK assembly.

Covers SURVEY.md J1-J4 + P8/P9. All dimensions (CQL schema, cf→keyspace
guess index, tag map, query patterns) are tiny configuration artifacts, so
they enter the plan as **broadcast joins or compiled literal expressions**
— the distributed fact stream is never shuffled for enrichment. At 100 TB
that means the whole parse→enrich phase is a single narrow stage over the
scan.

Pattern rewrite (P9/J4) deserves a note: the reference mutates the query
string per matched pattern parameter in a Python loop
(analyze_slow_queries.py:860-889). Patterns and their parameter lists are
*config*, so the loop is unrolled at plan-build time into a chain of
``when``/``replace`` expressions — first matching pattern wins, parameters
apply sequentially against the progressively rewritten query, exactly like
the reference, but fully inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.config import AnalysisConfig
from cassandra_slow_queries_spark.functions.parse import (
    assemble_primary_key,
    insert_table_segment,
    select_table_segment,
    split_keyspace_cf,
)
from cassandra_slow_queries_spark.sources.cql_schema import (
    cf_keyspace_dimension,
    schema_dimension,
)

def _empty_str_map() -> Column:
    return F.create_map().cast("map<string,string>")


def _strip_quotes(c: Column) -> Column:
    return F.regexp_replace(c, r"^'+|'+$", "")


def _rewrite_one_pattern(query: Column, pattern: dict) -> Column:
    """Apply one pattern's parameter extraction to ``query``.

    Returns struct ``(query string, bound_values map<string,string>)``.
    Reference semantics (analyze_slow_queries.py:860-889), reproduced
    position-for-position:

    - value starts after the first ``'='`` found at/after the first
      occurrence of the parameter name (both ``find`` fallthroughs kept:
      a missing name or ``=`` degrades to scanning from the start);
    - the remainder is space-trimmed, the value ends at the first space,
      else comma, else semicolon — no terminator means the parameter is
      skipped;
    - every occurrence of the value text in the query is replaced with
      ``?`` (``str.replace`` is global);
    - the bound value is recorded under the lowercased parameter name
      with surrounding single quotes stripped.

    Divergence (documented): an empty extracted value is skipped here,
    where Python's ``str.replace('', '?')`` would interleave ``?`` between
    every character — reproducing that pathology serves no analysis.
    """
    q = query
    entries: list[Column] = []
    for name in pattern["parameters"]:
        name_loc = F.locate(name, q)  # 1-based, 0 if absent
        # Python: start0 = query.find('=', find(name) + len(name)) + 1
        from_pos = F.when(name_loc > 0, name_loc + F.lit(len(name))).otherwise(
            F.lit(len(name))
        )
        eq_loc = _locate_from(F.lit("="), q, from_pos)
        temp = F.trim(F.substr(q, eq_loc + F.lit(1)))  # eq_loc==0 → whole string
        sp, cm, sc = (F.locate(t, temp) for t in (" ", ",", ";"))
        end_loc = F.when(sp > 0, sp).when(cm > 0, cm).when(sc > 0, sc)
        value = F.substring(temp, 1, end_loc - 1)
        applies = end_loc.isNotNull() & (F.length(value) > 0)
        q = F.when(applies, F.replace(q, value, F.lit("?"))).otherwise(q)
        entries.append(
            F.when(
                applies,
                F.struct(
                    F.lit(name.lower()).alias("key"),
                    _strip_quotes(value).alias("value"),
                ),
            )
        )
    bv = F.map_from_entries(F.filter(F.array(*entries), lambda e: e.isNotNull()))
    return F.struct(
        q.alias("query"), F.coalesce(bv, _empty_str_map()).alias("bound_values")
    )


def _locate_from(needle: Column, haystack: Column, start_pos: Column) -> Column:
    """``locate`` with a dynamic 1-based start position (0 = not found).

    ``F.locate`` only takes a literal start, so search the suffix and
    re-offset. A ``start_pos`` past the end yields 0.
    """
    suffix = F.substr(haystack, start_pos)
    pos_in_suffix = F.instr(suffix, needle)
    return F.when(pos_in_suffix > 0, pos_in_suffix + start_pos - 1).otherwise(F.lit(0))


def apply_query_patterns(query: Column, patterns: list[dict]) -> Column:
    """First-prefix-match pattern rewrite (J4 first-match-wins).

    → struct ``(query, bound_values)``; identity when no pattern matches
    or no patterns are configured.
    """
    identity = F.struct(query.alias("query"), _empty_str_map().alias("bound_values"))
    if not patterns:
        return identity
    expr = identity
    for pattern in reversed(patterns):
        expr = F.when(
            query.startswith(pattern["start"]), _rewrite_one_pattern(query, pattern)
        ).otherwise(expr)
    return expr


def resolve_keyspace_cf(
    df: DataFrame,
    spark: SparkSession,
    config: AnalysisConfig,
    table_col: str = "table_segment",
    tags_col: str = "tags",
) -> DataFrame:
    """Resolve ``keyspace`` / ``column_family`` from the table segment.

    J2 + J3 (analyze_slow_queries.py:506-567): an explicit ``ks.cf`` wins;
    a bare ``cf`` consults (a) the tag→keyspace map when the cf→keyspace
    index misses or is poisoned ``'unknown'``, then (b) the broadcast
    cf→keyspace index. Adds ``keyspace``/``column_family`` columns.
    """
    split = split_keyspace_cf(F.col(table_col))
    df = df.withColumn("_ks_raw", split["keyspace"]).withColumn(
        "_cf", split["column_family"]
    )
    cf_dim = cf_keyspace_dimension(spark, config.schema)
    df = df.join(
        F.broadcast(cf_dim.withColumnRenamed("column_family", "_cf")),
        on="_cf",
        how="left",
    )
    if config.tags:
        bad = {
            k: v
            for k, v in config.tags.items()
            if not isinstance(k, str) or not isinstance(v, str)
        }
        if bad:
            # fail with the contract, not Spark's opaque
            # UNSUPPORTED_FEATURE.LITERAL_TYPE from F.lit(tuple)
            raise TypeError(
                "config.tags must map tag string -> keyspace string "
                f"(reference analyze_slow_queries.py tag→keyspace); got {bad}"
            )
        tag_map = F.create_map(
            *[F.lit(x) for kv in config.tags.items() for x in kv]
        )
        tag_hit = F.element_at(
            F.filter(F.col(tags_col), lambda t: F.map_contains_key(tag_map, t)), 1
        )
        tag_ks = tag_map[tag_hit]
        guess = F.when(
            (
                F.col("guessed_keyspace").isNull()
                | (F.col("guessed_keyspace") == "unknown")
            )
            & tag_ks.isNotNull(),
            tag_ks,
        ).otherwise(F.col("guessed_keyspace"))
    else:
        guess = F.col("guessed_keyspace")
    keyspace = F.when(F.col("_ks_raw").isNotNull(), F.col("_ks_raw")).otherwise(
        F.when(F.col("_cf").isNotNull(), guess)
    )
    return (
        df.withColumn("keyspace", keyspace)
        .withColumn("column_family", F.col("_cf"))
        .drop("_ks_raw", "_cf", "guessed_keyspace")
    )


def attach_primary_key(
    df: DataFrame,
    spark: SparkSession,
    config: AnalysisConfig,
    bound_values_col: str = "bound_values",
) -> DataFrame:
    """J1 + P8: broadcast-join the CQL schema dimension on (keyspace, cf)
    and assemble the ``'-'``-joined primary key from bound values.

    Guard (analyze_slow_queries.py:659-662): pk is computed only when
    bound values are non-empty and keyspace and column family are both
    present (truthy — empty strings don't qualify); a (ks, cf) with no
    schema row yields NULL (reference KeyError → None, :501-504).
    """
    dim = schema_dimension(spark, config.schema).select(
        "keyspace", "column_family", F.col("primary_key").alias("_pk_fields")
    )
    joined = df.join(F.broadcast(dim), on=["keyspace", "column_family"], how="left")
    guard = (
        (F.size(F.col(bound_values_col)) > 0)
        & F.col("keyspace").isNotNull()
        & (F.col("keyspace") != "")
        & F.col("column_family").isNotNull()
        & (F.col("column_family") != "")
    )
    pk = F.when(guard, assemble_primary_key(F.col(bound_values_col), F.col("_pk_fields")))
    return joined.withColumn("primary_key", pk).drop("_pk_fields")


def table_segment_expr(type_col: Column, query: Column) -> Column:
    """Per-type table-segment extraction (P5/P6), NULL for types that
    carry no table (BATCH/DELETE/UPDATE)."""
    return (
        F.when(type_col == "SELECT", select_table_segment(query))
        .when(type_col == "INSERT", insert_table_segment(query))
        .otherwise(F.lit(None).cast("string"))
    )
