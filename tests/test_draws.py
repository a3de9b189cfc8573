"""The portable md5 draw contract (functions/draws.py): the Spark
expressions and their advertised DuckDB replays must produce identical
numbers — every deterministic-sampling oracle in the catalog leans on
this equivalence."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.functions.draws import (
    U_SPACE,
    md5_long,
    md5_long_sql,
    md5_uniform,
    md5_uniform_sql,
)


def test_md5_long_and_uniform_match_duckdb_replay(spark):
    ids = [f"row-{i}:salt" for i in range(200)] + ["", "x", "0", "émoji✓"]
    sdf = spark.createDataFrame([(s,) for s in ids], "s string").select(
        "s",
        md5_long(F.col("s")).alias("h"),
        md5_uniform(F.col("s")).alias("u"),
    )
    spark_rows = {r["s"]: (r["h"], r["u"]) for r in sdf.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in ids])
    duck = con.sql(
        f"SELECT s, {md5_long_sql('s')} AS h, {md5_uniform_sql('s')} AS u "
        "FROM t"
    ).fetchall()
    for s, h, u in duck:
        sh, su = spark_rows[s]
        assert sh == h, (s, sh, h)
        assert su == u, (s, su, u)  # bitwise: same division of same ints


def test_uniform_is_in_open_unit_interval(spark):
    rows = spark.range(0, 500).select(
        md5_uniform(F.col("id").cast("string")).alias("u")
    ).collect()
    us = [r["u"] for r in rows]
    assert all(0.0 < u < 1.0 for u in us)
    # the +0.5 offset makes 0 and 1 unreachable by construction:
    # (h + 0.5) / 2^60 with 0 <= h < 2^60
    assert len(set(us)) == len(us)  # and 60 bits make ties negligible


def test_u_space_constant():
    assert U_SPACE == float(1 << 60)
