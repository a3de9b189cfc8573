"""Local stand-in for the driver's correctness gate: run every catalog
query on Spark AND its oracle SQL on DuckDB, compare row count, column
names, and order-insensitive values.

Usage: PYTHONPATH=. python tools/oracle_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df, oracle_df) -> list[str]:
    problems = []
    s, o = normalize(spark_df), normalize(oracle_df)
    if list(s.columns) != list(o.columns):
        problems.append(f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}")
        return problems
    if len(s) != len(o):
        problems.append(f"row count differs: spark={len(s)} oracle={len(o)}")
        return problems
    for c in s.columns:
        sv, ov = s[c], o[c]
        # The driver's value hash is dtype-sensitive: an int64 Spark
        # column vs a float64 oracle column (e.g. DuckDB SUM(BIGINT) →
        # HUGEINT → pandas float64) mismatches on ANY data even when
        # every value is numerically equal. Mirror that strictness here
        # so the class can't pass locally and fail at the driver
        # (x_salted_join, rounds 6-7).
        int_vs_float = (
            pd.api.types.is_integer_dtype(sv) and pd.api.types.is_float_dtype(ov)
        ) or (
            pd.api.types.is_float_dtype(sv) and pd.api.types.is_integer_dtype(ov)
        )
        if int_vs_float:
            problems.append(
                f"column {c}: dtype split spark={sv.dtype} oracle={ov.dtype} "
                "(driver hash is dtype-sensitive; cast the oracle, e.g. "
                "CAST(SUM(..) AS BIGINT))"
            )
            continue
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            import numpy as np

            if not np.allclose(
                sv.astype(float), ov.astype(float), rtol=0, atol=0, equal_nan=True
            ):
                bad = (sv.astype(float) - ov.astype(float)).abs().max()
                problems.append(f"column {c}: float values differ (max abs diff {bad})")
        else:
            if not sv.equals(ov):
                diff_idx = (sv != ov) & ~(sv.isna() & ov.isna())
                n = int(diff_idx.sum())
                if n:
                    i = diff_idx.idxmax()
                    problems.append(
                        f"column {c}: {n} values differ, e.g. row {i}: "
                        f"spark={sv[i]!r} oracle={ov[i]!r}"
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from cassandra_slow_queries_spark import get_spark
    from cassandra_slow_queries_spark.plans.catalog import (
        CATALOG,
        DEFERRED_CATALOG,
    )

    # deferred (staged-for-promotion) entries get the same gate when
    # named — and sweeping them before promotion is the point of staging
    overlap = set(CATALOG) & set(DEFERRED_CATALOG)
    if overlap:
        # a deferred entry shadowing a live name would make this tool
        # green-light code the external driver never runs
        print(f"FAIL deferred entries shadow live catalog names: {sorted(overlap)}")
        return 1
    catalog = {**CATALOG, **DEFERRED_CATALOG}
    only = set(sys.argv[2:])
    unknown = only - set(catalog)
    if unknown:
        # a typo'd window list silently skipping entries would fake a
        # green pre-verification
        print(f"FAIL unknown entries: {sorted(unknown)}")
        return 1
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    failures = 0
    for name, qd in catalog.items():
        if only and name not in only:
            continue
        if qd.oracle is None:
            rows = qd.spark(spark, sf_dir).count()
            print(f"{name}: rows-only ({rows} rows)")
            continue
        try:
            sdf = qd.spark(spark, sf_dir).toPandas()
            odf = con.sql(qd.oracle).df()
            problems = compare(name, sdf, odf)
        except Exception as e:  # noqa: BLE001
            problems = [f"exception: {type(e).__name__}: {e}"]
        if problems:
            failures += 1
            print(f"FAIL {name}")
            for p in problems:
                print(f"   - {p}")
        else:
            print(f"ok   {name} ({len(sdf)} rows)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
