"""tools/scale_up.py guards: the synthesized 10x directory must keep the
invariants the sf1 smoke relies on — otherwise the scale numbers measure
a corrupted workload, not the engine.

- key-shifted fact copies stay referentially intact: every lineitem
  orderkey still joins an orders row, and keys are unique per table;
- regenerated documents keep the planted " dup"-suffix copy chains the
  dedup gates measure recall against;
- factor parameterizes row counts exactly.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from tools.scale_up import build_scaled_dir

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scaled"))
    build_scaled_dir(SRC, dst, factor=3, seed=7)
    return dst


def test_row_counts_scale_by_factor(scaled):
    for t in ("documents", "embeddings", "events", "lineitem", "orders"):
        n_src = duckdb.sql(f"SELECT COUNT(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        n_dst = duckdb.sql(f"SELECT COUNT(*) FROM '{scaled}/{t}.parquet'").fetchone()[0]
        assert n_dst == 3 * n_src, t
    # dims copy through
    n = duckdb.sql(f"SELECT COUNT(*) FROM '{scaled}/nation.parquet'").fetchone()[0]
    assert n == duckdb.sql(f"SELECT COUNT(*) FROM '{SRC}/nation.parquet'").fetchone()[0]


def test_order_line_join_referentially_intact(scaled):
    orphans = duckdb.sql(f"""
        SELECT COUNT(*) FROM '{scaled}/lineitem.parquet' l
        LEFT JOIN '{scaled}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL""").fetchone()[0]
    assert orphans == 0
    dup_orders = duckdb.sql(f"""
        SELECT COUNT(*) FROM (
          SELECT o_orderkey FROM '{scaled}/orders.parquet'
          GROUP BY 1 HAVING COUNT(*) > 1)""").fetchone()[0]
    assert dup_orders == 0


def test_join_fanout_preserved_per_copy(scaled):
    # each shifted copy must reproduce the source's lines-per-order
    # profile: total join cardinality is exactly factor x the source's
    src_n = duckdb.sql(f"""
        SELECT COUNT(*) FROM '{SRC}/lineitem.parquet' l
        JOIN '{SRC}/orders.parquet' o ON l.l_orderkey = o.o_orderkey""").fetchone()[0]
    dst_n = duckdb.sql(f"""
        SELECT COUNT(*) FROM '{scaled}/lineitem.parquet' l
        JOIN '{scaled}/orders.parquet' o ON l.l_orderkey = o.o_orderkey""").fetchone()[0]
    assert dst_n == 3 * src_n


def test_documents_keep_planted_dup_chains(scaled):
    n_dup, n_rows = duckdb.sql(f"""
        SELECT SUM(CASE WHEN text LIKE '% dup' THEN 1 ELSE 0 END), COUNT(*)
        FROM '{scaled}/documents.parquet'""").fetchone()
    assert n_dup >= 0.02 * n_rows  # ~5% planted, floor at 2%
    # every dup doc's base text exists in the corpus (chain integrity)
    missing = duckdb.sql(f"""
        WITH t AS (SELECT text FROM '{scaled}/documents.parquet')
        SELECT COUNT(*) FROM t d
        WHERE d.text LIKE '% dup'
          AND NOT EXISTS (
            SELECT 1 FROM t b
            WHERE b.text = substr(d.text, 1, length(d.text) - 4))""").fetchone()[0]
    assert missing == 0


def test_embeddings_match_source_dim_and_moments(scaled):
    dim_src = duckdb.sql(
        f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    dims = duckdb.sql(
        f"SELECT DISTINCT len(embedding) FROM '{scaled}/embeddings.parquet'"
    ).fetchall()
    assert dims == [(dim_src,)]
