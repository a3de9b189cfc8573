"""Synthesize an sf1-scale data directory from sf0.1 for scale smokes.

The driver ships sf{0.001,0.01,0.1} only, but the repo's 100x-scale
claims (bounded candidate generation under skew, no single-partition
exchanges, sub-linear hot-block stars) are plan-pinned and never
EXECUTED past sf0.1 — round-8 verdict item 6. This tool closes that by
building a 10x directory the heavy gates can actually run against:

- ``documents`` / ``embeddings`` / ``events``: regenerated at 10x row
  count through the SAME empirical-distribution generators the re-seed
  sweep uses (word frequencies, length mix, hot-user skew, ~5% planted
  dup chains all preserved) — NOT naive row duplication, which would
  plant pathological 10-copy exact-dup clusters and distort the dedup
  workload it is supposed to smoke.
- ``lineitem`` / ``orders``: 10 key-shifted copies (all join keys
  offset by ``i * (max_key + 1)`` consistently across both tables so
  order↔line joins stay referentially intact and key uniqueness
  holds); part/supplier/customer references stay in the original key
  range, so dimension joins keep hitting.
- dimension tables: copied through.

Usage:
    PYTHONPATH=. python tools/scale_up.py [--src /root/testdata/sf0.1]
        [--dst /tmp/sf1] [--factor 10] [--seed 77]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tools.reseed_sweep import (
    TABLES,
    regen_documents,
    regen_embeddings,
    regen_events,
)

# join-key columns to offset per copied fact table; all other columns
# repeat verbatim (value distributions are what the smoke needs)
_KEY_OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
}


def _replicate_shifted(src: str, dst: str, table: str, factor: int) -> None:
    t = pq.read_table(f"{src}/{table}.parquet")
    keys = _KEY_OFFSETS[table]
    # one shared offset base per key NAME (not per table) so lineitem
    # and orders shift l_orderkey/o_orderkey by the same stride
    stride = {}
    for k in keys:
        base = k.split("_", 1)[1]  # orderkey
        stride[k] = _key_stride(src, base)
    chunks = []
    for i in range(factor):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name in keys:
                col = pc.add(col, i * stride[name])
            cols[name] = col
        chunks.append(pa.table(cols))
    pq.write_table(pa.concat_tables(chunks), f"{dst}/{table}.parquet")


def _key_stride(src: str, base: str) -> int:
    """max over all tables of the <x>_<base> key + 1, so shifted copies
    of every table sharing the key family stay consistent and unique."""
    mx = 0
    for table, prefix in (("lineitem", "l"), ("orders", "o")):
        path = f"{src}/{table}.parquet"
        col = f"{prefix}_{base}"
        t = pq.read_table(path, columns=[col]) if os.path.exists(path) else None
        if t is not None and col in t.column_names:
            mx = max(mx, pc.max(t.column(col)).as_py() or 0)
    return mx + 1


def build_scaled_dir(src: str, dst: str, factor: int, seed: int) -> str:
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    regen_documents(src, dst, rng, factor=factor)
    regen_embeddings(src, dst, rng, factor=factor)
    regen_events(src, dst, rng, factor=factor)
    for table in _KEY_OFFSETS:
        _replicate_shifted(src, dst, table, factor)
    for name in TABLES:
        out = f"{dst}/{name}.parquet"
        if os.path.exists(out):
            continue
        path = f"{src}/{name}.parquet"
        if os.path.exists(path):
            shutil.copy(path, out)
    return dst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--seed", type=int, default=77)
    args = ap.parse_args()
    build_scaled_dir(args.src, args.dst, args.factor, args.seed)
    for name in sorted(os.listdir(args.dst)):
        path = os.path.join(args.dst, name)
        t = pq.read_metadata(path)
        print(f"{name}: {t.num_rows} rows, {os.path.getsize(path) >> 20} MiB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
