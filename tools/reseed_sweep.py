"""Re-seed sweep: simulate the driver's correctness gate on data the
repo has never seen.

The driver generates its own tables with the SAME generators but a
DIFFERENT seed than /root/testdata — so any catalog gate boolean that
depends on the data DISTRIBUTION (recall floors, spread audits, sketch
tolerances, blocking caps) can pass every local check and still flip on
the driver's corpus. That exact failure mode shipped twice (the round-6
``x_salted_join`` spread flake; the ANN recall floors that round-7
re-floored after an 8-seed sweep). This tool institutionalizes the
countermeasure:

1. FIT empirical distributions from the real testdata tables that carry
   gates (``documents``, ``embeddings``, ``events``): word frequencies +
   document word-lengths + the (lang, source) joint; per-dimension
   embedding moments + label frequencies; event user_id/event_type/
   value/props frequencies and the ts range.
2. REGENERATE those tables at the same row counts with a fresh numpy
   seed (other tables are copied through unchanged — their entries are
   exact-replay SQL with no distributional gates).
3. RUN ``tools/oracle_check.py`` (the driver-gate stand-in) over the
   chosen entries on each re-seeded directory and report per-seed FAILs.

Approximations, documented: columns are resampled independently (except
the pairs noted above), and the regenerated corpus is exact-dup-free
like the original; entries that plant their own structure (quotes,
near-dup clusters, contamination) rebuild it on top, so their gates
sweep correctly.

Usage:
    PYTHONPATH=. python tools/reseed_sweep.py [--sf-dir D] [--seeds N]
        [--out-root /tmp/reseed] [entry ...]
Entries default to the current driver window (first 50 catalog names).
Exit code = number of (seed, entry) failures.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
REGENERATED = ("documents", "embeddings", "events")


def _resample(rng: np.random.Generator, values: np.ndarray, n: int) -> np.ndarray:
    """Draw n values from the empirical distribution of ``values``."""
    return values[rng.integers(0, len(values), size=n)]


def regen_documents(src: str, dst: str, rng: np.random.Generator, factor: int = 1) -> None:
    """Word-frequency/length/label-faithful regeneration PLUS the
    original's near-duplicate structure: the testdata generator plants
    copy-chains by appending ``dup`` tokens (doc + " dup", doc +
    " dup dup", …) at ≈5%% of rows, ~0.99 3-gram Jaccard to the source
    — the ground truth every dedup gate measures recall against. A
    re-seed without it leaves those gates dividing by zero true pairs."""
    t = pq.read_table(f"{src}/documents.parquet")
    texts = t.column("text").to_pylist()
    words = np.array([w for txt in texts for w in txt.split() if w != "dup"])
    lengths = np.array([len(txt.split()) for txt in texts])
    pairs = list(zip(t.column("lang").to_pylist(), t.column("source").to_pylist()))
    n = len(texts) * factor
    n_copies = max(2, round(0.05 * n))
    n_base = n - n_copies
    new_pairs = [pairs[i] for i in rng.integers(0, len(pairs), size=n)]
    new_texts = [
        " ".join(_resample(rng, words, int(ln)))
        for ln in _resample(rng, lengths, n_base)
    ]
    budget = n_copies
    while budget > 0:
        src_text = new_texts[int(rng.integers(0, n_base))]
        chain = min(int(rng.integers(1, 3)), budget)  # 1- or 2-copy chains
        for k in range(1, chain + 1):
            new_texts.append(src_text + " dup" * k)
        budget -= chain
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(new_texts),
                "lang": pa.array([p[0] for p in new_pairs]),
                "source": pa.array([p[1] for p in new_pairs]),
                "n_chars": pa.array([len(s) for s in new_texts], pa.int64()),
            }
        ),
        f"{dst}/documents.parquet",
    )


def regen_embeddings(src: str, dst: str, rng: np.random.Generator, factor: int = 1) -> None:
    t = pq.read_table(f"{src}/embeddings.parquet")
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = t.column("label").to_numpy()
    mu, sd = vecs.mean(axis=0), vecs.std(axis=0)
    new = rng.normal(
        mu, sd, size=(vecs.shape[0] * factor, vecs.shape[1])
    ).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(new)), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in new], pa.list_(pa.float32())
                ),
                "label": pa.array(_resample(rng, labels, len(new)), pa.int32()),
            }
        ),
        f"{dst}/embeddings.parquet",
    )


def regen_events(src: str, dst: str, rng: np.random.Generator, factor: int = 1) -> None:
    t = pq.read_table(f"{src}/events.parquet")
    n = t.num_rows * factor
    ts = t.column("ts").cast(pa.int64()).to_numpy()  # µs since epoch
    users = t.column("user_id").to_numpy()
    etypes = np.array(t.column("event_type").to_pylist())
    values = t.column("value").to_numpy()
    props_k = np.array(
        [json.loads(p)["k"] for p in t.column("props").to_pylist()]
    )
    new_ts = np.sort(rng.integers(ts.min(), ts.max() + 1, size=n))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(new_ts, pa.timestamp("us")),
                # empirical user draw keeps the hot-key skew the skew
                # gates exist to exercise
                "user_id": pa.array(_resample(rng, users, n), pa.int64()),
                "event_type": pa.array(_resample(rng, etypes, n)),
                "value": pa.array(
                    np.round(_resample(rng, values, n), 2), pa.float64()
                ),
                "props": pa.array(
                    [json.dumps({"k": int(k)}) for k in _resample(rng, props_k, n)]
                ),
            }
        ),
        f"{dst}/events.parquet",
    )


def build_reseed_dir(sf_dir: str, out_dir: str, seed: int) -> str:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    regen_documents(sf_dir, out_dir, rng)
    regen_embeddings(sf_dir, out_dir, rng)
    regen_events(sf_dir, out_dir, rng)
    for name in TABLES:
        if name in REGENERATED:
            continue
        src = f"{sf_dir}/{name}.parquet"
        if os.path.exists(src):
            shutil.copy(src, f"{out_dir}/{name}.parquet")
    return out_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*", help="catalog entry names (default: driver window)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument(
        "--seed-base", type=int, default=1000,
        help="first seed; the sweep runs seed-base .. seed-base+seeds-1",
    )
    ap.add_argument("--out-root", default="/tmp/reseed")
    args = ap.parse_args()

    entries = args.entries
    if not entries:
        from cassandra_slow_queries_spark.plans.catalog import CATALOG

        entries = list(CATALOG)[:50]

    failures = 0
    for k in range(args.seeds):
        seed = args.seed_base + k
        out_dir = build_reseed_dir(args.sf_dir, f"{args.out_root}_s{seed}", seed)
        print(f"=== seed {seed} → {out_dir}", flush=True)
        proc = subprocess.run(
            [sys.executable, "tools/oracle_check.py", out_dir, *entries],
            capture_output=True,
            text=True,
            env={**os.environ, "PYTHONPATH": "."},
        )
        for line in proc.stdout.splitlines():
            if line.startswith(("FAIL", "   -")):
                print(f"  {line}", flush=True)
                failures += line.startswith("FAIL")
        lines = proc.stdout.splitlines()
        oks = sum(line.startswith("ok") for line in lines)
        # oracle-less entries print "<name>: rows-only" — count them as
        # covered, not as silent failures-by-omission (round-7 ADVICE)
        rows_only = sum(": rows-only" in line for line in lines)
        fails = sum(line.startswith("FAIL") for line in lines)
        print(
            f"  seed {seed}: {oks} ok / {rows_only} rows-only / "
            f"{fails} fail / {len(entries)} entries",
            flush=True,
        )
        if proc.returncode not in (0, 1):
            print(proc.stderr[-2000:], flush=True)
            return 2
    print(f"sweep complete: {failures} failures over {args.seeds} seeds")
    return min(failures, 125)


if __name__ == "__main__":
    sys.exit(main())
