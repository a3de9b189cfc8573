"""r14 adjudication harness: standalone warm timings for a list of
catalog entries, one JSON line per entry, identical methodology to
bench.py (noop sink, per-entry repeats) plus the r14 storage-release
discipline between runs.

Runs inside EITHER the current tree or a historical worktree (the
pre-r13-optimization baseline at 10dff00): the release helper is
inlined as a fallback because the old tree predates
session.release_entry_storage. Process-level interleave (old/new/old/
new...) cancels box drift the same way the r13 in-session interleaves
did; per-process warm medians come from whole-list passes so repeats
land in different positions.

Usage: AB_REPEATS=3 python tools/ab_entries.py entry [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_slow_queries_spark import get_spark  # noqa: E402
from cassandra_slow_queries_spark.plans.catalog import CATALOG  # noqa: E402

try:
    from cassandra_slow_queries_spark.session import release_entry_storage
except ImportError:  # pre-r14 tree

    def release_entry_storage(spark):  # type: ignore[misc]
        spark.catalog.clearCache()
        try:
            for jrdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                jrdd.unpersist()
        except Exception:
            pass
        return 0


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: ab_entries.py entry [entry ...]", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("AB_REPEATS", "3"))
    spark = get_spark("ab-entries")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("events", "lineitem", "documents", "embeddings"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            qd = CATALOG[name]
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            qd.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            release_entry_storage(spark)
    out = {}
    for name, walls in samples.items():
        s = sorted(walls)
        out[name] = {
            "median": s[len(s) // 2],
            "min": s[0],
            "walls": walls,
        }
        print(json.dumps({"entry": name, **out[name]}), flush=True)
    print(
        json.dumps(
            {
                "total_median": round(
                    sum(v["median"] for v in out.values()), 3
                ),
                "tree": os.path.abspath(
                    os.path.dirname(os.path.dirname(__file__))
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
