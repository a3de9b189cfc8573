"""r13 optimization-round measurement harness.

For each named catalog entry (default: all), run the query through the
same noop-sink methodology as bench.py N times standalone (not in suite
position), report median/min wall seconds, and optionally write
``.explain("formatted")`` to plans/r13/<entry>_<tag>.txt together with a
one-line plan-shape summary (Exchange count, join strategies, Python
eval nodes, scan pushdown).

Usage:
  PYTHONPATH=. python tools/opt_measure.py [--sf DIR] [--repeats N]
      [--tag before|after|none] [--plans-only] [name ...]

Prints one JSON line per entry and a final summary JSON line, so runs
can be diffed mechanically.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_slow_queries_spark import get_spark  # noqa: E402
from cassandra_slow_queries_spark.plans.catalog import (  # noqa: E402
    CATALOG,
    DEFERRED_CATALOG,
)

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
)


def plan_shape(explained: str) -> dict:
    """Mechanical plan-shape counters for before/after diffs."""
    return {
        "exchanges": len(re.findall(r"\bExchange\b", explained)),
        "single_partition": len(
            re.findall(r"Exchange SinglePartition", explained)
        ),
        "sort_merge_join": len(re.findall(r"\bSortMergeJoin\b", explained)),
        "broadcast_hash_join": len(
            re.findall(r"\bBroadcastHashJoin\b", explained)
        ),
        "shuffled_hash_join": len(
            re.findall(r"\bShuffledHashJoin\b", explained)
        ),
        "bnl_join": len(re.findall(r"BroadcastNestedLoopJoin", explained)),
        "cartesian": len(re.findall(r"CartesianProduct", explained)),
        "batch_eval_python": len(re.findall(r"BatchEvalPython", explained)),
        "arrow_eval_python": len(re.findall(r"ArrowEvalPython", explained)),
        "map_in_arrow_or_pandas": len(
            re.findall(r"MapInArrow|MapInPandas|FlatMapGroupsInPandas", explained)
        ),
        # "formatted" mode marks codegen'd operators with a leading '*'
        "codegen_ops": len(re.findall(r"^\s*(?:[:+\-| ]*)\* ", explained, re.M)),
        "aqe": len(re.findall(r"AdaptiveSparkPlan", explained)),
        "in_memory_scans": len(re.findall(r"InMemoryTableScan", explained)),
        "scans": len(re.findall(r"Scan parquet|FileScan parquet", explained)),
        "sorts": len(re.findall(r"\bSort \[", explained)),
    }


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def measure(spark, name, qd, sf_dir, repeats, tag, plans_only):
    rec: dict = {"entry": name}
    try:
        if tag != "none":
            df = qd.spark(spark, sf_dir)
            if df.isStreaming:
                rec["plan"] = "streaming (no batch explain)"
            else:
                txt = explain_str(df)
                os.makedirs(PLANS_DIR, exist_ok=True)
                with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                    f.write(txt)
                rec["shape"] = plan_shape(txt)
        if not plans_only:
            from cassandra_slow_queries_spark.session import (
                release_entry_storage,
            )

            walls = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                qd.spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls.append(round(time.perf_counter() - t0, 3))
                # match bench.py's r14 discipline: every timed run
                # starts from a clean storage state
                release_entry_storage(spark)
            walls_sorted = sorted(walls)
            rec["median"] = walls_sorted[len(walls) // 2]
            rec["min"] = walls_sorted[0]
            rec["walls"] = walls
    except Exception as exc:  # keep the sweep alive
        rec["error"] = f"{type(exc).__name__}: {exc}"[:300]
    return rec


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    repeats = 3
    tag = "none"
    plans_only = False
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--repeats":
            repeats = int(next(it))
        elif a == "--tag":
            tag = next(it)
        elif a == "--plans-only":
            plans_only = True
        else:
            names.append(a)
    if not names:
        names = list(CATALOG)
    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    # warm like bench.py so standalone numbers are comparable
    for t in ("events", "lineitem", "documents", "embeddings"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()
    out = {}
    for name in names:
        qd = CATALOG.get(name) or DEFERRED_CATALOG.get(name)
        if qd is None:
            print(json.dumps({"entry": name, "error": "unknown entry"}))
            continue
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        rec = measure(spark, name, qd, sf_dir, repeats, tag, plans_only)
        spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(json.dumps(rec), flush=True)
    if not plans_only:
        total = sum(r.get("median", 0) for r in out.values())
        print(json.dumps({"summary_total_median": round(total, 3), "n": len(out)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
