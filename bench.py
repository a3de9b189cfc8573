"""Benchmark harness: run the catalog suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall-clock seconds.

Queries execute via the no-op sink so the full plan runs (scan → shuffle
→ sink) without driver-side collect cost distorting the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cassandra_slow_queries_spark import get_spark  # noqa: E402
from cassandra_slow_queries_spark.plans.catalog import CATALOG  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the session (executor spin-up, parquet footers, first-stage
    # codegen) so per-query numbers measure the queries, not JVM startup.
    for t in ("events", "lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    start_all = time.perf_counter()
    for name, qd in CATALOG.items():
        t0 = time.perf_counter()
        try:
            qd.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # one broken entry must not kill the bench
            timings[name] = round(time.perf_counter() - t0, 3)
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
    total = round(time.perf_counter() - start_all, 3)

    print(
        json.dumps(
            {
                "metric": "catalog_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "errors": errors,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
