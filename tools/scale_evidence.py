"""Wall-vs-output scaling evidence for catalog entries across sf tiers.

The r11 sf3 run proved this tier finds real 100x-scale bugs nothing else
catches (the interval-join points-side serialization: a plan pin and a
green oracle both passed while one task crawled 15+ minutes at sf3).
This tool institutionalizes that measurement instead of leaving it an
ad-hoc session script:

- For each entry, at each data directory, time ONE noop-sink execution
  (the bench convention: full plan runs, no driver collect cost) and
  separately count the output rows (a second execution — acceptable for
  evidence tooling; the count is needed to separate "the answer got
  bigger" from "the plan got slower").
- Report per-entry log-log slopes between consecutive tiers:
  ``wall_exp`` (d log wall / d log factor) and ``out_exp`` (same for
  output rows). The reading protocol, from the r11 precedent:
  wall_exp <= max(out_exp, ~1.2) is healthy (runtime grows no faster
  than the output it must produce, modulo fixed-cost noise on
  sub-second entries); wall_exp substantially above out_exp AND above
  ~1.3 on a multi-second entry flags a plan that would not survive a
  100x scale-up and needs a root-cause note or fix in BASELINE.md.
- Entries whose sf0.1 wall is under ``--min-wall`` seconds are noted as
  fixed-cost-dominated: trigger floors and session overheads swamp the
  slope, so their exponents are reported but not alarmed on.

Usage:
    PYTHONPATH=. python tools/scale_evidence.py [--entries a,b,...]
        [--top N] [--bench-file BENCH_local.json]
        [--tiers sf0.1=/root/testdata/sf0.1,sf1=/tmp/sf1,sf3=/tmp/sf3]
        [--out /tmp/scale_evidence.json]

With --top N (default 10) and no --entries, the slowest N entries from
the bench file's per-query map are measured — the standing round
protocol ("run the sf1 top-10 cost entries at sf3").
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_slow_queries_spark import get_spark  # noqa: E402
from cassandra_slow_queries_spark.plans.catalog import CATALOG  # noqa: E402


def parse_tiers(spec: str) -> list[tuple[str, str, float]]:
    """'sf0.1=/path,sf1=/path' -> [(label, path, factor)] where factor
    is the numeric sf parsed from the label (relative slopes only need
    ratios, so any consistent unit works)."""
    tiers = []
    for part in spec.split(","):
        label, path = part.split("=", 1)
        factor = float(label.replace("sf", ""))
        tiers.append((label, path, factor))
    return tiers


def measure(spark, name: str, sf_dir: str) -> tuple[float, int]:
    qd = CATALOG[name]
    t0 = time.perf_counter()
    qd.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    rows = qd.spark(spark, sf_dir).count()
    return wall, rows


def slope(y2: float, y1: float, x2: float, x1: float) -> float | None:
    if min(y1, y2) <= 0 or x2 == x1:
        return None
    return round(math.log(y2 / y1) / math.log(x2 / x1), 2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", default=None)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--bench-file", default="BENCH_local.json")
    ap.add_argument(
        "--tiers",
        default="sf0.1=/root/testdata/sf0.1,sf1=/tmp/sf1,sf3=/tmp/sf3",
    )
    ap.add_argument("--min-wall", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/scale_evidence.json")
    args = ap.parse_args()

    tiers = parse_tiers(args.tiers)
    for _, path, _ in tiers:
        if not os.path.isdir(path):
            print(f"missing tier dir {path} — build it with tools/scale_up.py")
            return 2

    if args.entries:
        names = [n for n in args.entries.split(",") if n]
    else:
        with open(args.bench_file) as f:
            timings = json.load(f)["queries"]
        names = sorted(
            (n for n in timings if n in CATALOG),
            key=timings.get,
            reverse=True,
        )[: args.top]
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        print(f"not in CATALOG: {unknown}")
        return 2

    spark = get_spark("scale-evidence")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict[str, dict] = {}
    alarms: list[str] = []
    for name in names:
        row: dict = {"tiers": {}}
        ok = True
        for label, path, _ in tiers:
            try:
                wall, rows = measure(spark, name, path)
                row["tiers"][label] = {"wall": round(wall, 2), "rows": rows}
                print(f"{name} @ {label}: {wall:.2f} s, {rows} rows", flush=True)
            except Exception as exc:  # keep measuring the rest
                row["tiers"][label] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
                print(f"{name} @ {label}: ERROR {exc}", flush=True)
                ok = False
        if ok and len(tiers) >= 2:
            (l1, _, f1), (l2, _, f2) = tiers[-2], tiers[-1]
            t1, t2 = row["tiers"][l1], row["tiers"][l2]
            row["wall_exp"] = slope(t2["wall"], t1["wall"], f2, f1)
            row["out_exp"] = slope(t2["rows"], t1["rows"], f2, f1)
            base_wall = row["tiers"][tiers[0][0]]["wall"]
            row["fixed_cost_dominated"] = base_wall < args.min_wall
            we, oe = row["wall_exp"], row["out_exp"]
            if (
                we is not None
                and not row["fixed_cost_dominated"]
                and we > max((oe or 0), 1.0) + 0.3
            ):
                row["alarm"] = True
                alarms.append(name)
        report[name] = row

    payload = {"tiers": [(l, p) for l, p, _ in tiers], "entries": report,
               "alarms": alarms}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"alarms": alarms, "n": len(report), "out": args.out}))
    return 1 if alarms else 0


if __name__ == "__main__":
    sys.exit(main())
