"""Wall-vs-output scaling evidence for catalog entries across sf tiers.

The r11 sf3 run proved this tier finds real 100x-scale bugs nothing else
catches (the interval-join points-side serialization: a plan pin and a
green oracle both passed while one task crawled 15+ minutes at sf3).
This tool institutionalizes that measurement instead of leaving it an
ad-hoc session script:

- For each entry, at each data directory, time ONE noop-sink execution
  (the bench convention: full plan runs, no driver collect cost) with an
  ``Observation`` riding the same plan to count the output rows — ONE
  execution total, so the count can't warm caches/session intermediates
  ahead of a later tier's timed wall (the skew a separate count run
  introduced through r12, and the reason the r12 BASELINE ledger had to
  explain non-monotonic rows). The CollectMetrics node the observation
  adds is a constant-per-row fold, uniform across tiers, so slopes are
  unaffected. The count separates "the answer got bigger" from "the
  plan got slower".
- Report per-entry log-log slopes for EVERY consecutive tier pair
  (``pairs``), plus headline ``wall_exp``/``out_exp`` from the largest
  pair (the r11 reading convention). The alarm rule, from the r11
  precedent: the WORST pair's wall exponent above
  max(out_exp, 1.0) + 0.3 flags a plan that would not survive a 100x
  scale-up and needs a root-cause note or fix in BASELINE.md — a pair
  is only eligible when its smaller tier ran at least ``--min-wall``
  seconds (below that, trigger floors and session overheads swamp the
  slope).
- An entry that CRASHES at any tier (OOM, executor loss — the loudest
  possible scale signal) lands in ``failures`` and forces a nonzero
  exit; it must never read as healthy.

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
from cassandra_slow_queries_spark.plans.catalog import (  # noqa: E402
    CATALOG,
    DEFERRED_CATALOG,
)


def parse_tiers(spec: str) -> list[tuple[str, str, float]]:
    """'sf0.1=/path,sf1=/path' -> [(label, path, factor)] where factor
    is the numeric sf parsed from the label (relative slopes only need
    ratios, so any consistent unit works). Raises ValueError with a
    usage message on a malformed spec — main() turns that into the
    tool's documented exit-2 path instead of a traceback."""
    tiers = []
    for part in spec.split(","):
        label, _, path = part.partition("=")
        try:
            factor = float(label.replace("sf", "", 1))
        except ValueError:
            raise ValueError(
                f"bad tier label {label!r} in {part!r} — expected "
                "sf<number>=<dir>, e.g. sf0.1=/root/testdata/sf0.1"
            ) from None
        if not path:
            raise ValueError(
                f"bad tier spec {part!r} — expected sf<number>=<dir>"
            )
        tiers.append((label, path, factor))
    return tiers


def measure(spark, name: str, sf_dir: str) -> tuple[float, int]:
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    # deferred entries (built + oracle-backed, staged behind the
    # rotation-window math) are measurable too: they NEED multi-tier
    # evidence BEFORE their promotion round, not after
    qd = CATALOG[name] if name in CATALOG else DEFERRED_CATALOG[name]
    obs = Observation()
    # the entry call itself MUST sit inside the timer: streaming
    # entries run their query eagerly at construction and return the
    # sink's batch frame, and the dedup/ANN families build their
    # shared intermediates on first touch — outside the timer those
    # entries read near-zero (caught live in the first r13 sf10 run:
    # e2e at 0.04 s over 10M events)
    t0 = time.perf_counter()
    df = qd.spark(spark, sf_dir)
    df.observe(obs, F.count(F.lit(1)).alias("rows")).write.format(
        "noop"
    ).mode("overwrite").save()
    wall = time.perf_counter() - t0
    rows = int(obs.get["rows"])
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

    try:
        tiers = parse_tiers(args.tiers)
    except ValueError as exc:
        print(f"usage error: {exc}")
        return 2
    for _, path, _ in tiers:
        if not os.path.isdir(path):
            print(f"missing tier dir {path} — build it with tools/scale_up.py")
            return 2

    if args.entries:
        names = [n for n in args.entries.split(",") if n]
    else:
        with open(args.bench_file) as f:
            timings = json.load(f)["queries"]
        # a stale bench file (pre-rotation-swap) may carry retired
        # names — say so instead of silently substituting cheaper
        # entries for the claimed "top N"
        stale = sorted(n for n in timings if n not in CATALOG)
        if stale:
            print(
                f"note: {len(stale)} bench-file entries not in the "
                f"current CATALOG (stale file?) skipped: {stale}"
            )
        names = sorted(
            (n for n in timings if n in CATALOG),
            key=timings.get,
            reverse=True,
        )[: args.top]
    unknown = [
        n for n in names if n not in CATALOG and n not in DEFERRED_CATALOG
    ]
    if unknown:
        print(f"not in CATALOG or DEFERRED_CATALOG: {unknown}")
        return 2

    spark = get_spark("scale-evidence")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict[str, dict] = {}
    alarms: list[str] = []
    failures: list[str] = []
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
        if not ok:
            # a crash AT a tier (OOM, executor loss) IS the
            # scale-breaking signal — it must never read as healthy
            failures.append(name)
        if ok and len(tiers) >= 2:
            # slopes for EVERY consecutive tier pair: superlinear
            # growth between the first two tiers is just as fatal at
            # 100x as between the last two (and a fixed-cost floor at
            # the small tier can mask it in a single last-pair slope)
            row["pairs"] = {}
            worst_we, worst_oe = None, None
            for (l1, _, f1), (l2, _, f2) in zip(tiers, tiers[1:]):
                t1, t2 = row["tiers"][l1], row["tiers"][l2]
                we = slope(t2["wall"], t1["wall"], f2, f1)
                oe = slope(t2["rows"], t1["rows"], f2, f1)
                row["pairs"][f"{l1}->{l2}"] = {"wall_exp": we, "out_exp": oe}
                # alarm on the worst pair, but ignore pairs whose
                # SMALLER tier ran under min-wall (fixed-cost floor
                # makes the slope meaningless there)
                if we is not None and t1["wall"] >= args.min_wall:
                    if worst_we is None or we > worst_we:
                        worst_we, worst_oe = we, oe
            # headline = the last (largest) pair, the r11 convention
            last = row["pairs"][f"{tiers[-2][0]}->{tiers[-1][0]}"]
            row["wall_exp"] = last["wall_exp"]
            row["out_exp"] = last["out_exp"]
            base_wall = row["tiers"][tiers[0][0]]["wall"]
            row["fixed_cost_dominated"] = base_wall < args.min_wall
            if (
                worst_we is not None
                and worst_we > max((worst_oe or 0), 1.0) + 0.3
            ):
                row["alarm"] = True
                alarms.append(name)
        report[name] = row

    payload = {"tiers": [(l, p) for l, p, _ in tiers], "entries": report,
               "alarms": alarms, "failures": failures}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"alarms": alarms, "failures": failures,
                      "n": len(report), "out": args.out}))
    return 1 if (alarms or failures) else 0


if __name__ == "__main__":
    sys.exit(main())
