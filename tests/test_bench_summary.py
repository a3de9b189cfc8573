"""bench.py's compact summary line must parse out of the driver's
2000-char stdout tail in EVERY regime — most importantly failure-heavy
runs, where the r12 review found the untrimmed errors dict alone could
overflow the window and re-null the very record that should explain
the failures."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import compact_summary_line


def _full(n_queries=150, n_errors=0, err_len=500):
    queries = {f"entry_name_number_{i:03d}": round(0.1 * i, 3) for i in range(n_queries)}
    errors = {
        f"entry_name_number_{i:03d}": "E" * err_len for i in range(n_errors)
    }
    return {
        "metric": "catalog_suite_wall",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "errors": errors,
        "repeats": 3,
        "wall": 600.0,
        "canary_sec": 0.7,
        "canary_all": [0.71, 0.7, 0.69],
        "sf": 0.1,
    }


def _assert_survives_tail(line: str):
    assert len(line) <= 1600
    # simulate the driver: full payload line then the compact line,
    # keep the last 2000 chars, parse the last complete line
    stdout = json.dumps(_full()) + "\n" + line + "\n"
    tail = stdout[-2000:]
    last = [l for l in tail.splitlines() if l.strip()][-1]
    parsed = json.loads(last)
    assert parsed["metric"] == "catalog_suite_wall"
    return parsed


def test_clean_run_keeps_slowest_queries():
    full = _full()
    parsed = _assert_survives_tail(compact_summary_line(full))
    assert parsed["n_errors"] == 0
    assert parsed["queries_omitted"] + len(parsed["queries"]) == 150
    # slowest-first: every kept entry outranks every omitted one
    kept_min = min(parsed["queries"].values())
    omitted = set(full["queries"]) - set(parsed["queries"])
    assert all(full["queries"][n] <= kept_min for n in omitted)


def test_few_errors_keep_truncated_messages():
    parsed = _assert_survives_tail(compact_summary_line(_full(n_errors=4)))
    assert parsed["n_errors"] == 4
    assert all(len(m) <= 60 for m in parsed["errors"].values())


def test_many_errors_collapse_to_names():
    parsed = _assert_survives_tail(compact_summary_line(_full(n_errors=150)))
    assert parsed["n_errors"] == 150
    assert "errors" not in parsed
    assert len(parsed["error_names"]) == 20


def test_value_matches_full_payload():
    full = _full()
    parsed = _assert_survives_tail(compact_summary_line(full))
    assert parsed["value"] == full["value"]
    assert parsed["wall"] == full["wall"]
    assert parsed["repeats"] == full["repeats"]


def test_tiny_budget_still_enforced_in_failure_heavy_run():
    """The r12 ADVICE case: when the base payload alone (metadata + 8
    capped errors, or 20 error names) exceeds the budget, the error
    detail must degrade too — the budget is a guarantee, not a happy-
    path property. n_errors must survive every degradation step."""
    for n_errors in (4, 8, 150):
        full = _full(n_errors=n_errors)
        for budget in (1600, 800, 400, 300):
            line = compact_summary_line(full, budget=budget)
            assert len(line) <= budget, (n_errors, budget, len(line))
            parsed = json.loads(line)
            assert parsed["n_errors"] == n_errors


def test_canary_fields_survive_compact_line():
    """The contention canary rides the base payload: both the median
    and the per-pass walls must parse out of the 2000-char tail, since
    they're exactly what an adjudicator needs to normalize a noisy
    driver reading."""
    parsed = _assert_survives_tail(compact_summary_line(_full()))
    assert parsed["canary_sec"] == 0.7
    assert parsed["canary_all"] == [0.71, 0.7, 0.69]


def test_canary_measures_a_fixed_workload(spark):
    """canary() returns a positive wall and is invariant to data/config
    (pure spark.range compute — a tiny n keeps the test cheap)."""
    from bench import canary

    w = canary(spark, n=10_000)
    assert isinstance(w, float) and w > 0


def test_queries_min_stays_out_of_compact_line():
    """r14 adds the per-entry min map to the FULL payload only
    (BENCH_local.json); inlining 150 more floats into the compact line
    would blow its stdout budget. The compact line must neither carry
    the map nor grow past budget because of it."""
    full = _full()
    full["queries_min"] = {n: v * 0.9 for n, v in full["queries"].items()}
    full["value_min_sum"] = round(sum(full["queries_min"].values()), 3)
    parsed = _assert_survives_tail(compact_summary_line(full))
    assert "queries_min" not in parsed
    # the scalar min-sum is tiny and SHOULD survive for adjudication
    assert parsed["value_min_sum"] == full["value_min_sum"]
