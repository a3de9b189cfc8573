"""Cross-engine parity of the qdec quantization idiom.

qdec exists because ROUND(x, d) is engine-specific at exact decimal
half boundaries; this test pins that the replacement idiom itself is
NOT — Spark's qdec and DuckDB's FLOOR twin produce bit-identical
doubles over adversarial inputs: exact half-boundary rationals
(k/2^a/10^b), values one ulp either side of boundaries, negatives, and
random rationals of the count-ratio shape the oracle columns carry.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from cassandra_slow_queries_spark.functions.quantize import qdec, qdec_sql


def _adversarial_values() -> list[float]:
    vals: list[float] = []
    # exact 7th-digit-5 boundaries: k/(2^a · 10^b) terminating rationals
    for denom in (128, 256, 64, 32, 2_000_000, 8_000_000):
        for k in (1, 3, 5, 7, 11, 101, 999):
            vals.append(k / denom)
            vals.append(-k / denom)
    # one-ulp perturbations around boundaries
    for v in (0.0000005, 1.0000005, 123.4567895):
        vals.extend([v, np.nextafter(v, 0.0), np.nextafter(v, 2 * v + 1)])
    # count-ratio shapes
    rng = np.random.default_rng(7)
    num = rng.integers(0, 10_000, size=200)
    den = rng.integers(1, 10_000, size=200)
    vals.extend((num / den).tolist())
    return [float(v) for v in vals]


@pytest.mark.parametrize("digits", [4, 6, 9])
def test_qdec_matches_duckdb_floor_twin_bitwise(spark, digits):
    vals = _adversarial_values()
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, x double")
    got = {
        r["i"]: r["q"]
        for r in sdf.select("i", qdec(F.col("x"), digits).alias("q")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(vals)))
    expect = dict(
        con.execute(f"SELECT i, {qdec_sql('x', digits)} FROM t").fetchall()
    )
    assert got == expect  # dict equality on floats = bitwise equality


def test_qdec_is_half_up_for_nonnegative():
    """Driver-side replay on values exact in BINARY (k/2^a), where the
    idiom's arithmetic is fully determined: 5/4096 = 0.001220703125
    scales to 1220.703125, +0.5 → 1221.203125, floor → 1221."""
    v = 5.0 / 4096.0
    assert np.floor(v * 1e6 + 0.5) / 1e6 == 0.001221
    # an exact half at the quantization boundary rounds UP (half-up):
    # 1/128 = 0.0078125 → ×1e6 = 7812.5 → +0.5 → 7813.0 → 0.007813
    assert np.floor((1.0 / 128.0) * 1e6 + 0.5) / 1e6 == 0.007813
