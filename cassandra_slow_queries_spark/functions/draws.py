"""The portable md5 randomness primitives — ONE implementation of the
draw every deterministic-sampling operator shares.

md5 (not xxhash64/hash) on purpose: every consumer's DuckDB oracle must
reproduce the exact same numbers, and md5 is the hash both engines
spell identically. 15 hex chars = 60 bits, safely inside a long.

Consumers: curation.sample_bucket / weighted_sample (stratified,
Efraimidis-Spirakis), analytics.poisson_bootstrap_ci (replicate
weights), plus their catalog oracles via :func:`md5_long_sql` /
:func:`md5_uniform_sql`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: denominator of the 60-bit uniform draw
U_SPACE = float(1 << 60)


def md5_long(s: Column) -> Column:
    """First 60 bits of md5(s) as a non-negative long."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def md5_uniform(s: Column) -> Column:
    """Deterministic uniform in (0, 1): ``(md5_60bit(s) + 0.5) / 2^60``
    — a pure function of the input string, reproducible across runs,
    partitionings, and engines."""
    return (md5_long(s).cast("double") + F.lit(0.5)) / F.lit(U_SPACE)


def md5_long_sql(expr: str) -> str:
    """The DuckDB replay of :func:`md5_long` over a VARCHAR expression."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def md5_uniform_sql(expr: str) -> str:
    """The DuckDB replay of :func:`md5_uniform` — BITWISE equal, which
    takes care: the draw has up to 60 significant bits, so the float
    path matters. Spark promotes the long to double FIRST (rounding h
    to 53 bits; the +0.5 is then absorbed below the ulp), while
    DuckDB's ``BIGINT + 0.5`` runs through extended precision and can
    land one ulp away. The explicit ``CAST(... AS DOUBLE)`` pins DuckDB
    to Spark's evaluation order (verified value-for-value by
    tests/test_draws.py; downstream consumers additionally quantize, so
    even the unpinned form never produced a visible divergence)."""
    return f"((CAST({md5_long_sql(expr)} AS DOUBLE)) + 0.5) / {U_SPACE!r}"
