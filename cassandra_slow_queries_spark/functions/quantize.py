"""Engine-portable decimal quantization for oracle-compared columns.

``ROUND(x, d)`` is NOT portable at exact half boundaries: Spark rounds
doubles via BigDecimal HALF_UP over the exact binary value, DuckDB via
its own scheme, and the two can disagree on the SAME input double. That
only matters when a value lands exactly on the (d+1)-th-digit-5
boundary — impossible for transcendental outputs (logs, exps, sqrts are
never terminating decimals) but entirely possible for TERMINATING
RATIONALS: count ratios (k/128 = 0.0078125…), interpolation blends,
window averages, minmax scalings. The round-8 re-seed sweep caught
x_interpolate flipping exactly this way on one regenerated corpus.

:func:`qdec` spells the quantization as a fixed IEEE op sequence —
``floor(x·10^d + 0.5) / 10^d`` — which every engine evaluates
bit-identically on bit-identical input. Oracles must mirror the same
idiom textually: ``FLOOR((expr) * 1e6 + 0.5) / 1e6``.

Semantics note: ``floor(x + 0.5)`` is round-half-toward-+inf, which
matches HALF_UP for the non-negative values these columns carry; for
possibly-negative columns (a regression slope) the two sides still
agree with EACH OTHER, which is the property the oracle gate needs.

Valid magnitude range (round-9 ADVICE): the parity contract holds only
for ``|x| < 2^53 / 10^digits`` (≈ 9.0e9 at 6 digits). Past 2^53 the
scaled double ``x·10^d`` can no longer represent every integer, so the
``+ 0.5`` nudge may be absorbed and the two engines' FLOOR inputs can
differ in the last bit; past 2^63 Spark's ``F.floor(double)`` (which
returns BIGINT via a non-ANSI cast) saturates at Long.MAX while
DuckDB's FLOOR stays DOUBLE, silently breaking parity. Every current
call site carries bounded ratios/averages/z-scores well inside the
range; guard any NEW unbounded column (slope, intercept, raw sums)
with a range check or keep it on ROUND with a transcendental-input
argument.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qdec(col: Column | str, digits: int = 6) -> Column:
    """Quantize ``col`` to ``digits`` decimals via explicit IEEE ops."""
    scale = float(10 ** digits)
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def qdec_sql(expr: str, digits: int = 6) -> str:
    """The SQL twin of :func:`qdec` for oracle strings."""
    scale = float(10 ** digits)
    return f"FLOOR(({expr}) * {scale:.1f} + 0.5) / {scale:.1f}"
