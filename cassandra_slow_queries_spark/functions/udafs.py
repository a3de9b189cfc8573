"""Pandas GROUPED_AGG UDAF seam (§2.10 — the last member of the UDF
escape-hatch family: scalar pandas_udf, applyInPandas, mapInPandas,
applyInPandasWithState, UDTF, and now a grouped aggregate).

Same discipline as functions/udtfs.py's SpanSplitter: the UDAF exists
as the documented seam for aggregations that genuinely need Python
(a scipy fit, a library sketch), while the shipped pipelines stay
expression-first — here the reference implementation is the geometric
mean, whose expression twin ``exp(avg(ln(x)))`` is pure codegen, and
tests/test_udafs.py pins the two equal so the seam's semantics are
mechanically tied to the fast path.

A GROUPED_AGG pandas UDF receives each group's column as one pandas
Series and returns one scalar — Arrow-batched, no row-at-a-time
Python. Caveats that matter at scale, same as any UDAF without a
partial-aggregation form: every group's FULL value set ships to its
reducer (no map-side combine), so a hot group concentrates on one
task. Prefer decomposable expression aggregates when one exists; this
seam is for when one doesn't.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # pandas/pyarrow are baked into the target env; gate for safety
    import numpy as _np
    import pandas as _pd
    from pyspark.sql.functions import pandas_udf as _pandas_udf
    from pyspark.sql.types import DoubleType as _DoubleType

    _HAVE_ARROW = True
except ImportError:  # pragma: no cover
    _HAVE_ARROW = False


def geometric_mean_expr(x: Column | str) -> Column:
    """The expression twin: ``exp(avg(ln(x)))`` over positive values —
    decomposable (avg has a partial form), whole-stage codegen, the
    form the catalog entry and any production path should use."""
    c = F.col(x) if isinstance(x, str) else x
    return F.exp(F.avg(F.log(c)))


if _HAVE_ARROW:

    # returnType as a TYPE INSTANCE, not a DDL string: the string form
    # parses via the active SparkSession at import time, so a bare
    # ``import udafs`` before any session exists would crash.
    @_pandas_udf(_DoubleType())
    def geometric_mean_udaf(x: _pd.Series) -> float:  # pragma: no cover
        """GROUPED_AGG pandas UDAF: exp(mean(log(x))) over POSITIVE
        values only — matching the expression twin exactly: SQL
        ``ln(x)`` is NULL for x <= 0 and ``avg`` skips NULLs, whereas a
        bare numpy log would fold -inf into the mean and collapse the
        result to 0 the moment one zero appears. All-nonpositive (or
        empty) groups return None, as exp(avg(all-NULL)) does."""
        v = x.astype("float64")
        v = v[v > 0]
        if len(v) == 0:
            return None
        return float(_np.exp(_np.log(v).mean()))

else:  # pragma: no cover
    geometric_mean_udaf = None
