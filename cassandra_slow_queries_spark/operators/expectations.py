"""Declarative data-quality expectations, verified in one pass.

The contract-checking step a production pipeline runs before publishing
a table (the pattern popularized by Deequ / Great Expectations): declare
constraints — completeness, uniqueness, value ranges, regex shape,
set membership, row count — and get back one row per check with the
measured metric and a pass/fail verdict. The result is a plain
DataFrame, so it can be written next to the data, diffed across
snapshots (see ``plans/catalog.py:x_corpus_diff`` for the diff shape),
or used to fail a job.

Scale shape: every non-distinct metric is an ordinary aggregate, so the
WHOLE suite compiles into ONE map-side-combined aggregation over the
table — adding a check adds a column to the agg, not a pass over the
data. Uniqueness checks need exact ``COUNT(DISTINCT struct(keys))``;
Spark rewrites multi-distinct aggregates as an Expand (one row copy per
distinct spec), so those live in their OWN aggregation, crossJoined on
the 1-row results — the same measured split as
``operators/profile.py:profile_columns`` (mixing plain stats into the
expansion was 4-5× slower at sf0.1). N distinct specs still cost one
pass with an N-way expand, never N passes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class _Ratio:
    """A ratio-style check: fraction of rows satisfying ``predicate``
    must be ≥ ``min_ratio`` (NULLs fail the predicate unless the
    predicate itself handles them)."""

    name: str
    predicate: Column
    min_ratio: float


@dataclass(frozen=True)
class _Unique:
    """Distinct(key) / rows must be ≥ ``min_ratio`` (1.0 = strict key)."""

    name: str
    cols: tuple[str, ...]
    min_ratio: float


@dataclass(frozen=True)
class _RowCount:
    name: str
    min_rows: int
    max_rows: int | None


class ExpectationSuite:
    """Builder: accumulate checks, then :meth:`run` them in one job.

    All builders return ``self`` so suites chain fluently::

        suite = (ExpectationSuite()
                 .expect_complete("o_custkey")
                 .expect_unique("o_orderkey")
                 .expect_between("o_totalprice", 0, 600_000)
                 .expect_matches("o_orderpriority", "^[1-5]-")
                 .expect_in_set("o_orderstatus", ["O", "F", "P"])
                 .expect_row_count(min_rows=1))
        report = suite.run(orders)
    """

    def __init__(self) -> None:
        self._ratios: list[_Ratio] = []
        self._uniques: list[_Unique] = []
        self._row_counts: list[_RowCount] = []

    # -- builders ----------------------------------------------------------

    def expect_complete(self, col: str, min_ratio: float = 1.0) -> "ExpectationSuite":
        """Non-NULL fraction of ``col`` ≥ ``min_ratio``."""
        self._ratios.append(
            _Ratio(f"complete({col})", F.col(col).isNotNull(), min_ratio)
        )
        return self

    def expect_between(
        self, col: str, lo, hi, min_ratio: float = 1.0
    ) -> "ExpectationSuite":
        """Fraction of rows with ``lo ≤ col ≤ hi`` ≥ ``min_ratio``
        (NULL values count as violations — an absent measurement does
        not satisfy a range contract)."""
        pred = F.col(col).isNotNull() & F.col(col).between(F.lit(lo), F.lit(hi))
        self._ratios.append(_Ratio(f"between({col})", pred, min_ratio))
        return self

    def expect_matches(
        self, col: str, pattern: str, min_ratio: float = 1.0
    ) -> "ExpectationSuite":
        """Fraction of rows whose ``col`` matches the (RE2-compatible —
        keep to the portable subset) regex ≥ ``min_ratio``."""
        pred = F.col(col).isNotNull() & F.col(col).rlike(pattern)
        self._ratios.append(_Ratio(f"matches({col})", pred, min_ratio))
        return self

    def expect_in_set(
        self, col: str, allowed: list, min_ratio: float = 1.0
    ) -> "ExpectationSuite":
        """Fraction of rows whose ``col`` is one of ``allowed`` ≥
        ``min_ratio``."""
        pred = F.col(col).isin(allowed)
        self._ratios.append(_Ratio(f"in_set({col})", pred, min_ratio))
        return self

    def expect_satisfies(
        self, name: str, predicate: Column, min_ratio: float = 1.0
    ) -> "ExpectationSuite":
        """Escape hatch: arbitrary row predicate under a caller-chosen
        check name (shown as ``satisfies(<name>)``)."""
        self._ratios.append(_Ratio(f"satisfies({name})", predicate, min_ratio))
        return self

    def expect_unique(self, *cols: str, min_ratio: float = 1.0) -> "ExpectationSuite":
        """``COUNT(DISTINCT cols) / COUNT(*)`` ≥ ``min_ratio`` — 1.0
        asserts a strict candidate key."""
        self._uniques.append(_Unique(f"unique({','.join(cols)})", tuple(cols), min_ratio))
        return self

    def expect_row_count(
        self, min_rows: int = 1, max_rows: int | None = None
    ) -> "ExpectationSuite":
        self._row_counts.append(_RowCount("row_count", min_rows, max_rows))
        return self

    # -- execution ---------------------------------------------------------

    def run(self, df: DataFrame) -> DataFrame:
        """Evaluate every check: ``(check, metric, threshold, passed)``,
        one row per declared check in declaration order (ratios, then
        uniques, then row counts), metric rounded to 6 dp.

        One aggregation for all ratio/row-count checks; one more (the
        Expand pass) only if uniqueness checks exist.
        """
        if not (self._ratios or self._uniques or self._row_counts):
            raise ValueError("empty expectation suite")
        aggs = [F.count(F.lit(1)).alias("_n")]
        for i, r in enumerate(self._ratios):
            # coalesce the PREDICATE, not just the final ratio: a check
            # whose predicate is NULL on every row (expect_in_set over
            # an all-NULL column, a NULL-valued expect_satisfies) would
            # otherwise SUM to NULL, fall into the empty-table
            # vacuous-1.0 branch, and silently PASS a 0%-conforming
            # column — three-valued logic says NULL-is-not-in-set, so
            # a NULL predicate row is a failing row
            aggs.append(
                F.sum(
                    F.coalesce(r.predicate, F.lit(False)).cast("long")
                ).alias(f"_ok_{i}")
            )
        wide = df.agg(*aggs)
        if self._uniques:
            wide = wide.crossJoin(
                df.agg(
                    *[
                        F.count_distinct(*[F.col(c) for c in u.cols]).alias(
                            f"_uniq_{i}"
                        )
                        for i, u in enumerate(self._uniques)
                    ]
                )
            )

        from cassandra_slow_queries_spark.functions.quantize import qdec as _q

        n = F.col("_n")
        # guard n=0: ratio checks on an empty table are vacuously metric 1.0
        safe_n = F.when(n > 0, n.cast("double"))
        rows = []
        for i, r in enumerate(self._ratios):
            # passed is derived from the SAME quantized metric the row
            # reports — a raw-double comparison could disagree with the
            # displayed (metric, threshold) pair at the quantization
            # boundary, breaking consumers that re-derive passed
            metric = _q(F.coalesce(F.col(f"_ok_{i}") / safe_n, F.lit(1.0)))
            rows.append((r.name, metric, F.lit(float(r.min_ratio)), metric >= r.min_ratio))
        for i, u in enumerate(self._uniques):
            metric = _q(F.coalesce(F.col(f"_uniq_{i}") / safe_n, F.lit(1.0)))
            rows.append((u.name, metric, F.lit(float(u.min_ratio)), metric >= u.min_ratio))
        for rc in self._row_counts:
            ok = n >= rc.min_rows
            thr = float(rc.min_rows)
            if rc.max_rows is not None:
                ok = ok & (n <= rc.max_rows)
            rows.append((rc.name, n.cast("double"), F.lit(thr), ok))

        # qdec, not ROUND: ratio metrics (k/n) are terminating rationals
        # that can land exactly on the half boundary where Spark and a
        # DuckDB oracle round the same double differently (r9 ADVICE).
        from cassandra_slow_queries_spark.functions.quantize import qdec

        packed = F.array(
            *[
                F.struct(
                    F.lit(name).alias("check"),
                    qdec(metric).alias("metric"),
                    threshold.alias("threshold"),
                    passed.alias("passed"),
                )
                for name, metric, threshold, passed in rows
            ]
        )
        return wide.select(F.explode(packed).alias("r")).select("r.*")
