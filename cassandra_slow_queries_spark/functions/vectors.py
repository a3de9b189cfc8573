"""Vector math over ``array<float|double>`` columns as native expressions.

Built on higher-order functions (``zip_with`` + ``aggregate``) so the dot
product / norm / cosine run inside the JVM with no Python transfer —
at 100 TB the difference between this and a row-at-a-time Python UDF is
the whole job. Accumulation is sequential over the array (deterministic,
and bit-identical to DuckDB's ``list_cosine_similarity`` on the same
doubles, which the oracle checks rely on).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _to_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Σ aᵢ·bᵢ (sequential left-to-right accumulation — deterministic).

    With ``dim`` the sum is unrolled into flat codegen-able arithmetic
    (higher-order-function folds are interpreted per element — measured
    several× slower); the addition order is identical to the fold, so the
    doubles are bit-identical either way.
    """
    if dim is not None:
        # scalar casts AFTER the element access: casting the whole array
        # per access would copy it dim times per row (subexpression
        # elimination does not reach inside conditional branches)
        ra, rb = _col(a), _col(b)

        def term(j: int) -> Column:
            return F.get(ra, j).cast("double") * F.get(rb, j).cast("double")

        acc = term(0)
        for j in range(1, dim):
            acc = acc + term(j)
        return acc
    products = F.zip_with(
        _to_double(_col(a)), _to_double(_col(b)), lambda x, y: x * y
    )
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str, dim: int | None = None) -> Column:
    """Euclidean norm."""
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    d = dot(a, b, dim)
    na, nb = norm(a, dim), norm(b, dim)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def squared_l2(a: Column | str, b: Column | str) -> Column:
    """Σ (aᵢ-bᵢ)² — for IVF-style bucketing / nearest-centroid."""
    diffs = F.zip_with(
        _to_double(_col(a)), _to_double(_col(b)), lambda x, y: (x - y) * (x - y)
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
