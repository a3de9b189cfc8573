"""Statement-type dispatch (SURVEY.md §2.3, D1-D6).

The reference walks a processor chain per row and lets the first matching
class handle the log (analyze_slow_queries.py:892-898, :928-931). Here the
whole dispatch is ONE ``when``-chain producing a ``type`` column inside a
single narrow stage — no per-type DataFrames, no Python. Rows no processor
accepts get ``type = NULL`` and are filtered (the reference raises and
skips them, :932-934); the count of dropped rows is observable via
``F.observe`` in plans/pipeline.py.

Prefix semantics are pinned to the reference: it matches only the
all-upper or all-lower prefix (``'SELECT'``/``'select'``, :620 — a
mixed-case ``'Select'`` is dropped), so no ``F.upper`` normalization here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (type label, [accepted prefixes]) in the reference's registration order
# (SELECT, BATCH, INSERT, DELETE, UPDATE — analyze_slow_queries.py:892-898).
STATEMENT_PREFIXES: list[tuple[str, list[str]]] = [
    ("SELECT", ["SELECT", "select"]),
    ("BATCH", ["BEGIN BATCH", "begin batch"]),
    ("INSERT", ["INSERT", "insert"]),
    ("DELETE", ["DELETE", "delete"]),
    ("UPDATE", ["UPDATE", "update"]),
]


def statement_type(query: Column | str) -> Column:
    """Query text → statement type label, NULL when no processor matches."""
    q = F.col(query) if isinstance(query, str) else query
    expr: Column | None = None
    for label, prefixes in STATEMENT_PREFIXES:
        cond = q.startswith(prefixes[0])
        for p in prefixes[1:]:
            cond = cond | q.startswith(p)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    assert expr is not None
    return expr.otherwise(F.lit(None).cast("string"))


# Types that carry bound values / table / primary-key enrichment
# (BATCH/DELETE/UPDATE emit only type+duration+query —
# analyze_slow_queries.py:598-602, :800-804, :835-839).
ENRICHED_TYPES = ("SELECT", "INSERT")


def is_enriched(type_col: Column | str) -> Column:
    t = F.col(type_col) if isinstance(type_col, str) else type_col
    return t.isin(*ENRICHED_TYPES)
