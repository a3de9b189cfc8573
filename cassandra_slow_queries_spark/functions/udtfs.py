"""Python UDTF seam — the table-function corner of the UDF surface.

SURVEY.md §2.10 maps the sanctioned Python escape hatches this engine
exposes: scalar ``pandas_udf``, grouped ``applyInPandas``, streaming
``mapInPandas`` (multimodal decode, endpoint enrichment),
``applyInPandasWithState`` (custom streaming state). This module adds
the last member of the family, the user-defined TABLE function: one
input row → many output rows, composable via ``lateralJoin`` or
``SELECT ... FROM tbl, udtf(col)``.

Positioning, stated bluntly in code because it matters at 100 TB: a
UDTF is row-at-a-time Python — the SLOWEST execution shape Spark has.
Every production row-expander in this repo is a native expression
(``split`` + ``posexplode`` in operators/dedup.py:split_spans — the
exact operation ``SpanSplitter`` below reproduces), and
``tests/test_udtfs.py`` pins the two paths equal so the seam can never
silently drift from the expression it demonstrates. Reach for a UDTF
only when row production is genuinely imperative (a tokenizer from a
Python-only library, a parser with backtracking state) and the fan-out
side is small; otherwise write the expression.

(``transformWithStateInPandas`` — the Spark 4 successor to
``applyInPandasWithState`` — is absent from this family on purpose:
its driver worker requires ``google.protobuf``, which this
environment does not ship. The older API covers the semantics;
revisit when the dependency is available.)
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, span string")
class SpanSplitter:
    """UDTF twin of ``operators/dedup.py:split_spans``: one ``(pos,
    span)`` row per paragraph of the input text, 0-based, empty text →
    one empty span (``str.split`` semantics). Null text yields no rows
    (compose with ``lateralJoin`` + an outer reference if null
    propagation is needed)."""

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        if text is None:
            return
        for i, part in enumerate(text.split("\n\n")):
            yield i, part
