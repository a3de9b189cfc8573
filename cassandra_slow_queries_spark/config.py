"""Analysis configuration.

Mirrors the reference CLI surface (analyze_slow_queries.py:85-109,
:1309-1321): report caps, HAVING threshold, and the configurable sort key
used by every top-N report.
"""

from __future__ import annotations

from dataclasses import dataclass, field

VALID_ORDER_BY = ("duration", "avg_duration", "count")


@dataclass(frozen=True)
class AnalysisConfig:
    """Report shaping knobs (defaults = reference CLI defaults,
    analyze_slow_queries.py:1315-1317)."""

    top_n: int = 100
    rows_per_minute: int = 5
    order_by: str = "duration"
    min_count: int = 5
    # Dimension inputs (already parsed, driver-side; tiny → broadcast).
    # schema: {keyspace: {cf: {"primary_key": [...], "clustering_key": [...]}}}
    schema: dict = field(default_factory=dict)
    # queries: [{"start": str, "parameters": [str]}] — prefix patterns, order = priority
    queries: list = field(default_factory=list)
    # tags: {tag: keyspace}
    tags: dict = field(default_factory=dict)
    # Column families to drop from analysis — "cf" or "ks.cf" entries
    # (reference TODO analyze_slow_queries.py:61: high-volume CFs create
    # noise when everything is slow). Applied after parse/enrich, before
    # the reports, so the scan-side plan is unchanged.
    ignored_column_families: tuple = ()
    # IANA zone for REPORT time buckets only (reference TODO :58);
    # None keeps UTC. ts stays a UTC instant either way.
    report_timezone: str | None = None

    def __post_init__(self) -> None:
        if self.order_by not in VALID_ORDER_BY:
            raise ValueError(f"order_by must be one of {VALID_ORDER_BY}, got {self.order_by!r}")
