"""Config-file dimensions: query patterns and tag → keyspace map.

Reference loads both as driver-side JSON (analyze_slow_queries.py:124-126,
:133-135); they stay driver-side here too (each is a handful of entries)
and are compiled straight into Catalyst expressions / broadcast literals
by operators/enrich.py.
"""

from __future__ import annotations

import json
from pathlib import Path


def load_query_patterns(path: str | Path) -> list[dict]:
    """``[{"start": str, "parameters": [str]}]`` — list order = priority
    (first prefix match wins, analyze_slow_queries.py:641-646)."""
    data = json.loads(Path(path).read_text())
    if not isinstance(data, list):
        raise ValueError("query patterns file must be a JSON array")
    for p in data:
        if "start" not in p or "parameters" not in p:
            raise ValueError(f"invalid query pattern entry: {p!r}")
    return data


def load_tag_map(path: str | Path) -> dict:
    """``{tag: keyspace}`` flat map (analyze_slow_queries.py:133-135)."""
    data = json.loads(Path(path).read_text())
    if not isinstance(data, dict):
        raise ValueError("tag map file must be a JSON object")
    return data
