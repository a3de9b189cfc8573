"""Mechanical rotation of the driver's correctness check window.

The external driver gate hash-checks only the FIRST ``CHECK_WINDOW``
entries of the catalog (in dict order) against DuckDB each round, while
the catalog has grown past that. Through round 5 the ordering was
curated by hand — an honest but trust-me step, flagged by both the
round-5 verdict (next-round item 1) and ADVICE (catalog.py:2924).

This module removes the hand in the loop: the catalog reorders itself
at import time, STALEST FIRST, from the repo's recorded
``CORRECTNESS_r*.json`` files. An entry's staleness is the last round
in which the driver recorded it fully green (rows+schema+hash, no
error); entries never seen by the driver (new this round, or renamed)
rank stalest of all and land at the front of the window. Sorting
stalest-first makes the rotation invariant self-fulfilling: the tail
beyond the window is always exactly the freshest-checked entries, so no
entry can go more than ceil(catalog_size / CHECK_WINDOW) rounds without
a driver row (K rounds at N ≤ K·CHECK_WINDOW entries; the test caps
K at 3 — past that, consolidate entries instead of growing).
``tests/test_rotation.py`` asserts the invariant against the committed
correctness files, so a regression in this logic (or a by-hand reorder
sneaking back in) fails the suite.

Every entry, window or tail, is additionally oracle-checked locally on
every pytest run by ``tests/test_entry_oracle.py`` — the rotation
governs only which slice the *external* gate re-verifies each round.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

# How many leading catalog entries the external driver gate checks.
CHECK_WINDOW = 50

_CORRECTNESS_GLOB = "CORRECTNESS_r*.json"
_ROUND_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def repo_root() -> Path:
    """The repo checkout root (where the driver writes CORRECTNESS
    files), located relative to this file — cwd-independent."""
    return Path(__file__).resolve().parents[2]


def last_green_rounds(root: Path | None = None) -> dict[str, int]:
    """Map entry name → latest round number whose driver CORRECTNESS
    file recorded it fully green (rows+schema+hash matched, no error).

    Unreadable or malformed files are skipped rather than fatal: the
    rotation must never break catalog import (a fresh checkout has no
    CORRECTNESS files at all — then every entry ranks equally stale and
    definition order prevails through the stable sort).
    """
    root = root or repo_root()
    greens: dict[str, int] = {}
    for path in sorted(root.glob(_CORRECTNESS_GLOB)):
        m = _ROUND_RE.search(path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            recorded = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(recorded, dict):
            continue
        for name, row in recorded.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
                and row.get("err") in (None, "")
            )
            if green:
                greens[name] = max(greens.get(name, 0), rnd)
    return greens


def latest_round(root: Path | None = None) -> int:
    """Highest round number among the recorded CORRECTNESS files
    (0 when none exist)."""
    root = root or repo_root()
    rounds = [
        int(m.group(1))
        for p in root.glob(_CORRECTNESS_GLOB)
        if (m := _ROUND_RE.search(p.name))
    ]
    return max(rounds, default=0)


def rotated_order(names: list[str], greens: dict[str, int] | None = None) -> list[str]:
    """Catalog key order, stalest-first: primary key = last driver-green
    round (0 = never checked → front), tiebreak = original definition
    position (stable, deterministic, keeps the hand-tuned flagship-first
    ordering within each staleness class)."""
    if greens is None:
        greens = last_green_rounds()
    pos = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (greens.get(n, 0), pos[n]))
