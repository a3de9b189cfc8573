"""Relational + extension operators (SURVEY.md §2.3-§2.9, Tier 3)."""
