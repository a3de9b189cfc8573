"""Structured Streaming variants of the per-minute reports (Tier 2)."""
