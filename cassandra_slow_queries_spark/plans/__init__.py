"""End-to-end logical plans (SURVEY.md §3)."""

from cassandra_slow_queries_spark.plans.pipeline import parse_messages, run_analysis

__all__ = ["parse_messages", "run_analysis"]
