"""Sources and sinks (SURVEY.md §2.1)."""

from cassandra_slow_queries_spark.sources.cql_schema import (
    parse_cql_schema,
    schema_dimension,
)
from cassandra_slow_queries_spark.sources.kibana import read_kibana_json

__all__ = ["parse_cql_schema", "schema_dimension", "read_kibana_json"]
