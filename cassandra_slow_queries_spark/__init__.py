"""cassandra_slow_queries_spark — a PySpark-native log-analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (onzra/cassandra_slow_queries): parse Cassandra
"Query too slow" log lines out of Kibana/Elasticsearch JSON extracts,
enrich them against a CQL schema dimension (keyspace / column family /
primary key), and produce five top-N aggregate reports — re-expressed as
idiomatic Spark DataFrame plans (native Catalyst expressions on the hot
path, broadcast dimension joins, persist-once fan-out, windowed top-K),
plus an extension tier of large-scale data-pipeline operators
(deduplication, similarity search, text analysis, multimodal columns).

Nothing here is a port: the reference is a single-process Python loop over
``list[dict]``; this package declares logical plans and lets Catalyst and
Tungsten choose the physical execution, so the same code runs on
``local[*]`` and on a 1000-executor cluster over 100 TB.
"""

from cassandra_slow_queries_spark.config import AnalysisConfig
from cassandra_slow_queries_spark.session import get_spark

__all__ = ["AnalysisConfig", "get_spark"]

__version__ = "0.1.0"
