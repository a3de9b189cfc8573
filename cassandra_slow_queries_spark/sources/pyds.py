"""Custom Python DataSource (Spark 4 DataSource API) — §2.1 source
extensibility demonstrated end to end.

The reference ecosystem's extraction step is a bespoke client pulling
pages from a service (download_slow_queries.py's `_msearch` loop —
mirrored by sources/es_extract.py's planned-page fetch runner). Spark 4
lets that kind of source plug DIRECTLY into the scan planner as a
first-class format: a pure-Python `DataSource` declares its schema and
its INPUT PARTITIONS, and each partition's `read()` runs on an
executor — so a paginated/external feed becomes a parallel scan with
normal downstream pushdown, instead of a driver-side collect-then-
parallelize.

`SlowQueryGenSource` is the deterministic stand-in: a seeded generator
shaped like the parsed slow-query fact stream (statement type,
keyspace.cf, duration). Every value is pure integer arithmetic on the
global row id, which is what makes a cross-engine oracle possible —
DuckDB replays the identical generation from `range()`. The partition
split (`partitions` option) proves the planner fans read() out: row
content depends only on the global id, NOT on how many partitions
served it (pinned by test + the catalog entry running with 8).

Usage::

    spark.dataSource.register(SlowQueryGenSource)
    df = (spark.read.format("slowquerygen")
          .option("partitions", 8).option("rowsperpartition", 1000)
          .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

#: statement-type cycle (matches the dispatch operator's D1-D5 family)
STATEMENT_TYPES = ("SELECT", "INSERT", "UPDATE", "DELETE", "BATCH")
#: keyspace.cf cycle
TABLES = ("ks1.events", "ks1.users", "ks2.metrics")


def gen_row(gid: int) -> tuple[str, str, int, int]:
    """The generation rule for global row id ``gid`` — pure integer
    arithmetic, replayable in any SQL engine:

    - statement: ``STATEMENT_TYPES[gid % 5]``
    - table: ``TABLES[gid % 3]``
    - duration: ``500 + (gid * 37) % 1000``  (ms, over the slow cutoff)
    - bound count: ``gid % 7``
    """
    return (
        STATEMENT_TYPES[gid % 5],
        TABLES[gid % 3],
        500 + (gid * 37) % 1000,
        gid % 7,
    )


class _Reader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_partitions = int(options.get("partitions", 4))
        self.rows_per = int(options.get("rowsperpartition", 100))

    def partitions(self):  # planner-visible split
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition):  # runs on an executor, one call per split
        base = partition.value * self.rows_per
        for seq in range(self.rows_per):
            gid = base + seq
            stmt, table, duration, n_bound = gen_row(gid)
            yield (gid, stmt, table, duration, n_bound)


class SlowQueryGenSource(DataSource):
    """``spark.read.format("slowquerygen")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "slowquerygen"

    def schema(self) -> str:
        return (
            "gid bigint, statement string, table_ref string, "
            "duration bigint, n_bound bigint"
        )

    def reader(self, schema) -> DataSourceReader:
        return _Reader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering replaces)."""
    spark.dataSource.register(SlowQueryGenSource)


try:  # SimpleDataSourceStreamReader: Spark 4 streaming half of the API
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class _StreamReader(SimpleDataSourceStreamReader):
        """Offset-managed pure-Python STREAM source: offsets are plain
        dicts ({"gid": next-row-to-serve}), Spark checkpoints them, and
        replay between two checkpointed offsets (readBetweenOffsets) is
        exact because generation is a pure function of gid — the
        at-least-once → exactly-once story any custom stream source
        must tell. ``maxrows`` bounds the stream so AvailableNow /
        processAllAvailable terminate in tests and the catalog entry;
        a production feed would return whatever new data exists."""

        def __init__(self, options: dict):
            self.rows_per_batch = int(options.get("rowsperbatch", 100))
            self.max_rows = int(options.get("maxrows", 1000))

        def initialOffset(self):
            return {"gid": 0}

        def read(self, start):
            s = int(start["gid"])
            e = min(s + self.rows_per_batch, self.max_rows)
            rows = [(gid, *gen_row(gid)) for gid in range(s, e)]
            return (iter(rows), {"gid": e})

        def readBetweenOffsets(self, start, end):
            return iter(
                (gid, *gen_row(gid))
                for gid in range(int(start["gid"]), int(end["gid"]))
            )

    _HAVE_STREAM = True
except ImportError:  # pragma: no cover - older pyspark
    _HAVE_STREAM = False


if _HAVE_STREAM:

    def _stream_reader(self, schema):
        return _StreamReader(self.options)

    SlowQueryGenSource.simpleStreamReader = _stream_reader
