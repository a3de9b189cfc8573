"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 extension; the sanctioned escape hatch for semantics the
built-in windowed aggregations can't express).

Burst detection over the slow-query stream: for each query shape, track a
running event count and an exponentially-weighted moving average of
duration across micro-batches, and flag the key as "bursting" when the
count within the current state window exceeds a threshold. The running
EMA is the part a tumbling window genuinely cannot express — it carries
unbounded-horizon state across batches.

State layout per key: ``(count long, ema double)``; update is
commutative-enough for micro-batch replay (each batch folds its rows in
timestamp order). Timeout: ``GroupStateTimeout.NoTimeout`` here —
production deployments with unbounded key cardinality should use
processing-time timeouts to bound the state store (noted in the
function docstring; the session already sizes shuffle partitions for the
state store).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("query", StringType()),
        StructField("n_events", LongType()),
        StructField("ema_duration", DoubleType()),
        StructField("bursting", LongType()),  # 0/1 (bool as long for parity)
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("ema", DoubleType())]
)


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    alpha: float,
    burst_threshold: int,
):
    if state.exists:
        n, ema = state.get
    else:
        n, ema = 0, None
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for dur in pdf["duration"]:
            n += 1
            d = float(dur)
            ema = d if ema is None else alpha * d + (1.0 - alpha) * ema
    state.update((n, float(ema if ema is not None else 0.0)))
    yield pd.DataFrame(
        {
            "query": [key[0]],
            "n_events": [n],
            "ema_duration": [round(ema or 0.0, 6)],
            "bursting": [1 if n >= burst_threshold else 0],
        }
    )


def burst_state_stream(
    fact_stream: DataFrame,
    alpha: float = 0.2,
    burst_threshold: int = 100,
) -> DataFrame:
    """Streaming frame ``(ts, query, duration, ...)`` → per-key running
    state ``(query, n_events, ema_duration, bursting)`` updated each
    micro-batch.

    ``update`` output mode: every batch re-emits the keys it touched with
    their latest state. With unbounded key cardinality, switch to
    ``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.setTimeoutDuration``
    to evict idle keys and bound the state store.
    """

    def update_fn(key, pdfs, state):
        return _update(key, pdfs, state, alpha, burst_threshold)

    return (
        fact_stream.select("ts", "query", "duration")
        .groupBy("query")
        .applyInPandasWithState(
            update_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_burst_detection(
    fact_stream: DataFrame,
    alpha: float = 0.2,
    burst_threshold: int = 100,
) -> DataFrame:
    """Drive the stateful operator over a finite stream with AvailableNow
    and return the FINAL state per key as a batch frame (later batches
    overwrite earlier emissions of the same key)."""
    import tempfile
    import uuid

    out = burst_state_stream(fact_stream, alpha, burst_threshold)
    name = f"burst_{uuid.uuid4().hex}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="burst_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = fact_stream.sparkSession
    all_emissions = spark.table(name)
    # keep the last emission per key (final state)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("query").orderBy(F.col("n_events").desc())
    return (
        all_emissions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
