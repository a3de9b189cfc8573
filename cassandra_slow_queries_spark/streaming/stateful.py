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
timestamp order via a closed-form EMA — no per-row Python). Timeout:
``NoTimeout`` by default; pass ``idle_timeout_ms`` for
``ProcessingTimeTimeout`` idle-key eviction so the state store is
bounded by live key cardinality on unbounded streams.
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
        # per-key emission counter: identifies the final row WITHIN one
        # state epoch. n_events cannot: a timeout eviction re-emits the
        # same n_events (nondeterministic tie on the bursting flag), and
        # a key re-arriving after eviction restarts at a SMALLER
        # n_events. emit_seq alone is not enough either — eviction
        # discards the counter, so a re-arrived key restarts at seq 1
        # and its true final row would lose a max-emit_seq pick whenever
        # pre-eviction emissions outnumber post-re-arrival ones. Hence
        # emit_ms below: the batch processing time, monotonic ACROSS
        # epochs, ordered first; emit_seq breaks same-ms ties within an
        # epoch. Residual ambiguity would need two distinct micro-batches
        # (the eviction batch and a later re-arrival batch) to share one
        # processing-time millisecond — micro-batch scheduling overhead
        # makes that unobservable in practice — or a wall-clock step
        # BACKWARDS between those batches (e.g. an NTP correction),
        # which no processing-time source can defend against. If Spark
        # ever exposes the micro-batch id to applyInPandasWithState,
        # prefer it over this clock (r11 ADVICE, accepted residual).
        StructField("emit_seq", LongType()),
        StructField("emit_ms", LongType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("ema", DoubleType()),
        StructField("seq", LongType()),
    ]
)


def _fold_ema(ema: float | None, durations, alpha: float) -> float | None:
    """Closed-form EMA fold over one ordered batch (no per-row Python).

    Sequential ``ema ← α·d + (1-α)·ema`` over m rows telescopes to::

        ema' = (1-α)^m · ema + α · Σᵢ (1-α)^(m-i) · dᵢ      (i = 1..m)

    so a whole Arrow batch costs one weight vector and one dot product.
    An absent prior EMA is seeded with the first duration (matching the
    reference-style first-observation rule), then the closed form folds
    the rest.
    """
    import numpy as np

    durs = np.asarray(durations, dtype=np.float64)
    if durs.size == 0:
        return ema
    if ema is None:
        ema = float(durs[0])
        durs = durs[1:]
    m = durs.size
    if m:
        weights = (1.0 - alpha) ** np.arange(m - 1, -1, -1)
        ema = (1.0 - alpha) ** m * float(ema) + alpha * float(weights @ durs)
    return float(ema)


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    alpha: float,
    burst_threshold: int,
    timeout_ms: int | None = None,
):
    if state.hasTimedOut:
        # idle-key eviction (ProcessingTimeTimeout): emit the final state
        # tagged non-bursting and free the store slot
        n, ema, seq = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "query": [key[0]],
                "n_events": [n],
                # 4 digits, matching the oracle: the closed-form SQL replay
                # sums the weighted terms in a different order, and two
                # float sums agree to ~1e-10 relative — 1e-4 absolute is
                # safely inside that for ms-scale durations
                "ema_duration": [round(ema, 4)],
                "bursting": [0],
                "emit_seq": [seq + 1],
                "emit_ms": [state.getCurrentProcessingTimeMs()],
            }
        )
        return
    if state.exists:
        n, ema, seq = state.get
    else:
        n, ema, seq = 0, None, 0
    for pdf in pdfs:
        # duration as a tie-break makes the fold deterministic when the
        # upstream feed is (ts, duration)-sorted: equal (ts, duration)
        # rows are interchangeable in the EMA, unequal ones get a fixed
        # order regardless of arrival interleaving
        pdf = pdf.sort_values(["ts", "duration"])
        n += len(pdf)
        ema = _fold_ema(ema, pdf["duration"].to_numpy(), alpha)
    seq += 1
    state.update((n, float(ema if ema is not None else 0.0), seq))
    if timeout_ms is not None:
        state.setTimeoutDuration(timeout_ms)
    yield pd.DataFrame(
        {
            "query": [key[0]],
            "n_events": [n],
            "ema_duration": [round(ema or 0.0, 4)],  # see timeout branch note
            "bursting": [1 if n >= burst_threshold else 0],
            "emit_seq": [seq],
            "emit_ms": [state.getCurrentProcessingTimeMs()],
        }
    )


def burst_state_stream(
    fact_stream: DataFrame,
    alpha: float = 0.2,
    burst_threshold: int = 100,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming frame ``(ts, query, duration, ...)`` → per-key running
    state ``(query, n_events, ema_duration, bursting)`` updated each
    micro-batch.

    ``update`` output mode: every batch re-emits the keys it touched with
    their latest state. ``idle_timeout_ms`` switches to
    ``ProcessingTimeTimeout``: keys idle past the timeout emit a final
    non-bursting row and are evicted — the state store stays bounded by
    *live* key cardinality on an unbounded stream instead of growing with
    every key ever seen.
    """

    def update_fn(key, pdfs, state):
        return _update(key, pdfs, state, alpha, burst_threshold, idle_timeout_ms)

    return (
        fact_stream.select("ts", "query", "duration")
        .groupBy("query")
        .applyInPandasWithState(
            update_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def run_burst_detection(
    fact_stream: DataFrame,
    alpha: float = 0.2,
    burst_threshold: int = 100,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Drive the stateful operator over a finite stream with AvailableNow
    and return the FINAL state per key as a batch frame (later batches
    overwrite earlier emissions of the same key)."""
    import uuid

    from cassandra_slow_queries_spark.session import scratch_dir

    from cassandra_slow_queries_spark.streaming.pipeline import (
        release_stream_sink,
        stream_state_partitions,
    )

    out = burst_state_stream(fact_stream, alpha, burst_threshold, idle_timeout_ms)
    name = f"burst_{uuid.uuid4().hex}"
    with stream_state_partitions(fact_stream.sparkSession):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", scratch_dir("burst_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    all_emissions = release_stream_sink(fact_stream.sparkSession, name)
    return final_emissions(all_emissions)


def final_emissions(all_emissions: DataFrame) -> DataFrame:
    """Reduce an update-mode emission log to the LAST row per key.

    Ordered by ``(emit_ms, emit_seq)`` descending: emit_ms (the batch
    processing time) is monotonic across state epochs, so a key that was
    evicted and re-arrived resolves to its post-re-arrival final row even
    when the pre-eviction epoch emitted more rows (larger emit_seq);
    emit_seq then breaks same-millisecond ties within an epoch — see the
    OUTPUT_SCHEMA note on why neither n_events nor emit_seq alone can
    identify the final row once timeouts evict and keys re-arrive.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("query").orderBy(
        F.col("emit_ms").desc(), F.col("emit_seq").desc()
    )
    return (
        all_emissions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "emit_seq", "emit_ms")
    )
