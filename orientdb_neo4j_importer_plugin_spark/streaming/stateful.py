"""Custom stateful streaming operator: per-conversation running progress.

Demonstrates the engine's custom-stateful-operator path
(``applyInPandasWithState``): the running counters the reference keeps in
its volatile statistics object (``ONeo4jImporterStatistics.java:30-63``),
kept here as *keyed streaming state* — one state row per conversation with
event count, live-turn estimate, and lsn high-watermark, emitted on every
update.

State is Arrow-batched per key group (no per-row Python); eviction uses a
processing-time timeout so idle conversations age out of the store —
bounded state at 10^8 conversations.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROGRESS_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("n_deletes", LongType()),
        StructField("max_lsn", LongType()),
        StructField("max_turn", IntegerType()),
    ]
)

PROGRESS_OUT = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_events", LongType()),
        StructField("n_deletes", LongType()),
        StructField("max_lsn", LongType()),
        StructField("max_turn", IntegerType()),
    ]
)


def _make_update(evict_idle_ms: int | None):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n_events, n_deletes, max_lsn, max_turn = (
            state.get if state.exists else (0, 0, -1, -1)
        )
        for pdf in pdfs:
            n_events += len(pdf)
            n_deletes += int((pdf["op"] == "D").sum())
            max_lsn = max(max_lsn, int(pdf["lsn"].max()))
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
        state.update((n_events, n_deletes, max_lsn, max_turn))
        if evict_idle_ms:
            state.setTimeoutDuration(evict_idle_ms)
        yield pd.DataFrame(
            [
                {
                    "conv_id": key[0],
                    "n_events": n_events,
                    "n_deletes": n_deletes,
                    "max_lsn": max_lsn,
                    "max_turn": max_turn,
                }
            ]
        )

    return _update


def conversation_progress(
    events: DataFrame, evict_idle_ms: int | None = None
) -> DataFrame:
    """Streaming: running per-conversation counters, one update per batch.

    evict_idle_ms bounds state on INFINITE streams (idle conversations age
    out via ProcessingTimeTimeout). Leave None for bounded/availableNow
    runs: registered timers keep an availableNow query alive indefinitely
    (it triggers empty batches forever to service them).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle_ms
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("conv_id").applyInPandasWithState(
        _make_update(evict_idle_ms),
        outputStructType=PROGRESS_OUT,
        stateStructType=PROGRESS_STATE,
        outputMode="update",
        timeoutConf=timeout,
    )


def conversation_progress_batch(events: DataFrame) -> DataFrame:
    """Batch twin (for verification): same result as the final streaming
    state for a bounded feed."""
    from pyspark.sql import functions as F

    return events.groupBy("conv_id").agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
        F.max("lsn").alias("max_lsn"),
        F.max("turn_idx").alias("max_turn"),
    )


def run_progress_stream(
    spark: Any,
    feed_dir: str,
    checkpoint_dir: str,
    event_schema: StructType,
    out_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drive the stateful operator over a feed dir to completion, writing
    per-batch updates as parquet (latest row per conv = final state)."""
    reader = spark.readStream.schema(event_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(feed_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    q = (
        conversation_progress(src)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.isActive:
        q.stop()
