"""Custom stateful streaming operator: per-user sessionization via
applyInPandasWithState.

The batch twin is queries.q_events_sessionize (lag + running sum over a
per-user window); here the gap logic runs incrementally with one state
row per user — (n_sessions, n_events, last_seen_us) — so an unbounded
stream needs O(users) state, not O(events). Batch/stream parity is
asserted in tests/test_streaming.py.

Scale notes: state is keyed by user_id (shuffle on the group key, same
as the batch window); a production run adds a state TTL
(GroupStateTimeout) to expire idle users past the watermark.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from paddleocr_spark.streaming.events import read_event_stream

SESSION_GAP_US = 1_800_000_000  # 30 min, mirrors queries.SESSION_GAP_US

OUTPUT_SCHEMA = "user_id bigint, n_sessions bigint, n_events bigint"
STATE_SCHEMA = "n_sessions bigint, n_events bigint, last_us bigint"


def _update_user(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n_sessions, n_events, last_us = state.get
    else:
        n_sessions, n_events, last_us = 0, 0, None

    batches = [pdf[["us", "event_id"]] for pdf in pdfs]
    if batches:
        ev = pd.concat(batches).sort_values(["us", "event_id"])
        us = ev["us"].to_numpy()
        prev = us[:-1]
        # gaps within this batch, plus the boundary gap vs carried state
        new_in_batch = int((us[1:] - prev > SESSION_GAP_US).sum())
        first_new = 1 if last_us is None or us[0] - last_us > SESSION_GAP_US else 0
        n_sessions += first_new + new_in_batch
        n_events += len(us)
        last_us = int(us[-1])

    state.update((n_sessions, n_events, last_us))
    yield pd.DataFrame(
        [[user_id, n_sessions, n_events]],
        columns=["user_id", "n_sessions", "n_events"],
    )


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "sessions_stream",
) -> DataFrame:
    """availableNow run of the stateful sessionizer into a memory sink;
    returns the (update-mode) result table — take the last row per user
    for the final counts."""
    stream = read_event_stream(spark, input_dir).withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def session_window_stream(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
):
    """Native session windows (`F.session_window`) under readStream —
    the built-in alternative to the applyInPandasWithState sessionizer
    above: state is managed by the engine, sessions merge as events
    arrive, and a session emits exactly once when the watermark passes
    its close (append mode). maxFilesPerTrigger=1 advances the
    watermark between micro-batches so closed sessions flush during an
    availableNow drain. Emitted rows are FINAL (value-identical to the
    batch session_window aggregate — asserted in tests)."""
    from paddleocr_spark.streaming.events import await_drain, read_event_stream

    stream = read_event_stream(
        spark, input_dir, watermark=watermark, max_files_per_trigger=1
    )
    agg = (
        stream.groupBy(
            F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, 180)


def session_window_batch(df, gap: str = "30 minutes"):
    """The batch twin of session_window_stream's aggregation."""
    return (
        df.groupBy(F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
