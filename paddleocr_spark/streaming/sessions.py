"""Custom stateful streaming operator: per-user sessionization via
applyInPandasWithState.

The batch twin is queries.q_events_sessionize (lag + running sum over a
per-user window); here the gap logic runs incrementally with one state
row per user holding the user's SESSION INTERVALS — so an unbounded
stream needs O(users x sessions) state, not O(events), and the result
is EXACT under any arrival order: a late-but-delivered event that
lands inside an existing session extends it, and one that bridges two
previously-separate sessions MERGES them (a counter-only state cannot
un-count a session, which is why last-seen-timestamp designs break
batch/stream parity on out-of-order input). Batch/stream parity —
including a cross-batch out-of-order batch — is asserted in
tests/test_streaming.py.

Scale notes: state is keyed by user_id (shuffle on the group key, same
as the batch window); a production run adds a state TTL
(GroupStateTimeout) to expire idle users past the watermark, which
also bounds the interval list by the retention horizon.
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
STATE_SCHEMA = "n_events bigint, starts array<bigint>, ends array<bigint>"


def _merge_intervals(
    intervals: list[tuple[int, int]], gap: int
) -> list[tuple[int, int]]:
    """Sorted sweep: two intervals belong to one session iff the gap
    between them is <= ``gap`` (the batch rule: a NEW session starts
    when the inter-event gap is strictly greater)."""
    out: list[list[int]] = []
    for s, e in sorted(intervals):
        if out and s - out[-1][1] <= gap:
            if e > out[-1][1]:
                out[-1][1] = e
        else:
            out.append([s, e])
    return [(s, e) for s, e in out]


def _update_user(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n_events, starts, ends = state.get
        intervals = list(zip(starts, ends))
    else:
        n_events, intervals = 0, []

    batches = [pdf[["us"]] for pdf in pdfs]
    if batches:
        us = pd.concat(batches)["us"].to_numpy()
        n_events += len(us)
        intervals = _merge_intervals(
            intervals + [(int(t), int(t)) for t in us], SESSION_GAP_US
        )

    state.update(
        (n_events, [s for s, _ in intervals], [e for _, e in intervals])
    )
    yield pd.DataFrame(
        [[user_id, len(intervals), n_events]],
        columns=["user_id", "n_sessions", "n_events"],
    )


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "sessions_stream",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """availableNow run of the stateful sessionizer into a memory sink;
    returns the (update-mode) result table — take the last row per user
    for the final counts. ``max_files_per_trigger=1`` forces one
    micro-batch per file — the multi-batch path where the interval
    state actually merges across batches."""
    stream = read_event_stream(
        spark, input_dir, max_files_per_trigger=max_files_per_trigger
    ).withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
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
    # the ONE aggregation, shared with the batch twin below — parity by
    # construction (the linkgraph.py convention): an edit to the
    # projection cannot desynchronize the frames the tests compare
    agg = session_window_batch(stream, gap)
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
