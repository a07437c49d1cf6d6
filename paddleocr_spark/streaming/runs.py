"""Stateful streaming run-collapse: the CTC-greedy-decode analog
(rec_postprocess.py:148-152 adjacent-repeat collapse) as an incremental
operator — per user, count maximal runs of the same event_type and the
longest run, across batch boundaries.

Batch twin: queries.q_events_run_collapse (lag + running-sum window);
parity is asserted in tests/test_streaming.py. State per user is a few
scalars — so an unbounded stream needs O(users) state. The in-batch
run segmentation is vectorized numpy (change-point indices -> run
lengths), not a per-row Python loop; only the batch-boundary merge
consults state.

ORDER CONTRACT: a run decomposition is a property of the event
SEQUENCE, so an event arriving in a later micro-batch but ordered
BEFORE already-folded events cannot be folded exactly without
per-event state (it may split or merge runs that are already counted).
This operator therefore processes the in-(us, event_id)-order stream
and DROPS-AND-COUNTS out-of-order arrivals (``n_late`` in the output)
instead of silently mis-folding them — parity with the batch twin
holds whenever the stream delivers in order (the file source + one
batch per file shape used here), and any deviation is observable, not
silent. Contrast sessions.py, whose interval-merge state IS exact
under any arrival order.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from paddleocr_spark.streaming.events import read_event_stream

OUTPUT_SCHEMA = (
    "user_id bigint, n_runs bigint, longest_run bigint, n_late bigint"
)
STATE_SCHEMA = (
    "n_runs bigint, longest_done bigint, last_type string, run_len bigint, "
    "last_us bigint, last_id bigint, n_late bigint"
)


def _update_runs(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n_runs, longest_done, last_type, run_len, last_us, last_id, n_late = (
            state.get
        )
    else:
        n_runs, longest_done, last_type, run_len = 0, 0, None, 0
        last_us, last_id, n_late = None, None, 0

    batches = [pdf[["us", "event_id", "event_type"]] for pdf in pdfs]
    if batches:
        ev = pd.concat(batches).sort_values(["us", "event_id"])
        if last_us is not None:
            # order contract (module docstring): an event ordered at or
            # before the already-folded frontier cannot be folded
            # exactly — drop and COUNT it instead of mis-folding
            keep = (ev["us"] > last_us) | (
                (ev["us"] == last_us) & (ev["event_id"] > last_id)
            )
            n_late += int((~keep).sum())
            ev = ev[keep]
    if batches and len(ev):
        types = ev["event_type"].to_numpy()
        n = len(types)
        # starts of maximal runs within the batch
        change = np.flatnonzero(types[1:] != types[:-1]) + 1
        starts = np.concatenate([[0], change]).astype(int)
        lens = np.diff(np.concatenate([starts, [n]])).astype(int)

        if last_type is not None and types[0] == last_type:
            # first in-batch run continues the carried run
            lens[0] += run_len
            new_runs = len(starts) - 1
        else:
            # the carried run (if any) is now complete — fold its length
            # into longest_done before the batch overwrites run_len
            longest_done = max(longest_done, run_len)
            new_runs = len(starts)
        n_runs += new_runs
        if len(lens) > 1:
            longest_done = max(longest_done, int(lens[:-1].max()))
        run_len = int(lens[-1])
        last_type = str(types[-1])
        last_us = int(ev["us"].iloc[-1])
        last_id = int(ev["event_id"].iloc[-1])

    state.update(
        (n_runs, longest_done, last_type, run_len, last_us, last_id, n_late)
    )
    yield pd.DataFrame(
        [[user_id, n_runs, max(longest_done, run_len), n_late]],
        columns=["user_id", "n_runs", "longest_run", "n_late"],
    )


def run_collapse_stream(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "runs_stream",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """`max_files_per_trigger=1` forces one micro-batch per input file —
    the multi-batch path where carried-run state actually merges (the
    single-file default exercises only the in-batch segmentation)."""
    stream = read_event_stream(
        spark, input_dir, max_files_per_trigger=max_files_per_trigger
    ).withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    out = stream.groupBy("user_id").applyInPandasWithState(
        _update_runs,
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
