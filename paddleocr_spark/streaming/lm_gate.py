"""Streaming LM quality gate: score documents against a FROZEN bigram
LM as they are ingested.

The streaming twin of `queries_curation.q_bigram_logprob`: the LM
tables (unigram counts, bigram counts, total) are trained ONCE on a
reference corpus and arrive as static batch frames; each micro-batch
of incoming documents runs the SAME scoring plan
(`score_against_bigram_lm` — stream-static joins + a per-doc mean) and
appends its scores to the sink. Because a document's bigrams are
derived from its own single input row, the per-doc aggregation never
spans micro-batches — so the job runs under ``foreachBatch`` with ZERO
cross-batch state (no watermark, no state store), the honest
unbounded-stream shape: per-day cost is O(day's documents), memory is
O(micro-batch).

This is the admission-time deployment of the CCNet-style perplexity
gate: the batch query computes corpus tertiles after the fact; the
stream scores each arriving document immediately (the head/middle/tail
cut is then a threshold lookup against the published tertile bounds —
thresholds are data, not state).

Reference analog: none — the reference has no streaming surface
(SURVEY.md §2.10); this extends the same LM-gate semantics the batch
driver query pins against DuckDB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from paddleocr_spark.queries_curation import score_against_bigram_lm
from paddleocr_spark.streaming.events import await_drain


def run_lm_gate_stream(
    spark: SparkSession,
    input_dir: str,
    uni: DataFrame,
    bi: DataFrame,
    total: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    schema=None,
) -> DataFrame:
    """File-source document stream -> per-micro-batch LM scoring ->
    batch-id-keyed parquet sink. The LM frames must be static (batch)
    DataFrames. foreachBatch replays are possible after a mid-batch
    crash, so each batch overwrites its own ``batch=<id>`` directory —
    idempotent under replay (exactly-once OUTPUT, at-least-once
    execution). Returns the accumulated scores after the stream drains.
    `max_files_per_trigger=1` forces multi-batch execution so tests
    exercise the batch-boundary independence claim.

    ``schema`` makes a zero-data drain well-defined: an admission
    landing dir is EMPTY between drops (its normal steady state), and
    schema inference over an empty dir cannot succeed — with ``schema``
    passed the drain no-ops and returns an empty scores frame; without
    it an empty dir raises a clear error instead of an opaque
    inference failure."""
    if schema is None:
        try:
            schema = spark.read.parquet(input_dir).schema
        except Exception as ex:
            raise ValueError(
                f"{input_dir} holds no readable parquet yet; pass schema= "
                "to run a zero-batch drain over an empty landing dir"
            ) from ex
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_dir)

    def commit(batch: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once on crash replay; overwriting the
        # batch's OWN partition directory makes the replay idempotent
        # (the standard batch-id-keyed sink recipe, streaming/ingest.py).
        score_against_bigram_lm(batch, uni, bi, total).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "scores", f"batch={batch_id}"))

    q = (
        src.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, 180)
    scores_dir = os.path.join(out_dir, "scores")
    if not os.path.isdir(scores_dir):
        # zero batches drained: no batch=<id> dir was ever written —
        # an empty scores frame, same schema as a scored batch
        empty = spark.createDataFrame([], schema)
        return score_against_bigram_lm(empty, uni, bi, total)
    return spark.read.parquet(scores_dir)
