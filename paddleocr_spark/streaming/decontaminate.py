"""Streaming eval-set decontamination: stream-static broadcast join.

The streaming twin of `queries_curation.q_decontaminate`: documents
arrive as a file stream, the benchmark gram-hash set is a STATIC
batch table broadcast into every micro-batch (eval suites are MBs —
the canonical stream-static join), and per-document shared-gram counts
accumulate across micro-batches as a `collect_set` aggregation in
complete output mode — ONE stateful operator, state bounded by
(contaminated docs × their distinct shared hashes), which is tiny by
construction: only grams that hit the benchmark set survive the join.

The reference has no streaming surface (SURVEY.md §2.10); this is the
honest extension for continuous-crawl admission — "flag contaminated
documents as they are ingested, before they reach the corpus".

At scale: the static side is re-broadcast per micro-batch (cheap for
an eval-suite-sized table); state partitions by doc_id across the
state store. A real deployment keys the sink by (doc_id, snapshot) and
expires finished documents with a watermark on crawl time — the
synthetic documents table has no timestamp, so the harness uses
availableNow + complete mode, the shape the parity test pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.queries_curation import gram_hashes
from paddleocr_spark.streaming.events import await_drain


def decontaminate_stream(corpus: DataFrame, bench_hashes: DataFrame) -> DataFrame:
    """Streaming corpus documents -> (doc_id, n_shared) accumulating
    complete-mode aggregate. `bench_hashes` must be a static (batch)
    single-column `h` DataFrame; `corpus` may be streaming or batch
    (the batch twin produces identical rows — the parity contract)."""
    grams = gram_hashes(corpus.filter(F.size(F.split("text", " ")) >= 5))
    return (
        grams.join(F.broadcast(bench_hashes), "h")
        .groupBy("doc_id")
        .agg(F.size(F.collect_set("h")).alias("n_shared"))
    )


def run_decontaminate_stream(
    spark: SparkSession,
    input_dir: str,
    bench_hashes: DataFrame,
    name: str,
    max_files_per_trigger: int | None = None,
    schema=None,
) -> DataFrame:
    """File-source stream -> stream-static broadcast join -> complete-
    mode memory sink; returns the accumulated flags after the stream
    drains. `max_files_per_trigger=1` forces multi-batch execution so
    tests exercise cross-batch state accumulation. ``schema`` makes a
    zero-data drain well-defined (a landing dir is empty between
    drops); without it an empty dir raises a clear error instead of an
    opaque schema-inference failure."""
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
    q = (
        decontaminate_stream(src, bench_hashes)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, 120)
    return spark.table(name)
