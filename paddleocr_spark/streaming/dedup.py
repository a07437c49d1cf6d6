"""Streaming exact dedup: first-seen-wins key dedup with a watermark.

The streaming twin of the batch `dedup_exact` hash-groupBy
(functions/dedup.py): under `readStream`,
`dropDuplicatesWithinWatermark` keeps per-key state and EVICTS each
key once the watermark passes it, so the job runs forever without
unbounded memory (plain `dropDuplicates(keys)` would keep every
distinct key's state forever when the event-time column is not part of
the subset) — the classic incremental ingest guard ("have I already
extracted this url?"). The reference has
no streaming surface (SURVEY.md §2.10); this is the honest extension
the same stage functions support.

At scale: state is per-key in the state store, partitioned by the
dedup key — set `spark.sql.shuffle.partitions` to the state-store
parallelism you want; late rows beyond the watermark are dropped, which
for ingest dedup means "a duplicate arriving later than the watermark
may be re-admitted" — pick the watermark to cover the crawler's revisit
horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.streaming.events import await_drain


def dedup_keys(df: DataFrame, keys: list[str], ts_col: str, delay: str) -> DataFrame:
    """Watermarked first-occurrence dedup on `keys` (works under both
    batch and streaming plans; batch ignores the watermark).

    Streaming uses ``dropDuplicatesWithinWatermark``: with plain
    ``dropDuplicates(keys)`` Spark only evicts per-key state when the
    event-time column is PART of the dedup subset — with it absent the
    state store grows one entry per distinct key forever, which is
    exactly the unbounded-memory failure this module's watermark claim
    promises to prevent. The within-watermark variant evicts each key
    after the watermark passes it, matching the documented semantics
    ("a duplicate arriving later than the watermark may be
    re-admitted")."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def run_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    name: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """File-source stream -> watermarked dedup -> memory sink; returns
    the deduped rows after the stream drains (test harness shape,
    mirroring streaming/events.py)."""
    keys = keys or ["user_id", "event_type"]
    schema = spark.read.parquet(input_dir).schema
    src = spark.readStream.schema(schema).parquet(input_dir)
    # parquet NTZ timestamps must become session-TZ timestamps before a
    # watermark can anchor to them (UTC session => same instant)
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    deduped = dedup_keys(src, keys, "ts", "1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, 120)
    return spark.table(name)
