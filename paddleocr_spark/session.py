"""SparkSession factory with the engine's scale-oriented defaults.

Defaults chosen for the 100 TB framing (AQE on, skew-join on, Arrow
batches sized for multi-KB page rows); tests override master/partitions.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "paddleocr-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    arrow_batch: int = 512,
) -> SparkSession:
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    b = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime row-level bloom filters: a selective join side (resume
        # anti-join vs completed partitions, dedup losers, benchmark
        # grams) prunes the big side's scan before the shuffle — the
        # 10^12-row win for every "big table joins filtered table" plan
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        # 32 in-process executor threads + localCheckpoint blocks from
        # the iterative ops need heap headroom, or long sessions decay
        # into full-GC storms (observed: trivial queries 5-10x slow for
        # ~1 min late in a 70-query run on an 8g heap)
        .config("spark.driver.memory", "16g")
        # ContextCleaner's periodic System.gc() defaults to 30 MINUTES;
        # checkpoint/shuffle blocks from dropped DataFrames pile up for
        # that long unless the JVM happens to GC. 60s keeps block
        # cleanup prompt in long multi-query sessions
        .config("spark.cleaner.periodicGC.interval", "60s")
    )
    return b.getOrCreate()
