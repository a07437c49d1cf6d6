"""Streaming crawl-frontier discovery: as crawled pages stream in,
maintain the known-page set and the frontier (urls referenced by some
crawled page but never themselves crawled) incrementally — the
continuously-updated discover loop whose one-shot form is the batch
`frontier_expand` query (queries_web.py).

Semantics (the invariant the tests pin): after draining any prefix of
the stream, `read_frontier` equals the BATCH computation over the same
pages — distinct outlink targets anti-joined against crawled page keys
— regardless of arrival order or batching. A url discovered in batch i
and crawled in batch j > i leaves the frontier at j (the fetch loop
consuming its own discoveries). `first_seen_batch` records when each
frontier url was first referenced.

Link semantics match streaming/linkgraph.py: absolute hrefs resolve to
their own (host, path); relative hrefs resolve to the PAGE's host.

Scale notes: per micro-batch cost is O(batch links + batch pages) —
the stores are consulted via anti-joins where the BATCH side is the
small probe (broadcast at micro-batch sizes); the frontier/known
stores are append-only parquet keyed by (host, path), compacted the
same way the signature stores are (functions/dedup_store.py). State
never lives in executor memory — a restart resumes from the stores +
checkpoint, the streaming/ingest.py discipline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.streaming.events import PAGES_SCHEMA

_KEY = ["host", "path"]


def page_keys(pages: DataFrame) -> DataFrame:
    """(host, path) of the crawled pages themselves."""
    return pages.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("")).alias(
            "path"
        ),
    ).distinct()


def outlink_keys(pages: DataFrame) -> DataFrame:
    """(host, path) of every outlink target; relative links resolve to
    the page's host. Stateless — shared by batch and stream."""
    html_s = F.decode(F.col("html"), "UTF-8")
    src_host = F.parse_url(F.col("url"), F.lit("HOST"))
    hrefs = F.regexp_extract_all(html_s, F.lit(r'href="([^"]+)"'), F.lit(1))
    links = pages.select(
        src_host.alias("src_host"), F.explode(hrefs).alias("href")
    )
    host = F.coalesce(
        F.parse_url(F.col("href"), F.lit("HOST")), F.col("src_host")
    )
    path = F.coalesce(
        F.parse_url(F.col("href"), F.lit("PATH")),
        F.regexp_replace(F.col("href"), r"[?#].*$", ""),
        F.lit(""),
    )
    return links.select(host.alias("host"), path.alias("path")).distinct()


def batch_frontier(pages: DataFrame) -> DataFrame:
    """The one-shot truth: all outlink targets minus all crawled keys —
    what the incremental stream must converge to on the same input."""
    return outlink_keys(pages).join(page_keys(pages), _KEY, "left_anti")


def run_frontier_stream(
    spark: SparkSession,
    pages_dir: str,
    store_dir: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """availableNow drain: per micro-batch, append the batch's crawled
    keys to <store>/known and its never-seen link targets to
    <store>/frontier (tagged with the discovering batch id). Appends
    are anti-joined against the stores first, so replaying a batch
    (checkpoint recovery) appends nothing new."""
    known_dir = os.path.join(store_dir, "known")
    frontier_dir = os.path.join(store_dir, "frontier")
    os.makedirs(store_dir, exist_ok=True)

    def _read(path: str, cols) -> DataFrame | None:
        try:
            return spark.read.parquet(path)
        except Exception:
            return None

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        crawled = page_keys(batch_df).persist()
        links = outlink_keys(batch_df)
        known = _read(known_dir, _KEY)
        # new crawled keys -> known store (idempotent on replay)
        new_known = crawled if known is None else crawled.join(
            known, _KEY, "left_anti"
        )
        new_known.write.mode("append").parquet(known_dir)
        # never-seen link targets -> frontier store
        frontier = _read(frontier_dir, _KEY)
        fresh = links
        if known is not None:
            fresh = fresh.join(known, _KEY, "left_anti")
        fresh = fresh.join(crawled, _KEY, "left_anti")
        if frontier is not None:
            fresh = fresh.join(
                frontier.select(*_KEY), _KEY, "left_anti"
            )
        fresh.select(
            *_KEY, F.lit(batch_id).cast("bigint").alias("first_seen_batch")
        ).write.mode("append").parquet(frontier_dir)
        crawled.unpersist()

    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    writer = (
        reader.parquet(pages_dir)
        .writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()


def read_frontier(spark: SparkSession, store_dir: str) -> DataFrame:
    """Current frontier = discovered minus since-crawled (the fetch
    loop consuming its own discoveries); first_seen_batch preserved."""
    frontier = spark.read.parquet(os.path.join(store_dir, "frontier"))
    try:
        known = spark.read.parquet(os.path.join(store_dir, "known"))
    except Exception:
        return frontier
    return frontier.join(known, _KEY, "left_anti")
