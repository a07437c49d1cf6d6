"""Incremental materialized-view sync (jobs/sync.py): a derived
extracted warehouse table follows the pages table through appends,
recrawl upserts, and takedowns by consuming CDC windows — and at every
step equals what a from-scratch extraction of the live pages would
produce, while having extracted only the deltas."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

from paddleocr_spark.sources import warehouse as W  # noqa: E402


def _load_pages(spark, smoke_dir):
    return spark.read.parquet(os.path.join(smoke_dir, "pages.parquet"))


def _texts(df):
    return {
        (r["url"], r["extracted_text"])
        for r in df.select("url", "extracted_text").collect()
    }


def test_sync_follows_append_upsert_takedown(spark, smoke_dir, tmp_path):
    from sync import last_synced_snapshot, sync_extracted

    from paddleocr_spark.operators.extract import extract_fused

    pages_tbl = str(tmp_path / "pages_tbl")
    ext_tbl = str(tmp_path / "ext_tbl")
    pages = _load_pages(spark, smoke_dir)
    base = pages.limit(50).cache()
    W.append(base, pages_tbl)

    # first sync: full extraction, byte-identical to direct extraction
    s1 = sync_extracted(spark, pages_tbl, ext_tbl)
    assert s1["synced"] and s1["inserted"] == 50 and s1["deleted"] == 0
    assert _texts(W.read_table(spark, ext_tbl)) == _texts(extract_fused(base))

    # nothing changed: no-op, no new snapshot on the derived table
    n_snaps = len(W.snapshots(ext_tbl))
    s2 = sync_extracted(spark, pages_tbl, ext_tbl)
    assert not s2["synced"]
    assert len(W.snapshots(ext_tbl)) == n_snaps

    # window: 10 new pages, 3 recrawled (content change), 2 taken down
    base_urls = sorted(r["url"] for r in base.select("url").collect())
    new = pages.filter(~F.col("url").isin(base_urls)).limit(10).cache()
    W.append(new, pages_tbl)
    recrawl = (
        base.filter(F.col("url").isin(base_urls[:3]))
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("interval 1 day"))
        .withColumn("html", F.to_binary(F.lit(
            "<html><body><p>recrawled body text long enough to keep as a "
            "block of content here.</p></body></html>"), F.lit("utf-8")))
    )
    W.upsert(recrawl, pages_tbl)
    W.delete_where(spark, pages_tbl, base_urls[3:5])

    s3 = sync_extracted(spark, pages_tbl, ext_tbl)
    # inserted = 10 new + 3 recrawled; deleted = 2 takedowns (the 3
    # upsert-retractions are folded into the replace, not re-deleted)
    assert s3["synced"] and s3["inserted"] == 13 and s3["deleted"] == 2

    live = W.read_table(spark, pages_tbl)
    assert _texts(W.read_table(spark, ext_tbl)) == _texts(extract_fused(live))
    # the recrawled urls show the NEW content
    got = dict(_texts(W.read_table(spark, ext_tbl)))
    assert "recrawled body text" in got[base_urls[0]]
    assert base_urls[3] not in got and base_urls[4] not in got

    assert last_synced_snapshot(ext_tbl) == W.current_snapshot_id(pages_tbl)
    base.unpersist(); new.unpersist()


def test_sync_interrupted_window_is_idempotent(spark, smoke_dir, tmp_path):
    """A sync that committed its upsert but crashed before recording the
    log replays the same window on restart and converges to the same
    table (replace-by-key + delete-by-key are idempotent)."""
    from sync import _sync_log_path, sync_extracted

    pages_tbl = str(tmp_path / "p2_tbl")
    ext_tbl = str(tmp_path / "e2_tbl")
    pages = _load_pages(spark, smoke_dir)
    base = pages.limit(30).cache()
    W.append(base, pages_tbl)
    sync_extracted(spark, pages_tbl, ext_tbl)

    base_urls = [r["url"] for r in base.select("url").collect()]
    W.append(pages.filter(~F.col("url").isin(base_urls)).limit(5), pages_tbl)
    s = sync_extracted(spark, pages_tbl, ext_tbl)
    assert s["inserted"] == 5

    # simulate the crash: drop the last log line, re-sync the window
    p = _sync_log_path(ext_tbl)
    lines = open(p).read().splitlines()
    with open(p, "w") as fh:
        fh.write("\n".join(lines[:-1]) + "\n")
    s2 = sync_extracted(spark, pages_tbl, ext_tbl)
    assert s2["synced"] and s2["inserted"] == 5

    assert W.read_table(spark, ext_tbl).count() == 35
    assert W.read_table(spark, ext_tbl).select("url").distinct().count() == 35
    base.unpersist()
