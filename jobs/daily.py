"""Daily crawl operations — ONE spark-submit surface for the steady
state the rest of the repo builds toward. Each run processes a landing
directory of page parquet files and leaves every store consistent:

  1. INGEST   landing files -> pages warehouse, exactly-once, as
              recrawl UPSERTS (a url recrawled today shadows yesterday;
              snapshots keep history)           streaming/ingest.py
  2. SYNC     pages CDC window -> derived EXTRACTED warehouse table
              (extraction runs over the delta only)        jobs/sync.py
  3. ADMIT    the day's newly-extracted documents dedup against the
              materialized signature store (corpus bodies never
              re-read; batch side broadcast); survivors land in
              <out>/admitted/ and their signatures join the store
                                         functions/dedup_store.py

Per-day cost is O(day's crawl + collisions): nothing in this loop
re-reads the pages table, the extracted table, or corpus bodies at
table scale. Takedown note: signatures of removed documents stay in
the store by design — a future re-submission of taken-down content is
still rejected, which is the conservative behavior a takedown wants.

Usage:
    spark-submit --py-files dist/paddleocr_spark.zip jobs/daily.py \
        --landing <dir> --pages <tbl> --extracted <tbl> \
        --store <dir> --output <dir> --checkpoint <dir>
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def run_daily(
    spark,
    landing_dir: str,
    pages_dir: str,
    extracted_dir: str,
    store_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    mode: str = "fused",
) -> dict:
    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sync import sync_extracted
    from paddleocr_spark.functions import dedup_store as S
    from paddleocr_spark.sources import warehouse as W
    from paddleocr_spark.streaming.ingest import ingest_recrawl_stream

    stats: dict = {}

    # 1) ingest (exactly-once; a rerun of the same landing dir is a no-op)
    ingest_recrawl_stream(
        spark, landing_dir, pages_dir, os.path.join(checkpoint_dir, "ingest")
    )
    stats["pages_snapshot"] = W.current_snapshot_id(pages_dir)

    # 2) sync the extracted table over the pages CDC window; remember
    #    the derived table's snapshot BEFORE, so the day's new docs can
    #    be read back as ITS change window (no re-extraction, no rescan)
    ext_before = (
        W.current_snapshot_id(extracted_dir)
        if os.path.isdir(os.path.join(extracted_dir, "_snapshots"))
        else None
    )
    sync = sync_extracted(spark, pages_dir, extracted_dir, mode=mode)
    stats["extracted"] = {k: sync[k] for k in ("inserted", "deleted") if k in sync}
    if not sync["synced"] or sync["inserted"] == 0:
        stats["admitted"] = 0
        return stats

    if ext_before is None:
        day_docs = W.read_table(spark, extracted_dir)
    else:
        day_docs = W.read_changes(spark, extracted_dir, ext_before).filter(
            F.col("_change_type") == "insert"
        )
    day_docs = day_docs.select(
        F.xxhash64("url").alias("doc_id"),
        F.col("url"),
        F.col("extracted_text").alias("text"),
    ).filter(F.length("text") > 0)

    # 3) admit against the signature store
    if not S.store_exists(store_dir):
        # day 0: self-dedup via the in-batch path of the store probe is
        # not defined without a store — seed with an empty store dir by
        # admitting the batch through the same code path after writing
        # a zero-row store (keeps one code path, same semantics)
        empty = day_docs.filter(F.lit(False))
        S.append_to_store(empty, store_dir)
    admitted = S.incremental_dedup_against_store(spark, store_dir, day_docs)
    out_path = os.path.join(
        output_dir, "admitted", f"snap_{stats['pages_snapshot']}"
    )
    admitted.write.mode("overwrite").parquet(out_path)
    admitted = spark.read.parquet(out_path)
    stats["admitted"] = S.append_to_store(admitted, store_dir)
    stats["admitted_path"] = out_path
    return stats


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--landing", required=True)
    ap.add_argument("--pages", required=True)
    ap.add_argument("--extracted", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mode", default="fused", choices=["fused", "array", "relational"])
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("paddleocr-spark-daily").getOrCreate()
    t0 = time.time()
    stats = run_daily(
        spark,
        args.landing,
        args.pages,
        args.extracted,
        args.store,
        args.output,
        args.checkpoint,
        mode=args.mode,
    )
    stats["wall_sec"] = round(time.time() - t0, 3)
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
