"""Persistent line-frequency store: the line-level boilerplate rewrite
(`queries_curation.line_dedup_rewrite_over`) at crawl steady state.

A growing crawl discovers boilerplate cumulatively: a footer seen once
today is unremarkable, but once its corpus-wide count crosses the
threshold every future emission of it must be dropped. Recomputing
line frequencies from all text every day is O(corpus); this store
persists the counts once:

    counts/v<NNNN>/    parquet rows (h: xxhash64(segment), cnt)
    _meta.json         {"version", "seg", "min_count", "applied": [...],
                        "n_distinct"}

- ``update_line_store`` merges a day's batch into the counts: ONE
  shuffle of the batch's 8-byte segment hashes, then a union +
  sum-groupBy against the current counts table. The merge reads
  O(distinct segments) — the counts table, never corpus text; on a
  real cluster the counts table is bucketed by ``h`` so the merge
  shuffles only the batch side.
- ``rewrite_against_store`` rewrites a batch using cumulative counts:
  the store is scanned ONCE, semi-joined against the BROADCAST batch
  hash set (the day's collision set is the only store output — the
  batch side is always the build side, mirroring dedup_store's probe
  discipline), then the rebuild is the same order-preserving
  array_sort(collect_list(struct)) as the one-shot query.
- Crash safety: a new counts version is fully written before
  ``_meta.json`` flips to it (write-temp + os.replace); a crash
  mid-update leaves the old version live and the batch unapplied.
- Idempotence: applied batch ids are recorded in the meta; re-applying
  one is a no-op (update returns the current state unchanged).

Parity contract (tested): seed(A) then update(B) then
rewrite_against_store(B) equals the from-scratch
``line_dedup_rewrite_over(A union B)`` restricted to B's documents.

Reference analog: none — the reference dedups nothing; this is the
steady-state LLM-data-pipeline layer (SURVEY.md §6), third member of
the admission-store family (dedup_store, semdedup_store).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META = "_meta.json"


def _meta_path(store_dir: str) -> str:
    return os.path.join(store_dir, _META)


def _counts_dir(store_dir: str, version: int) -> str:
    return os.path.join(store_dir, "counts", f"v{version:04d}")


def line_store_exists(store_dir: str) -> bool:
    return os.path.isfile(_meta_path(store_dir))


def _read_meta(store_dir: str) -> dict:
    with open(_meta_path(store_dir)) as fh:
        return json.load(fh)


def _flip_meta(store_dir: str, meta: dict) -> None:
    tmp = _meta_path(store_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, _meta_path(store_dir))


def seg_lines(d: DataFrame, seg: int = 8) -> DataFrame:
    """(doc_id, idx, line, h): fixed seg-word segments with position and
    their 8-byte hash — the store key. Same split expression as the
    one-shot query; a real deployment swaps in a newline split."""
    return (
        d.select("doc_id", F.split("text", " ").alias("__w"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, cast(ceil(size(__w) / {seg}.0) as int) - 1),"
                    f" i -> array_join(slice(__w, i * {seg} + 1, {seg}), ' '))"
                )
            ).alias("idx", "line"),
        )
        .withColumn("h", F.xxhash64("line"))
    )


def _batch_counts(docs: DataFrame, seg: int) -> DataFrame:
    return seg_lines(docs, seg).groupBy("h").agg(F.count("*").alias("cnt"))


def read_line_counts(spark: SparkSession, store_dir: str) -> DataFrame:
    meta = _read_meta(store_dir)
    return spark.read.parquet(_counts_dir(store_dir, meta["version"]))


def seed_line_store(
    docs: DataFrame,
    store_dir: str,
    batch_id: str,
    seg: int = 8,
    min_count: int = 3,
) -> dict:
    """Day 0: counts from the initial corpus become version 1."""
    if line_store_exists(store_dir):
        raise ValueError(f"line store already exists: {store_dir}")
    counts = _batch_counts(docs, seg)
    # overwrite: a version dir is not live until the meta flips to it,
    # so an orphan left by a crashed earlier attempt is safely replaced
    counts.write.mode("overwrite").parquet(_counts_dir(store_dir, 1))
    meta = {
        "version": 1,
        "seg": seg,
        "min_count": min_count,
        "applied": [batch_id],
        # count the WRITTEN parquet (footer reads) — counting the frame
        # would re-run the segment aggregation a second time
        "n_distinct": docs.sparkSession.read.parquet(
            _counts_dir(store_dir, 1)
        ).count(),
    }
    _flip_meta(store_dir, meta)
    return meta


def update_line_store(docs: DataFrame, store_dir: str, batch_id: str) -> dict:
    """Merge a batch's segment counts into the store (new version, then
    atomic meta flip). Re-applying an already-applied batch_id is a
    no-op returning the current meta."""
    meta = _read_meta(store_dir)
    if batch_id in meta["applied"]:
        return meta
    spark = docs.sparkSession
    cur = spark.read.parquet(_counts_dir(store_dir, meta["version"]))
    merged = (
        cur.unionByName(_batch_counts(docs, meta["seg"]))
        .groupBy("h")
        .agg(F.sum("cnt").alias("cnt"))
    )
    new_version = meta["version"] + 1
    # overwrite for the same reason as in seed_line_store: the dir is
    # not live until the meta flip, and a crashed run may have left it
    merged.write.mode("overwrite").parquet(_counts_dir(store_dir, new_version))
    meta = {
        **meta,
        "version": new_version,
        "applied": meta["applied"] + [batch_id],
        # footer-read count of the written version, not a second
        # execution of the corpus-wide merge aggregation
        "n_distinct": spark.read.parquet(
            _counts_dir(store_dir, new_version)
        ).count(),
    }
    _flip_meta(store_dir, meta)
    return meta


def rewrite_against_store(
    spark: SparkSession, docs: DataFrame, store_dir: str
) -> DataFrame:
    """Rewrite a batch using the store's CUMULATIVE counts: a segment
    whose corpus-wide count >= min_count is dropped, surviving text is
    reassembled in original order. Output schema matches the one-shot
    query: (doc_id, n_lines, n_kept, new_md5).

    The store is scanned once, column-pruned, semi-joined against the
    broadcast batch hash set; only the collision rows leave the scan.
    """
    meta = _read_meta(store_dir)
    lines = seg_lines(docs, meta["seg"])
    hot = (
        read_line_counts(spark, store_dir)
        .filter(F.col("cnt") >= meta["min_count"])
        .join(F.broadcast(lines.select("h").distinct()), "h", "left_semi")
        .select("h")
    )
    flagged = lines.join(F.broadcast(hot.withColumn("__hot", F.lit(1))), "h", "left")
    return (
        flagged.withColumn("__kept", F.col("__hot").isNull())
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("__kept").cast("int")).alias("n_kept"),
            F.md5(
                F.array_join(
                    F.expr(
                        "transform(array_sort(collect_list("
                        "case when __kept then struct(idx, line) end)),"
                        " s -> s.line)"
                    ),
                    " ",
                )
            ).alias("new_md5"),
        )
    )
