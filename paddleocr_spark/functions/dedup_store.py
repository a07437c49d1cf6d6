"""Materialized signature store: steady-state (daily-crawl) dedup whose
per-day cost is O(new batch + collisions), never O(corpus).

The full-corpus job (jobs/dedup.py build_dedup) and its incremental
variant (build_incremental_dedup) both recompute the BASE side's
signatures from document text — fine for a one-shot pass, quadratic
over a year of daily batches. This module persists each document's
signature rows once, at admission:

    (doc_id, content_hash, band_id, band_hash)   n_bands rows per doc

and runs the day's dedup against the store:

- the corpus side is ONE column-pruned scan of the store (ids + hashes,
  never document text);
- the new batch's hashes and bands are BROADCAST to probe it (the small
  side is the build side — the corpus is never collected, never
  shuffled by key);
- candidate pairs then flow through the same connected-components +
  corpus-taint logic as jobs/dedup.py, so admission semantics are
  identical (parity-tested), including new-doc-chained-to-corpus-
  through-another-new-doc.

Reference analog: none — the reference dedups nothing; this is the
LLM-data-pipeline layer (SURVEY.md §6) at steady state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.functions import dedup
from paddleocr_spark.functions.dedup import (
    LSH_BANDS,
    N_MINHASH,
    band_hashes,
    content_hash,
    with_minhash,
)

SIG_SCHEMA = "doc_id bigint, content_hash string, band_id int, band_hash string"


def doc_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_minhash: int = N_MINHASH,
    n_bands: int = LSH_BANDS,
) -> DataFrame:
    """The store rows for a batch of documents: n_bands rows per doc,
    each carrying the doc's content hash (exact-dup probe key) and one
    LSH band hash (near-dup probe key). Pure column expressions."""
    sigs = with_minhash(df.select(id_col, text_col), text_col, n=n_minhash)
    return sigs.select(
        F.col(id_col).alias("doc_id"),
        content_hash(F.col(text_col)).alias("content_hash"),
        F.posexplode(F.array(*band_hashes(n_minhash, n_bands))).alias(
            "band_id", "band_hash"
        ),
    )


def _sig_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "sigs")


def store_exists(store_dir: str) -> bool:
    return os.path.isdir(_sig_dir(store_dir))


def append_to_store(docs: DataFrame, store_dir: str, **sig_kwargs) -> int:
    """Admit documents: write their signature rows. Returns docs added."""
    sigs = doc_signatures(docs, **sig_kwargs)
    sigs.write.mode("append").parquet(_sig_dir(store_dir))
    return docs.count()


def read_store(spark: SparkSession, store_dir: str) -> DataFrame:
    return spark.read.schema(SIG_SCHEMA).parquet(_sig_dir(store_dir))


def incremental_dedup_against_store(
    spark: SparkSession,
    store_dir: str,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    n_minhash: int = N_MINHASH,
    n_bands: int = LSH_BANDS,
    algorithm: str = "propagation",
) -> DataFrame:
    """Admit only new documents that duplicate neither the corpus (via
    the store) nor an admitted newcomer. Returns the survivors; the
    caller appends them with ``append_to_store`` (and to the corpus).

    Every join against the store broadcasts the NEW side: the store is
    scanned exactly twice (hash probe + band probe), both column-pruned,
    and its output is only the matching rows — the day's collision set,
    not the corpus."""
    from pyspark.sql import Window

    from paddleocr_spark.functions.graph import (
        connected_components,
        connected_components_two_phase,
    )

    cc_fn = (
        connected_components_two_phase
        if algorithm == "twophase"
        else connected_components
    )
    store = read_store(spark, store_dir)
    new_sigs = doc_signatures(
        new, id_col, text_col, n_minhash=n_minhash, n_bands=n_bands
    ).cache()

    # 1) exact, within batch: min doc_id per content hash
    new_hashes = new_sigs.select("doc_id", "content_hash").distinct()
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    batch_exact = (
        new_hashes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # 2) exact, vs corpus: stream the store once against the broadcast
    #    batch hashes; the (small) matched set then anti-joins the batch.
    #    (A direct batch-anti-store join would make the corpus the build
    #    side — the exact driver-OOM shape this module exists to avoid.)
    matched_hashes = (
        store.select("content_hash")
        .join(F.broadcast(batch_exact.select("content_hash")), "content_hash", "left_semi")
        .distinct()
    )
    live = batch_exact.join(F.broadcast(matched_hashes), "content_hash", "left_anti")

    # 3) near-dup candidates: corpus×new via ONE store band probe
    #    (broadcast new bands), plus new×new via a self-join of the
    #    (small) batch bands
    live_bands = new_sigs.join(
        F.broadcast(live.select("doc_id")), "doc_id", "left_semi"
    ).select("doc_id", "band_id", "band_hash")
    cross = (
        store.join(
            F.broadcast(live_bands.withColumnRenamed("doc_id", "new_id")),
            ["band_id", "band_hash"],
        )
        .filter(F.col("doc_id") != F.col("new_id"))
        .select(F.col("doc_id").alias("id_a"), F.col("new_id").alias("id_b"))
        .distinct()
    )
    a, b = live_bands.alias("a"), live_bands.alias("b")
    within = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    pairs = cross.unionByName(within)

    # 4) CC + corpus taint, same admission rule as jobs/dedup.py:
    #    a new doc survives iff its component is corpus-free and it is
    #    the component minimum (or it collided with nothing)
    cc = cc_fn(pairs, checkpoint_dir=checkpoint_dir)
    # the base side here is the day's COLLISION set (store rows that
    # matched some newcomer), bounded by the batch — broadcastable
    clustered_survivors = dedup.cc_admitted_new_ids(
        cc, cross.select(F.col("id_a").alias("id")), broadcast_base=True
    )
    clustered = cc.select(F.col("id").alias("doc_id")).distinct()
    keep_ids = (
        live.select("doc_id")
        .join(clustered, "doc_id", "left_anti")
        .unionByName(clustered_survivors)
    )
    # the advertised id_col, not a hard-coded 'doc_id': the internal
    # frames are normalized by doc_signatures but `new` keeps the
    # caller's column name
    out = new.join(
        F.broadcast(keep_ids.withColumnRenamed("doc_id", id_col)),
        id_col,
        "left_semi",
    )
    # new_sigs stays cached: the caller has not acted on `out` yet, and
    # unpersisting here (the old behavior) wiped the cache the returned
    # plan depends on — the final action then re-derived the whole
    # signature pipeline (shingles + 8x minhash + two store probes)
    # several times. The cache is O(batch) and LRU-evictable; a
    # steady-state job calls this once per run.
    return out
