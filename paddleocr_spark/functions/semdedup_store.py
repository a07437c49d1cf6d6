"""Materialized SEMANTIC signature store: steady-state (daily-crawl)
SemDeDup whose per-day cost is O(new batch + collisions), never
O(corpus) — the embedding-space twin of `functions/dedup_store.py`.

A one-shot `semantic_dedup_scaled` pass re-clusters and re-compares the
whole corpus every run — fine once, quadratic over a year of daily
batches. This module persists, at admission time:

    centroids.json   the FROZEN quantizer: [(cluster_id, vector)] plus
                     the banding/τ parameters the store was built with
                     (admission must hash with the same planes)
    vectors/         (vec_id, cluster, embedding, nrm)   1 row per kept vec
    sigs/            (vec_id, cluster, t, b)             n_tables rows per vec

and admits a new batch in three bounded steps:

1. ASSIGN new vectors to the stored centroids (flat literal argmax or
   the two-level IVF path, same threshold rule as the batch job). The
   quantizer is frozen on day-0 — the production pattern: re-training
   it daily would drift every stored signature.
2. REJECT vs corpus: new and stored vectors must collide in
   (cluster, table, bucket) to be compared — the store's sigs are
   scanned ONCE against the broadcast batch signatures (the corpus is
   never collected, never shuffled by key); only colliding pairs pull
   their stored embeddings (one more store scan, semi-joined down by
   the broadcast collision set) for the exact-cosine ≥ τ verify.
3. DEDUP within batch: survivors run the same (cluster, table, bucket)
   self-join with the keep-min-id rule `semantic_dedup_scaled` applies,
   so a batch containing its own near-dup pair admits exactly one.

Admitted vectors append their rows to vectors/ and sigs/; re-running
the same batch admits nothing (every vector now collides with itself
at cos 1.0 ≥ τ) — the same convergence probe as the exact store.

Recall contract: identical to `semantic_dedup_scaled`'s banded scan —
a near-dup is caught when the pair collides in ≥1 of the L tables
(S-curve in `embed_near_dup_pairs`); τ and the banding parameters are
pinned in centroids.json so every batch probes the same space.

Reference analog: none — the reference dedups nothing; this is the
LLM-data-pipeline layer (SURVEY.md §6) at steady state.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paddleocr_spark.functions.similarity import (
    _assign_two_level,
    _centroid_argmax,
    _with_band_buckets,
    dot,
    semantic_dedup_scaled,
)

VEC_SCHEMA = "vec_id bigint, cluster bigint, embedding array<float>, nrm double"
SIG_SCHEMA = "vec_id bigint, cluster bigint, t int, b int"


def _model_path(store_dir: str) -> str:
    return os.path.join(store_dir, "centroids.json")


def recover_store(store_dir: str) -> None:
    """Complete an interrupted `reseed_semantic_store` swap: if the
    store is missing but a COMPLETED ``.next`` (centroids.json present)
    exists, promote it; a stale ``.old`` left after a completed swap is
    removed. Idempotent; called by `store_exists` so every entry point
    self-heals before dispatching."""
    import shutil

    nxt = store_dir.rstrip("/") + ".next"
    old = store_dir.rstrip("/") + ".old"
    if not os.path.exists(_model_path(store_dir)) and os.path.exists(
        _model_path(nxt)
    ):
        if os.path.exists(store_dir):
            shutil.rmtree(store_dir)
        os.rename(nxt, store_dir)
    if os.path.exists(_model_path(store_dir)):
        shutil.rmtree(old, ignore_errors=True)


def store_exists(store_dir: str) -> bool:
    recover_store(store_dir)
    return os.path.exists(_model_path(store_dir))


def _read_model(store_dir: str) -> dict:
    with open(_model_path(store_dir)) as fh:
        return json.load(fh)


def _write_model(store_dir: str, cents: list, params: dict) -> None:
    os.makedirs(store_dir, exist_ok=True)
    with open(_model_path(store_dir), "w") as fh:
        json.dump(
            dict(cents=[[int(c), [float(x) for x in v]] for c, v in cents], **params),
            fh,
        )


def read_store_vectors(spark: SparkSession, store_dir: str) -> DataFrame:
    return spark.read.schema(VEC_SCHEMA).parquet(os.path.join(store_dir, "vectors"))


def read_store_sigs(spark: SparkSession, store_dir: str) -> DataFrame:
    return spark.read.schema(SIG_SCHEMA).parquet(os.path.join(store_dir, "sigs"))


def _assign_to_cents(
    e: DataFrame, cents: list, vec_col: str, id_col: str,
    two_level: bool, nprobe: int,
) -> DataFrame:
    """(id, vec, __nrm, cluster) under the FROZEN centroid set. The
    flat-vs-two-level dispatch is the one RECORDED at seed time, not
    re-derived from len(cents): refinement can drop empty clusters
    below the threshold, and replaying a different (exact) assignment
    path than the (approximate IVF) one that placed the stored vectors
    would let an exact duplicate land in a different cluster and skip
    the collision check entirely."""
    if two_level:
        return _assign_two_level(e, cents, vec_col, id_col, nprobe=nprobe)
    cents3 = [
        (c, v, math.sqrt(sum(float(x) * float(x) for x in v))) for c, v in cents
    ]
    best = _centroid_argmax(cents3, vec_col)
    return e.select(
        id_col, vec_col, "__nrm", (-best["nc"]).cast("bigint").alias("cluster")
    )


def _with_nrm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        id_col, vec_col, F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("__nrm")
    )


def _append(df: DataFrame, store_dir: str, sub: str) -> None:
    df.write.mode("append").parquet(os.path.join(store_dir, sub))


def seed_semantic_store(
    df: DataFrame,
    store_dir: str,
    target_cluster_size: int = 4096,
    k: int | None = None,
    tau: float = 0.4,
    refine_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 2,
    two_level_threshold: int = 2048,
    nprobe: int = 2,
) -> dict:
    """Day-0: run the batch SemDeDup, then persist its trained quantizer
    and the KEPT vectors' signatures as the admission baseline."""
    model: dict = {}
    decisions = semantic_dedup_scaled(
        df,
        target_cluster_size=target_cluster_size,
        k=k,
        tau=tau,
        refine_iters=refine_iters,
        id_col=id_col,
        vec_col=vec_col,
        n_planes=n_planes,
        n_tables=n_tables,
        two_level_threshold=two_level_threshold,
        nprobe=nprobe,
        model_out=model,
    )
    kept_ids = decisions.filter(F.col("kept") == 1).select(id_col)
    # kept is O(corpus) — a plain semi-join (shuffle at scale), never a
    # broadcast of the kept-id set
    kept = model["assigned"].join(kept_ids, id_col, "left_semi")
    vecs = kept.select(
        F.col(id_col).cast("bigint").alias("vec_id"),
        F.col("cluster").cast("bigint").alias("cluster"),
        F.col(vec_col).cast("array<float>").alias("embedding"),
        F.col("__nrm").cast("double").alias("nrm"),
    )
    # OVERWRITE, not append: a crashed seed (centroids.json is written
    # LAST, so the store doesn't exist yet) reruns from scratch without
    # duplicating rows on top of the orphaned first attempt. The write
    # is also the ONE execution of the expensive dedup plan — sigs and
    # counts derive from the parquet read-back, never a recompute.
    vecs.write.mode("overwrite").parquet(os.path.join(store_dir, "vectors"))
    spark = df.sparkSession
    vread = read_store_vectors(spark, store_dir)
    sigs = _with_band_buckets(
        vread.withColumnRenamed("nrm", "__nrm"), "embedding", n_planes, n_tables
    ).select(
        "vec_id", "cluster",
        F.col("__t").cast("int").alias("t"),
        F.col("__b").cast("int").alias("b"),
    )
    sigs.write.mode("overwrite").parquet(os.path.join(store_dir, "sigs"))
    _write_model(
        store_dir,
        model["cents"],
        dict(
            tau=tau, n_planes=n_planes, n_tables=n_tables,
            two_level_threshold=two_level_threshold, nprobe=nprobe,
            two_level=model["two_level"],
        ),
    )
    n = df.count()
    n_kept = vread.count()
    return dict(mode="seed", n_input=n, admitted=n_kept,
                rejected_corpus=0, rejected_batch=n - n_kept)


def admit_against_semantic_store(
    spark: SparkSession,
    store_dir: str,
    new: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict]:
    """Admit only new vectors that are near-dups of neither a stored
    vector nor an earlier-id admitted newcomer. Returns (admitted
    assignment frame, stats); the admitted rows are appended to the
    store by the caller via `append_admitted` (kept separate so the
    caller can sink the surviving documents in the same transaction
    boundary it uses for the corpus)."""
    m = _read_model(store_dir)
    cents = [(int(c), v) for c, v in m["cents"]]
    tau, n_planes, n_tables = m["tau"], m["n_planes"], m["n_tables"]

    e = _with_nrm(new, id_col, vec_col)
    # legacy stores (pre two_level marker) fall back to the threshold rule
    two_level = m.get("two_level", len(cents) > m["two_level_threshold"])
    assigned = _assign_to_cents(
        e, cents, vec_col, id_col, two_level, m["nprobe"]
    ).cache()
    new_sigs = _with_band_buckets(assigned, vec_col, n_planes, n_tables).select(
        F.col(id_col).alias("new_id"),
        "cluster",
        F.col("__t").alias("t"),
        F.col("__b").alias("b"),
    )

    # 2) corpus collisions: ONE store-sigs scan vs the broadcast batch
    pairs = (
        read_store_sigs(spark, store_dir)
        .join(F.broadcast(new_sigs), ["cluster", "t", "b"])
        .select("vec_id", "new_id")
        .distinct()
    )
    # pull only colliding stored vectors (scan semi-joined down by the
    # day's collision set, which is broadcast-sized by construction)
    hit_vecs = read_store_vectors(spark, store_dir).join(
        F.broadcast(pairs.select("vec_id").distinct()), "vec_id", "left_semi"
    )
    new_vecs = assigned.select(
        F.col(id_col).alias("new_id"),
        F.col(vec_col).alias("__nv"),
        F.col("__nrm").alias("__nn"),
    )
    # (pairs ⋈ hit_vecs) is collision-bounded — the small side of the
    # verify join. new_vecs carries the batch's embeddings (batch × dim
    # floats — broadcastable for a daily batch only when small), so the
    # hint goes on the collision side and AQE keeps the batch streaming.
    rejected = (
        F.broadcast(pairs.join(hit_vecs, "vec_id"))
        .join(new_vecs, "new_id")
        .withColumn(
            "cos",
            F.round(dot(F.col("embedding"), F.col("__nv")) / (F.col("nrm") * F.col("__nn")), 6),
        )
        .filter(F.col("cos") >= tau)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    survivors = assigned.join(F.broadcast(rejected), id_col, "left_anti")

    # 3) within-batch: same keep-min-id rule as semantic_dedup_scaled
    s_sigs = _with_band_buckets(survivors, vec_col, n_planes, n_tables)
    a, b = s_sigs.alias("a"), s_sigs.alias("b")
    batch_dropped = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.__t") == F.col("b.__t"))
            & (F.col("a.__b") == F.col("b.__b"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "cos",
            F.round(
                dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
                / (F.col("a.__nrm") * F.col("b.__nrm")),
                6,
            ),
        )
        .filter(F.col("cos") >= tau)
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    admitted = survivors.join(
        F.broadcast(batch_dropped), id_col, "left_anti"
    ).cache()

    n_in = assigned.count()
    n_rej_corpus = rejected.count()
    n_adm = admitted.count()
    # the batch-sized assignment cache served the three counts above;
    # the caller only touches the (already-cached, admission-sized)
    # admitted frame, so release the big one now — a long-lived daily
    # driver must not accumulate one batch cache per admission call
    assigned.unpersist()
    stats = dict(
        mode="admit",
        n_input=n_in,
        admitted=n_adm,
        rejected_corpus=n_rej_corpus,
        rejected_batch=n_in - n_rej_corpus - n_adm,
    )
    return admitted, stats


def reseed_semantic_store(
    corpus: DataFrame,
    store_dir: str,
    **seed_kwargs,
) -> dict:
    """Periodic retrain against quantizer drift: as the corpus
    distribution shifts, the day-0 centroids describe it less well and
    cluster populations skew (admission stays CORRECT — collisions are
    verified by exact cosine — but the banding does less work per
    probe). The production cadence is to rebuild the store from the
    CURRENT kept corpus every N days: build into ``<store>.next``, then
    swap directories (build-then-swap, so readers never see a
    half-built store). Crash windows: before the swap, the old store is
    intact (a rerun rebuilds ``.next``); between the two renames, the
    store is briefly absent but ``.next`` is COMPLETE — `recover_store`
    (invoked by every `store_exists` dispatch) promotes it, so the next
    entry point self-heals instead of silently re-seeding from a daily
    batch. Admissions between the snapshot and the swap replay into the
    new store by rerunning the day's batches — the same catch-up
    discipline as jobs/daily.py."""
    import shutil

    nxt = store_dir.rstrip("/") + ".next"
    if os.path.exists(nxt):
        shutil.rmtree(nxt)
    stats = seed_semantic_store(corpus, nxt, **seed_kwargs)
    old = store_dir.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(store_dir):
        os.rename(store_dir, old)
    os.rename(nxt, store_dir)
    shutil.rmtree(old, ignore_errors=True)
    stats["mode"] = "reseed"
    return stats


def append_admitted(
    admitted: DataFrame, store_dir: str, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Persist an admission decision: the admitted assignment frame's
    vector + signature rows join the store baseline."""
    m = _read_model(store_dir)
    vecs = admitted.select(
        F.col(id_col).cast("bigint").alias("vec_id"),
        F.col("cluster").cast("bigint").alias("cluster"),
        F.col(vec_col).cast("array<float>").alias("embedding"),
        F.col("__nrm").cast("double").alias("nrm"),
    )
    _append(vecs, store_dir, "vectors")
    sigs = _with_band_buckets(admitted, vec_col, m["n_planes"], m["n_tables"]).select(
        F.col(id_col).cast("bigint").alias("vec_id"),
        F.col("cluster").cast("bigint").alias("cluster"),
        F.col("__t").cast("int").alias("t"),
        F.col("__b").cast("int").alias("b"),
    )
    _append(sigs, store_dir, "sigs")
