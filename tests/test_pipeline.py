"""End-to-end curation pipeline (jobs/pipeline.py): extract -> curate
-> dedup -> split, manifest accounting, and split determinism."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from jobs.pipeline import run_pipeline, split_col


def test_pipeline_end_to_end(spark, smoke_dir, tmp_path):
    out = str(tmp_path / "pipe")
    m = run_pipeline(
        spark,
        input_path=os.path.join(smoke_dir, "pages.parquet"),
        output_dir=out,
        n_partitions=8,
        salt=2,
    )
    # manifest accounting is internally consistent
    assert m["n_extracted"] > 0
    assert 0 < m["n_curated"] <= m["n_extracted"]
    assert 0 < m["n_corpus"] <= m["n_curated"]
    assert sum(m["splits"].values()) == m["n_corpus"]
    assert set(m["splits"]) <= {"train", "val", "test"}
    # manifest.json on disk matches the returned dict
    with open(os.path.join(out, "manifest.json")) as fh:
        assert json.load(fh)["n_corpus"] == m["n_corpus"]

    # every curated row passed the gates
    cur = spark.read.parquet(os.path.join(out, "curated"))
    bad = cur.filter(
        (F.col("quality") < 0.3) | (F.col("n_tokens") < 5)
        | ~F.col("lang").isin(["en", "de", "fr", "es", "zh"])
    ).count()
    assert bad == 0

    # dedup contract: no cluster loser survives into the corpus
    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    losers = (
        spark.read.parquet(os.path.join(out, "clusters"))
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    assert corpus.join(losers, "doc_id", "inner").count() == 0

    # split is a pure function of the url: recomputing the assignment
    # from the written dataset reproduces the partition it landed in
    ds = spark.read.parquet(os.path.join(out, "dataset"))
    moved = ds.filter(F.col("split") != split_col("doc_id")).count()
    assert moved == 0


def test_pipeline_empty_and_garbage_pages_survive(spark, tmp_path):
    """Pages whose extraction is empty (garbage html) are dropped by the
    token gate, never a divide-by-zero in the quality expression."""
    rows = [
        ("u1", "2024-01-01 00:00:00", b"<html>\xff\xfe garbage", "", "en"),
        ("u2", "2024-01-01 00:00:00", b"", "", "en"),
        (
            "u3",
            "2024-01-01 00:00:00",
            b"<html><body><p>"
            + " ".join(["the quick brown fox jumps over the lazy dog"] * 30).encode()
            + b"</p></body></html>",
            "",
            "en",
        ),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts string, html binary, text string, lang string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    src = str(tmp_path / "gpages")
    df.write.parquet(src)
    out = str(tmp_path / "gpipe")
    m = run_pipeline(spark, input_path=src, output_dir=out, n_partitions=2, salt=1)
    assert m["n_extracted"] == 3
    assert m["n_curated"] == 1  # only the real document survives
    assert m["n_corpus"] == 1


def test_pipeline_decontamination_drops_benchmark_overlap(spark, smoke_dir, tmp_path):
    """With --benchmark set, any corpus doc sharing a word-5-gram with a
    benchmark text is dropped; manifest accounts for it exactly and the
    dataset totals follow the decontaminated corpus."""
    out = str(tmp_path / "pipe_decon")

    # baseline run (no benchmark) to harvest a real surviving text
    base = run_pipeline(
        spark,
        input_path=os.path.join(smoke_dir, "pages.parquet"),
        output_dir=str(tmp_path / "pipe_base"),
        n_partitions=8,
        salt=2,
    )
    corpus = spark.read.parquet(str(tmp_path / "pipe_base" / "corpus"))
    victim = corpus.filter(F.size(F.split("text", " ")) >= 5).first()
    assert victim is not None
    # benchmark text = the victim's first five words (one shared 5-gram)
    bench_text = " ".join(victim["text"].split(" ")[:5])
    bench_path = str(tmp_path / "bench.parquet")
    spark.createDataFrame([(bench_text,)], "text string").write.parquet(bench_path)

    m = run_pipeline(
        spark,
        input_path=os.path.join(smoke_dir, "pages.parquet"),
        output_dir=out,
        n_partitions=8,
        salt=2,
        benchmark_path=bench_path,
    )
    assert m["n_contaminated"] >= 1
    clean = spark.read.parquet(os.path.join(out, "decontaminated"))
    # the victim is gone, the accounting holds, splits follow the clean corpus
    assert clean.filter(F.col("doc_id") == victim["doc_id"]).count() == 0
    assert m["n_corpus"] == base["n_corpus"] - m["n_contaminated"]
    assert sum(m["splits"].values()) == m["n_corpus"]


def test_pipeline_semdedup_stage_drops_planted_semantic_dups(spark, smoke_dir, tmp_path):
    """Opt-in SemDeDup stage: upstream (doc_id, embedding) table with
    two corpus docs planted on the SAME vector — exactly one survives;
    every other doc is untouched; manifest accounting stays closed."""
    out = str(tmp_path / "pipe_sem")
    base = run_pipeline(
        spark,
        input_path=os.path.join(smoke_dir, "pages.parquet"),
        output_dir=out,
        n_partitions=8,
        salt=2,
    )
    corpus_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "corpus"))
        .select("doc_id").collect()
    )
    a, b = corpus_ids[0], corpus_ids[1]
    # deterministic unique vectors per doc; a and b share one
    src = F.when(F.col("doc_id") == b, F.lit(a)).otherwise(F.col("doc_id"))
    emb = (
        spark.createDataFrame([(u,) for u in corpus_ids], "doc_id string")
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda i: (F.pmod(F.xxhash64(src, i), F.lit(101)).cast("double") - 50.0) / 25.0,
            ).cast("array<float>").alias("embedding"),
        )
    )
    emb_path = str(tmp_path / "emb.parquet")
    emb.write.parquet(emb_path)

    out2 = str(tmp_path / "pipe_sem2")
    m = run_pipeline(
        spark,
        input_path=os.path.join(smoke_dir, "pages.parquet"),
        output_dir=out2,
        n_partitions=8,
        salt=2,
        semdedup_embeddings=emb_path,
        semdedup_tau=0.999,
        semdedup_cluster_size=64,
    )
    assert m["n_semantic_dropped"] == 1
    assert m["n_corpus"] == base["n_corpus"] - 1
    survivors = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out2, "semdeduped"))
        .select("doc_id").collect()
    }
    # exactly one of the planted pair survives (the min id, a < b)
    assert a in survivors and b not in survivors
    assert sum(m["splits"].values()) == m["n_corpus"]


def test_pipeline_lm_gate_drops_worst_tertile(spark, smoke_dir, tmp_path):
    """Opt-in LM gate (CCNet cut): the bigram LM trains on a reference
    slice of the corpus's own texts, every doc is scored, and the tail
    tertile is dropped via approx-quantile thresholds. Assertions: the
    retention is ~2/3, the cut is threshold-separable (every dropped
    doc scores >= every kept doc's mean_nll up to the two-threshold
    band), scores are persisted for audit, and accounting stays
    closed through the split."""
    out = str(tmp_path / "pipe_lm_base")
    base = run_pipeline(
        spark,
        input_path=os.path.join(smoke_dir, "pages.parquet"),
        output_dir=out,
        n_partitions=8,
        salt=2,
    )
    # reference = a deterministic half of the corpus texts (the
    # target-domain LM side)
    ref = (
        spark.read.parquet(os.path.join(out, "corpus"))
        .filter(F.abs(F.xxhash64("doc_id")) % 2 == 0)
        .select("text")
    )
    ref_path = str(tmp_path / "lm_ref.parquet")
    ref.write.parquet(ref_path)

    out2 = str(tmp_path / "pipe_lm")
    m = run_pipeline(
        spark,
        input_path=os.path.join(smoke_dir, "pages.parquet"),
        output_dir=out2,
        n_partitions=8,
        salt=2,
        lm_ref_path=ref_path,
    )
    n0 = base["n_corpus"]
    assert m["n_lm_dropped"] > 0
    assert m["n_corpus"] == n0 - m["n_lm_dropped"]
    assert abs(m["n_corpus"] - 2 * n0 / 3) <= max(2, 0.05 * n0)
    assert sum(m["splits"].values()) == m["n_corpus"]

    scores = spark.read.parquet(os.path.join(out2, "lm_scores"))
    kept = spark.read.parquet(os.path.join(out2, "lm_gated")).select("doc_id")
    j = scores.join(kept.withColumn("k", F.lit(1)), "doc_id", "left")
    max_kept = j.filter("k = 1").agg(F.max("mean_nll")).first()[0]
    min_dropped = j.filter("k is null").agg(F.min("mean_nll")).first()[0]
    # threshold cut => strictly separable by mean_nll
    assert min_dropped >= max_kept
    # dropped docs are exactly the tail bucket
    tails = {r["doc_id"] for r in scores.filter("bucket = 'tail'").collect()}
    dropped = {r["doc_id"] for r in j.filter("k is null").select("doc_id").collect()}
    assert tails == dropped


def test_pipeline_lm_gate_keeps_unscorable_docs(spark, smoke_dir, tmp_path):
    """A doc with a single token yields no bigrams, is absent from the
    scores frame, and must be KEPT by the gate (anti-join on the tail
    set) — never silently dropped outside the lm_scores/ audit trail."""
    from paddleocr_spark.queries_curation import (
        bigram_lm_tables,
        ccnet_buckets_scaled,
        score_against_bigram_lm,
    )

    docs = spark.createDataFrame(
        [(i, f"common words repeat here number {i % 7}") for i in range(60)]
        + [(999, "solo")],
        "doc_id bigint, text string",
    )
    uni, bi, total = bigram_lm_tables(docs.filter("doc_id % 2 = 0"))
    scored = score_against_bigram_lm(docs, uni, bi, total)
    assert scored.filter("doc_id = 999").count() == 0  # unscorable
    tail = ccnet_buckets_scaled(scored).filter("bucket = 'tail'").select("doc_id")
    kept = docs.join(tail, "doc_id", "left_anti")
    assert kept.filter("doc_id = 999").count() == 1
