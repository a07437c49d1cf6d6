"""Materialized signature store: steady-state incremental dedup that
never re-reads corpus bodies. Parity against the recompute-everything
incremental job, multi-day lifecycle, and the broadcast-direction plan
guarantee (the corpus is never the build side)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

from paddleocr_spark.functions import dedup_store as S  # noqa: E402

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )


def test_store_parity_with_recompute_incremental(spark, tmp_path):
    """Same admissions as jobs/dedup.build_incremental_dedup on the same
    (base, new) split — the store changes the cost, not the answer."""
    from dedup import build_incremental_dedup

    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 3 != 0).cache()
    new = docs.filter(F.col("doc_id") % 3 == 0).cache()

    store = str(tmp_path / "store")
    S.append_to_store(base, store)
    got = {
        r["doc_id"]
        for r in S.incremental_dedup_against_store(spark, store, new)
        .select("doc_id").collect()
    }
    want = {
        r["doc_id"]
        for r in build_incremental_dedup(spark, base, new).select("doc_id").collect()
    }
    assert got == want and len(want) > 0
    base.unpersist(); new.unpersist()


def test_store_lifecycle_admissions_are_stable(spark, tmp_path):
    """Three daily batches: an admitted doc's exact duplicate in a later
    batch is rejected; its near-duplicate is rejected; re-presenting an
    already-admitted batch admits nothing."""
    store = str(tmp_path / "store")
    docs = _docs(spark).limit(40).cache()
    day1 = docs.filter(F.col("doc_id") % 2 == 0)
    S.append_to_store(day1, store)

    # day 2: one exact copy of a day-1 doc (new id), one fresh doc
    base_row = day1.orderBy("doc_id").limit(1).collect()[0]
    fresh = docs.filter(F.col("doc_id") % 2 == 1).orderBy("doc_id").limit(1)
    day2 = fresh.unionByName(
        spark.createDataFrame(
            [(10_000_000, base_row["text"])], "doc_id bigint, text string"
        )
    )
    adm2 = S.incremental_dedup_against_store(spark, store, day2)
    ids2 = {r["doc_id"] for r in adm2.select("doc_id").collect()}
    assert 10_000_000 not in ids2 and len(ids2) == 1
    S.append_to_store(adm2, store)

    # day 3: replay day 2 → nothing admitted (corpus now contains it)
    adm3 = S.incremental_dedup_against_store(spark, store, day2)
    assert adm3.count() == 0
    docs.unpersist()


def test_store_joins_broadcast_the_batch_not_the_corpus(spark, tmp_path):
    """Plan guarantee: the store scan never appears on the build side of
    a broadcast — only batch-derived (small) frames are broadcast."""
    store = str(tmp_path / "store")
    docs = _docs(spark)
    S.append_to_store(docs.filter(F.col("doc_id") % 2 == 0), store)
    out = S.incremental_dedup_against_store(
        spark, store, docs.filter(F.col("doc_id") % 2 == 1)
    )
    # default maxMetadataStringLength=100 truncates Location paths out
    # of the dump under pytest's long tmp dirs — widen for the check
    old = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    assert "/store/sigs" in plan  # the store is scanned...
    for seg in plan.split("BroadcastExchange")[1:]:
        # ...but never inside a broadcast build side (the window up to
        # the next join node is the build subtree in the string dump)
        head = seg.split("BroadcastHashJoin")[0]
        assert "/store/sigs" not in head, head[:400]
