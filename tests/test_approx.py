"""approx_count_distinct (HLL++) contract: within the configured
relative error of the exact distinct count on real data."""

from __future__ import annotations

from pyspark.sql import functions as F

import paddleocr_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_approx_reach_within_rsd(spark):
    got = {
        r["event_type"]: r["approx_users"]
        for r in Q.QUERIES["event_reach_approx"](spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["u"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    assert set(got) == set(exact) and len(got) > 0
    for t, approx in got.items():
        rel = abs(approx - exact[t]) / exact[t]
        assert rel <= 0.05, (t, approx, exact[t])  # 2% rsd, 5% head-room


def test_approx_percentile_close_to_exact(spark):
    """The 100 TB path for `len_percentiles` swaps exact `percentile`
    (buffers the group) for `approx_percentile` (fixed-size mergeable
    sketch). accuracy=10000 bounds rank error at 1/accuracy; assert the
    sketch lands within 2% of the exact value on real data."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    row = d.agg(
        F.expr("percentile(n_chars, array(0.25, 0.5, 0.75, 0.95))").alias("ex"),
        F.expr(
            "approx_percentile(n_chars, array(0.25, 0.5, 0.75, 0.95), 10000)"
        ).alias("ap"),
    ).collect()[0]
    for ex, ap in zip(row["ex"], row["ap"]):
        assert abs(ap - ex) / ex <= 0.02, (ex, ap)


def test_ccnet_buckets_scaled_near_tertiles(spark):
    """The threshold-style bucket cut (approx_percentile sketch +
    broadcast comparisons — the no-global-window 100 TB form) must
    agree with the exact ntile tertiles everywhere except a thin band
    around the two thresholds: bucket sizes within 2% of n/3, and
    per-doc agreement with the oracle-checked exact cut >= 99%."""
    from paddleocr_spark.queries_curation import (
        ccnet_buckets_scaled,
        q_bigram_logprob,
        q_ccnet_buckets,
    )

    sf = SF_DIR.replace("sf0.001", "sf0.01")
    scored = q_bigram_logprob(spark, sf)
    got = {r["doc_id"]: r["bucket"] for r in ccnet_buckets_scaled(scored).collect()}
    exact = {r["doc_id"]: r["bucket"] for r in q_ccnet_buckets(spark, sf).collect()}
    n = len(exact)
    assert n > 0 and len(got) == n
    from collections import Counter

    sizes = Counter(got.values())
    for b in ("head", "middle", "tail"):
        assert abs(sizes[b] - n / 3) <= max(2, 0.02 * n), sizes
    agree = sum(1 for k in exact if got[k] == exact[k])
    assert agree / n >= 0.99, (agree, n)
