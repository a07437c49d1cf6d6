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
