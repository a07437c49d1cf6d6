"""Bucketed co-located join: the plan must contain NO Exchange on
either side (the shuffle happened once, at write time)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paddleocr_spark.sources.bucketed import cojoin, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in the session's default warehouse dir
    # (spark-warehouse/, gitignored); dropped in teardown.
    docs = spark.range(0, 5000).select(
        F.col("id").alias("url_id"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    meta = spark.range(0, 5000).select(
        F.col("id").alias("url_id"),
        (F.col("id") % 7).alias("grade"),
    )
    write_bucketed(docs, "docs_b", "url_id", n_buckets=8)
    write_bucketed(meta, "meta_b", "url_id", n_buckets=8)
    yield "docs_b", "meta_b"
    spark.sql("drop table if exists docs_b")
    spark.sql("drop table if exists meta_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the test exercises the co-located SMJ path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cojoin(spark, left, right, "url_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_values_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    j = cojoin(spark, left, right, "url_id")
    row = j.filter(F.col("url_id") == 42).collect()[0]
    assert row["grade"] == 42 % 7
    assert row["payload"] is not None


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join over raw DataFrames (no bucket metadata)
    plans at least one Exchange — bucketing is what removed it."""
    left, _ = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        raw = spark.table(left).localCheckpoint(eager=True)
        other = spark.range(0, 5000).select(F.col("id").alias("url_id"))
        plan = (
            raw.join(other, "url_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
