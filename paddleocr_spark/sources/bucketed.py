"""Bucketed storage: shuffle-free co-located joins.

The reference's only co-location is modulo file striping
(predict_system.py:187 `image_file_list[pid::nproc]`), which pins each
document list slice to one worker. The engine-grade version is Spark
bucketing: both sides of a recurring equi-join are written
`bucketBy(N, key).sortBy(key)`, so the join compiles to a zero-Exchange
sort-merge over matching bucket files. At 10^12 rows this is the
difference between re-shuffling the fact table on every run and
shuffling it exactly once at ingest.

Usage pattern (validated by tests/test_bucketed.py, which asserts the
joined plan contains NO Exchange):

    write_bucketed(pages_df, "pages_b", "url", n_buckets=64)
    write_bucketed(extracted_df, "extracted_b", "url", n_buckets=64)
    spark.table("pages_b").join(spark.table("extracted_b"), "url")

Bucket counts must match across tables meant to co-join; pick
n_buckets ~ total_size / target_partition_size at ingest time and keep
it stable across snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and bucket-sorted) managed table."""
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def cojoin(spark: SparkSession, left: str, right: str, key: str) -> DataFrame:
    """Equi-join two identically-bucketed tables on their bucket key.
    With matching bucket specs Catalyst plans this with zero Exchange
    (and zero Sort when both sides are bucket-sorted)."""
    return spark.table(left).join(spark.table(right), key)
