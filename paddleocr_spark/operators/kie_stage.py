"""KIE linking as a native window operator (the Spark twin of
core/kie.py — see that module for the reference citations).

Works on the exploded blocks table (url, block_id, tag, text). The
link is the as-of pattern: `last(key_block_id, ignorenulls)` over an
unbounded-preceding window ordered by reading order — one shuffle on
url, zero joins, whole-stage codegen around the window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from paddleocr_spark.core.kie import KEY_TAGS, MAX_KEY_LEN


def is_key_col() -> Column:
    return F.col("tag").isin(*KEY_TAGS) | (
        F.col("text").endswith(":") & (F.length("text") <= MAX_KEY_LEN)
    )


def link_key_values_df(blocks: DataFrame) -> DataFrame:
    """(url, block_id, tag, text) -> (url, value_block_id,
    key_block_id nullable): each value row linked to the nearest
    preceding key row of its document."""
    w = (
        Window.partitionBy("url")
        .orderBy("block_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    key = is_key_col()
    with_key = blocks.withColumn(
        "key_block_id",
        F.last(F.when(key, F.col("block_id")), ignorenulls=True).over(w),
    )
    return (
        with_key.filter(~key & (F.col("text") != ""))
        .select(
            "url",
            F.col("block_id").alias("value_block_id"),
            "key_block_id",
        )
    )
