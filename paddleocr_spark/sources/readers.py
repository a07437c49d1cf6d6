"""Sources and sinks beyond the parquet scan (SURVEY.md §2.1).

- ``read_pages``: the canonical pages source with an explicit schema
  (parquet; JSONL for fixture-style inputs — the PubTabDataSet analog,
  ppocr/data/pubtab_dataset.py). In production this is an Iceberg scan
  (`spark.read.format("iceberg")`, snapshot pinned for lineage); the
  sandbox has no Iceberg catalog, so parquet stands in with the same
  schema and the snapshot id emulated from the file listing
  (plans/job._input_snapshot).
- ``sampled_pages``: per-source ratio sampling with a fixed seed — the
  SimpleDataSet ``ratio_list`` + seeded-shuffle analog
  (ppocr/data/simple_dataset.py:25-99), as a native `sample` (no
  driver-side lists).
- ``write_jsonl_results``: the reference's results sink — one JSON doc
  per input (tools/infer/predict_system.py:244-267 writes
  ``name \\t [{"transcription","points"}]``) — as `to_json` + text write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt == "parquet":
        return spark.read.schema(PAGES_SCHEMA).parquet(path)
    if fmt in ("json", "jsonl"):
        df = spark.read.json(path)
        # JSONL carries html as base64 text (JSON has no binary type)
        return df.select(
            "url",
            F.col("warc_ts").cast("timestamp").alias("warc_ts"),
            F.unbase64("html_b64").alias("html"),
            "text",
            "lang",
        )
    raise ValueError(f"unsupported pages format: {fmt}")


def sampled_pages(
    df: DataFrame, ratios: dict[str, float], seed: int = 42,
    source_col: str = "lang",
) -> DataFrame:
    """Per-group sampling ratios (ratio_list analog): stratified
    `sampleBy` — executed as a per-row filter on a seeded hash, no
    shuffle, no driver materialization."""
    return df.sampleBy(source_col, fractions=ratios, seed=seed)


def write_jsonl_results(df: DataFrame, path: str) -> None:
    """extracted rows -> one JSON object per line (results-sink analog)."""
    out = df.select(
        F.to_json(
            F.struct("url", "extracted_text", "spans", "n_blocks_kept")
        ).alias("value")
    )
    out.write.mode("overwrite").text(path)


def read_labels_tsv(spark: SparkSession, path: str) -> DataFrame:
    """SimpleDataSet label-file source (ppocr/data/simple_dataset.py:
    25-99 reads ``img_path \\t label`` lines): tab-separated
    (url, label) with an explicit schema, no header; malformed lines
    are dropped, mirroring the reference's log-and-skip on bad rows.
    Distributed text-splitting — a 10^9-line label file reads in
    parallel like any other source."""
    schema = StructType(
        [StructField("url", StringType()), StructField("label", StringType())]
    )
    df = spark.read.csv(path, sep="\t", schema=schema, mode="DROPMALFORMED")
    return df.filter(F.col("url").isNotNull() & F.col("label").isNotNull())


def latest_crawl(df: DataFrame) -> DataFrame:
    """Recrawl dedup: keep exactly one row per url — the latest
    `warc_ts`, ties broken by the longer (then lexicographically
    larger) html payload so the choice is deterministic under any
    partitioning. One shuffle on url; the streaming twin is
    streaming/dedup.py with first-seen semantics."""
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(
        F.desc("warc_ts"), F.desc(F.octet_length("html")), F.desc(F.md5("html"))
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
