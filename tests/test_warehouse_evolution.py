"""Schema evolution (Iceberg id-based column mapping): add/rename/drop
are metadata-only commits; reads map every file's schema version onto
the current schema by FIELD ID — no data rewrite, time travel keeps the
old shape, and composition with merge-on-read deletes stays correct."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from paddleocr_spark.sources import warehouse as W


def _pages(spark, urls, lang="en"):
    ts = dt.datetime(2026, 3, 1, 12, 0, 0)
    return spark.createDataFrame(
        [(u, ts, b"<p>x</p>", f"text {u}", lang) for u in urls],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


@pytest.fixture()
def tbl(spark, tmp_path):
    t = str(tmp_path / "tbl")
    W.append(_pages(spark, [f"https://a.example/{i}" for i in range(6)]), t)
    return t


def test_add_column_reads_null_for_old_files(spark, tbl):
    s_before = W.current_snapshot_id(tbl)
    W.add_column(spark, tbl, "quality", "double")
    df = W.read_table(spark, tbl)
    assert "quality" in df.columns
    assert df.filter(F.col("quality").isNotNull()).count() == 0
    assert df.count() == 6
    # new appends carry values; old rows stay NULL
    new = _pages(spark, ["https://a.example/new"]).withColumn(
        "quality", F.lit(0.9)
    )
    W.append(new, tbl)
    got = {r["url"]: r["quality"] for r in W.read_table(spark, tbl).collect()}
    assert got["https://a.example/new"] == 0.9
    assert sum(1 for v in got.values() if v is None) == 6
    # time travel to the pre-evolution snapshot: old shape, no column
    old = W.read_table(spark, tbl, snapshot_id=s_before)
    assert "quality" not in old.columns and old.count() == 6


def test_rename_column_maps_old_files_by_field_id(spark, tbl):
    W.rename_column(spark, tbl, "lang", "language")
    df = W.read_table(spark, tbl)
    assert "language" in df.columns and "lang" not in df.columns
    assert df.filter(F.col("language") == "en").count() == 6
    # appends under the new name coexist with old files
    W.append(
        _pages(spark, ["https://b.example/1"], lang="de").withColumnRenamed(
            "lang", "language"
        ),
        tbl,
        ts_col="warc_ts",
    )
    counts = {
        r["language"]: r["n"]
        for r in W.read_table(spark, tbl)
        .groupBy("language").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"en": 6, "de": 1}


def test_drop_column_projects_away_everywhere(spark, tbl):
    W.drop_column(spark, tbl, "html")
    df = W.read_table(spark, tbl)
    assert "html" not in df.columns and df.count() == 6


def test_readd_dropped_name_does_not_resurrect_data(spark, tbl):
    """Field ids are never reused: drop lang, re-add a column named
    lang — old files' lang BYTES must not reappear under the new id."""
    W.drop_column(spark, tbl, "lang")
    W.add_column(spark, tbl, "lang", "string")
    df = W.read_table(spark, tbl)
    assert df.filter(F.col("lang").isNotNull()).count() == 0


def test_rename_composes_with_equality_deletes(spark, tbl):
    victim = "https://a.example/0"
    W.delete_where(spark, tbl, [victim])
    # renaming the delete-key column with a live delete is refused
    with pytest.raises(ValueError):
        W.rename_column(spark, tbl, "url", "uri")
    # renaming an unrelated column composes with merge-on-read
    W.rename_column(spark, tbl, "text", "body")
    df = W.read_table(spark, tbl)
    assert df.count() == 5
    assert df.filter(F.col("url") == victim).count() == 0
    assert df.filter(F.col("body").startswith("text ")).count() == 5


def test_layout_columns_are_protected(spark, tbl):
    with pytest.raises(ValueError):
        W.rename_column(spark, tbl, "url", "uri")
    with pytest.raises(ValueError):
        W.drop_column(spark, tbl, "warc_ts")


def test_compact_materializes_current_schema(spark, tbl):
    W.rename_column(spark, tbl, "lang", "language")
    W.add_column(spark, tbl, "quality", "double")
    W.compact(spark, tbl)
    df = W.read_table(spark, tbl)
    assert df.count() == 6
    assert {"language", "quality"} <= set(df.columns)
    # post-compact files ARE the current schema: a direct footer read
    # of any live file shows the new names
    m = W._load_manifest(tbl, W.current_snapshot_id(tbl))
    raw = spark.read.parquet(
        os.path.join(W._data_dir(tbl), m["files"][0])
    )
    assert "language" in raw.columns and "lang" not in raw.columns


def test_incremental_reads_under_window_end_schema(spark, tbl):
    s0 = W.current_snapshot_id(tbl)
    W.rename_column(spark, tbl, "lang", "language")
    W.append(
        _pages(spark, ["https://c.example/1"], lang="fr").withColumnRenamed(
            "lang", "language"
        ),
        tbl,
    )
    inc = W.read_incremental(spark, tbl, s0)
    assert inc.count() == 1
    assert inc.first()["language"] == "fr"
    # CDC across an evolve commit is refused with a clear error
    W.delete_where(spark, tbl, ["https://a.example/1"])
    with pytest.raises(ValueError):
        W.read_changes(spark, tbl, s0)


def test_stats_skipping_stays_safe_after_rename(spark, tbl):
    """File stats were recorded under the OLD name; pruning on the new
    name finds no stats for old files and keeps them — skipping stays
    an optimization, never a correctness decision."""
    W.rename_column(spark, tbl, "lang", "language")
    df = W.read_table(spark, tbl, prune_stats=("language", "aa", "zz"))
    assert df.count() == 6
