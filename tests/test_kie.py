"""KIE analog parity: the pure-Python linker (core/kie.py) and the
native window form (operators/kie_stage.py) must agree pair-for-pair
on the real fixture pages."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from paddleocr_spark.core.kie import entity_label, link_key_values
from paddleocr_spark.core.tokenizer import tokenize_page
from paddleocr_spark.operators.detect_stage import with_blocks
from paddleocr_spark.operators.kie_stage import link_key_values_df


def test_entity_label_rules():
    assert entity_label("h2", "Intro") == "key"
    assert entity_label("p", "Name:") == "key"          # short trailing colon
    assert entity_label("p", "x" * 61 + ":") == "value"  # too long for a key
    assert entity_label("p", "body text") == "value"
    assert entity_label("div", "") == "other"


def test_link_prefers_latest_key():
    class B:
        def __init__(self, bid, tag, text):
            self.block_id, self.tag, self.text = bid, tag, text

    blocks = [
        B(0, "p", "pre-key value"),
        B(1, "h1", "Title"),
        B(2, "p", "alpha"),
        B(3, "h2", "Section"),
        B(4, "p", "beta"),
        B(5, "p", "gamma"),
    ]
    assert link_key_values(blocks) == [(0, None), (2, 1), (4, 3), (5, 3)]


def test_window_form_matches_core_on_fixture_pages(spark, smoke_dir):
    pages_path = os.path.join(smoke_dir, "pages.parquet")

    # expected: pure-Python linker over per-page tokenize
    tbl = pq.read_table(pages_path, columns=["url", "html"])
    expected = set()
    for url, html in zip(tbl.column("url").to_pylist(), tbl.column("html").to_pylist()):
        for vid, kid in link_key_values(tokenize_page(bytes(html))):
            expected.add((url, vid, kid))
    assert expected, "fixture produced no KIE pairs"
    assert any(k is not None for (_, _, k) in expected), "no keyed pairs in fixture"

    # actual: engine blocks -> exploded -> native window linker
    pages = spark.read.parquet(pages_path)
    blocks = (
        with_blocks(pages)
        .select("url", F.explode("blocks").alias("b"))
        .select("url", F.col("b.block_id").alias("block_id"),
                F.col("b.tag").alias("tag"), F.col("b.text").alias("text"))
    )
    got = {
        (r["url"], r["value_block_id"], r["key_block_id"])
        for r in link_key_values_df(blocks).collect()
    }
    assert got == expected
