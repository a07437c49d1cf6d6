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


def test_links_follow_layout_reading_order_not_y_order(spark):
    """The recovery_to_doc.py:106-152 subtlety reaching the link
    structure: in a two-column page, reading order is the column-aware
    layout sort, NOT the naive (y, x) sort — and the KIE links must
    follow it. Left column: key then two values; right column: key
    then two values, vertically interleaved so that the naive y-order
    would link the left column's first value to the RIGHT column's
    key. Assigning block_id from sorted_layout_boxes and running the
    native window linker over a physically permuted row set must
    recover each value's own-column key."""
    from paddleocr_spark.core.geometry import sorted_layout_boxes

    w = 1000
    # (box, tag, text); y-interleaved across the two columns
    regions = [
        ((50, 100, 400, 130), "h2", "Left Section"),    # L key   y=100
        ((550, 150, 900, 180), "h2", "Right Section"),  # R key   y=150
        ((50, 200, 400, 230), "p", "left value one"),   # L val   y=200
        ((550, 250, 900, 280), "p", "right value one"), # R val   y=250
        ((50, 300, 400, 330), "p", "left value two"),   # L val   y=300
        ((550, 350, 900, 380), "p", "right value two"), # R val   y=350
    ]
    order, _labels = sorted_layout_boxes([r[0] for r in regions], w)
    # the layout sort puts the whole left column before the right one
    assert [regions[k][2] for k in order] == [
        "Left Section", "left value one", "left value two",
        "Right Section", "right value one", "right value two",
    ]

    class B:
        def __init__(self, bid, tag, text):
            self.block_id, self.tag, self.text = bid, tag, text

    ordered = [B(i, regions[k][1], regions[k][2]) for i, k in enumerate(order)]
    expected = link_key_values(ordered)
    texts = {b.block_id: b.text for b in ordered}
    # every value is governed by its OWN column's key
    assert {(texts[v], texts[k]) for v, k in expected} == {
        ("left value one", "Left Section"),
        ("left value two", "Left Section"),
        ("right value one", "Right Section"),
        ("right value two", "Right Section"),
    }
    # ...whereas ids assigned from the naive (y, x) order would have
    # mislinked the left column's first value to the right key —
    # the case is genuinely subtle, not vacuous
    naive = sorted(range(len(regions)), key=lambda k: (regions[k][0][1], regions[k][0][0]))
    naive_blocks = [B(i, regions[k][1], regions[k][2]) for i, k in enumerate(naive)]
    ntexts = {b.block_id: b.text for b in naive_blocks}
    naive_pairs = {(ntexts[v], ntexts[k]) for v, k in link_key_values(naive_blocks)}
    assert ("left value one", "Right Section") in naive_pairs

    # native window form over a PERMUTED physical row order agrees
    rows = [("doc", b.block_id, b.tag, b.text) for b in ordered]
    rows = rows[::-1]  # reversed arrival order
    df = (
        spark.createDataFrame(rows, "url string, block_id int, tag string, text string")
        .repartition(4)
        .sortWithinPartitions(F.md5(F.concat_ws("|", "url", "block_id")))
    )
    got = {
        (r["value_block_id"], r["key_block_id"])
        for r in link_key_values_df(df).collect()
    }
    assert got == set(expected)


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
