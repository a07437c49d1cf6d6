"""Opt-in prefilters (bin/inv/alpha, paddleocr.py:717-723 analog) and
the page_num layout-section limit (paddleocr.py:710-713 analog)."""

from __future__ import annotations

from paddleocr_spark.config import DEFAULT, PipelineConfig
from paddleocr_spark.core.oracle import extract_page
from paddleocr_spark.core.tokenizer import tokenize_page
from paddleocr_spark.operators.extract import extract


def test_alpha_strips_comments():
    # commented-OUT markup leaks its inner text through the plain tag
    # stripper (the comment close survives `<[^>]+>`); the alpha
    # prefilter removes the whole invisible layer first
    html = b"<p>visible words here<!-- <a href=x>dead link text</a> --></p>"
    off = tokenize_page(html, DEFAULT)
    on = tokenize_page(html, PipelineConfig(prefilter_alpha=True))
    assert "dead link text" in off[0].text
    assert "dead link text" not in on[0].text
    assert off[0].text_len > on[0].text_len


def test_inv_drops_struck_content():
    html = b"<p>kept words stay here <del>obsolete struck text</del> fine</p>"
    off = tokenize_page(html, DEFAULT)
    on = tokenize_page(html, PipelineConfig(prefilter_inv=True))
    assert "obsolete" in off[0].text and "obsolete" not in on[0].text


def test_bin_collapses_whitespace_runs():
    html = b"<p>words    separated\t\tby   runs of whitespace padding</p>"
    off = tokenize_page(html, DEFAULT)
    on = tokenize_page(html, PipelineConfig(prefilter_bin=True))
    assert on[0].text_len < off[0].text_len  # raw count shrinks
    assert on[0].text == off[0].text        # normalized text unchanged


def test_page_num_limits_layout_sections():
    sec = (
        '<div class="layout" data-pagew="1000">'
        '<p data-bbox="10,{y},400,{y2}">layout page {i} paragraph body text</p>'
        "</div>"
    )
    html = "".join(
        sec.format(i=i, y=10 + 100 * i, y2=60 + 100 * i) for i in range(3)
    ).encode()
    all_pages = tokenize_page(html, DEFAULT)
    two = tokenize_page(html, PipelineConfig(page_num=2))
    assert len(all_pages) == 3 and len(two) == 2
    assert "page 2" not in " ".join(b.text for b in two)


def test_prefiltered_spark_matches_oracle(spark):
    cfg = PipelineConfig(
        prefilter_alpha=True, prefilter_inv=True, prefilter_bin=True, page_num=1
    )
    pages = [
        ("p1", b"<p>body text<!-- c --> with   <del>dead</del> runs kept</p>", "en"),
        (
            "p2",
            (
                '<div class="layout" data-pagew="1000">'
                '<p data-bbox="10,10,400,60">first layout page body</p></div>'
                '<div class="layout" data-pagew="1000">'
                '<p data-bbox="10,110,400,160">second layout page body</p></div>'
            ).encode(),
            "en",
        ),
    ]
    df = spark.createDataFrame(
        [(u, bytearray(h), l) for u, h, l in pages],
        "url string, html binary, lang string",
    )
    got = {r["url"]: r["extracted_text"] for r in extract(df, cfg).collect()}
    want = {u: extract_page(u, h, l, cfg).extracted_text for u, h, l in pages}
    assert got == want
    assert "second layout page" not in got["p2"]
