"""Hostile-input edges in the tokenizer's table branch, chunk-span
offsets, the degenerate score denominator, and the serving per-page
error contract (round-5 review findings, each verified by execution
before the fix)."""

from __future__ import annotations

import base64
import json
import urllib.request

from paddleocr_spark.config import PipelineConfig
from paddleocr_spark.core.oracle import block_score, extract_page
from paddleocr_spark.core.tokenizer import tokenize_page


def _table_block(html: bytes):
    blocks = [b for b in tokenize_page(html, PipelineConfig()) if b.tag == "table"]
    assert len(blocks) == 1
    return blocks[0]


def test_table_with_stray_span_and_no_cells_does_not_crash():
    """A <table> holding a data-bbox span but zero matchable cells used
    to kill the whole Arrow batch (min() over an empty sequence)."""
    b = _table_block(b'<table><span data-bbox="1,2,3,4">x</span></table>')
    assert b.text.startswith("<table>")


def test_plain_table_without_bboxes_keeps_cell_text():
    """Cells without data-bbox defaulted to (0,0,0,0), failed the
    y-filter, and the assembled html silently lost ALL cell text while
    text_len still counted it; bbox-less tables now self-match 1:1."""
    b = _table_block(b"<table><tr><td>Hello</td><td>World</td></tr></table>")
    assert "Hello" in b.text and "World" in b.text
    assert b.text_len == len("Hello") + len("World")


def test_tr_with_attributes_is_parsed():
    """<tr class=...> rows were silently dropped with all their cells
    (the tr regex accepted no attributes while td's did)."""
    b = _table_block(
        b'<table><tr class="r"><td data-bbox="0,0,10,10">Hi</td></tr></table>'
    )
    assert "Hi" in b.text and b.text_len == 2


def test_span_inside_td_not_double_counted():
    """A bbox span INSIDE a <td> is that cell's text; scanning it again
    as a stray OCR fragment duplicated the text and inflated
    text_len."""
    b = _table_block(
        b'<table><tr><td data-bbox="0,0,10,10">'
        b'<span data-bbox="1,1,9,9">X</span></td></tr></table>'
    )
    assert b.text.count("X") == 1 and b.text_len == 1


def test_chunk_spans_map_back_to_raw_offsets():
    """Chunk cuts are computed in tag-stripped coordinates; the emitted
    start/end must still index the DECODED DOCUMENT, so a tag inside a
    giant block must not shift later chunks onto wrong ranges."""
    cfg = PipelineConfig()
    body = b"<b>aaaa</b> " + b"b" * (cfg.chunk_limit + 50)
    html = b"<p>" + body + b"</p>"
    doc = html.decode("utf-8")
    blocks = [b for b in tokenize_page(html, cfg) if b.parent_id is not None]
    assert len(blocks) >= 2
    for b in blocks:
        raw = doc[b.start : b.end]
        # the chunk's visible text IS the span's visible text
        import re

        vis = re.sub(r"<[^>]+>", "", raw)
        assert " ".join(vis.split()) == b.text


def test_block_score_zero_denominator_drops_not_crashes():
    """score_k=0 + an empty block: Spark's division yields NULL and the
    filter drops the block; the Python realization must do the same
    via -inf, never ZeroDivisionError (it kills the fused batch)."""
    assert block_score(0, 0, 0) == float("-inf")
    cfg = PipelineConfig(score_k=0)
    res = extract_page("u", b"<p></p><p>real text here</p>", "en", cfg)
    assert "real text here" in res.extracted_text


def test_serving_non_dict_page_is_per_page_error(serving_server=None):
    """A truthy non-dict 'pages' entry must produce a per-page error
    row, not crash the error handler itself into a whole-batch 500."""
    from paddleocr_spark.serving.server import start_server

    server = start_server(port=0)
    try:
        host, port = server.server_address
        good = base64.b64encode(b"<p>fine content here</p>").decode()
        body = json.dumps(
            {"pages": ["notadict", {"url": "u1", "html": good}]}
        ).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/predict/extract_system",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
            out = json.loads(resp.read())
        assert "error" in out["results"][0]
        assert out["results"][1]["url"] == "u1"
        assert "error" not in out["results"][1]
    finally:
        server.shutdown()
