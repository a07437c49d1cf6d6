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


def test_sorted_layout_boxes_degenerate_box_never_drops_content():
    """x1 >= w/2 >= x2 (degenerate/inverted bbox) fell through BOTH
    last-element branches in the reference port, silently dropping the
    box and every accumulated column; the completed branch keeps all
    regions (documented deviation from recovery_to_doc.py:120-132)."""
    from paddleocr_spark.core.geometry import sorted_layout_boxes

    order, labels = sorted_layout_boxes(
        [(0, 0, 2, 5), (0, 6, 2, 11), (5, 20, 5, 25)], 10
    )
    assert sorted(order) == [0, 1, 2] and len(labels) == 3


def test_normalize_ws_strips_only_ws_class():
    """Python .strip() eats ALL Unicode whitespace while the Spark
    mirror trim(regexp_replace(s, WS_CLASS+'+', ' ')) does not — NBSP
    must survive identically on the fast AND slow paths."""
    from paddleocr_spark.core.text import normalize_ws

    assert normalize_ws("a\xa0 ") == "a\xa0"
    # fast path (no WS trigger) and slow path (double space) agree
    assert normalize_ws("\xa0a b") == "\xa0a b"
    assert normalize_ws("\xa0a  b") == "\xa0a b"


def test_ctc_probsless_conf_is_full_length_ones():
    """rec_postprocess.py:160 takes [1] * len(selection) — the FULL
    input length — so an all-blank input decodes ('', 1.0) in the
    probs-less mode, not ('', 0.0); a truly empty input stays 0.0."""
    from paddleocr_spark.core.text import ctc_greedy_decode

    vocab = ["_", "a"]
    assert ctc_greedy_decode([0, 0, 0], None, vocab) == ("", 1.0)
    assert ctc_greedy_decode([], None, vocab) == ("", 0.0)


def test_cjk_bound_covers_post_unicode1_ideographs():
    """The reference bound is U+4E00..U+9FFF (rec_postprocess.py:94);
    a ..U+9FA5 bound misclassifies ~90 real CJK ideographs as 'sp'."""
    from paddleocr_spark.core.text import get_word_info

    assert get_word_info("鿐") == [("鿐", "cn", 0, 1)]
