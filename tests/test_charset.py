"""Declared-charset decoding (core/tokenizer.decode_page): the opt-in
byte->text dispatch for Latin-1-family pages — a real Common Crawl
concern (legacy hosts still serve iso-8859-1 / windows-1252). The
default path must stay byte-identical with the flag on for UTF-8
corpora (the golden contract), and the sniff must never crash on
garbage declarations."""

from __future__ import annotations

from paddleocr_spark.config import DEFAULT, PipelineConfig
from paddleocr_spark.core.oracle import extract_page
from paddleocr_spark.core.tokenizer import decode_page, tokenize_page

SNIFF = PipelineConfig(charset_sniff=True)


def _page(meta: str, body_bytes: bytes) -> bytes:
    return (
        f'<html><head><meta charset="{meta}"></head><body><p>'.encode("ascii")
        + body_bytes
        + b"</p></body></html>"
    )


def test_latin1_declaration_decodes_accents():
    # 0xE9 is 'é' in iso-8859-1 and an invalid utf-8 continuation
    html = _page("iso-8859-1", b"caf\xe9 words body here text")
    off = tokenize_page(html, DEFAULT)
    on = tokenize_page(html, SNIFF)
    assert "caf�" in off[0].text  # default: replacement char
    assert "café" in on[0].text        # sniffed: real accent


def test_cp1252_smart_quotes_not_latin1_controls():
    # 0x93/0x94 are curly quotes in cp1252 but C1 controls in latin-1
    html = _page("windows-1252", b"he said \x93quoted words\x94 today")
    on = tokenize_page(html, SNIFF)
    assert "“quoted words”" in on[0].text


def test_utf8_pages_identical_with_flag_on():
    # the golden contract: a UTF-8 (or undeclared) corpus extracts
    # byte-identically whether the sniff is on or off
    for html in (
        _page("utf-8", "réal utf-8 café body".encode("utf-8")),
        b"<p>no declaration at all plain body</p>",
        _page("utf-8", b"ascii only body words"),
    ):
        a = extract_page("u", html, "en", DEFAULT).extracted_text
        b = extract_page("u", html, "en", SNIFF).extracted_text
        assert a == b


def test_garbage_declarations_fall_back_to_utf8():
    for meta in ("klingon-9", "x" * 31, "", "utf-99"):
        html = _page(meta, b"plain ascii body text words")
        assert "plain ascii body" in tokenize_page(html, SNIFF)[0].text


def test_declaration_outside_first_1k_ignored():
    pad = b"<!-- " + b"x" * 1100 + b" -->"
    html = b"<html><head>" + pad + \
        b'<meta charset="iso-8859-1"></head><body><p>caf\xe9 body</p></body></html>'
    # declaration past the sniff window: default utf-8 path
    assert decode_page(html, SNIFF) == html.decode("utf-8", errors="replace")


def test_charset_spark_matches_oracle(spark):
    """The sniffed decode runs identically in the distributed Arrow
    stage and the pure-Python oracle (the shared-core guarantee)."""
    from paddleocr_spark.operators.extract import extract

    pages = [
        ("l1", _page("iso-8859-1", b"caf\xe9 latin body words text"), "en"),
        ("w1", _page("windows-1252", b"said \x93curly\x94 words body"), "en"),
        ("u1", _page("utf-8", "plain utf-8 café body".encode()), "en"),
    ]
    df = spark.createDataFrame(
        [(u, bytearray(h), l) for u, h, l in pages],
        "url string, html binary, lang string",
    )
    got = {r["url"]: r["extracted_text"] for r in extract(df, SNIFF).collect()}
    want = {u: extract_page(u, h, l, SNIFF).extracted_text for u, h, l in pages}
    assert got == want
    assert "café" in got["l1"] and "“curly”" in got["w1"]


def test_form_accept_charset_and_urls_do_not_trigger_sniff():
    """Legacy form markup (accept-charset=) and charset= inside a URL
    are NOT encoding declarations: a UTF-8 page carrying them must keep
    the utf-8 decode path (the review-caught corruption mode)."""
    utf8_body = "café body".encode("utf-8")
    for prefix in (
        b'<form accept-charset="iso-8859-1">',
        b'<a href="/convert?charset=latin-1">x</a>',
    ):
        html = prefix + utf8_body
        assert decode_page(html, SNIFF) == html.decode("utf-8", errors="replace")
        assert "café" in decode_page(html, SNIFF)


def test_meta_http_equiv_content_type_still_sniffs():
    """The other standard declaration form — <meta http-equiv
    Content-Type content="...charset=..."> — dispatches too."""
    html = (
        b'<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'
        b"caf\xe9 body"
    )
    assert "café" in decode_page(html, SNIFF)
