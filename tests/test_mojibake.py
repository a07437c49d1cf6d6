"""mojibake_fix (queries_web.py): the double-encoding repair must fix
injected Latin-1 mojibake back to the intended UTF-8 bytes via the real
re-encode/re-decode round trip, and must NEVER touch genuinely-accented
text (the gate's whole point — a blind round-trip would shred it)."""

from __future__ import annotations

from paddleocr_spark.queries_web import mojibake_fix_over


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    return {r["source"]: r.asDict() for r in mojibake_fix_over(df).collect()}


def test_mojibake_doc_repaired_to_intended_bytes(spark):
    # doc_id 0 -> %3==0 -> mojibake injected on value/table/key
    out = _run(spark, [(0, "m", "value table key")])["m"]
    assert out["n_mojibake"] == 1
    assert out["n_fix_ok"] == 1  # decode(encode(...,'ISO-8859-1'),'UTF-8') restored it
    assert out["chars_shrunk"] == 3  # three 2-char digraphs -> three 1-char accents


def test_genuine_accents_pass_the_gate_untouched(spark):
    # doc_id 7 -> %3!=0, %7==0 -> genuine 'kéy'; repair must be a no-op
    out = _run(spark, [(7, "g", "key data")])["g"]
    assert out["n_mojibake"] == 0
    assert out["n_fix_ok"] == 1
    assert out["chars_shrunk"] == 0


def test_clean_ascii_doc_is_identity(spark):
    out = _run(spark, [(1, "c", "plain data row")])["c"]
    assert out["n_mojibake"] == 0
    assert out["n_fix_ok"] == 1
    assert out["chars_shrunk"] == 0
