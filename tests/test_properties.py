"""Property-based tests (hypothesis) over the pure extraction core.

The reference has no randomized testing (SURVEY.md §5); we add it for
the discrete operators whose invariants must hold on ALL inputs, since
they feed the byte-identical gate: CTC collapse invariances, reading-
order permutation, merge fixpoint, NMS pairwise suppression, span
bookkeeping, and tokenizer crash-freedom on arbitrary bytes.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from paddleocr_spark.core.geometry import (
    hard_nms,
    iou_xyxy,
    merge_fragmented,
    sorted_boxes,
)
from paddleocr_spark.core.text import (
    ctc_greedy_decode,
    get_word_info,
    normalize_ws,
    pred_reverse,
)
from paddleocr_spark.core.tokenizer import tokenize_page

coord = st.integers(min_value=0, max_value=400)
boxes_st = st.lists(
    st.tuples(coord, coord, coord, coord).map(
        lambda t: (min(t[0], t[2]), min(t[1], t[3]), max(t[0], t[2]) + 1, max(t[1], t[3]) + 1)
    ),
    max_size=12,
)

VOCAB = ["", "a", "b", "c", "d"]  # index 0 = blank
ids_st = st.lists(st.integers(min_value=0, max_value=len(VOCAB) - 1), max_size=30)


# ---------------------------------------------------------------- CTC decode

@given(ids_st)
def test_ctc_blank_insertion_makes_tokens_verbatim(ids):
    """The reference collapses adjacent repeats FIRST and drops blanks
    AFTER (rec_postprocess.py:148-152) — so with a blank between every
    token no collapse can fire and every non-blank token survives
    verbatim. (Distinguishes these semantics from textbook CTC, where
    repeat-collapse happens per-frame before blank removal too but a
    repeated label separated by blank also survives — the two agree
    here, and differ on adjacent repeats without blanks.)"""
    spaced = []
    for t in ids:
        spaced.extend([0, t])
    spaced.append(0)
    text2, _ = ctc_greedy_decode(spaced, None, VOCAB)
    assert text2 == "".join(VOCAB[t] for t in ids if t != 0)


@given(ids_st)
def test_ctc_duplication_invariant(ids):
    """Doubling every token (classic CTC stutter) never changes the
    decoded text under collapse-then-drop-blank semantics."""
    doubled = [t for t in ids for _ in range(2)]
    assert (
        ctc_greedy_decode(doubled, None, VOCAB)[0]
        == ctc_greedy_decode(ids, None, VOCAB)[0]
    )


@given(ids_st)
def test_ctc_no_adjacent_repeats_no_blanks_is_verbatim(ids):
    """A stream with no blanks and no adjacent repeats decodes to the
    verbatim char join."""
    clean = [t for i, t in enumerate(ids) if t != 0 and (i == 0 or t != ids[i - 1])]
    # clean can still contain adjacent repeats after blank removal; drop them
    clean = [t for i, t in enumerate(clean) if i == 0 or t != clean[i - 1]]
    text, _ = ctc_greedy_decode(clean, None, VOCAB)
    assert text == "".join(VOCAB[t] for t in clean)


# ------------------------------------------------------------- reading order

@given(boxes_st)
def test_sorted_boxes_is_permutation(boxes):
    order = sorted_boxes(boxes)
    assert sorted(order) == list(range(len(boxes)))


@given(boxes_st)
def test_sorted_boxes_plain_sort_when_lines_far_apart(boxes):
    """If all y1 are pairwise >= 10 apart the bubble pass never fires:
    result is exactly the stable (y1, x1) sort."""
    spread = [(x1, 20 * i, x2, 20 * i + 5) for i, (x1, _, x2, _) in enumerate(boxes)]
    order = sorted_boxes(spread)
    expect = sorted(range(len(spread)), key=lambda k: (spread[k][1], spread[k][0]))
    assert order == expect


# ------------------------------------------------------------- merge fixpoint

@given(boxes_st)
def test_merge_fragmented_reaches_fixpoint(boxes):
    out = merge_fragmented(boxes)
    # membership partitions the input indices
    members = sorted(i for _, mem in out for i in mem)
    assert members == list(range(len(boxes)))
    # running the merge again on the merged boxes changes nothing
    again = merge_fragmented([b for b, _ in out])
    assert [b for b, _ in again] == [b for b, _ in out]


# ---------------------------------------------------------------------- NMS

@given(boxes_st.flatmap(lambda bs: st.tuples(
    st.just(bs),
    st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=len(bs), max_size=len(bs),
    ),
)))
def test_hard_nms_pairwise_suppression(args):
    boxes, scores = args
    kept = hard_nms(boxes, scores, iou_threshold=0.5)
    assert len(set(kept)) == len(kept)
    for a_i in range(len(kept)):
        for b_i in range(a_i + 1, len(kept)):
            assert iou_xyxy(boxes[kept[a_i]], boxes[kept[b_i]]) <= 0.5


# --------------------------------------------------------------- text spans

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)


@given(text_st)
def test_get_word_info_span_bookkeeping(text):
    """Spans ascend, never overlap, and each word IS the substring at
    its span (end exclusive)."""
    prev_end = 0
    for word, _state, start, end in get_word_info(text):
        assert start >= prev_end
        assert text[start:end] == word
        prev_end = end


@given(text_st)
def test_normalize_ws_idempotent(text):
    once = normalize_ws(text)
    assert normalize_ws(once) == once


@given(text_st)
def test_pred_reverse_involution_on_pure_latin(text):
    """On pure-Latin-run text the RTL reverse is the identity; on any
    text it preserves the multiset of characters."""
    out = pred_reverse(text)
    assert sorted(out) == sorted(text)


# ------------------------------------------------------------- tokenizer fuzz

@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=400))
def test_tokenizer_never_crashes_on_garbage(data):
    blocks = tokenize_page(data)
    assert isinstance(blocks, list)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=200))
def test_tokenizer_never_crashes_on_text_soup(s):
    blocks = tokenize_page(("<html><body>" + s).encode("utf-8", "replace"))
    for b in blocks:
        assert b.end >= b.start


# ------------------------------------------------- layout sort & table match

from paddleocr_spark.core.geometry import sorted_layout_boxes
from paddleocr_spark.core.table import filter_ocr_result, match_result


@given(boxes_st, st.integers(min_value=100, max_value=2000))
def test_sorted_layout_boxes_permutation_and_labels(boxes, page_w):
    order, labels = sorted_layout_boxes(boxes, page_w)
    assert sorted(order) == list(range(len(boxes)))
    assert len(labels) == len(boxes)
    assert set(labels) <= {"single", "double"}


@given(boxes_st, boxes_st)
def test_match_result_total_assignment(ocr_boxes, cell_boxes):
    """Every OCR box is assigned to exactly one valid cell (many-to-one
    allowed, matcher.py:77-101)."""
    if not cell_boxes:
        return
    m = match_result(ocr_boxes, cell_boxes)
    assigned = sorted(i for members in m.values() for i in members)
    assert assigned == list(range(len(ocr_boxes)))
    assert all(0 <= c < len(cell_boxes) for c in m)


@given(boxes_st, boxes_st)
def test_filter_ocr_drops_only_above_table(cell_boxes, ocr_boxes):
    texts = [f"t{i}" for i in range(len(ocr_boxes))]
    kept_boxes, kept_texts = filter_ocr_result(cell_boxes, ocr_boxes, texts)
    assert len(kept_boxes) == len(kept_texts)
    if cell_boxes:
        y1 = min(b[1] for b in cell_boxes)
        assert all(b[3] > y1 for b in kept_boxes)
        # nothing kept was altered, nothing below the line was dropped
        expect = [(b, t) for b, t in zip(ocr_boxes, texts) if b[3] > y1]
        assert kept_boxes == [b for b, _ in expect]
        assert kept_texts == [t for _, t in expect]
    else:
        assert kept_boxes == ocr_boxes


# --- WARC record codec: encode->parse identity on adversarial input ---

_url_st = st.text(
    alphabet=st.characters(blacklist_characters="\r\n", min_codepoint=33, max_codepoint=0x2FF),
    min_size=1, max_size=60,
)
_payload_st = st.binary(min_size=0, max_size=2000)


@given(st.lists(st.tuples(_url_st, _payload_st), min_size=0, max_size=8))
@settings(max_examples=60, deadline=None)
def test_warc_member_roundtrip_arbitrary_payloads(records):
    """Content-Length framing must survive payloads that CONTAIN the
    record separator (b'\\r\\n\\r\\n'), WARC magic, or header-shaped
    bytes — the cases a separator-scanning parser gets wrong."""
    import datetime as dt

    from paddleocr_spark.sources.warc import iter_warc_records, warc_record_bytes

    ts = dt.datetime(2024, 1, 2, 3, 4, 5, 250000, tzinfo=dt.timezone.utc)
    blob = b"".join(
        warc_record_bytes(u, ts, p + b"\r\n\r\nWARC/1.0\r\n") for u, p in records
    )
    got = list(iter_warc_records(blob))
    assert len(got) == len(records)
    for (u, p), (gu, gts, gp, off, ln) in zip(records, got):
        assert gu == u and gts == ts
        assert gp == p + b"\r\n\r\nWARC/1.0\r\n"
    # offsets tile the member exactly
    assert sum(g[4] for g in got) == len(blob)


@given(st.lists(st.tuples(_url_st, _payload_st), min_size=1, max_size=5),
       st.integers(min_value=1, max_value=12))
@settings(max_examples=60, deadline=None)
def test_warc_gz_truncation_never_yields_garbage(records, cut):
    """Per-record-gzip members: truncating anywhere drops whole tail
    records, never yields corrupted payloads or raises."""
    import datetime as dt
    import gzip

    from paddleocr_spark.sources.warc import iter_warc_gz_records, warc_record_bytes

    ts = dt.datetime(2024, 1, 2, 3, 4, 5, tzinfo=dt.timezone.utc)
    blob = b"".join(
        gzip.compress(warc_record_bytes(u, ts, p), mtime=0) for u, p in records
    )
    got_full = list(iter_warc_gz_records(blob))
    assert [g[0] for g in got_full] == [u for u, _ in records]
    got_cut = list(iter_warc_gz_records(blob[:-cut]))
    assert len(got_cut) < len(got_full)
    for (gu, _, gp, _, _), (u, p) in zip(got_cut, records):
        assert gu == u and gp == p


# ---------------------------------------------------------------------------
# The tokenizer fast paths are EXACT: property-check each against its
# original single-regex definition over adversarial ws/tag soup.
# ---------------------------------------------------------------------------

_ws_soup = st.text(
    alphabet=" \t\n\r\f\x0b" + "abcZ9.:<>/=\"'é中", min_size=0, max_size=80
)


@given(_ws_soup)
def test_normalize_ws_fast_path_is_exact(s):
    from paddleocr_spark.core.text import _WS_RE, normalize_ws

    assert normalize_ws(s) == _WS_RE.sub(" ", s).strip()


@given(_ws_soup)
def test_visible_fast_path_is_exact(s):
    from paddleocr_spark.core.tokenizer import _TAG_RE, _visible

    assert _visible(s) == _TAG_RE.sub("", s)


@given(
    st.lists(
        st.tuples(_ws_soup, st.booleans()),
        max_size=6,
    )
)
def test_link_len_fast_path_is_exact(parts):
    from paddleocr_spark.core.tokenizer import _A_RE, _TAG_RE, _link_len

    inner = "".join(
        (f'<a href="#">{t}</a>' if is_a else t) for t, is_a in parts
    )
    want = sum(len(_TAG_RE.sub("", m)) for m in _A_RE.findall(inner))
    assert _link_len(inner) == want


# ---------------------------------------------------------------------------
# ctc_collapse_blocks: the run-scan rewrite must equal the original
# flush-per-boundary algorithm on ALL block sequences (the same
# equivalence-locking discipline as the tokenizer fast paths above).
# ---------------------------------------------------------------------------

from dataclasses import dataclass as _dc

from paddleocr_spark.core.text import Span, ctc_collapse_blocks


@_dc
class _Blk:
    block_id: int
    start: int
    end: int
    text: str
    score: float
    parent_id: int


def _ctc_collapse_reference(blocks):
    """The pre-rewrite flush-based implementation, verbatim semantics
    (kept here as the property-test oracle)."""
    spans, run = [], []

    def flush():
        if not run:
            return
        first = run[0]
        if first.text == "":
            run.clear()
            return
        total = 0.0
        end = first.end
        for b in run:
            total += b.score
            if b.end > end:
                end = b.end
        spans.append(Span(first.block_id, first.start, end,
                          total / len(run), first.text, first.parent_id))
        run.clear()

    prev_text = None
    for b in blocks:
        if prev_text is not None and b.text == prev_text:
            run.append(b)
        else:
            flush()
            run.append(b)
        prev_text = b.text
    flush()
    return spans


_blk_st = st.lists(
    st.builds(
        _Blk,
        block_id=st.integers(0, 50),
        start=st.integers(0, 1000),
        end=st.integers(0, 1000),
        # tiny alphabet + '' so adjacent repeats and blank runs are common
        text=st.sampled_from(["", "a", "b", "ab", "c"]),
        score=st.floats(min_value=0.0, max_value=1.0,
                        allow_nan=False, allow_infinity=False),
        parent_id=st.integers(0, 50),
    ),
    max_size=40,
)


@given(_blk_st)
@settings(max_examples=300, deadline=None)
def test_ctc_collapse_rewrite_equals_flush_original(blocks):
    assert ctc_collapse_blocks(blocks) == _ctc_collapse_reference(blocks)


# --- media header parsers: total functions over arbitrary bytes -----------
#
# At corpus scale the decode stage sees arbitrary hostile web bytes; the
# parsers must be total — return a well-formed tuple or None, never raise,
# never hang — including on bytes that start with a valid magic number and
# then lie about sizes/offsets.

_raw_bytes_st = st.binary(max_size=512)
_magic_st = st.sampled_from(
    [b"\x89PNG\r\n\x1a\n", b"GIF89a", b"\xff\xd8", b"BM",
     b"RIFF", b"fLaC", b"ID3", b"\xff\xfb",
     b"\x00\x00\x00\x10ftyp", b"RIFFxxxxWAVE", b"RIFFxxxxWEBP"]
).flatmap(lambda m: st.binary(max_size=256).map(lambda t: m + t))


@given(st.one_of(_raw_bytes_st, _magic_st))
@settings(max_examples=300, deadline=None)
def test_media_header_parsers_are_total(b):
    from paddleocr_spark.functions.multimodal import (
        decode_av_header,
        decode_image_header,
    )

    img = decode_image_header(b)
    assert img is None or (
        len(img) == 4 and img[0] > 0 and img[1] > 0 and 1 <= img[2] <= 4
    )
    av = decode_av_header(b)
    if av is not None:
        kind, w, h, ch, rate, fmt = av
        assert kind in ("audio", "video", "image")
        assert fmt in ("wav", "flac", "mp3", "mp4", "webp")
        if kind == "audio":
            assert w is None and h is None and rate and rate > 0
        else:
            assert w and w > 0 and h and h > 0 and rate is None


# --- BPE space-doubled string-replace merge vs the token-walk original ---

def _bpe_merge_token_walk(sym: str, lft: str, rgt: str) -> str:
    """Sennrich et al.'s merge step verbatim: walk the token list,
    greedy left-to-right non-overlapping."""
    toks = sym.split(" ")
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == lft and toks[i + 1] == rgt:
            out.append(lft + rgt)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return " ".join(out)


def _bpe_merge_string(sym: str, lft: str, rgt: str) -> str:
    """The codegen form queries_curation._bpe_apply evaluates JVM-side,
    replicated in Python: space-double, literal replace, collapse."""
    import re

    work = " " + sym.replace(" ", "  ") + " "
    work = work.replace(f" {lft}  {rgt} ", f" {lft}{rgt} ")
    return re.sub(" +", " ", work).strip()


@given(
    st.lists(st.sampled_from(["a", "b", "ab", "ba", "aa"]), min_size=1, max_size=12),
    st.sampled_from(["a", "b", "ab", "ba", "aa"]),
    st.sampled_from(["a", "b", "ab", "ba", "aa"]),
)
@settings(max_examples=400, deadline=None)
def test_bpe_string_merge_equals_token_walk(toks, lft, rgt):
    """Adjacent runs, pairs sharing a boundary, symbols that are
    substrings of each other — the string form must merge exactly the
    occurrences the reference token walk merges."""
    sym = " ".join(toks)
    assert _bpe_merge_string(sym, lft, rgt) == _bpe_merge_token_walk(sym, lft, rgt)


# --------------------------------------------------------------- mojibake

# any latin-1-encodable text (the domain where the re-decode round
# trip is defined): printable latin-1 minus the C0/C1 controls
_latin1_st = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0xFF, exclude_characters="\x7f"
    ).filter(lambda c: not 0x80 <= ord(c) <= 0x9F),
    max_size=60,
)


@given(_latin1_st)
def test_mojibake_roundtrip_recovers_any_latin1_text(s):
    """For ANY latin-1 text s: reading s's UTF-8 bytes as latin-1
    (the corruption) then applying the repair round trip
    decode(encode(.,'ISO-8859-1'),'UTF-8') recovers s exactly —
    the algebraic identity mojibake_fix relies on, checked in pure
    Python over the same byte semantics the JVM codec uses."""
    corrupted = s.encode("utf-8").decode("latin-1")
    repaired = corrupted.encode("latin-1").decode("utf-8")
    assert repaired == s


@given(_latin1_st)
def test_charset_decode_latin1_total(s):
    """decode_page on a declared latin-1 page recovers the text for
    any latin-1 payload (total function, no crash)."""
    from paddleocr_spark.config import PipelineConfig
    from paddleocr_spark.core.tokenizer import decode_page

    html = b'<meta charset="iso-8859-1">' + s.encode("latin-1")
    out = decode_page(html, PipelineConfig(charset_sniff=True))
    assert out == '<meta charset="iso-8859-1">' + s


@given(st.binary(max_size=80))
def test_charset_decode_never_crashes_on_garbage(b):
    """decode_page is total on arbitrary bytes, sniff on or off."""
    from paddleocr_spark.config import DEFAULT, PipelineConfig
    from paddleocr_spark.core.tokenizer import decode_page

    assert isinstance(decode_page(b, DEFAULT), str)
    assert isinstance(
        decode_page(b'<meta charset="iso-8859-1">' + b, PipelineConfig(charset_sniff=True)),
        str,
    )
