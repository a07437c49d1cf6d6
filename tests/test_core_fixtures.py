"""Operator-level golden fixtures, recast from the reference's unit tests
(tests/test_cls_postprocess.py model: fixed inputs -> exact expected
outputs; see SURVEY.md §5)."""

import pytest

from paddleocr_spark.core.geometry import (
    merge_fragmented,
    sorted_boxes,
    sorted_layout_boxes,
)
from paddleocr_spark.core.table import assemble_table, match_result
from paddleocr_spark.core.text import (
    cls_argmax,
    ctc_greedy_decode,
    normalize_ws,
    pred_reverse,
)


# --- cls fixture (FIXTURES.md §4; tests/test_cls_postprocess.py:25-63) ---
@pytest.mark.parametrize(
    "probs,labels,exp_label,exp_score",
    [
        ([0.1, 0.7, 0.2], ["keep", "drop", "rotate"], "drop", 0.7),
        ([0.6, 0.4], ["0", "180"], "0", 0.6),
        ([0.5, 0.5], ["0", "180"], "0", 0.5),  # argmax tie -> first index
        ([0.1, 0.7, 0.2], None, 1, 0.7),  # no label list -> idx passthrough
    ],
)
def test_cls_argmax(probs, labels, exp_label, exp_score):
    assert cls_argmax(probs, labels) == (exp_label, exp_score)


# --- CTC fixture (FIXTURES.md §5; rec_postprocess.py:136-224) ---
VOCAB = ["blank", "a", "b", "c", "d", "e"]


@pytest.mark.parametrize(
    "ids,probs,exp_text,exp_conf",
    [
        # collapse repeats, drop blank
        ([0, 5, 5, 0, 3, 3, 3, 0, 5], [1.0] * 9, "ece", 1.0),
        # leading/trailing blanks
        ([0, 0, 1, 2, 0, 0], [0.5, 0.5, 0.8, 0.6, 0.5, 0.5], "ab", 0.7),
        # all blank -> conf list empty -> [0] (rec_postprocess.py:161-162)
        ([0, 0, 0], [0.9, 0.9, 0.9], "", 0.0),
        # repeats across a blank kept separate
        ([1, 0, 1], [0.4, 0.2, 0.8], "aa", 0.6000000000000001),
        # dedup before blank-drop: [1,1,0,0,2] -> a,b
        ([1, 1, 0, 0, 2], [0.9, 0.1, 0.5, 0.5, 0.7], "ab", 0.8),
    ],
)
def test_ctc_greedy(ids, probs, exp_text, exp_conf):
    text, conf = ctc_greedy_decode(ids, probs, VOCAB)
    assert text == exp_text
    assert conf == exp_conf


def test_pred_reverse():
    # latin runs stay intact; other chars are single units, list reversed
    # (rec_postprocess.py:51-65)
    assert pred_reverse("abc") == "abc"
    assert pred_reverse("αβ") == "βα"
    # runs of "ab " + "α" + " cd" -> reversed -> " cd" + "α" + "ab "
    assert pred_reverse("ab α cd") == " cdαab "
    assert pred_reverse("") == ""
    assert pred_reverse("x1 ي y2") == " y2يx1 "


def test_normalize_ws():
    assert normalize_ws("  a\t b\n\nc ") == "a b c"
    assert normalize_ws(" \n ") == ""


# --- reading order fixture (FIXTURES.md §6; predict_system.py:160-182) ---
def test_sorted_boxes_same_line_jitter():
    boxes = [(100, 12, 150, 30), (10, 5, 60, 25), (200, 8, 260, 28)]
    # The reference pass is adjacent-bubble only, NOT a full line sort:
    # after (y,x)-sort [1,2,0], box0 (x=100) bubbles past box2 (x=200)
    # but stops at box1 (x=10) -> [1,0,2]. Quirk pinned intentionally.
    assert sorted_boxes(boxes) == [1, 0, 2]


def test_sorted_boxes_distinct_lines():
    boxes = [(10, 100, 50, 120), (10, 5, 60, 25), (200, 102, 260, 128)]
    assert sorted_boxes(boxes) == [1, 0, 2]


def test_sorted_boxes_tie_stability():
    boxes = [(10, 5, 60, 25), (10, 5, 60, 25)]
    assert sorted_boxes(boxes) == [0, 1]


def test_sorted_boxes_bounded_bubble():
    # y: 0, 9, 18 — each adjacent pair within 10 but 0 vs 18 not:
    # the swap pass is adjacent-only, replicating the quirk.
    boxes = [(300, 0, 350, 10), (200, 9, 250, 19), (100, 18, 150, 28)]
    assert sorted_boxes(boxes) == [1, 0, 2] or sorted_boxes(boxes) == [2, 1, 0]
    # pin exact behavior:
    assert sorted_boxes(boxes) == [1, 0, 2]


# --- layout order fixture (recovery_to_doc.py:85-153) ---
def test_layout_two_columns_then_single():
    w = 1000
    boxes = [
        (40, 10, 430, 50),   # left row1
        (520, 10, 960, 50),  # right row1
        (40, 70, 430, 110),  # left row2
        (520, 70, 960, 110), # right row2
        (100, 130, 900, 170),  # trailing full-width
    ]
    order, labels = sorted_layout_boxes(boxes, w)
    assert order == [0, 2, 1, 3, 4]  # left column run, right column run, single
    assert labels == ["double", "double", "double", "double", "single"]


def test_layout_single_box():
    order, labels = sorted_layout_boxes([(10, 10, 700, 40)], 1000)
    assert order == [0] and labels == ["single"]


def test_layout_last_element_right_column():
    w = 1000
    boxes = [(40, 10, 430, 50), (520, 10, 960, 50)]
    order, labels = sorted_layout_boxes(boxes, w)
    assert order == [0, 1]
    assert labels == ["double", "double"]


# --- merge fixture (FIXTURES.md §8; utility.py:735-790) ---
def test_merge_chain_two_rounds():
    boxes = [(0, 0, 10, 10), (35, 0, 45, 10), (18, 0, 28, 10)]
    # 0-2 gap: |10-18|=8<=10 merges in round 1 via greedy scan? scan order:
    # box0 vs box1: |10-35|=25 no; box0 vs box2: |10-18|=8 yes -> (0,0,28,10);
    # then merged vs remaining box1: |28-35|=7 yes -> all three.
    merged = merge_fragmented(boxes, 10, 10)
    assert len(merged) == 1
    assert merged[0][0] == (0, 0, 45, 10)
    assert sorted(merged[0][1]) == [0, 1, 2]


def test_merge_identity():
    boxes = [(0, 0, 10, 10), (100, 0, 110, 10)]
    merged = merge_fragmented(boxes, 10, 10)
    assert [m[0] for m in merged] == boxes


def test_merge_y_misaligned():
    boxes = [(0, 0, 10, 10), (12, 30, 22, 40)]
    assert len(merge_fragmented(boxes, 10, 10)) == 2


# --- table fixture (FIXTURES.md §7; matcher.py:19-146) ---
def test_table_match_two_boxes_one_cell():
    cells = [(0, 0, 100, 30), (110, 0, 210, 30)]
    tokens = ["<table>", "<tr>", "<td></td>", "<td></td>", "</tr>", "</table>"]
    ocr_boxes = [(5, 5, 50, 25), (55, 5, 95, 25), (115, 5, 200, 25)]
    ocr_texts = ["hello", "world", "right"]
    html = assemble_table(cells, tokens, ocr_boxes, ocr_texts)
    assert html == "<table><tr><td>hello world</td><td>right</td></tr></table>"


def test_table_empty_cell_and_filter_above():
    cells = [(0, 40, 100, 70), (110, 40, 210, 70)]
    tokens = ["<table>", "<tr>", "<td></td>", "<td></td>", "</tr>", "</table>"]
    # first ocr box fully above min cell y -> filtered (matcher.py:193-203)
    ocr_boxes = [(0, 0, 50, 30), (5, 45, 95, 65)]
    ocr_texts = ["above", "inside"]
    html = assemble_table(cells, tokens, ocr_boxes, ocr_texts)
    assert html == "<table><tr><td>inside</td><td></td></tr></table>"


def test_table_match_tie_first_cell():
    # equidistant -> first cell wins (stable sorted + .index in matcher.py:95-100)
    cells = [(0, 0, 10, 10), (0, 0, 10, 10)]
    m = match_result([(2, 2, 8, 8)], cells)
    assert m == {0: [0]}


def test_get_word_info_classes_and_positions():
    from paddleocr_spark.core.text import get_word_info

    assert get_word_info("pi is 3.14") == [
        ("pi", "en", 0, 2),
        ("is", "en", 3, 5),
        ("3.14", "en", 6, 10),
    ]
    assert get_word_info("state-of-art!") == [
        ("state-of-art", "en", 0, 12),
        ("!", "sp", 12, 13),
    ]
    assert get_word_info("数据x") == [
        ("数", "cn", 0, 1),
        ("据", "cn", 1, 2),
        ("x", "en", 2, 3),
    ]
    # trailing '.' is a splitter, not a number join
    assert get_word_info("v2.") == [("v2", "en", 0, 2), (".", "sp", 2, 3)]
    assert get_word_info("  ") == []
