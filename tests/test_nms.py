"""Fixture tests for the suppression family (hard_nms / containment
dedup / IoU), mirroring the reference's golden in/out style
(tests/test_cls_postprocess.py pattern)."""

from __future__ import annotations

from paddleocr_spark.core.geometry import (
    calculate_containment,
    containment_dedup,
    hard_nms,
    iou_xyxy,
)


def test_iou_basic():
    assert iou_xyxy((0, 0, 10, 10), (0, 0, 10, 10)) == 1.0
    assert iou_xyxy((0, 0, 10, 10), (20, 20, 30, 30)) == 0.0
    # half overlap: inter 50, union 150
    assert abs(iou_xyxy((0, 0, 10, 10), (5, 0, 15, 10)) - 50 / 150) < 1e-12


def test_hard_nms_greedy_suppression():
    boxes = [(0, 0, 10, 10), (1, 1, 11, 11), (20, 20, 30, 30), (21, 21, 31, 31)]
    scores = [0.9, 0.8, 0.7, 0.95]
    kept = hard_nms(boxes, scores, iou_threshold=0.5)
    # picks 3 (0.95) suppressing 2, then 0 (0.9) suppressing 1
    assert kept == [3, 0]


def test_hard_nms_top_k_and_candidates():
    boxes = [(i * 20, 0, i * 20 + 10, 10) for i in range(5)]  # disjoint
    scores = [0.1, 0.2, 0.3, 0.4, 0.5]
    assert hard_nms(boxes, scores, top_k=2) == [4, 3]
    # candidate_size pre-cap drops the lowest scores before picking
    assert hard_nms(boxes, scores, candidate_size=2) == [4, 3]


def test_containment():
    assert calculate_containment((0, 0, 10, 10), (2, 2, 8, 8)) == 1.0
    assert calculate_containment((0, 0, 10, 10), (20, 0, 30, 10)) == 0.0


def test_containment_dedup_table_priority():
    boxes = [(0, 0, 10, 10), (1, 1, 9, 9), (50, 50, 60, 60)]
    labels = ["text", "table", "figure"]
    scores = [0.99, 0.5, 0.9]
    # inner table wins over the outer higher-score text region
    assert containment_dedup(boxes, labels, scores) == [1, 2]


def test_containment_dedup_score_fallback():
    boxes = [(0, 0, 10, 10), (1, 1, 9, 9)]
    labels = ["text", "text"]
    assert containment_dedup(boxes, labels, [0.4, 0.6]) == [1]
    assert containment_dedup(boxes, labels, [0.6, 0.4]) == [0]


def test_containment_dedup_transitive_group_matches_reference():
    """Group-based rule (picodet_postprocess.py:272-296): an anchor A
    bridging two disjoint boxes B and C forms ONE overlap group; only
    the group's best-scoring member survives. A pairwise-greedy pass
    would keep both B and C."""
    boxes = [(0, 0, 10, 10), (0, 0, 5, 10), (6, 0, 10, 10)]
    labels = ["text", "text", "text"]
    scores = [0.5, 0.9, 0.7]
    assert containment_dedup(boxes, labels, scores) == [1]
