"""Geometry ops on axis-aligned boxes ``(x1, y1, x2, y2)``.

Reference parity (cited file:line into /root/reference):
- sorted_boxes bounded bubble pass: tools/infer/predict_system.py:160-182.
- sorted_layout_boxes two-column state machine:
  ppstructure/recovery/recovery_to_doc.py:85-153.
- merge_fragmented transitive-closure merge: tools/infer/utility.py:735-790
  (merge_boxes :743-763, fixpoint recursion :786-790).
- distance / compute_iou: ppstructure/table/matcher.py:19-54.

The reference's quads carry the top-left corner at ``box[0]``; our
axis-aligned analog uses ``(x1, y1)`` for it. All coordinates are ints,
so every comparison is exact.
"""

from __future__ import annotations

Box = tuple[int, int, int, int]


def sorted_boxes(boxes: list[Box]) -> list[int]:
    """Reading order: stable sort by (y1, x1) + bounded adjacent swaps.

    Returns the *indices* of ``boxes`` in reading order. Exact semantics
    of predict_system.py:160-182: after the stable sort, for each i a
    backward bubble pass swaps adjacent items while |Δy1| < 10 and x is
    out of order, stopping at the first non-swap.
    """
    n = len(boxes)
    order = sorted(range(n), key=lambda k: (boxes[k][1], boxes[k][0]))
    for i in range(n - 1):
        for j in range(i, -1, -1):
            a, b = order[j], order[j + 1]
            if abs(boxes[b][1] - boxes[a][1]) < 10 and boxes[b][0] < boxes[a][0]:
                order[j], order[j + 1] = order[j + 1], order[j]
            else:
                break
    return order


def sorted_layout_boxes(boxes: list[Box], w: int) -> tuple[list[int], list[str]]:
    """Column-aware reading order (recovery_to_doc.py:85-153).

    Returns (indices in reading order, layout label per *output* position,
    'single' or 'double'). Implements the exact state machine including
    the last-element special cases (:109-132) and the trailing
    res_left/res_right flush (:149-152).
    """
    n = len(boxes)
    if n == 0:
        return [], []
    if n == 1:
        return [0], ["single"]

    order = sorted(range(n), key=lambda k: (boxes[k][1], boxes[k][0]))
    lay = {}
    new_res: list[int] = []
    res_left: list[int] = []
    res_right: list[int] = []
    i = 0
    while True:
        if i >= n:
            break
        k = order[i]
        x1, y1, x2, y2 = boxes[k]
        if i == n - 1:
            kp = order[i - 1]
            if y1 > boxes[kp][3] and x1 < w / 2 and x2 > w / 2:
                new_res += res_left
                new_res += res_right
                lay[k] = "single"
                new_res.append(k)
            else:
                if x2 > w / 2:
                    lay[k] = "double"
                    res_right.append(k)
                    new_res += res_left
                    new_res += res_right
                elif x1 < w / 2:
                    lay[k] = "double"
                    res_left.append(k)
                    new_res += res_left
                    new_res += res_right
                else:
                    # DELIBERATE deviation from recovery_to_doc.py:120-132,
                    # which falls through here (x1 >= w/2 >= x2 — a
                    # degenerate/inverted bbox) and silently drops the
                    # box AND both accumulated columns. Model-emitted
                    # quads can never hit this, but a hostile
                    # data-bbox can; losing every region of the page to
                    # one malformed box is not acceptable — complete
                    # the branch as the symmetric right-column case.
                    lay[k] = "double"
                    res_right.append(k)
                    new_res += res_left
                    new_res += res_right
            res_left = []
            res_right = []
            break
        elif x1 < w / 4 and x2 < 3 * w / 4:
            lay[k] = "double"
            res_left.append(k)
            i += 1
        elif x1 > w / 4 and x2 > w / 2:
            lay[k] = "double"
            res_right.append(k)
            i += 1
        else:
            new_res += res_left
            new_res += res_right
            lay[k] = "single"
            new_res.append(k)
            res_left = []
            res_right = []
            i += 1
    if res_left:
        new_res += res_left
    if res_right:
        new_res += res_right
    return new_res, [lay.get(k, "single") for k in new_res]


def merge_boxes(b1: Box, b2: Box, x_threshold: int, y_threshold: int) -> Box | None:
    """Single merge test (utility.py:743-763): y-extents aligned within
    y_threshold AND |max_x1 - min_x2| <= x_threshold -> union box."""
    if (
        abs(b1[1] - b2[1]) <= y_threshold
        and abs(b1[3] - b2[3]) <= y_threshold
        and abs(b1[2] - b2[0]) <= x_threshold
    ):
        return (
            min(b1[0], b2[0]),
            min(b1[1], b2[1]),
            max(b1[2], b2[2]),
            max(b1[3], b2[3]),
        )
    return None


def merge_fragmented(
    boxes: list[Box], x_threshold: int = 10, y_threshold: int = 10
) -> list[tuple[Box, list[int]]]:
    """Transitive-closure fragment merge to fixpoint (utility.py:766-790).

    Returns a list of (merged_box, member_indices_into_input) in the
    order the reference produces (outer scan order, greedy absorption).
    """
    items: list[tuple[Box, list[int]]] = [(b, [i]) for i, b in enumerate(boxes)]

    def one_round(cur):
        merged = []
        visited = set()
        for i, (box1, mem1) in enumerate(cur):
            if i in visited:
                continue
            mbox, mmem = box1, list(mem1)
            for j in range(i + 1, len(cur)):
                if j in visited:
                    continue
                box2, mem2 = cur[j]
                res = merge_boxes(mbox, box2, x_threshold, y_threshold)
                if res is not None:
                    mbox = res
                    mmem.extend(mem2)
                    visited.add(j)
            merged.append((mbox, mmem))
        return merged

    while True:
        nxt = one_round(items)
        if len(nxt) == len(items):
            return nxt
        items = nxt


def _inter_areas(b1: Box, b2: Box) -> tuple[float, float, float]:
    """(intersection, area1, area2) with empty-overlap clamping — the
    ONE definition behind both overlap measures (IoU and containment
    differ only in the denominator)."""
    left, top = max(b1[0], b2[0]), max(b1[1], b2[1])
    right, bottom = min(b1[2], b2[2]), min(b1[3], b2[3])
    inter = max(right - left, 0) * max(bottom - top, 0)
    a1 = max(b1[2] - b1[0], 0) * max(b1[3] - b1[1], 0)
    a2 = max(b2[2] - b2[0], 0) * max(b2[3] - b2[1], 0)
    return inter, a1, a2


def iou_xyxy(b1: Box, b2: Box) -> float:
    """IoU on (x1, y1, x2, y2) boxes with empty-overlap clamping
    (vectorized iou_of/area_of semantics, picodet_postprocess.py:51-96)."""
    inter, a1, a2 = _inter_areas(b1, b2)
    denom = a1 + a2 - inter
    return inter / denom if denom > 0 else 0.0


def hard_nms(
    boxes: list[Box],
    scores: list[float],
    iou_threshold: float = 0.5,
    top_k: int = -1,
    candidate_size: int = 200,
) -> list[int]:
    """Greedy non-maximum suppression (hard_nms,
    picodet_postprocess.py:19-48): take the max-score box, suppress all
    remaining with IoU > threshold, repeat; optional result cap
    ``top_k`` (keep_top_k=100) and pre-cap ``candidate_size``.
    Returns kept indices in pick order. Sequential by nature — runs
    per-document inside the Arrow stage, never as a distributed op
    (SURVEY.md §2.5)."""
    order = sorted(range(len(boxes)), key=lambda i: scores[i])[-candidate_size:]
    picked: list[int] = []
    while order:
        cur = order.pop()  # highest remaining score
        picked.append(cur)
        if 0 < top_k == len(picked):
            break
        order = [i for i in order if iou_xyxy(boxes[cur], boxes[i]) <= iou_threshold]
    return picked


def calculate_containment(b1: Box, b2: Box) -> float:
    """Intersection over the smaller box's area
    (picodet_postprocess.py:84-96)."""
    inter, a1, a2 = _inter_areas(b1, b2)
    small = min(a1, a2)
    return inter / small if small > 0 else 0.0


def containment_dedup(
    boxes: list[Box],
    labels: list[str],
    scores: list[float],
    priority_label: str = "table",
    threshold: float = 0.5,
) -> list[int]:
    """Overlapping-region dedup with label priority — the reference's
    GROUP-based rule (picodet_postprocess.py:272-296), not a pairwise
    greedy pass: for each not-yet-dropped anchor i, the overlap GROUP
    is every box with containment > threshold vs i (including i); if
    the group has more than one member, keep the best-scoring
    priority-label member (else best-scoring member overall; ties to
    the lowest index — sorted(reverse=True) stability) and drop the
    rest. A pairwise pass diverges on transitive overlaps: an anchor
    bridging two disjoint boxes keeps BOTH under pairwise but only the
    group max under the reference. Returns surviving indices in input
    order."""
    n = len(boxes)
    dropped: set[int] = set()
    for i in range(n):
        if i in dropped:
            continue
        overlaps = [
            j
            for j in range(n)
            if calculate_containment(boxes[j], boxes[i]) > threshold
        ]
        if len(overlaps) <= 1:
            continue
        prio = [j for j in overlaps if labels[j] == priority_label]
        pool = prio if prio else overlaps
        keep = max(pool, key=lambda j: scores[j])  # first max on ties
        dropped.update(j for j in overlaps if j != keep)
    return [i for i in range(n) if i not in dropped]


def distance(box_1: Box, box_2: Box) -> float:
    """L1 corner+center proxy distance (matcher.py:19-25)."""
    x1, y1, x2, y2 = box_1
    x3, y3, x4, y4 = box_2
    dis = abs(x3 - x1) + abs(y3 - y1) + abs(x4 - x2) + abs(y4 - y2)
    dis_2 = abs(x3 - x1) + abs(y3 - y1)
    dis_3 = abs(x4 - x2) + abs(y4 - y2)
    return dis + min(dis_2, dis_3)


def compute_iou(rec1, rec2) -> float:
    """IoU on (y0, x0, y1, x1) rectangles (matcher.py:28-54), including
    the reference's >=-edge no-intersection rule."""
    s1 = (rec1[2] - rec1[0]) * (rec1[3] - rec1[1])
    s2 = (rec2[2] - rec2[0]) * (rec2[3] - rec2[1])
    sum_area = s1 + s2
    left = max(rec1[1], rec2[1])
    right = min(rec1[3], rec2[3])
    top = max(rec1[0], rec2[0])
    bottom = min(rec1[2], rec2[2])
    if left >= right or top >= bottom:
        return 0.0
    intersect = (right - left) * (bottom - top)
    return (intersect / (sum_area - intersect)) * 1.0
