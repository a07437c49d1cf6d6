"""Table cell matching + HTML assembly (TableMatch analog).

Reference parity: ppstructure/table/matcher.py
- match_result (nearest-cell similarity join by (1-IoU, L1 dist)): :77-101
- get_pred_html (ordered per-cell concat interleaved into the structure
  token stream, <b> handling, multi-match space joining): :103-146
- _filter_ocr_result (drop boxes fully above the table): :193-203

Per-document the cell/box counts are tiny, so this runs inside the
stage-1 Arrow UDF (the Spark-level realization of this join is
documented in SURVEY.md §2.3: broadcast crossJoin + window rank 1).
"""

from __future__ import annotations

from paddleocr_spark.core.geometry import Box, compute_iou, distance


def filter_ocr_result(cell_boxes: list[Box], ocr_boxes: list[Box], ocr_texts: list[str]):
    """Drop OCR boxes fully above the table's min cell y (matcher.py:193-203)."""
    if not cell_boxes:
        return ocr_boxes, ocr_texts
    y1 = min(b[1] for b in cell_boxes)
    kept = [(b, t) for b, t in zip(ocr_boxes, ocr_texts) if b[3] > y1]
    return [b for b, _ in kept], [t for _, t in kept]


def match_result(ocr_boxes: list[Box], cell_boxes: list[Box]) -> dict[int, list[int]]:
    """For each OCR box pick argmin cell by (1-IoU, L1 distance).

    Exact matcher.py:77-101 semantics including the tie-break: sorted()
    is stable, and ``distances.index(sorted[0])`` re-finds the FIRST cell
    with an equal (iou, dist) key. IoU is computed on (y0,x0,y1,x1)
    rectangles like the reference.
    """
    matched: dict[int, list[int]] = {}
    if not cell_boxes:
        # a table with OCR fragments but zero matchable cells (e.g. a
        # stray data-bbox span and no <td>): nothing to assign — the
        # structure renders empty rather than min() crashing the batch
        return matched
    for i, gt in enumerate(ocr_boxes):
        keys = []
        for cell in cell_boxes:
            d = distance(gt, cell)
            iou = compute_iou(
                (gt[1], gt[0], gt[3], gt[2]), (cell[1], cell[0], cell[3], cell[2])
            )
            keys.append((1.0 - iou, d))
        best = min(range(len(keys)), key=lambda j: keys[j])
        matched.setdefault(best, []).append(i)
    return matched


def get_pred_html(
    structure_tokens: list[str],
    matched_index: dict[int, list[int]],
    ocr_texts: list[str],
) -> str:
    """Interleave matched cell texts into the structure token stream.

    Exact port of the get_pred_html control flow (matcher.py:103-146):
    - '<td></td>' splits into '<td>' ... '</td>';
    - multi-match cells: leading-space strip, <b>/</b> strip, skip
      empties, space-join between non-final members;
    - a cell whose FIRST matched text contains '<b>' (and with >1
      matches) is wrapped in <b>...</b>.
    """
    out: list[str] = []
    td_index = 0
    for tag in structure_tokens:
        if "</td>" in tag:
            if tag == "<td></td>":
                out.append("<td>")
            if td_index in matched_index:
                members = matched_index[td_index]
                b_with = False
                if "<b>" in ocr_texts[members[0]] and len(members) > 1:
                    b_with = True
                    out.append("<b>")
                for i, m in enumerate(members):
                    content = ocr_texts[m]
                    if len(members) > 1:
                        if len(content) == 0:
                            continue
                        if content[0] == " ":
                            content = content[1:]
                        if "<b>" in content:
                            content = content[3:]
                        if "</b>" in content:
                            content = content[:-4]
                        if len(content) == 0:
                            continue
                        if i != len(members) - 1 and content[-1] != " ":
                            content += " "
                    out.append(content)
                if b_with:
                    out.append("</b>")
            if tag == "<td></td>":
                out.append("</td>")
            else:
                out.append(tag)
            td_index += 1
        else:
            out.append(tag)
    return "".join(out)


def assemble_table(
    cell_boxes: list[Box],
    structure_tokens: list[str],
    ocr_boxes: list[Box],
    ocr_texts: list[str],
) -> str:
    """Full table branch: filter -> match -> html (TableMatch.__call__,
    matcher.py:57-72 with filter_ocr_result=True)."""
    ocr_boxes, ocr_texts = filter_ocr_result(cell_boxes, ocr_boxes, ocr_texts)
    matched = match_result(ocr_boxes, cell_boxes)
    return get_pred_html(structure_tokens, matched, ocr_texts)
