"""The distributed TableMatch plan (queries_struct) must agree with the
per-document pure core (core/table.py — the code the Arrow stage runs),
not just with the DuckDB oracle: recompute one table's match and HTML
with match_result/get_pred_html over the same derived boxes and compare
row-for-row / byte-for-byte. This pins the DataFrame realization to the
reference control flow (ppstructure/table/matcher.py:77-146)."""

from __future__ import annotations

from paddleocr_spark.core.table import filter_ocr_result, get_pred_html, match_result
from paddleocr_spark.queries_struct import (
    q_table_html,
    q_table_match,
    q_table_match_filtered,
)

SF = "/root/testdata/sf0.001"

CELLS = [
    ((i % 4) * 100, (i // 4) * 30, (i % 4) * 100 + 90, (i // 4) * 30 + 25)
    for i in range(12)
]


def _derived_ocr(table_id: int):
    """The same pure derivation as queries_struct._ocr_boxes, in Python."""
    import duckdb

    rows = duckdb.sql(
        f"select p_partkey from read_parquet('{SF}/part.parquet')"
        f" where p_partkey % 8 = {table_id} order by p_partkey"
    ).fetchall()
    out = []
    for (p,) in rows:
        slot = (p // 8) % 12
        col, row = slot % 4, slot // 4
        box = (
            col * 100 + (p % 5 - 2),
            row * 30 + ((p // 5) % 5 - 2),
            col * 100 + 90 + ((p // 25) % 5 - 2),
            row * 30 + 25 + ((p // 125) % 5 - 2),
        )
        out.append((int(p), box))
    return out


def _texts(table_id: int):
    import duckdb

    return dict(
        duckdb.sql(
            f"select cast(p_partkey as int), p_name"
            f" from read_parquet('{SF}/part.parquet')"
            f" where p_partkey % 8 = {table_id}"
        ).fetchall()
    )


def test_distributed_match_equals_core_match_result(spark):
    got = {
        (r["ocr_id"]): r["cell_id"]
        for r in q_table_match(spark, SF).where("table_id = 3").collect()
    }
    ocr = _derived_ocr(3)
    matched = match_result([b for _, b in ocr], CELLS)
    want = {}
    for cell_id, members in matched.items():
        for m in members:
            want[ocr[m][0]] = cell_id
    assert got == want and len(got) > 0


def test_distributed_html_equals_core_get_pred_html(spark):
    got = {
        r["table_id"]: r["html"] for r in q_table_html(spark, SF).collect()
    }
    for table_id in (0, 5):
        ocr = _derived_ocr(table_id)
        texts = _texts(table_id)
        matched = match_result([b for _, b in ocr], CELLS)
        # ocr texts in the same index space match_result used
        ocr_texts = [texts[pid] for pid, _ in ocr]
        tokens = ["<table>"] + ["<td></td>"] * 12 + ["</table>"]
        want = get_pred_html(tokens, matched, ocr_texts)
        assert got[table_id] == want


def test_distributed_filter_equals_core_filter_ocr_result(spark):
    got_ids = {
        r["ocr_id"]
        for r in q_table_match_filtered(spark, SF).where("table_id = 0").collect()
    }
    ocr = _derived_ocr(0)
    boxes = []
    ids = []
    for pid, (x0, y0, x1, y1) in ocr:
        if pid % 17 == 0:
            y0, y1 = y0 - 60, y1 - 60
        boxes.append((x0, y0, x1, y1))
        ids.append(pid)
    kept_boxes, kept_ids = filter_ocr_result(CELLS, boxes, ids)
    assert got_ids == set(kept_ids)
    assert len(kept_ids) < len(ids)  # the shifted rows really drop
