"""Plan gates for the structure-branch driver queries (queries_struct):
the cell grid must travel as a broadcast, the argmin must partial-
aggregate map-side, and the scans must prune to the columns used."""

from __future__ import annotations

import re

import paddleocr_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_table_match_broadcasts_cells_and_partial_aggregates(spark):
    """12-row cell grid rides a broadcast (never a shuffle of the big
    side); the (1-IoU, dist) argmin is a partial min(struct) — the
    exchange carries one row per OCR box, not one per (box, cell)."""
    plan = _plan(Q.QUERIES["table_match"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "partial_min" in plan, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_table_match_prunes_part_scan(spark):
    """Only p_partkey and p_name leave the parquet scan."""
    plan = _plan(Q.QUERIES["table_match"](spark, SF_DIR))
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m, plan
    assert "p_retailprice" not in m.group(1)
    assert "p_type" not in m.group(1)


def test_table_html_orders_without_window(spark):
    """Ordered assembly is sort_array(collect_list(struct)) inside the
    aggregate — no Window operator, no per-row sort pass."""
    plan = _plan(Q.QUERIES["table_html"](spark, SF_DIR))
    assert "Window" not in plan, plan


def test_line_confidence_single_doc_window(spark):
    """One window pass partitioned by doc — exactly one exchange feeds
    it (the groupBy reuses the same hash partitioning)."""
    plan = _plan(Q.QUERIES["line_confidence"](spark, SF_DIR))
    assert "Window" in plan
    assert plan.count("Exchange") <= 2, plan


def test_det_metric_pure_codegen_aggregate(spark):
    """No join, no window — scan + arithmetic + one partial-aggregable
    groupBy; the IoU is pure column arithmetic (codegen-eligible
    Project, no Python)."""
    plan = _plan(Q.QUERIES["det_metric"](spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "Window" not in plan
    assert "partial_" in plan
    assert "Python" not in plan


def test_word_runs_no_join(spark):
    plan = _plan(Q.QUERIES["word_runs"](spark, SF_DIR))
    assert "Join" not in plan, plan
