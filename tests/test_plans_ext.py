"""Plan gates for the extension queries: the shapes that make them
scale must be visible in the physical plan."""

from __future__ import annotations

import paddleocr_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_is_window_only_no_join(spark):
    """The as-of join compiles to a window pass — no Join operator, no
    pair explosion."""
    plan = _plan(Q.QUERIES["events_asof_purchase"](spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "Window" in plan


def test_containment_suppress_uses_equi_key(spark):
    """The anti-join must key on l_orderkey (hash/sort-merge with the
    interval predicate as residual) — never a nested-loop over all
    pairs."""
    plan = _plan(Q.QUERIES["containment_suppress"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_shipping_priority_broadcasts_customer(spark):
    plan = _plan(Q.QUERIES["shipping_priority"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_top_terms_partial_aggregates(spark):
    """Map-side partial count before the exchange: the shuffle carries
    O(distinct terms), not O(tokens)."""
    plan = _plan(Q.QUERIES["top_terms"](spark, SF_DIR))
    assert "partial_count" in plan


def test_user_setops_no_cartesian(spark):
    plan = _plan(Q.QUERIES["user_setops"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
