"""Plan gates for the crawl-management queries (queries_web.py): the
shapes that make them 10^12-row-safe must be visible in the physical
plan, so a refactor that silently reintroduces a shuffle or drops a
broadcast fails here, not at scale."""

from __future__ import annotations

import re

import paddleocr_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(plan: str) -> int:
    # shuffle exchanges only; BroadcastExchange is the cheap side
    return len(re.findall(r"\bExchange hashpartitioning", plan))


def test_crawl_diff_one_exchange_one_window_no_join(spark):
    """Content is hashed below the exchange — only (page_key, doc_id,
    md5) shuffle, once; rn + lead come from the same window spec."""
    plan = _plan(Q.QUERIES["crawl_diff"](spark, SF_DIR))
    assert _n_exchanges(plan) == 1, plan
    assert plan.count("Window") == 1, plan
    assert "Join" not in plan, plan
    # the full text column must not survive into the exchange
    exch = plan[plan.index("Exchange hashpartitioning"):]
    assert "text#" not in exch.split("\n")[0]


def test_page_title_meta_pure_projection(spark):
    """Zero shuffles, zero Python: whole-stage-codegen regex only."""
    plan = _plan(Q.QUERIES["page_title_meta"](spark, SF_DIR))
    assert _n_exchanges(plan) == 0, plan
    assert "EvalPython" not in plan
    # executedPlan().toString() marks whole-stage-codegen stages "*(n)"
    assert plan.lstrip().startswith("*("), plan


def test_robots_gate_broadcasts_rules_no_per_doc_shuffle(spark):
    """The O(hosts) rule table broadcasts; the only shuffle aggregates
    the hosts distinct (O(hosts) rows), never the documents."""
    plan = _plan(Q.QUERIES["robots_gate"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert _n_exchanges(plan) == 1, plan  # the hosts distinct only
    exch_line = plan[plan.index("Exchange hashpartitioning"):].split("\n")[0]
    assert "doc_id" not in exch_line, exch_line
    assert "EvalPython" not in plan


def test_revisit_schedule_agg_rides_window_partitioning(spark):
    """Window then per-page aggregate on the SAME key: one exchange
    total — the groupBy must not add a second one."""
    plan = _plan(Q.QUERIES["revisit_schedule"](spark, SF_DIR))
    assert _n_exchanges(plan) == 1, plan
    assert plan.count("Window") == 1, plan
    assert "Join" not in plan, plan


def test_crawl_budget_no_cartesian_no_python(spark):
    """The budget total and leftover ride broadcasts (the crossJoins
    carry 1-row sides) — never a CartesianProduct — and the whole
    apportionment is expression-only."""
    plan = _plan(Q.QUERIES["crawl_budget"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan


def test_frontier_expand_drops_text_before_exchange(spark):
    """The outlink explode must not carry the text column into any
    exchange — only (doc_id, host, path) shuffle."""
    plan = _plan(Q.QUERIES["frontier_expand"](spark, SF_DIR))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line, line


def test_url_canonical_no_python_no_join(spark):
    plan = _plan(Q.QUERIES["url_canonical"](spark, SF_DIR))
    assert "EvalPython" not in plan
    assert "Join" not in plan


def test_latest_snapshot_one_exchange_no_join(spark):
    """Both window passes (row_number + the unbounded-frame counts)
    ride ONE hashpartitioning(page_key) exchange; no join."""
    plan = _plan(Q.QUERIES["latest_snapshot"](spark, SF_DIR))
    assert _n_exchanges(plan) == 1, plan
    assert "Join" not in plan, plan


def test_mojibake_fix_single_agg_exchange_no_python(spark):
    """Repair is pure codegen string work: the only exchange is the
    O(sources) aggregate, no join, no Python."""
    plan = _plan(Q.QUERIES["mojibake_fix"](spark, SF_DIR))
    assert _n_exchanges(plan) == 1, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan


def test_sitemap_extract_prunes_text_no_python(spark):
    """Sitemap XML + known-page urls derive from doc_id only: the text
    column must be pruned from every scan, the parse is codegen regex
    (no Python), and the known-set resolution joins on the url key."""
    plan = _plan(Q.QUERIES["sitemap_extract"](spark, SF_DIR))
    assert "text#" not in plan, plan
    assert "EvalPython" not in plan
    assert "Join" in plan, plan
