"""The crawl-scheduler job (jobs/crawl_plan.py): the fetch plan must
respect every constraint its three component queries establish —
robots admission, per-host quotas, priority ordering — and be
deterministic across reruns."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jobs.crawl_plan import build_crawl_plan  # noqa: E402
from paddleocr_spark.queries_web import (  # noqa: E402
    crawl_budget_over,
    robots_gate_over,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_plan_respects_robots_and_quotas(spark):
    docs = _docs(spark)
    verdicts, plan = build_crawl_plan(docs, budget=40)
    rows = plan.collect()
    assert rows, "plan must not be empty"

    # no robots-denied doc may appear in the plan
    denied_ids = {
        r["doc_id"]
        for r in verdicts.filter(F.col("allowed") == 0).collect()
    }
    assert not denied_ids.intersection({r["doc_id"] for r in rows})

    # per-host counts stay within the apportioned quota
    quotas = {
        r["source"]: r["quota"]
        for r in crawl_budget_over(docs, budget=40).collect()
    }
    per_host: dict[str, int] = {}
    for r in rows:
        per_host[r["source"]] = per_host.get(r["source"], 0) + 1
    for host, n in per_host.items():
        assert n <= quotas[host], (host, n, quotas[host])


def test_plan_prioritizes_hotter_buckets(spark):
    """Within a host the kept ranks must be contiguous from 1 and
    ordered hot >= warm >= cold >= new — a cold page may not outrank a
    hot one."""
    docs = _docs(spark)
    _, plan = build_crawl_plan(docs, budget=40)
    prio = {"hot": 3, "warm": 2, "cold": 1, "new": 0}
    by_host: dict[str, list] = {}
    for r in plan.collect():
        by_host.setdefault(r["source"], []).append(r)
    for host, rows in by_host.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        ps = [prio[r["bucket"]] for r in rows]
        assert ps == sorted(ps, reverse=True), (host, ps)


def test_plan_deterministic_rerun(spark):
    docs = _docs(spark)
    _, p1 = build_crawl_plan(docs, budget=40)
    _, p2 = build_crawl_plan(docs, budget=40)
    key = lambda r: (r["source"], r["rank"])  # noqa: E731
    assert sorted(p1.collect(), key=key) == sorted(p2.collect(), key=key)


def test_plan_admission_is_the_robots_gate(spark):
    """With an unbounded budget the plan is exactly the admissible
    pages of every host that HAS demand (proportional apportionment
    gives zero-demand hosts zero quota no matter the budget — the
    scheduler's contract, not a bug; in this corpus doc_id % 4 is
    constant per host, so demand is all-or-nothing per host)."""
    docs = _docs(spark)
    _, plan = build_crawl_plan(docs, budget=10**9)
    funded = {
        r["source"]
        for r in crawl_budget_over(docs, budget=10**9).collect()
        if r["quota"] > 0
    }
    n_expected = (
        robots_gate_over(docs)
        .filter(F.col("allowed") == 1)
        .filter(F.col("source").isin(list(funded)))
        .count()
    )
    assert plan.count() == n_expected


def test_zero_demand_batch_never_crashes(spark):
    """A quiet crawl day (no volatile pages, total demand 0) must
    yield zero quotas and an empty plan — not an ANSI DIVIDE_BY_ZERO
    from the apportionment (regression: `(b*demand) div total`)."""
    docs = _docs(spark).filter(F.col("doc_id") % 4 < 2)
    quotas = crawl_budget_over(docs, budget=40).collect()
    assert quotas and all(r["quota"] == 0 for r in quotas)
    _, plan = build_crawl_plan(docs, budget=40)
    assert plan.count() == 0
    # empty input degenerates the same way
    _, empty_plan = build_crawl_plan(_docs(spark).limit(0), budget=40)
    assert empty_plan.count() == 0


def test_short_and_digitless_docs_never_crash_the_gate(spark):
    """ANSI-mode regressions: a one-word/empty doc (element_at OOB) or
    a digitless host (cast('') to int) must degrade to NULL path /
    no-rules / default-allow — the same verdict DuckDB's silent NULL
    indexing gives — never a Spark-only crash."""
    from paddleocr_spark.queries_web import robots_gate_over

    d = spark.createDataFrame(
        [(1, "solo", "en", "src1", 4), (2, "", "en", "cdn", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r["doc_id"]: r for r in robots_gate_over(d).collect()}
    assert rows[1]["allowed"] == 1 and rows[1]["path"] is None
    assert rows[2]["allowed"] == 1 and rows[2]["matched_len"] == 0


def test_politeness_cap_defers_overflow_without_reapportioning(spark):
    """A host whose Hamilton quota exceeds its crawl-delay rate cap
    plans only the cap and defers the rest; quotas themselves are
    untouched (politeness never re-apportions)."""
    from paddleocr_spark.queries_web import politeness_cap_over

    # one dominant volatile host (src1 -> delay 1+1%5=2 -> cap 30)
    rows = [(i * 4 + 2, "src1", "t") for i in range(80)]  # volatile
    rows += [(1, "src2", "t"), (5, "src2", "t")]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {r["source"]: r.asDict() for r in politeness_cap_over(df).collect()}
    s1 = out["src1"]
    assert s1["crawl_delay_s"] == 2 and s1["rate_cap"] == 30
    assert s1["quota"] > s1["rate_cap"]          # budget would exceed the cap
    assert s1["planned"] == 30                    # capped at the window rate
    assert s1["deferred"] == s1["quota"] - 30     # carry-over, not lost
    s2 = out["src2"]
    assert s2["deferred"] == 0


def test_crawl_plan_window_caps_per_host_and_keeps_top_ranks(spark):
    """--window-s politeness: per-host plan size <= window div delay,
    the surviving pages are exactly the TOP ranks (carry-over is the
    tail), and the uncapped plan is unchanged for hosts under the cap."""
    from paddleocr_spark.queries_web import crawl_delay_col
    from jobs.crawl_plan import build_crawl_plan
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    _, free = build_crawl_plan(docs, budget=100)
    _, capped = build_crawl_plan(docs, budget=100, window_s=10)
    delays = {
        r["source"]: r["d"]
        for r in docs.select("source").distinct()
        .withColumn("d", crawl_delay_col()).collect()
    }
    free_by = {r["source"]: r for r in free.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("max_rank")
    ).collect():
        cap = 10 // delays[r["source"]]
        assert r["n"] <= cap
        assert r["max_rank"] == r["n"]  # top ranks survive, tail deferred
        assert r["n"] == min(cap, free_by[r["source"]]["n"])
