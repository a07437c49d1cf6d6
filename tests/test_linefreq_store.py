"""Lifecycle tests for the persistent line-frequency store — the
steady-state twin of line_dedup_rewrite (boilerplate segments
accumulate across daily batches; rewrites use cumulative counts)."""

from __future__ import annotations

import hashlib

import pytest

from paddleocr_spark.functions.linefreq_store import (
    _read_meta,
    line_store_exists,
    read_line_counts,
    rewrite_against_store,
    seed_line_store,
    update_line_store,
)
from paddleocr_spark.queries_curation import line_dedup_rewrite_over


def _seg(tag):
    """One full 8-word segment with a distinguishing tag."""
    return " ".join(f"{tag}{i}" for i in range(8))


BOILER = _seg("footer")


@pytest.fixture()
def corpora(spark):
    # day 0: boilerplate appears TWICE (below the min_count=3 threshold)
    day0 = spark.createDataFrame(
        [
            (1, BOILER + " " + _seg("a")),
            (2, _seg("b") + " " + BOILER),
            (3, _seg("c")),
        ],
        "doc_id bigint, text string",
    )
    # day 1: one more emission pushes the cumulative count to 3
    day1 = spark.createDataFrame(
        [
            (10, _seg("d") + " " + BOILER),
            (11, _seg("e")),
        ],
        "doc_id bigint, text string",
    )
    return day0, day1


def test_lifecycle_and_parity_with_oneshot(spark, tmp_path, corpora):
    """seed(day0) + update(day1) + rewrite(day1) must equal the
    from-scratch line_dedup_rewrite_over(day0 UNION day1) restricted to
    day1's documents — cumulative counts, not per-batch counts."""
    day0, day1 = corpora
    store = str(tmp_path / "store")

    meta = seed_line_store(day0, store, batch_id="day0")
    assert line_store_exists(store) and meta["version"] == 1

    meta = update_line_store(day1, store, batch_id="day1")
    assert meta["version"] == 2

    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["new_md5"])
        for r in rewrite_against_store(spark, day1, store).collect()
    }
    want = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["new_md5"])
        for r in line_dedup_rewrite_over(day0.unionByName(day1)).collect()
        if r["doc_id"] >= 10
    }
    assert got == want
    # the boilerplate crossed the threshold only cumulatively: doc 10
    # drops it, doc 11 (all unique) is untouched
    assert got[10] == (2, 1, hashlib.md5(_seg("d").encode()).hexdigest())
    assert got[11][1] == got[11][0]


def test_rewrite_below_threshold_is_identity(spark, tmp_path, corpora):
    """After day 0 alone the boilerplate count is 2 < 3: a rewrite of
    day0 against the seeded store drops nothing."""
    day0, _ = corpora
    store = str(tmp_path / "store")
    seed_line_store(day0, store, batch_id="day0")
    got = {r["doc_id"]: r for r in rewrite_against_store(spark, day0, store).collect()}
    assert all(r["n_kept"] == r["n_lines"] for r in got.values())
    assert got[3]["new_md5"] == hashlib.md5(_seg("c").encode()).hexdigest()


def test_update_is_idempotent_per_batch_id(spark, tmp_path, corpora):
    day0, day1 = corpora
    store = str(tmp_path / "store")
    seed_line_store(day0, store, batch_id="day0")
    m1 = update_line_store(day1, store, batch_id="day1")
    m2 = update_line_store(day1, store, batch_id="day1")  # replay
    assert m2 == m1  # no new version, no double counting
    counts = {r["h"]: r["cnt"] for r in read_line_counts(spark, store).collect()}
    assert max(counts.values()) == 3  # boiler counted once per emission


def test_crashed_update_is_recoverable(spark, tmp_path, corpora, monkeypatch):
    """A crash after the new counts version is written but before the
    meta flip leaves the old version live; the rerun overwrites the
    orphan dir and lands the batch exactly once."""
    import paddleocr_spark.functions.linefreq_store as L

    day0, day1 = corpora
    store = str(tmp_path / "store")
    seed_line_store(day0, store, batch_id="day0")

    real_flip = L._flip_meta

    def crash(*a, **k):
        raise RuntimeError("simulated crash before meta flip")

    monkeypatch.setattr(L, "_flip_meta", crash)
    with pytest.raises(RuntimeError):
        update_line_store(day1, store, batch_id="day1")
    monkeypatch.setattr(L, "_flip_meta", real_flip)

    assert _read_meta(store)["version"] == 1  # old version still live
    meta = update_line_store(day1, store, batch_id="day1")  # rerun
    assert meta["version"] == 2 and meta["applied"] == ["day0", "day1"]
    counts = {r["h"]: r["cnt"] for r in read_line_counts(spark, store).collect()}
    assert max(counts.values()) == 3


def test_store_probe_broadcasts_the_batch_side(spark, tmp_path):
    """The store scan must never be a broadcast build side: the batch
    hash set and the (small) collision set are the broadcast sides."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    store = str(tmp_path / "store")
    seed_line_store(docs, store, batch_id="day0")
    plan = (
        rewrite_against_store(spark, docs.limit(50), store)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_job_surface_two_day_loop(spark, tmp_path):
    """jobs/linededup.py run_linededup: day 0 seeds, day 1 updates and
    rewrites under cumulative counts; replaying day 1 leaves the store
    version unchanged and re-emits the same rewrite."""
    from jobs.linededup import run_linededup

    day0 = spark.createDataFrame(
        [(1, BOILER + " " + _seg("a")), (2, _seg("b") + " " + BOILER)],
        "doc_id bigint, text string",
    )
    day1 = spark.createDataFrame(
        [(10, _seg("d") + " " + BOILER)], "doc_id bigint, text string"
    )
    p0 = str(tmp_path / "day0.parquet")
    p1 = str(tmp_path / "day1.parquet")
    day0.write.parquet(p0)
    day1.write.parquet(p1)
    store = str(tmp_path / "store")

    s0 = run_linededup(spark, p0, store, str(tmp_path / "out0"), batch_id="d0")
    assert (s0["store_version"], s0["n_rewritten"]) == (1, 0)

    s1 = run_linededup(spark, p1, store, str(tmp_path / "out1"), batch_id="d1")
    assert (s1["store_version"], s1["n_docs"], s1["n_rewritten"]) == (2, 1, 1)

    s1b = run_linededup(spark, p1, store, str(tmp_path / "out1b"), batch_id="d1")
    assert s1b["store_version"] == 2  # replay: no new version
    a = spark.read.parquet(s1["output"]).collect()
    b = spark.read.parquet(s1b["output"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
