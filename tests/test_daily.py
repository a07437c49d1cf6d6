"""Daily crawl operations (jobs/daily.py): two days through the full
loop — ingest (recrawl upsert) -> CDC-synced extraction -> signature-
store admission — with every store consistent and per-day work bounded
by the day's delta."""

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

from paddleocr_spark.sources import warehouse as W  # noqa: E402


def _land(df, src_dir, name, tmp_path):
    stage = tmp_path / f"stage_{name}"
    df.coalesce(1).write.parquet(str(stage))
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    shutil.copy(stage / part, os.path.join(src_dir, name))


def test_two_daily_runs(spark, smoke_dir, tmp_path):
    from daily import run_daily

    landing = str(tmp_path / "landing")
    pages_tbl = str(tmp_path / "pages_tbl")
    ext_tbl = str(tmp_path / "ext_tbl")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    pages = spark.read.parquet(os.path.join(smoke_dir, "pages.parquet"))
    day1 = pages.limit(60).cache()
    _land(day1, landing, "crawl_day1.parquet", tmp_path)

    s1 = run_daily(spark, landing, pages_tbl, ext_tbl, store, out, ckpt)
    assert s1["extracted"]["inserted"] == 60
    n_day1_nonempty = (
        W.read_table(spark, ext_tbl)
        .filter(F.length("extracted_text") > 0).count()
    )
    assert 0 < s1["admitted"] <= n_day1_nonempty  # in-batch dupes rejected

    # rerun with no new landing files: every stage is a no-op
    s1b = run_daily(spark, landing, pages_tbl, ext_tbl, store, out, ckpt)
    assert s1b["admitted"] == 0
    assert s1b["pages_snapshot"] == s1["pages_snapshot"]

    # day 2: 15 new pages + 5 recrawls of day-1 urls (changed content);
    # one new page duplicates a day-1 page's TEXT under a different url
    day1_urls = sorted(r["url"] for r in day1.select("url").collect())
    fresh = pages.filter(~F.col("url").isin(day1_urls)).limit(15).cache()
    dup_html = day1.filter(F.col("url") == day1_urls[0]).select("html").collect()[0]["html"]
    dup_page = (
        fresh.limit(1)
        .withColumn("url", F.lit("https://mirror.example/copy"))
        .withColumn("html", F.lit(dup_html))
    )
    recrawl = (
        day1.filter(F.col("url").isin(day1_urls[:5]))
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("interval 1 day"))
        .withColumn("html", F.to_binary(F.lit(
            "<html><body><p>fresh recrawl content long enough to keep as a "
            "block of text here.</p></body></html>"), F.lit("utf-8")))
    )
    day2 = fresh.unionByName(recrawl).unionByName(dup_page)
    _land(day2, landing, "crawl_day2.parquet", tmp_path)

    s2 = run_daily(spark, landing, pages_tbl, ext_tbl, store, out, ckpt)
    # sync extracted exactly the day-2 window: 15 fresh + 5 recrawls + 1 dup
    assert s2["extracted"]["inserted"] == 21

    # the pages table holds ONE live version per url
    live = W.read_table(spark, pages_tbl)
    assert live.count() == live.select("url").distinct().count() == 76

    # extracted table matches a from-scratch extraction of the live pages
    from paddleocr_spark.operators.extract import extract_fused
    want = {
        (r["url"], r["extracted_text"])
        for r in extract_fused(live).select("url", "extracted_text").collect()
    }
    got = {
        (r["url"], r["extracted_text"])
        for r in W.read_table(spark, ext_tbl).select("url", "extracted_text").collect()
    }
    assert got == want

    # the mirror copy was rejected by the store (same text, new url);
    # admitted outputs exist on disk for both days
    adm2 = spark.read.parquet(s2["admitted_path"])
    assert adm2.filter(F.col("url") == "https://mirror.example/copy").count() == 0
    assert s2["admitted"] < s2["extracted"]["inserted"]
    day1.unpersist(); fresh.unpersist()


def test_daily_admission_crash_recovery(spark, smoke_dir, tmp_path, monkeypatch):
    """The stage-3 crash windows ADVICE flagged: (a) a run dies after
    sync commits but before admission starts — the rerun's sync is a
    no-op (inserted == 0) yet the day's docs must still be admitted;
    (b) a run dies after the signature append but before the marker —
    the rerun must finish the window without rejecting the batch
    against its own signatures. Neither may drop a document."""
    import pytest

    from daily import run_daily, _admission_state
    import paddleocr_spark.functions.dedup_store as S

    landing = str(tmp_path / "landing")
    pages_tbl = str(tmp_path / "pages_tbl")
    ext_tbl = str(tmp_path / "ext_tbl")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    args = (spark, landing, pages_tbl, ext_tbl, store, out, ckpt)

    pages = spark.read.parquet(os.path.join(smoke_dir, "pages.parquet"))
    day1 = pages.limit(40).cache()
    _land(day1, landing, "crawl_day1.parquet", tmp_path)
    s1 = run_daily(*args)
    assert s1["admitted"] > 0
    day1_urls = sorted(r["url"] for r in day1.select("url").collect())

    # --- (a) crash AFTER sync, BEFORE any admission work ---
    day2 = pages.filter(~F.col("url").isin(day1_urls)).limit(10).cache()
    _land(day2, landing, "crawl_day2.parquet", tmp_path)

    def boom(*a, **k):
        raise RuntimeError("injected crash before admission")

    monkeypatch.setattr(S, "incremental_dedup_against_store", boom)
    with pytest.raises(RuntimeError):
        run_daily(*args)
    monkeypatch.undo()

    s2 = run_daily(*args)  # sync replays as a no-op...
    assert s2["extracted"].get("inserted", 0) == 0
    assert s2["admitted"] > 0  # ...but the synced window is admitted
    adm2_urls = {
        r["url"] for r in spark.read.parquet(s2["admitted_path"]).collect()
    }
    day2_urls = {r["url"] for r in day2.select("url").collect()}
    assert adm2_urls <= day2_urls and adm2_urls

    # --- (b) crash AFTER the signature append, BEFORE the marker ---
    day3 = pages.filter(
        ~F.col("url").isin(day1_urls) & ~F.col("url").isin(sorted(day2_urls))
    ).limit(8).cache()
    _land(day3, landing, "crawl_day3.parquet", tmp_path)

    real_append = S.append_to_store

    def append_then_crash(docs, store_dir, **kw):
        real_append(docs, store_dir, **kw)
        raise RuntimeError("injected crash after append")

    monkeypatch.setattr(S, "append_to_store", append_then_crash)
    with pytest.raises(RuntimeError):
        run_daily(*args)
    monkeypatch.undo()
    assert _admission_state(store)["pending"] is not None  # window open

    s3 = run_daily(*args)
    assert s3["admitted"] > 0  # finished, not rejected-as-own-dup
    adm3_urls = {
        r["url"] for r in spark.read.parquet(s3["admitted_path"]).collect()
    }
    assert adm3_urls <= {r["url"] for r in day3.select("url").collect()}
    assert adm3_urls
    assert _admission_state(store)["pending"] is None

    # steady state: a further run is a full no-op
    s4 = run_daily(*args)
    assert s4["admitted"] == 0
    day1.unpersist(); day2.unpersist(); day3.unpersist()


def test_daily_pending_window_survives_target_advance(
    spark, smoke_dir, tmp_path, monkeypatch
):
    """ADVICE r3: crash after the signature append but before the
    marker, THEN new data syncs before the rerun — target advances past
    the pending window. The old recovery branch (pending == target
    only) skipped it and the recomputed window rejected the crashed
    batch against its own signatures, stranding those docs in the
    never-sealed out_path. The rerun must now finish the pending window
    FIRST (report it as recovered), then admit the new window."""
    import pytest

    from daily import run_daily, _admission_state
    import paddleocr_spark.functions.dedup_store as S

    landing = str(tmp_path / "landing")
    pages_tbl = str(tmp_path / "pages_tbl")
    ext_tbl = str(tmp_path / "ext_tbl")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    args = (spark, landing, pages_tbl, ext_tbl, store, out, ckpt)

    pages = spark.read.parquet(os.path.join(smoke_dir, "pages.parquet"))
    day1 = pages.limit(30).cache()
    _land(day1, landing, "crawl_day1.parquet", tmp_path)
    run_daily(*args)
    day1_urls = sorted(r["url"] for r in day1.select("url").collect())

    # day 2 crashes after append_to_store, leaving the window open
    day2 = pages.filter(~F.col("url").isin(day1_urls)).limit(10).cache()
    _land(day2, landing, "crawl_day2.parquet", tmp_path)
    real_append = S.append_to_store

    def append_then_crash(docs, store_dir, **kw):
        real_append(docs, store_dir, **kw)
        raise RuntimeError("injected crash after append")

    monkeypatch.setattr(S, "append_to_store", append_then_crash)
    with pytest.raises(RuntimeError):
        run_daily(*args)
    monkeypatch.undo()
    pend = _admission_state(store)["pending"]
    assert pend is not None
    day2_urls = {r["url"] for r in day2.select("url").collect()}

    # day 3 lands BEFORE the rerun: sync advances target past pending
    day3 = pages.filter(
        ~F.col("url").isin(day1_urls) & ~F.col("url").isin(sorted(day2_urls))
    ).limit(7).cache()
    _land(day3, landing, "crawl_day3.parquet", tmp_path)

    s = run_daily(*args)
    # the stranded day-2 batch is recovered (sealed into the store)...
    assert s.get("recovered", 0) > 0
    assert s["recovered_path"] == pend["out_path"]
    rec_urls = {
        r["url"] for r in spark.read.parquet(s["recovered_path"]).collect()
    }
    assert rec_urls and rec_urls <= day2_urls
    # ...and the new day-3 window is admitted in the same run
    assert s["admitted"] > 0
    adm_urls = {
        r["url"] for r in spark.read.parquet(s["admitted_path"]).collect()
    }
    day3_urls = {r["url"] for r in day3.select("url").collect()}
    assert adm_urls and adm_urls <= day3_urls
    # marker sealed at the new target; steady state is a no-op
    st = _admission_state(store)
    assert st["pending"] is None
    assert st["admitted_through"] == W.current_snapshot_id(ext_tbl)
    s_again = run_daily(*args)
    assert s_again["admitted"] == 0 and "recovered" not in s_again
    day1.unpersist(); day2.unpersist(); day3.unpersist()


def test_daily_first_run_empty_landing_noops(spark, tmp_path):
    """Scheduling the daily job BEFORE crawlers drop any files must be
    a quiet-day no-op with zeroed stats — not a crash in sync over a
    pages table that has no snapshots yet (r5 review finding)."""
    from daily import run_daily

    landing = str(tmp_path / "landing_empty")
    os.makedirs(landing)
    stats = run_daily(
        spark,
        landing,
        str(tmp_path / "pages"),
        str(tmp_path / "ext"),
        str(tmp_path / "store"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    assert stats["pages_snapshot"] is None
    assert stats["extracted"] == {"inserted": 0, "deleted": 0}
    assert stats["admitted"] == 0
