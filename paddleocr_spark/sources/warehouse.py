"""Snapshot-isolated, partition-transformed table layout ("Iceberg-lite").

No Iceberg runtime exists in this environment (no catalog jars, no
network), so the SURVEY §4 scale story — ``bucket(N, url)`` /
``days(warc_ts)`` partition transforms, snapshot-pinned scans,
partition-pruned reads — is reproduced here with the same *mechanism*
Iceberg uses, at file granularity, instead of being emulated with an
opaque listing hash:

- **partition transforms**: ``bucket = pmod(xxhash64(url), N)`` and
  ``day = date(warc_ts)`` written as hive-style partition directories
  (``day=.../bucket=.../``) — the exact analog of Iceberg's
  ``bucket(N, url)`` + ``days(warc_ts)`` spec on the pages table.
- **snapshots**: every append lists the data files before and after the
  write and commits a JSON manifest naming the full file set; readers
  pin a snapshot id and scan exactly those files. Time travel = read an
  older manifest; the files of later appends are invisible to it.
- **partition pruning**: reads go through ``basePath`` + the manifest's
  explicit file list, so filters on ``day``/``bucket`` become
  ``PartitionFilters`` in the scan node and files outside the predicate
  are skipped at plan time (asserted in tests/test_warehouse.py).

Deliberately out of scope (what a real Iceberg deployment adds):
atomic metadata-pointer CAS for concurrent writers, manifest-level
column stats for file skipping within a partition, and schema
evolution. Single-writer append-only is the contract here, which is
exactly how the extraction job uses its tables.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 16


def bucket_col(url_col: str = "url", n_buckets: int = N_BUCKETS):
    """Iceberg ``bucket(N, url)`` transform analog (content-derived,
    stable across runs and cluster sizes)."""
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")


def day_col(ts_col: str = "warc_ts"):
    """Iceberg ``days(warc_ts)`` transform analog."""
    return F.date_format(F.col(ts_col), "yyyy-MM-dd")


def _data_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "data")


def _snap_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_snapshots")


def _list_data_files(table_dir: str) -> list[str]:
    out = []
    root = _data_dir(table_dir)
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(dirpath, f), root))
    return sorted(out)


def snapshots(table_dir: str) -> list[dict]:
    """All committed snapshots, oldest first."""
    log = os.path.join(_snap_dir(table_dir), "log.jsonl")
    if not os.path.exists(log):
        return []
    with open(log) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def current_snapshot_id(table_dir: str) -> str | None:
    snaps = snapshots(table_dir)
    return snaps[-1]["snapshot_id"] if snaps else None


def append(
    df: DataFrame,
    table_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    n_buckets: int = N_BUCKETS,
    batch_id: int | None = None,
) -> str:
    """Append rows under the (day, bucket) partition layout and commit
    a new snapshot; returns its id. The snapshot id content-addresses
    (parent id + files added), so identical re-ingests are detectable
    and lineage rows referencing it pin the exact input state."""
    before = set(_list_data_files(table_dir)) if os.path.exists(_data_dir(table_dir)) else set()
    (
        df.withColumn("day", day_col(ts_col))
        .withColumn("bucket", bucket_col(url_col, n_buckets))
        .write.mode("append")
        .partitionBy("day", "bucket")
        .parquet(_data_dir(table_dir))
    )
    after = _list_data_files(table_dir)
    added = sorted(set(after) - before)
    parent = current_snapshot_id(table_dir)
    # the new snapshot = parent's live file set + the files just added
    # (NOT the raw disk listing: after a replace/compact commit, files
    # the parent no longer references are still on disk awaiting
    # expiry — listing them would double-count their rows)
    if parent is not None:
        with open(os.path.join(_snap_dir(table_dir), f"{parent}.json")) as fh:
            live = json.load(fh)["files"]
    else:
        live = []
    files = sorted(set(live) | set(added))
    h = hashlib.md5()
    h.update((parent or "").encode())
    for f in added:
        h.update(f.encode())
    snap_id = h.hexdigest()[:16]
    os.makedirs(_snap_dir(table_dir), exist_ok=True)
    entry = dict(
        snapshot_id=snap_id,
        parent=parent,
        n_files=len(files),
        added=added,
        files=files,
        batch_id=batch_id,
        committed_ms=int(time.time() * 1000),
    )
    with open(os.path.join(_snap_dir(table_dir), f"{snap_id}.json"), "w") as fh:
        json.dump(entry, fh)
    with open(os.path.join(_snap_dir(table_dir), "log.jsonl"), "a") as fh:
        fh.write(json.dumps({k: entry[k] for k in ("snapshot_id", "parent", "n_files", "batch_id", "committed_ms")}) + "\n")
    return snap_id


def read_table(
    spark: SparkSession, table_dir: str, snapshot_id: str | None = None
) -> DataFrame:
    """Snapshot-pinned scan: exactly the pinned manifest's files, with
    day/bucket recovered as partition columns (basePath) so predicates
    on them prune at plan time."""
    sid = snapshot_id or current_snapshot_id(table_dir)
    if sid is None:
        raise ValueError(f"no snapshots committed in {table_dir}")
    manifest = os.path.join(_snap_dir(table_dir), f"{sid}.json")
    if not os.path.exists(manifest):
        raise ValueError(f"unknown snapshot {sid!r} in {table_dir}")
    with open(manifest) as fh:
        files = json.load(fh)["files"]
    data = _data_dir(table_dir)
    paths = [os.path.join(data, f) for f in files]
    return spark.read.option("basePath", data).parquet(*paths)


def compact(
    spark: SparkSession,
    table_dir: str,
    target_partitions_per_day_bucket: int = 1,
) -> str:
    """Small-file compaction (Iceberg ``rewrite_data_files`` analog):
    rewrite the CURRENT snapshot's rows into at most
    ``target_partitions_per_day_bucket`` files per (day, bucket)
    partition and commit the result as a REPLACE snapshot. Old
    snapshots still reference the old files (which are left in place —
    an expire-snapshots pass would garbage-collect them), so time
    travel across the compaction boundary keeps working.

    Many tiny appends (a streaming ingest, per-crawl increments) are
    the classic small-files failure mode at scale: scan planning cost
    grows with file count and each file under-fills its read task.
    """
    cur = read_table(spark, table_dir)
    before = set(_list_data_files(table_dir))
    (
        cur.repartition(target_partitions_per_day_bucket, "day", "bucket")
        .write.mode("append")
        .partitionBy("day", "bucket")
        .parquet(_data_dir(table_dir))
    )
    after = _list_data_files(table_dir)
    added = sorted(set(after) - before)
    parent = current_snapshot_id(table_dir)
    h = hashlib.md5()
    h.update((parent or "").encode())
    h.update(b"compact")
    for f in added:
        h.update(f.encode())
    snap_id = h.hexdigest()[:16]
    entry = dict(
        snapshot_id=snap_id,
        parent=parent,
        operation="replace",
        n_files=len(added),
        added=added,
        files=added,  # the compacted snapshot reads ONLY the new files
        committed_ms=int(time.time() * 1000),
    )
    with open(os.path.join(_snap_dir(table_dir), f"{snap_id}.json"), "w") as fh:
        json.dump(entry, fh)
    with open(os.path.join(_snap_dir(table_dir), "log.jsonl"), "a") as fh:
        fh.write(json.dumps({k: entry[k] for k in ("snapshot_id", "parent", "n_files", "committed_ms")}) + "\n")
    return snap_id


def expire_snapshots(table_dir: str, keep_last: int = 1) -> dict:
    """Iceberg ``expire_snapshots`` analog: retain only the newest
    ``keep_last`` snapshots, delete manifests of the expired ones, and
    garbage-collect data files no retained snapshot references (the
    pre-compaction files ``compact()`` leaves in place). Time travel to
    an expired snapshot becomes a clean "unknown snapshot" error; the
    retained snapshots are untouched.

    Driver-side metadata surgery only — file counts are O(snapshots ×
    files-per-manifest), no Spark job. Returns counts for audit:
    ``{"expired_snapshots": n, "deleted_files": m, "kept_files": k}``.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    snaps = snapshots(table_dir)
    if len(snaps) <= keep_last:
        return dict(expired_snapshots=0, deleted_files=0,
                    kept_files=len(_list_data_files(table_dir)))
    kept, expired = snaps[-keep_last:], snaps[:-keep_last]
    sdir, data = _snap_dir(table_dir), _data_dir(table_dir)

    def _manifest_files(sid: str) -> set[str]:
        with open(os.path.join(sdir, f"{sid}.json")) as fh:
            return set(json.load(fh)["files"])

    live: set[str] = set()
    for s in kept:
        live |= _manifest_files(s["snapshot_id"])
    dead = [f for f in _list_data_files(table_dir) if f not in live]
    for f in dead:
        os.remove(os.path.join(data, f))
    # drop now-empty partition dirs so the hive layout stays clean
    for dirpath, _dirs, _files in os.walk(data, topdown=False):
        if dirpath != data and not os.listdir(dirpath):
            os.rmdir(dirpath)
    for s in expired:
        p = os.path.join(sdir, f"{s['snapshot_id']}.json")
        if os.path.exists(p):
            os.remove(p)
    with open(os.path.join(sdir, "log.jsonl"), "w") as fh:
        for s in kept:
            fh.write(json.dumps(s) + "\n")
    return dict(expired_snapshots=len(expired), deleted_files=len(dead),
                kept_files=len(live))
