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

- **row-level deletes** (Iceberg v2 equality-delete files): a takedown
  (DMCA/GDPR url removal) writes a small parquet of deleted urls as a
  *delete file* and commits a DELETE snapshot — no data file of a
  100 TB table is rewritten. Reads merge-on-read: data anti-joined
  against the applicable delete files. Sequence numbers give Iceberg's
  exact applicability rule — an equality delete applies only to data
  files committed *before* it, so a url re-ingested after its takedown
  survives. ``compact()`` materializes deletes (rewritten files carry
  no delete baggage); ``expire_snapshots`` garbage-collects delete
  files no retained snapshot references.

- **manifest column stats + file skipping**: every commit harvests
  per-file min/max for ``STATS_COLS`` from the parquet footers (pyarrow
  metadata read — no Spark job, no data scan) into the manifest;
  ``read_table(..., prune_stats=(col, lo, hi))`` drops files whose
  range cannot overlap the predicate *at plan time on the driver*, the
  manifest-stats skipping Iceberg does inside a partition. Stats are
  only selective when files are clustered on the column, so
  ``compact(sort_within_partitions=[col])`` offers Iceberg's
  sort-order rewrite: after it, a point predicate on the column reads
  a strict subset of files (asserted in tests).

Schema evolution is implemented Iceberg-style (id-based column
mapping: add/rename/drop are metadata-only commits; reads map each
file's schema version onto the current one by field id — see the
Schema evolution section at the bottom). Deliberately out of scope
(what a real Iceberg deployment adds): atomic metadata-pointer CAS
for concurrent writers. Single-writer is the contract here, which is
exactly how the extraction job uses its tables.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_BUCKETS = 16

# columns whose per-file min/max are recorded in every manifest (the
# Iceberg manifest-stats analog). Footer-derived: adding a column here
# costs a metadata read per new file, never a data scan.
STATS_COLS = ("lang", "warc_ts")


def _canon_stat(v):
    """Canonical JSON-safe encoding for a footer min/max value, one
    encoding per column TYPE so stored stats and query bounds always
    compare in the same domain: timestamps/dates -> epoch micros (int,
    UTC), numerics -> as-is, strings/bytes -> str. ``str()``-encoding
    everything (the old scheme) made timestamp skipping depend on the
    caller's string format — 'YYYY-MM-DDTHH:MM:SS' vs the stored
    'YYYY-MM-DD HH:MM:SS+00:00' mis-compared lexicographically and
    silently skipped live files."""
    import datetime

    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, datetime.date):
        dt = datetime.datetime(
            v.year, v.month, v.day, tzinfo=datetime.timezone.utc
        )
        return int(dt.timestamp() * 1_000_000)
    if isinstance(v, bool) or isinstance(v, (int, float)):
        return v
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    return str(v)


def _session_tzinfo(spark):
    """tzinfo for ``spark.sql.session.timeZone`` (the zone Spark uses to
    interpret naive/string timestamp literals in row filters), or None
    when it can't be resolved — callers must then refuse to prune on
    naive bounds rather than guess."""
    try:
        name = spark.conf.get("spark.sql.session.timeZone")
    except Exception:
        return None
    return _session_tzinfo_from_name(name)


def _session_tzinfo_from_name(name):
    import datetime
    import re

    if not name:
        return None
    if name.upper() in ("UTC", "Z", "GMT", "GMT0", "ETC/UTC", "ETC/GMT"):
        return datetime.timezone.utc
    m = re.fullmatch(r"(?:GMT|UTC)?([+-])(\d{1,2})(?::?(\d{2}))?", name)
    if m:
        sign = 1 if m.group(1) == "+" else -1
        delta = datetime.timedelta(
            hours=int(m.group(2)), minutes=int(m.group(3) or 0)
        )
        return datetime.timezone(sign * delta)
    try:
        import zoneinfo

        return zoneinfo.ZoneInfo(name)
    except Exception:
        return None


def _looks_like_timestamp_str(s: str) -> bool:
    """True for strings parseable as a datetime — the legacy (pre-typed)
    stats encoding stored timestamps via ``str()``; comparing those
    lexicographically against a differently-formatted bound was the
    original mis-skip bug, so such stats must never drive pruning."""
    import datetime

    try:
        datetime.datetime.fromisoformat(s.replace("T", " "))
        return True
    except (ValueError, TypeError):
        return False


def _canon_bound(b, stored_sample, tz=None):
    """Bring a query bound into the stored stat's comparison domain.
    Returns None when it can't (then the file is KEPT — skipping is an
    optimization, never a correctness decision).

    ``tz`` is the SESSION timezone (from ``_session_tzinfo``): Spark
    evaluates the typed row filter's naive/string timestamp literals in
    that zone, so the stats comparison must localize naive bounds the
    same way or the two layers disagree and a matching file could be
    pruned. A naive bound with ``tz is None`` refuses to prune."""
    import datetime

    def _naive_to_micros(dt):
        if dt.tzinfo is None:
            if tz is None:
                return None  # can't know how Spark will read it: keep
            dt = dt.replace(tzinfo=tz)
        return int(dt.timestamp() * 1_000_000)

    if isinstance(stored_sample, (int, float)) and not isinstance(
        stored_sample, bool
    ):
        if isinstance(b, str):
            try:
                dt = datetime.datetime.fromisoformat(b.replace("T", " "))
            except ValueError:
                return None
            return _naive_to_micros(dt)
        if isinstance(b, datetime.datetime):
            return _naive_to_micros(b)
        if isinstance(b, datetime.date):
            return _naive_to_micros(
                datetime.datetime(b.year, b.month, b.day)
            )
        if isinstance(b, (int, float)) and not isinstance(b, bool):
            return b
        return None
    if isinstance(stored_sample, str):
        # legacy manifests (pre-typed stats) stored timestamps via
        # str(); format-dependent string compare mis-skips — keep file
        if _looks_like_timestamp_str(stored_sample):
            return None
        return b if isinstance(b, str) else None
    return None


def _file_stats(data_dir: str, relpaths: list[str], cols=STATS_COLS) -> dict:
    """Per-file min/max for ``cols``, read from parquet footers
    (row-group statistics; O(files) metadata reads, zero data IO).
    Values are stored via ``_canon_stat`` — one canonical encoding per
    column type, so query bounds compare in the same domain."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for rel in relpaths:
        md = pq.ParquetFile(os.path.join(data_dir, rel)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict[str, list] = {}
        for col in cols:
            ci = names.get(col)
            if ci is None:
                continue
            lo = hi = None
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(ci).statistics
                if s is None or not s.has_min_max:
                    lo = hi = None
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            clo, chi = _canon_stat(lo), _canon_stat(hi)
            if lo is not None and clo is not None and chi is not None:
                stats[col] = [clo, chi]
        if stats:
            out[rel] = stats
    return out


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


def _delete_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "deletes")


def _load_manifest(table_dir: str, sid: str) -> dict:
    path = os.path.join(_snap_dir(table_dir), f"{sid}.json")
    if not os.path.exists(path):
        raise ValueError(f"unknown snapshot {sid!r} in {table_dir}")
    with open(path) as fh:
        m = json.load(fh)
    # manifests written before row-level-delete/stats support lack these
    m.setdefault("seq", 0)
    m.setdefault("file_seq", {f: 0 for f in m["files"]})
    m.setdefault("delete_files", [])
    m.setdefault("file_stats", {})
    return m


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


class _micros_timestamps:
    """Scoped ``spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS``:
    sets the conf for the write and restores the caller's prior value on
    exit, so warehouse writes never leak a session-wide encoding change
    into unrelated parquet writes."""

    _KEY = "spark.sql.parquet.outputTimestampType"

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        try:
            self.prev = self.spark.conf.get(self._KEY)
        except Exception:
            self.prev = None
        self.spark.conf.set(self._KEY, "TIMESTAMP_MICROS")

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset(self._KEY)
        else:
            self.spark.conf.set(self._KEY, self.prev)
        return False


def _write_data(
    df: DataFrame,
    table_dir: str,
    url_col: str,
    ts_col: str,
    n_buckets: int,
) -> list[str]:
    """Write ``df`` under the (day, bucket) layout WITHOUT committing;
    returns the relpaths of the files written. Until a manifest names
    them they are invisible to every reader (a crash here leaves
    orphans that ``expire_snapshots`` garbage-collects — the table
    state is unchanged).

    Timestamps are written as int64 TIMESTAMP_MICROS — the encoding
    the Iceberg spec mandates — NOT Spark's legacy INT96 default:
    INT96 columns carry no parquet min/max statistics, which would
    silently disable manifest-stats file skipping on ``warc_ts``."""
    before = set(_list_data_files(table_dir)) if os.path.exists(_data_dir(table_dir)) else set()
    with _micros_timestamps(df.sparkSession):
        (
            df.withColumn("day", day_col(ts_col))
            .withColumn("bucket", bucket_col(url_col, n_buckets))
            .write.mode("append")
            .partitionBy("day", "bucket")
            .parquet(_data_dir(table_dir))
        )
    after = _list_data_files(table_dir)
    return sorted(set(after) - before)


def _check_n_buckets(pm: dict, n_buckets: int) -> None:
    """The bucket count is part of the table's physical layout, fixed
    at first commit: appending with a different modulus would scatter a
    url across buckets and silently break bucket-pruned reads
    (read_changes) and layout-reliant jobs. Recorded in every data
    commit; a mismatched writer fails loudly here."""
    rec = pm.get("n_buckets")
    if rec is not None and rec != n_buckets:
        raise ValueError(
            f"table was bucketed with n_buckets={rec}; writing with "
            f"n_buckets={n_buckets} would corrupt the layout"
        )


def _read_schema_json(df: DataFrame) -> str:
    """JSON of the schema a SCAN of this commit's data would produce:
    the written columns plus the recovered layout columns — partition
    type inference reads ``day`` ('yyyy-MM-dd' dirs) back as DATE and
    ``bucket`` as INT. Recorded in every data commit's manifest so a
    snapshot with ZERO live data files (empty first ingest batch,
    compaction after a full takedown) still reads as a schema-correct
    empty frame instead of an unreadable table."""
    fields = [f for f in df.schema.fields if f.name not in ("day", "bucket")]
    sch = T.StructType(fields)
    sch = sch.add("day", T.DateType()).add("bucket", T.IntegerType())
    return sch.json()


def _empty_frame(spark: SparkSession, m: dict, row_filter=None) -> DataFrame:
    """Schema-correct empty frame for a snapshot with no live data
    files, from the manifest's recorded read schema."""
    sj = m.get("schema_json")
    if sj is None:
        raise ValueError(
            "snapshot has no data files and no recorded schema_json "
            "(table committed before schema recording); append data or "
            "re-commit to make it readable"
        )
    df = spark.createDataFrame([], T.StructType.fromJson(json.loads(sj)))
    return df.filter(row_filter) if row_filter is not None else df


def _commit(table_dir: str, entry: dict, log_extra: tuple = ()) -> None:
    """Write the manifest and advance the log — the single metadata
    operation that makes a snapshot visible."""
    os.makedirs(_snap_dir(table_dir), exist_ok=True)
    with open(os.path.join(_snap_dir(table_dir), f"{entry['snapshot_id']}.json"), "w") as fh:
        json.dump(entry, fh)
    keys = ("snapshot_id", "parent", "n_files", "committed_ms") + log_extra
    with open(os.path.join(_snap_dir(table_dir), "log.jsonl"), "a") as fh:
        fh.write(json.dumps({k: entry[k] for k in keys if k in entry}) + "\n")


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
    parent = current_snapshot_id(table_dir)
    # the new snapshot = parent's live file set + the files just added
    # (NOT the raw disk listing: after a replace/compact commit, files
    # the parent no longer references are still on disk awaiting
    # expiry — listing them would double-count their rows)
    if parent is not None:
        pm = _load_manifest(table_dir, parent)
        _check_n_buckets(pm, n_buckets)
        live, file_seq = pm["files"], dict(pm["file_seq"])
        delete_files, seq = pm["delete_files"], pm["seq"] + 1
        file_stats = dict(pm["file_stats"])
    else:
        live, file_seq, delete_files, seq, file_stats = [], {}, [], 1, {}
    added = _write_data(df, table_dir, url_col, ts_col, n_buckets)
    files = sorted(set(live) | set(added))
    for f in added:
        file_seq[f] = seq
    file_stats.update(_file_stats(_data_dir(table_dir), added))
    h = hashlib.md5()
    h.update((parent or "").encode())
    for f in added:
        h.update(f.encode())
    snap_id = h.hexdigest()[:16]
    entry = dict(
        snapshot_id=snap_id,
        parent=parent,
        seq=seq,
        n_files=len(files),
        added=added,
        files=files,
        file_seq=file_seq,
        file_stats=file_stats,
        delete_files=delete_files,
        batch_id=batch_id,
        schema_json=_read_schema_json(df),
        n_buckets=n_buckets,
        committed_ms=int(time.time() * 1000),
    )
    _carry_schema(pm if parent is not None else None, entry, added)
    _commit(table_dir, entry, log_extra=("batch_id",))
    return snap_id


def delete_where(
    spark: SparkSession,
    table_dir: str,
    urls,
    url_col: str = "url",
) -> str:
    """Row-level takedown (Iceberg v2 *equality delete* analog): commit
    a DELETE snapshot that removes every row whose ``url_col`` appears
    in ``urls`` (a list of strings or a single-column DataFrame) —
    WITHOUT rewriting any data file. The deleted keys are written as a
    small parquet *delete file*; readers merge-on-read (anti-join).

    Sequence semantics match Iceberg: the delete applies only to data
    files committed before it (``file_seq < delete seq``), so a url
    re-ingested by a later append is NOT retro-deleted. At 100 TB this
    is the only viable takedown mechanism — a takedown list is O(KB),
    rewriting the table is O(corpus).
    """
    parent = current_snapshot_id(table_dir)
    if parent is None:
        raise ValueError(f"no snapshots committed in {table_dir}")
    pm = _load_manifest(table_dir, parent)
    seq = pm["seq"] + 1
    if isinstance(urls, DataFrame):
        del_df = urls.select(F.col(urls.columns[0]).alias(url_col)).distinct()
    else:
        del_df = spark.createDataFrame(
            [(u,) for u in sorted(set(urls))], f"{url_col} string"
        )
    h = hashlib.md5()
    h.update(parent.encode())
    h.update(b"delete")
    snap_id = h.hexdigest()[:16]
    rel = os.path.join(snap_id, "equality-deletes.parquet")
    # a takedown list is small by nature: one file, written atomically
    del_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(_delete_dir(table_dir), rel)
    )
    entry = dict(
        snapshot_id=snap_id,
        parent=parent,
        seq=seq,
        operation="delete",
        n_files=len(pm["files"]),
        added=[],
        files=pm["files"],
        file_seq=pm["file_seq"],
        file_stats=pm["file_stats"],
        delete_files=pm["delete_files"] + [dict(path=rel, seq=seq, key=url_col)],
        schema_json=pm.get("schema_json"),
        n_buckets=pm.get("n_buckets"),
        committed_ms=int(time.time() * 1000),
    )
    _carry_schema(pm, entry, [])
    _commit(table_dir, entry, log_extra=("operation",))
    return snap_id


def upsert(
    df: DataFrame,
    table_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    n_buckets: int = N_BUCKETS,
    batch_id: int | None = None,
) -> str:
    """Iceberg ``MERGE INTO`` analog for recrawls: replace-by-key.
    Rows of ``df`` whose ``url_col`` already exists in the table shadow
    the old version (an equality delete covers the prior files); new
    urls are plain inserts.

    ATOMIC like the real MERGE INTO: the new data files and the
    equality-delete file are written first (invisible — no manifest
    names them), then ONE snapshot commits both. There is no
    intermediate state where the recrawled urls read as deleted; a
    crash before the commit leaves the table at the parent snapshot
    (the orphaned files are GC'd by ``expire_snapshots``). Both the
    delete entry and the new files carry the same sequence number, so
    the delete applies to every PRIOR file (file_seq < seq) and never
    to the batch it rode in with.

    Cost is O(new batch), never O(table): the delete file is just the
    incoming batch's key set, and no existing data file is rewritten —
    the only way a daily recrawl increment can be merged into a 100 TB
    corpus. Old snapshots still read the pre-merge state (time travel
    across the merge boundary works).
    """
    parent = current_snapshot_id(table_dir)
    if parent is None:
        return append(
            df, table_dir, url_col=url_col, ts_col=ts_col,
            n_buckets=n_buckets, batch_id=batch_id,
        )
    pm = _load_manifest(table_dir, parent)
    _check_n_buckets(pm, n_buckets)
    added = _write_data(df, table_dir, url_col, ts_col, n_buckets)
    seq = pm["seq"] + 1
    h = hashlib.md5()
    h.update(parent.encode())
    h.update(b"merge")
    for f in added:
        h.update(f.encode())
    snap_id = h.hexdigest()[:16]
    rel = os.path.join(snap_id, "equality-deletes.parquet")
    (
        df.select(F.col(url_col).alias(url_col)).distinct()
        .coalesce(1).write.mode("overwrite")
        .parquet(os.path.join(_delete_dir(table_dir), rel))
    )
    files = sorted(set(pm["files"]) | set(added))
    file_seq = dict(pm["file_seq"])
    for f in added:
        file_seq[f] = seq
    file_stats = dict(pm["file_stats"])
    file_stats.update(_file_stats(_data_dir(table_dir), added))
    entry = dict(
        snapshot_id=snap_id,
        parent=parent,
        seq=seq,
        operation="merge",
        n_files=len(files),
        added=added,
        files=files,
        file_seq=file_seq,
        file_stats=file_stats,
        delete_files=pm["delete_files"] + [dict(path=rel, seq=seq, key=url_col)],
        batch_id=batch_id,
        schema_json=_read_schema_json(df),
        n_buckets=n_buckets,
        committed_ms=int(time.time() * 1000),
    )
    _carry_schema(pm, entry, added)
    _commit(table_dir, entry, log_extra=("operation", "batch_id"))
    return snap_id


def read_table(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: str | None = None,
    prune_stats: tuple | None = None,
) -> DataFrame:
    """Snapshot-pinned scan: exactly the pinned manifest's files, with
    day/bucket recovered as partition columns (basePath) so predicates
    on them prune at plan time. If the snapshot carries equality-delete
    files, the scan is merge-on-read: data files are grouped by which
    suffix of the (seq-ordered) delete set applies to them — at most
    ``n_delete_commits + 1`` groups, each anti-joined once against its
    applicable deletes. The delete side is a takedown list (tiny), so
    AQE picks a broadcast anti-join; no hint is forced.

    ``prune_stats=(col, lo, hi)`` is the manifest-stats file skip: data
    files whose recorded [min, max] for ``col`` cannot intersect
    [lo, hi] are dropped from the file list ON THE DRIVER, before any
    Spark planning, and the equivalent row filter is applied on top
    (files without stats are always kept — skipping is an optimization,
    never a correctness decision). Selective only when files are
    clustered on ``col`` — see ``compact(sort_within_partitions=...)``."""
    sid = snapshot_id or current_snapshot_id(table_dir)
    if sid is None:
        raise ValueError(f"no snapshots committed in {table_dir}")
    m = _load_manifest(table_dir, sid)
    files, file_seq = m["files"], m["file_seq"]
    if not files:
        # zero live data files (empty first ingest batch, or compaction
        # after a full takedown): a schema-correct empty frame — the
        # table stays readable, spark.read.parquet of nothing would not
        return _empty_frame(spark, m)
    data = _data_dir(table_dir)
    row_filter = None
    if prune_stats is not None:
        col, lo, hi = prune_stats
        stats = m["file_stats"]
        tz = _session_tzinfo(spark)

        def _keep(f: str) -> bool:
            rng = stats.get(f, {}).get(col)
            if rng is None:
                return True
            # compare in the stored stat's domain (epoch micros for
            # timestamps, raw for numerics/strings); an uncomparable
            # bound keeps the file — the typed row filter below is the
            # correctness layer, skipping is only an optimization.
            # Naive/string bounds are localized to the SESSION timezone
            # (the zone the row filter evaluates them in); if that zone
            # can't be resolved the file is kept.
            clo = _canon_bound(lo, rng[0], tz)
            chi = _canon_bound(hi, rng[1], tz)
            if clo is None or chi is None:
                return True
            return rng[0] <= chi and rng[1] >= clo

        files = [f for f in files if _keep(f)]
        row_filter = F.col(col).between(lo, hi)
        if not files:
            # every file skipped: an empty frame with the table schema
            return _scan_schema_only(
                spark, data, m["files"], schema_info=_registry(m)
            )

    return _scan_merge_on_read(
        spark, table_dir, files, file_seq, m["delete_files"], row_filter,
        schema_info=_registry(m),
    )


def _scan_merge_on_read(
    spark, table_dir, files, file_seq, delete_files, row_filter=None,
    schema_info=None,
) -> DataFrame:
    """Merge-on-read scan core shared by snapshot and incremental reads:
    scan ``files``, anti-joining each against the equality deletes that
    apply to it (delete.seq > file's seq). ``schema_info`` (the
    manifest's (schemas, current_id, file_schema) registry, None for
    never-evolved tables) groups files by the schema version they were
    written under and maps each group onto the current schema by field
    id — see the Schema evolution section."""
    data = _data_dir(table_dir)

    def _scan(fs: list[str]) -> DataFrame:
        if schema_info is None:
            return spark.read.option("basePath", data).parquet(
                *[os.path.join(data, f) for f in fs]
            )
        schemas, cur, file_schema = schema_info
        by_sid: dict[int, list[str]] = {}
        for f in fs:
            by_sid.setdefault(int(file_schema.get(f, 0)), []).append(f)
        out = None
        for sid, group in sorted(by_sid.items()):
            part = spark.read.option("basePath", data).parquet(
                *[os.path.join(data, f) for f in group]
            )
            # map even the current-version group: projecting to schema
            # order keeps every group's columns aligned for the union
            part = _map_to_current(part, schemas[str(sid)], schemas[str(cur)])
            out = part if out is None else out.unionByName(part)
        return out

    deletes = sorted(delete_files, key=lambda d: d["seq"])
    if not deletes:
        scan = _scan(files)
        return scan.filter(row_filter) if row_filter is not None else scan
    ddir = _delete_dir(table_dir)
    # group data files by the first delete (in seq order) that applies
    # to them; deletes form suffixes, so group i gets deletes[i:]
    bounds = [d["seq"] for d in deletes]
    groups: dict[int, list[str]] = {}
    for f in files:
        s = file_seq.get(f, 0)
        i = 0
        while i < len(bounds) and bounds[i] <= s:
            i += 1
        groups.setdefault(i, []).append(f)
    out = None
    for i, fs in sorted(groups.items()):
        part = _scan(fs)
        if i < len(deletes):
            # the applicable deletes may be keyed on different columns
            # (a url takedown and, say, a content-hash purge): group by
            # key column and anti-join once per key — applying one
            # key's files under another key's column would anti-join on
            # the wrong values
            by_key: dict[str, list[str]] = {}
            for d in deletes[i:]:
                by_key.setdefault(d.get("key", "url"), []).append(d["path"])
            for key, paths in sorted(by_key.items()):
                keys = spark.read.parquet(
                    *[os.path.join(ddir, p) for p in paths]
                ).select(key).distinct()
                part = part.join(keys, on=key, how="left_anti")
        out = part if out is None else out.unionByName(part)
    return out.filter(row_filter) if row_filter is not None else out


def _scan_schema_only(spark, data, all_files, schema_info=None):
    """All files skipped by stats: a schema-correct empty frame (one
    footer read, plan-time false predicate, no data IO)."""
    df = spark.read.option("basePath", data).parquet(
        os.path.join(data, all_files[0])
    )
    if schema_info is not None:
        schemas, cur, file_schema = schema_info
        sid = int(file_schema.get(all_files[0], 0))
        df = _map_to_current(df, schemas[str(sid)], schemas[str(cur)])
    return df.filter(F.lit(False))


def snapshots_between(table_dir: str, from_snapshot: str, to_snapshot: str | None = None) -> list[dict]:
    """Manifests of the snapshots strictly after ``from_snapshot`` up to
    and including ``to_snapshot`` (default: current), oldest first, by
    walking parent pointers. Raises if ``from_snapshot`` is not an
    ancestor of ``to_snapshot`` — an incremental read across unrelated
    lineages would silently return garbage."""
    to_sid = to_snapshot or current_snapshot_id(table_dir)
    if to_sid is None:
        raise ValueError(f"no snapshots committed in {table_dir}")
    chain: list[dict] = []
    sid = to_sid
    while sid is not None:
        if sid == from_snapshot:
            return list(reversed(chain))
        m = _load_manifest(table_dir, sid)
        chain.append(m)
        sid = m["parent"]
    raise ValueError(
        f"snapshot {from_snapshot!r} is not an ancestor of {to_sid!r} in {table_dir}"
    )


def read_incremental(
    spark: SparkSession,
    table_dir: str,
    from_snapshot: str,
    to_snapshot: str | None = None,
) -> DataFrame:
    """Incremental scan (Iceberg's incremental append scan, made
    delete-aware): the rows APPENDED by snapshots after
    ``from_snapshot`` up to ``to_snapshot`` (default current) that are
    still live at ``to_snapshot``. A recrawl pipeline extracts only
    this delta instead of re-reading the table: IO is proportional to
    what changed, not to table size — the difference between re-scanning
    100 TB and scanning the day's crawl.

    Implementation: the window's manifests name exactly the data files
    each append commit added, so the delta is a merge-on-read scan of
    that file subset against the window's equality-delete files (a row
    appended then taken down inside the window is NOT returned — the
    seq rule is the same one the snapshot scan uses). Replace commits
    (compaction) rewrite EXISTING rows into new files; their "added"
    files are excluded — compaction moves bytes, it does not change the
    table, and an incremental consumer must not see rewritten rows
    twice. The appended files of a compacted-over window are still on
    disk until ``expire_snapshots`` — like Iceberg, incremental reads
    require the window's snapshots to be retained.

    IO is bounded by the window's appended+deleted bytes; nothing about
    this scan touches the rest of the table, so it costs the same on a
    100 TB table as on the day-one table."""
    window = snapshots_between(table_dir, from_snapshot, to_snapshot)
    files: list[str] = []
    file_seq: dict[str, int] = {}
    delete_files: list[dict] = []
    seen_deletes: set[str] = set()
    for m in window:
        if m.get("operation") != "replace":
            for f in m.get("added", []):
                files.append(f)
                file_seq[f] = m["seq"]
        # collect every delete entry any window manifest references —
        # compaction materializes deletes out of LATER manifests, but a
        # delete committed in the window still applies to the window's
        # earlier appends
        for d in m.get("delete_files", []):
            if d["path"] not in seen_deletes:
                seen_deletes.add(d["path"])
                delete_files.append(d)
    to_m = _load_manifest(
        table_dir, to_snapshot or current_snapshot_id(table_dir)
    )
    if not files:
        if not to_m["files"]:
            return _empty_frame(spark, to_m)
        return _scan_schema_only(
            spark, _data_dir(table_dir), to_m["files"],
            schema_info=_registry(to_m),
        )
    # deletes committed at-or-before `from` have seq <= every window
    # file's seq, so they never match the seq rule; keeping them in the
    # list is harmless, but dropping them avoids pointless anti-joins
    min_seq = min(file_seq.values())
    delete_files = [d for d in delete_files if d["seq"] > min_seq]
    # the delta reads under the WINDOW-END schema (Iceberg's rule: an
    # incremental consumer sees the table as of `to`)
    return _scan_merge_on_read(
        spark, table_dir, sorted(files), file_seq, delete_files,
        schema_info=_registry(to_m),
    )


def read_changes(
    spark: SparkSession,
    table_dir: str,
    from_snapshot: str,
    to_snapshot: str | None = None,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Changelog (CDC) scan between two snapshots: every row the window
    INSERTED (live at ``to``) plus every row it DELETED, tagged with a
    ``_change_type`` column ('insert' | 'delete'). This is what a
    downstream consumer needs to maintain a derived store — a search
    index or a dedup signature table retracts taken-down documents and
    adds the recrawl's, instead of rebuilding from a full scan.

    Inserts are ``read_incremental`` (window-added files, merge-on-read).
    Deleted ROWS need the pre-delete data: the window's delete keys are
    SEMI-JOINED against the ``from`` snapshot — the keys stay a
    DataFrame end to end (a bulk delete of millions of urls never
    touches driver memory; AQE broadcasts the key side when it is
    takedown-sized and falls back to a shuffle join when it is not).
    The only thing collected is the keys' DISTINCT BUCKET set — bounded
    by n_buckets, never by key count — pushed as a plan-time partition
    filter so a K-url takedown reads only the buckets the victims hash
    to, not the table. A key deleted in the window that was never live
    at ``from`` (inserted and deleted inside the window) does not
    produce a delete row — consumers never saw it."""
    window = snapshots_between(table_dir, from_snapshot, to_snapshot)
    from_m = _load_manifest(table_dir, from_snapshot)
    to_m = _load_manifest(
        table_dir, to_snapshot or current_snapshot_id(table_dir)
    )
    # inserts read under the `to` schema, deletes under `from`'s — a
    # schema change inside the window would union mismatched shapes
    if (_registry(from_m) or (None, None, None))[1] != (
        _registry(to_m) or (None, None, None)
    )[1]:
        raise ValueError(
            "read_changes across a schema-evolution commit is not "
            "supported; split the window at the evolve snapshot"
        )
    ins = read_incremental(
        spark, table_dir, from_snapshot, to_snapshot
    ).withColumn("_change_type", F.lit("insert"))

    from_seq = from_m["seq"]
    ddir = _delete_dir(table_dir)
    # only deletes COMMITTED in the window retract rows a `from` reader
    # could have seen; the from-manifest's own deletes already hid theirs
    paths, keys = [], set()
    for m in window:
        for d in m.get("delete_files", []):
            if d["seq"] > from_seq and d["path"] not in paths:
                paths.append(d["path"])
                keys.add(d.get("key", "url"))
    if not paths:
        return ins
    if keys != {"url"}:
        raise ValueError(f"read_changes supports url-keyed deletes, got {keys}")
    del_keys = (
        spark.read.parquet(*[os.path.join(ddir, p) for p in paths])
        .select("url").distinct()
    )
    # the bucket modulus comes from the TABLE's manifest, not the
    # caller: computing victim buckets with a different modulus than
    # the one the data was written under would miss the victims'
    # partitions and silently drop delete rows from the changelog (the
    # parameter remains only as a fallback for tables committed before
    # n_buckets was recorded)
    nb = to_m.get("n_buckets") or n_buckets
    # O(n_buckets) driver rows, regardless of how many keys were deleted
    buckets = sorted(
        r["b"]
        for r in del_keys.select(bucket_col("url", nb).alias("b"))
        .distinct().collect()
    )
    base = read_table(spark, table_dir, from_snapshot)
    dels = (
        base.filter(F.col("bucket").isin(buckets))
        .join(del_keys, on="url", how="left_semi")
        .withColumn("_change_type", F.lit("delete"))
    )
    return ins.unionByName(dels)


def compact(
    spark: SparkSession,
    table_dir: str,
    target_partitions_per_day_bucket: int = 1,
    sort_within_partitions: list[str] | None = None,
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
    cur = read_table(spark, table_dir)  # merge-on-read: deletes applied
    parent = current_snapshot_id(table_dir)
    pm = _load_manifest(table_dir, parent) if parent else None
    before = set(_list_data_files(table_dir))
    if sort_within_partitions:
        # Iceberg sort-order rewrite: RANGE-partition on (day, bucket,
        # sort cols) so each (day, bucket) dir gets several files, each
        # covering a narrow sort-col range — that's what makes the
        # manifest min/max stats selective. target_partitions_per_day_
        # bucket stays the per-dir file budget. The dir count comes
        # from the manifest's relpaths (day=X/bucket=Y/ prefixes) — an
        # exact upper bound with ZERO Spark jobs, where a
        # distinct().count() would merge-on-read scan the whole table
        # once just to plan the rewrite that then scans it again.
        n_dirs = max(
            1,
            len({os.path.dirname(f) for f in (pm["files"] if pm else [])}),
        )
        n_out = n_dirs * max(1, target_partitions_per_day_bucket)
        rewrite = cur.repartitionByRange(
            n_out, "day", "bucket", *sort_within_partitions
        ).sortWithinPartitions("day", "bucket", *sort_within_partitions)
    else:
        rewrite = cur.repartition(
            target_partitions_per_day_bucket, "day", "bucket"
        )
    # int64 micros: keeps footer stats alive (see _write_data)
    with _micros_timestamps(spark):
        (
            rewrite.write.mode("append")
            .partitionBy("day", "bucket")
            .parquet(_data_dir(table_dir))
        )
    after = _list_data_files(table_dir)
    added = sorted(set(after) - before)
    seq = pm["seq"] + 1 if pm else 1
    h = hashlib.md5()
    h.update((parent or "").encode())
    h.update(b"compact")
    for f in added:
        h.update(f.encode())
    snap_id = h.hexdigest()[:16]
    entry = dict(
        snapshot_id=snap_id,
        parent=parent,
        seq=seq,
        operation="replace",
        n_files=len(added),
        added=added,
        files=added,  # the compacted snapshot reads ONLY the new files
        file_seq={f: seq for f in added},
        file_stats=_file_stats(_data_dir(table_dir), added),
        delete_files=[],  # materialized by the rewrite: no delete baggage
        schema_json=_read_schema_json(cur),
        n_buckets=pm.get("n_buckets") if pm else None,
        committed_ms=int(time.time() * 1000),
    )
    # compact reads mapped-to-current frames, so its files ARE current
    _carry_schema(pm, entry, added)
    # same single metadata operation as every other commit; the log
    # row carries operation='replace' so audits can tell a compaction
    # from an append (delete/merge commits were already labeled)
    _commit(table_dir, entry, log_extra=("operation",))
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

    live: set[str] = set()
    live_del: set[str] = set()
    for s in kept:
        m = _load_manifest(table_dir, s["snapshot_id"])
        live |= set(m["files"])
        live_del |= {d["path"] for d in m["delete_files"]}
    dead = [f for f in _list_data_files(table_dir) if f not in live]
    for f in dead:
        os.remove(os.path.join(data, f))
    # drop now-empty partition dirs so the hive layout stays clean
    for dirpath, _dirs, _files in os.walk(data, topdown=False):
        if dirpath != data and not os.listdir(dirpath):
            os.rmdir(dirpath)
    # GC delete files (whole per-snapshot dirs) no kept snapshot references
    ddir = _delete_dir(table_dir)
    if os.path.isdir(ddir):
        live_del_dirs = {p.split(os.sep, 1)[0] for p in live_del}
        for d in os.listdir(ddir):
            if d not in live_del_dirs:
                shutil.rmtree(os.path.join(ddir, d))
                dead.append(os.path.join("deletes", d))
    for s in expired:
        p = os.path.join(sdir, f"{s['snapshot_id']}.json")
        if os.path.exists(p):
            os.remove(p)
    with open(os.path.join(sdir, "log.jsonl"), "w") as fh:
        for s in kept:
            fh.write(json.dumps(s) + "\n")
    return dict(expired_snapshots=len(expired), deleted_files=len(dead),
                kept_files=len(live))


# ---------------------------------------------------------------------------
# Schema evolution (Iceberg id-based column mapping)
# ---------------------------------------------------------------------------
# Iceberg's evolution guarantee is that columns are tracked by FIELD ID,
# not by name: a rename is a metadata edit, an added column reads as
# NULL from pre-evolution files, and a drop projects the column away
# from every file without rewriting bytes. The manifest grows three
# keys the first time a table evolves (legacy tables that never call an
# evolution op keep their manifests and their exact read path — zero
# overhead):
#   schemas:        {schema_id: [[field_id, name, spark_sql_type], ...]}
#   current_schema: the id appends write under
#   file_schema:    {relpath: schema_id} (absent -> the initial schema)
# Reads group files by schema id and map each group to the CURRENT
# schema by field id — at most n_schema_versions unions of metadata
# cost, never a data rewrite.


def _registry(m: dict):
    """(schemas, current_schema_id, file_schema) or None for tables
    that never evolved."""
    if "schemas" not in m:
        return None
    return m["schemas"], m["current_schema"], m.get("file_schema", {})


def _footer_fields(spark: SparkSession, table_dir: str, relpath: str) -> list:
    """Initial field-id assignment from one live file's footer, in
    column order (Iceberg's fresh-assignment rule). Data columns only —
    day/bucket are directory-encoded."""
    sch = spark.read.parquet(os.path.join(_data_dir(table_dir), relpath)).schema
    return [
        [i + 1, f.name, f.dataType.simpleString()]
        for i, f in enumerate(sch.fields)
    ]


def _carry_schema(pm: dict | None, entry: dict, added: list[str]) -> None:
    """Propagate the schema registry through a data commit, tagging the
    commit's new files with the current schema id. No-op for tables
    that never evolved."""
    if not pm or "schemas" not in pm:
        return
    entry["schemas"] = pm["schemas"]
    entry["current_schema"] = pm["current_schema"]
    fs = dict(pm.get("file_schema", {}))
    for f in added:
        fs[f] = pm["current_schema"]
    entry["file_schema"] = fs


_LAYOUT_COLS = ("url", "warc_ts")


def _evolve(spark: SparkSession, table_dir: str, op: str, transform) -> str:
    """Commit a metadata-only schema change: same files, same seq (no
    data changed, so delete applicability is untouched), new current
    schema."""
    parent = current_snapshot_id(table_dir)
    if parent is None:
        raise ValueError(f"no snapshots committed in {table_dir}")
    pm = _load_manifest(table_dir, parent)
    reg = _registry(pm)
    if reg is None:
        if not pm["files"]:
            raise ValueError("schema evolution needs at least one data file")
        schemas = {"0": _footer_fields(spark, table_dir, pm["files"][0])}
        cur, file_schema = 0, {f: 0 for f in pm["files"]}
    else:
        schemas = {k: [list(f) for f in v] for k, v in reg[0].items()}
        cur, file_schema = reg[1], dict(reg[2])
    new_fields = transform([list(f) for f in schemas[str(cur)]], pm, schemas)
    new_id = max(int(k) for k in schemas) + 1
    schemas[str(new_id)] = new_fields
    h = hashlib.md5()
    h.update(parent.encode())
    h.update(op.encode())
    h.update(json.dumps(new_fields).encode())
    snap_id = h.hexdigest()[:16]
    entry = dict(
        snapshot_id=snap_id,
        parent=parent,
        seq=pm["seq"],
        operation="evolve",
        n_files=len(pm["files"]),
        added=[],
        files=pm["files"],
        file_seq=pm["file_seq"],
        file_stats=pm["file_stats"],
        delete_files=pm["delete_files"],
        schemas=schemas,
        current_schema=new_id,
        file_schema=file_schema,
        committed_ms=int(time.time() * 1000),
    )
    _commit(table_dir, entry, log_extra=("operation",))
    return snap_id


def add_column(spark: SparkSession, table_dir: str, name: str, dtype: str) -> str:
    """ALTER TABLE ADD COLUMN: metadata-only; pre-evolution files read
    the column as NULL of ``dtype`` (a Spark SQL type string)."""

    def t(fields, pm, schemas):
        if any(f[1] == name for f in fields):
            raise ValueError(f"column {name!r} already exists")
        # field ids are NEVER reused (Iceberg rule): max over every
        # schema version ever, not just the current one — re-adding a
        # dropped name must not resurrect the dropped column's data
        next_fid = 1 + max(f[0] for fs in schemas.values() for f in fs)
        return fields + [[next_fid, name, dtype]]

    return _evolve(spark, table_dir, f"add:{name}", t)


def rename_column(spark: SparkSession, table_dir: str, old: str, new: str) -> str:
    """ALTER TABLE RENAME COLUMN: metadata-only; every file's data —
    old and new — reads under the new name (field-id mapping). Refused
    for the layout columns (bucket/day derive from them at append time)
    and for columns a LIVE equality-delete file keys on (the anti-join
    would look for the old name; compact first to materialize)."""

    def t(fields, pm, schemas):
        if old in _LAYOUT_COLS:
            raise ValueError(f"{old!r} is a partition-layout column")
        if any(d.get("key", "url") == old for d in pm["delete_files"]):
            raise ValueError(
                f"live equality-delete files key on {old!r}; compact first"
            )
        if any(f[1] == new for f in fields):
            raise ValueError(f"column {new!r} already exists")
        out = [list(f) for f in fields]
        hit = [f for f in out if f[1] == old]
        if not hit:
            raise ValueError(f"no column {old!r}")
        hit[0][1] = new
        return out

    return _evolve(spark, table_dir, f"rename:{old}:{new}", t)


def drop_column(spark: SparkSession, table_dir: str, name: str) -> str:
    """ALTER TABLE DROP COLUMN: metadata-only; the column is projected
    away from every file at read time (bytes stay until compaction
    rewrites them). Same refusals as rename."""

    def t(fields, pm, schemas):
        if name in _LAYOUT_COLS:
            raise ValueError(f"{name!r} is a partition-layout column")
        if any(d.get("key", "url") == name for d in pm["delete_files"]):
            raise ValueError(
                f"live equality-delete files key on {name!r}; compact first"
            )
        out = [f for f in fields if f[1] != name]
        if len(out) == len(fields):
            raise ValueError(f"no column {name!r}")
        return out

    return _evolve(spark, table_dir, f"drop:{name}", t)


def _map_to_current(df: DataFrame, from_fields: list, to_fields: list) -> DataFrame:
    """Project a frame read under one schema version onto the current
    schema BY FIELD ID: renamed fields alias, added fields materialize
    as typed NULLs, dropped fields disappear. Partition columns pass
    through untouched."""
    old = {f[0]: f for f in from_fields}
    cols = []
    for fid, name, dtype in to_fields:
        if fid in old:
            cols.append(F.col(old[fid][1]).alias(name))
        else:
            cols.append(F.lit(None).cast(dtype).alias(name))
    for pc in ("day", "bucket"):
        if pc in df.columns:
            cols.append(F.col(pc))
    return df.select(*cols)
