"""Dependency-free LMDB (MDB file format) reader + the distributed
LMDBDataSet analog.

The reference trains recognizers from LMDB datasets
(ppocr/data/lmdb_dataset.py:27-156 `LMDBDataSet`): it walks a data
dir hierarchically, opens every leaf directory as a read-only lmdb
env (:51-71), reads ``num-samples`` (:64), and fetches 1-based
``label-%09d`` / ``image-%09d`` pairs, skipping samples whose label
key is missing (:126-134). The ``lmdb`` C extension is not available
in this environment, so this module implements a **read-only parser
of the public MDB file format itself** (as specified by liblmdb's
mdb.c, the OpenLDAP project — 4096-byte pages, dual meta pages with
txnid arbitration, B-tree branch/leaf pages, overflow pages for big
values), plus a spec-faithful single-transaction *writer* used to
generate test fixtures (real .mdb files cannot be produced here
either, for the same reason). Byte-level structural tests pin the
on-disk layout (magic/meta offsets, node packing, overflow layout)
so the parser is checked against the format spec, not merely against
its own writer.

Scale shape: an LMDB dataset is a single memory-mapped file per
directory; random access by key is O(log n) page reads. The Spark
reader therefore ships only (dirpath, index-range) to executors —
each task mmaps the file locally and point-reads its own index range
(mapInPandas, Arrow batches out). No whole-file broadcast, no
driver-side decode; the driver touches exactly one key per env
(``num-samples``), like the reference's init.
"""

from __future__ import annotations

import mmap
import os
import struct
from typing import Iterator

PAGESIZE = 4096
PAGEHDRSZ = 16
MDB_MAGIC = 0xBEEFC0DE
MDB_DATA_VERSION = 1

P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08

F_BIGDATA = 0x01

P_INVALID = 0xFFFFFFFFFFFFFFFF

# MDB_meta after the 16-byte page header: magic u32, version u32,
# address u64, mapsize u64, then two MDB_db structs (free, main),
# then last_pg u64, txnid u64. MDB_db: pad u32, flags u16, depth u16,
# branch_pages u64, leaf_pages u64, overflow_pages u64, entries u64,
# root u64 (48 bytes).
_META_HEAD = struct.Struct("<II8sQ")
_DB = struct.Struct("<IHHQQQQQ")
_META_TAIL = struct.Struct("<QQ")
_NODEHDR = struct.Struct("<HHHH")  # mn_lo, mn_hi, mn_flags, mn_ksize


class MdbError(ValueError):
    pass


class MdbReader:
    """Read-only cursor over one MDB data file (the main, unnamed DB).

    Accepts an env directory (containing ``data.mdb``) or a direct
    file path. The file is memory-mapped; ``get`` is a B-tree descent,
    ``items`` an in-order leaf walk — both O(touched pages), never a
    full-file read.
    """

    def __init__(self, path: str):
        if os.path.isdir(path):
            path = os.path.join(path, "data.mdb")
        self.path = path
        self._fh = open(path, "rb")
        self._mm = mmap.mmap(self._fh.fileno(), 0, access=mmap.ACCESS_READ)
        self.psize = PAGESIZE  # refined by _pick_meta from mm_psize
        meta = self._pick_meta()
        (
            _pad,
            self.db_flags,
            self.depth,
            self.branch_pages,
            self.leaf_pages,
            self.overflow_pages,
            self.entries,
            self.root,
        ) = meta

    def close(self) -> None:
        self._mm.close()
        self._fh.close()

    def __enter__(self) -> "MdbReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __len__(self) -> int:
        return self.entries

    # -- format plumbing ---------------------------------------------------

    def _meta_at(self, base: int) -> tuple[int, int, tuple]:
        """Meta page at byte offset ``base`` ->
        (txnid, psize, main-db struct) or raises MdbError. The page
        size lives in mm_dbs[FREE_DBI].md_pad (mdb.c mm_psize); a
        stamp of 0 (pre-upgrade fixtures) falls back to 4096."""
        flags = struct.unpack_from("<H", self._mm, base + 10)[0]
        if not flags & P_META:
            raise MdbError(f"offset {base} is not a meta page")
        magic, version, _addr, _mapsize = _META_HEAD.unpack_from(
            self._mm, base + PAGEHDRSZ
        )
        if magic != MDB_MAGIC:
            raise MdbError(f"bad magic {magic:#x}")
        if version != MDB_DATA_VERSION:
            raise MdbError(f"unsupported MDB data version {version}")
        dbs_off = base + PAGEHDRSZ + _META_HEAD.size
        free_db = _DB.unpack_from(self._mm, dbs_off)  # dbs[0]
        main_db = _DB.unpack_from(self._mm, dbs_off + _DB.size)  # dbs[1]
        _last_pg, txnid = _META_TAIL.unpack_from(self._mm, dbs_off + 2 * _DB.size)
        psize = free_db[0] or PAGESIZE
        return txnid, psize, main_db

    def _pick_meta(self) -> tuple:
        """Both meta pages are candidates; the live one has the larger
        txnid (mdb.c mdb_env_pick_meta). Meta 0 sits at offset 0 and
        stamps the page size that locates meta 1 (offset mm_psize); if
        meta 0 is unreadable, meta 1 is found by probing the real
        liblmdb page sizes — a probe offset only counts when the meta
        found there stamps that same psize."""
        cands = []
        try:
            cands.append(self._meta_at(0))
        except (MdbError, struct.error):
            pass
        probe = [cands[0][1]] if cands else [
            4096, 8192, 16384, 32768, 65536
        ]
        for off in probe:
            try:
                t, p, db = self._meta_at(off)
            except (MdbError, struct.error):
                continue
            if p == off:
                cands.append((t, p, db))
        if not cands:
            raise MdbError(f"{self.path}: no valid meta page")
        txnid, psize, main_db = max(cands, key=lambda t: t[0])
        self.psize = psize
        return main_db

    def _page(self, pgno: int) -> tuple[int, int, int, int]:
        """-> (base offset, flags, nkeys, lower). NUMKEYS(p) =
        (mp_lower - PAGEHDRSZ) >> 1."""
        base = pgno * self.psize
        flags = struct.unpack_from("<H", self._mm, base + 10)[0]
        lower = struct.unpack_from("<H", self._mm, base + 12)[0]
        return base, flags, (lower - PAGEHDRSZ) >> 1, lower

    def _node(self, base: int, i: int) -> tuple[int, int, int, bytes]:
        """Node i of the page at ``base`` -> (lo|hi<<16, flags, off, key)."""
        ptr = struct.unpack_from("<H", self._mm, base + PAGEHDRSZ + 2 * i)[0]
        off = base + ptr
        lo, hi, flags, ksize = _NODEHDR.unpack_from(self._mm, off)
        key = self._mm[off + 8 : off + 8 + ksize]
        return lo | (hi << 16), flags, off + 8 + ksize, key

    def _branch_child(self, base: int, i: int) -> int:
        ptr = struct.unpack_from("<H", self._mm, base + PAGEHDRSZ + 2 * i)[0]
        off = base + ptr
        lo, hi, flags, _ksize = _NODEHDR.unpack_from(self._mm, off)
        return lo | (hi << 16) | (flags << 32)

    def _leaf_value(self, dsize: int, nflags: int, data_off: int) -> bytes:
        if nflags & F_BIGDATA:
            ov_pgno = struct.unpack_from("<Q", self._mm, data_off)[0]
            ov = ov_pgno * self.psize
            ovflags = struct.unpack_from("<H", self._mm, ov + 10)[0]
            if not ovflags & P_OVERFLOW:
                raise MdbError(f"page {ov_pgno} is not an overflow page")
            start = ov + PAGEHDRSZ
            return self._mm[start : start + dsize]
        return self._mm[data_off : data_off + dsize]

    # -- public API --------------------------------------------------------

    def get(self, key: bytes) -> bytes | None:
        """Point lookup (txn.get analog): B-tree descent + binary
        search within each page."""
        if self.root == P_INVALID:
            return None
        pgno = self.root
        for _ in range(self.depth + 2):  # bounded descent, corrupt-safe
            base, flags, nkeys, _lower = self._page(pgno)
            if flags & P_LEAF:
                lo_i, hi_i = 0, nkeys - 1
                while lo_i <= hi_i:
                    mid = (lo_i + hi_i) >> 1
                    dsize, nflags, data_off, k = self._node(base, mid)
                    if k == key:
                        return self._leaf_value(dsize, nflags, data_off)
                    if k < key:
                        lo_i = mid + 1
                    else:
                        hi_i = mid - 1
                return None
            if not flags & P_BRANCH:
                raise MdbError(f"page {pgno}: unexpected flags {flags:#x}")
            # branch: rightmost child whose separator key <= key
            # (node 0's key is empty = -infinity, mdb.c mdb_node_search)
            child_i = 0
            lo_i, hi_i = 1, nkeys - 1
            while lo_i <= hi_i:
                mid = (lo_i + hi_i) >> 1
                _sz, _fl, _off, k = self._node(base, mid)
                if k <= key:
                    child_i = mid
                    lo_i = mid + 1
                else:
                    hi_i = mid - 1
            pgno = self._branch_child(base, child_i)
        raise MdbError("B-tree deeper than advertised depth (corrupt file)")

    def items(self) -> Iterator[tuple[bytes, bytes]]:
        """In-order (key-sorted) scan of all entries."""
        if self.root == P_INVALID:
            return
        stack = [(self.root, 0)]
        while stack:
            pgno, i = stack.pop()
            base, flags, nkeys, _lower = self._page(pgno)
            if flags & P_LEAF:
                for j in range(nkeys):
                    dsize, nflags, data_off, k = self._node(base, j)
                    yield k, self._leaf_value(dsize, nflags, data_off)
                continue
            if i + 1 < nkeys:
                stack.append((pgno, i + 1))
            stack.append((self._branch_child(base, i), 0))


# ---------------------------------------------------------------------------
# Fixture writer: a spec-faithful single-transaction MDB file builder.
# Real .mdb corpora are produced by liblmdb; this writer exists so the
# reader (and the Spark dataset on top of it) can be tested in an
# environment with no lmdb module. It follows the same layout rules as
# mdb.c's page code: nodes packed top-down from mp_upper, 2-byte
# aligned; values too big for a node spill to contiguous overflow
# pages (F_BIGDATA, node carries the full dsize + an 8-byte pgno);
# branch levels built bottom-up, first separator key empty.
# ---------------------------------------------------------------------------

_NODEMAX = (PAGESIZE - PAGEHDRSZ) // 2 - 2  # conservative mdb.c me_nodemax
_MAXKEYSIZE = 511  # mdb.c ENV_MAXKEY for 4096-byte pages


def _leaf_node_bytes(key: bytes, value: bytes, big: bool, ov_pgno: int) -> bytes:
    dsize = len(value)
    payload = struct.pack("<Q", ov_pgno) if big else value
    hdr = _NODEHDR.pack(dsize & 0xFFFF, dsize >> 16, F_BIGDATA if big else 0, len(key))
    raw = hdr + key + payload
    return raw + (b"\x00" * (len(raw) & 1))  # 2-byte alignment


def _branch_node_bytes(key: bytes, pgno: int) -> bytes:
    hdr = _NODEHDR.pack(pgno & 0xFFFF, (pgno >> 16) & 0xFFFF, (pgno >> 32) & 0xFFFF, len(key))
    raw = hdr + key
    return raw + (b"\x00" * (len(raw) & 1))


def _pack_page(pgno: int, flags: int, nodes: list[bytes]) -> bytes:
    page = bytearray(PAGESIZE)
    struct.pack_into("<Q", page, 0, pgno)
    struct.pack_into("<H", page, 10, flags)
    upper = PAGESIZE
    ptrs = []
    for nb in nodes:
        upper -= len(nb)
        page[upper : upper + len(nb)] = nb
        ptrs.append(upper)
    lower = PAGEHDRSZ + 2 * len(nodes)
    struct.pack_into("<HH", page, 12, lower, upper)
    for i, p in enumerate(ptrs):
        struct.pack_into("<H", page, PAGEHDRSZ + 2 * i, p)
    return bytes(page)


def write_mdb(path: str, items: dict[bytes, bytes] | list[tuple[bytes, bytes]]) -> str:
    """Build ``<path>/data.mdb`` holding ``items`` in the main DB.
    Returns the env directory path (mkdir'd like lmdb.open does)."""
    if isinstance(items, dict):
        entries = sorted(items.items())
    else:
        entries = sorted(items)
    os.makedirs(path, exist_ok=True)

    pages: list[bytes | None] = [None, None]  # metas patched last
    n_overflow = 0

    def alloc(raw: bytes) -> int:
        pages.append(raw)
        return len(pages) - 1

    # 1) leaves (and any overflow pages), packed greedily in key order
    leaf_pgnos: list[int] = []
    leaf_first_key: list[bytes] = []
    cur_nodes: list[bytes] = []
    cur_free = PAGESIZE - PAGEHDRSZ
    cur_first: bytes | None = None

    def flush_leaf() -> None:
        nonlocal cur_nodes, cur_free, cur_first
        if not cur_nodes:
            return
        leaf_pgnos.append(alloc(_pack_page(len(pages), P_LEAF, cur_nodes)))
        leaf_first_key.append(cur_first)
        cur_nodes, cur_free, cur_first = [], PAGESIZE - PAGEHDRSZ, None

    for key, value in entries:
        # real lmdb enforces this in mdb_put (MDB_BAD_VALSIZE); without
        # it an oversized key's node would be appended past an empty
        # page's capacity and _pack_page would silently overwrite the
        # page header — a corrupt fixture with no error at write time
        if len(key) > _MAXKEYSIZE:
            raise MdbError(
                f"key of {len(key)} bytes exceeds the lmdb max key size "
                f"({_MAXKEYSIZE})"
            )
        big = 8 + len(key) + len(value) > _NODEMAX
        ov_pgno = 0
        if big:
            n_ov = (PAGEHDRSZ + len(value) + PAGESIZE - 1) // PAGESIZE
            blob = bytearray(n_ov * PAGESIZE)
            struct.pack_into("<Q", blob, 0, len(pages))
            struct.pack_into("<H", blob, 10, P_OVERFLOW)
            struct.pack_into("<I", blob, 12, n_ov)  # pb_pages
            blob[PAGEHDRSZ : PAGEHDRSZ + len(value)] = value
            ov_pgno = len(pages)
            for i in range(n_ov):
                alloc(bytes(blob[i * PAGESIZE : (i + 1) * PAGESIZE]))
            n_overflow += n_ov
        nb = _leaf_node_bytes(key, value, big, ov_pgno)
        if len(nb) + 2 > cur_free:
            flush_leaf()
        if cur_first is None:
            cur_first = key
        cur_nodes.append(nb)
        cur_free -= len(nb) + 2
    flush_leaf()

    # 2) branch levels bottom-up until a single root
    depth = 1
    level = list(zip(leaf_pgnos, leaf_first_key))
    n_branch = 0
    if not level:
        root = P_INVALID
        depth = 0
    else:
        while len(level) > 1:
            depth += 1
            nxt: list[tuple[int, bytes]] = []
            bn: list[bytes] = []
            bfree = PAGESIZE - PAGEHDRSZ
            bfirst: bytes | None = None

            def flush_branch() -> None:
                nonlocal bn, bfree, bfirst, n_branch
                if not bn:
                    return
                # first node of every branch page carries the empty key
                first = _NODEHDR.unpack_from(bn[0])
                child0 = first[0] | (first[1] << 16) | (first[2] << 32)
                bn[0] = _branch_node_bytes(b"", child0)
                nxt.append((alloc(_pack_page(len(pages), P_BRANCH, bn)), bfirst))
                n_branch += 1
                bn, bfree, bfirst = [], PAGESIZE - PAGEHDRSZ, None

            for child_pgno, first_key in level:
                nb = _branch_node_bytes(first_key, child_pgno)
                if len(nb) + 2 > bfree:
                    flush_branch()
                if bfirst is None:
                    bfirst = first_key
                bn.append(nb)
                bfree -= len(nb) + 2
            flush_branch()
            level = nxt
        root = level[0][0]

    # 3) metas: page 0 live (txnid 1), page 1 stale (txnid 0)
    mapsize = len(pages) * PAGESIZE
    for pgno, txnid in ((0, 1), (1, 0)):
        page = bytearray(PAGESIZE)
        struct.pack_into("<Q", page, 0, pgno)
        struct.pack_into("<H", page, 10, P_META)
        off = PAGEHDRSZ
        _META_HEAD.pack_into(page, off, MDB_MAGIC, MDB_DATA_VERSION, b"\x00" * 8, mapsize)
        off += _META_HEAD.size
        # free DB; its pad field is mm_psize — real liblmdb stamps the
        # page size here and refuses files without it (MDB_INVALID)
        _DB.pack_into(page, off, PAGESIZE, 0, 0, 0, 0, 0, 0, P_INVALID)
        off += _DB.size
        _DB.pack_into(
            page, off, 0, 0, depth, n_branch, len(leaf_pgnos), n_overflow,
            len(entries), root,
        )
        off += _DB.size
        _META_TAIL.pack_into(page, off, len(pages) - 1, txnid)
        pages[pgno] = bytes(page)

    with open(os.path.join(path, "data.mdb"), "wb") as fh:
        for p in pages:
            fh.write(p)
    return path


# ---------------------------------------------------------------------------
# The distributed LMDBDataSet analog
# ---------------------------------------------------------------------------


def find_lmdb_envs(data_dir: str) -> list[tuple[str, int]]:
    """Hierarchical env discovery + num-samples, exactly the
    reference's init walk (lmdb_dataset.py:51-71): every directory
    with no subdirectories is an env. -> [(dirpath, num_samples)]."""
    out = []
    for dirpath, dirnames, _filenames in os.walk(data_dir + "/"):
        if not dirnames:
            with MdbReader(dirpath) as r:
                ns = r.get(b"num-samples")
            out.append((dirpath, int(ns) if ns else 0))
    return out


def _env_index_frame(spark, envs: list[tuple[str, int]], num_partitions: int):
    """The (dirpath, idx) frame every LMDB dataset variant fans out
    over: global row ids ranged over ``num_partitions`` tasks, mapped
    to (env, 1-based file idx) via a broadcast range-join on the
    per-env offsets — ONE shared definition so the recognition, SR,
    and any future variant can never diverge on the indexing/sampling
    semantics. Returns None when the envs hold no samples."""
    from pyspark.sql import functions as F

    total = sum(n for _, n in envs)
    if total == 0:
        return None
    rows, beg = [], 0
    for dirpath, n in envs:
        rows.append((dirpath, beg, n))
        beg += n
    offsets = spark.createDataFrame(rows, "dirpath string, beg bigint, n bigint")
    return (
        spark.range(0, total, 1, num_partitions)
        .join(
            F.broadcast(offsets),
            (F.col("id") >= F.col("beg")) & (F.col("id") < F.col("beg") + F.col("n")),
        )
        .select("dirpath", (F.col("id") - F.col("beg") + 1).alias("idx"))
    )


def read_lmdb_dataset(
    spark, data_dir: str, num_partitions: int = 32, sample_ratio: float = 1.0
):
    """LMDB recognition dataset -> DataFrame(dirpath, idx, image
    binary, label string). 1-based ``label-%09d``/``image-%09d`` keys;
    rows whose label key is missing are skipped (lmdb_dataset.py:
    126-134). The driver reads one key per env; executors mmap the
    file and point-read only their own index range.

    ``sample_ratio`` is the ``ratio_list`` analog (lmdb_dataset.py:46):
    the reference randomly subsamples each source; ours gates on a
    hash of (dirpath, idx) — same expected fraction, deterministic
    across runs and partitionings (the engine's sampling idiom)."""
    import pandas as pd
    from pyspark.sql import functions as F

    envs = find_lmdb_envs(data_dir)
    idx = _env_index_frame(spark, envs, num_partitions)
    if idx is None:
        return spark.createDataFrame(
            [], "dirpath string, idx bigint, image binary, label string"
        )
    if sample_ratio < 1.0:
        gate = F.pmod(F.xxhash64("dirpath", "idx"), F.lit(1_000_000))
        idx = idx.filter(gate < int(sample_ratio * 1_000_000))

    def fetch(batches):
        readers: dict[str, MdbReader] = {}
        try:
            for pdf in batches:
                out = {"dirpath": [], "idx": [], "image": [], "label": []}
                for dirpath, i in zip(pdf["dirpath"], pdf["idx"]):
                    r = readers.get(dirpath)
                    if r is None:
                        r = readers[dirpath] = MdbReader(dirpath)
                    label = r.get(b"label-%09d" % i)
                    if label is None:
                        continue
                    out["dirpath"].append(dirpath)
                    out["idx"].append(i)
                    out["image"].append(r.get(b"image-%09d" % i))
                    out["label"].append(label.decode("utf-8"))
                yield pd.DataFrame(out)
        finally:
            for r in readers.values():
                r.close()

    return idx.mapInPandas(
        fetch, "dirpath string, idx bigint, image binary, label string"
    )


# -- variant datasets (lmdb_dataset.py:158-303) ------------------------------

_SR_VOCABS = {
    # str_filt alphabets, lmdb_dataset.py:167-179
    "digit": "0123456789",
    "lower": "0123456789abcdefghijklmnopqrstuvwxyz",
    "upper": "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
    "all": (
        "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
    ),
}


def str_filt(s: str, voc_type: str = "upper") -> str:
    """`LMDBDataSetSR.str_filt` (lmdb_dataset.py:167-179): lowercase
    for voc_type='lower', then REMOVE every char outside the vocab
    (the reference's replace-with-empty loop)."""
    if voc_type == "lower":
        s = s.lower()
    voc = _SR_VOCABS[voc_type]
    return "".join(c for c in s if c in voc)


def read_lmdb_dataset_sr(
    spark, data_dir: str, num_partitions: int = 32, voc_type: str = "upper",
    max_len: int = 100,
):
    """LMDBDataSetSR analog (super-resolution pairs, lmdb_dataset.py:
    158-212) -> DataFrame(dirpath, idx, image_hr, image_lr, label).
    1-based ``label-%09d`` + ``image_hr-%09d``/``image_lr-%09d`` keys;
    the label passes `str_filt`; rows with a missing key or a label
    longer than ``max_len`` are skipped (the reference falls through to
    the next sample — a skip in set semantics). Image bytes stay
    opaque binary: the PIL decode is environment-blocked, exactly like
    functions/multimodal's decode boundary."""
    import pandas as pd
    from pyspark.sql import functions as F

    envs = find_lmdb_envs(data_dir)
    schema = (
        "dirpath string, idx bigint, image_hr binary, image_lr binary, "
        "label string"
    )
    idx = _env_index_frame(spark, envs, num_partitions)
    if idx is None:
        return spark.createDataFrame([], schema)

    def fetch(batches):
        readers: dict[str, MdbReader] = {}
        try:
            for pdf in batches:
                out = {"dirpath": [], "idx": [], "image_hr": [],
                       "image_lr": [], "label": []}
                for dirpath, i in zip(pdf["dirpath"], pdf["idx"]):
                    r = readers.get(dirpath)
                    if r is None:
                        r = readers[dirpath] = MdbReader(dirpath)
                    label = r.get(b"label-%09d" % i)
                    hr = r.get(b"image_hr-%09d" % i)
                    lr = r.get(b"image_lr-%09d" % i)
                    if label is None or hr is None or lr is None:
                        continue
                    word = label.decode("utf-8")
                    if len(word) > max_len:
                        continue
                    out["dirpath"].append(dirpath)
                    out["idx"].append(i)
                    out["image_hr"].append(hr)
                    out["image_lr"].append(lr)
                    out["label"].append(str_filt(word, voc_type))
                yield pd.DataFrame(out)
        finally:
            for r in readers.values():
                r.close()

    return idx.mapInPandas(fetch, schema)


def read_lmdb_dataset_tablemaster(spark, data_dir: str, num_partitions: int = 32):
    """LMDBDataSetTableMaster analog (lmdb_dataset.py:214-303) ->
    DataFrame(idx, file_name, structure array<string>, bboxes
    array<array<int>>, image binary). SINGLE env (no hierarchical
    walk), ``__len__`` key holds the pickled count, sample ``str(i)``
    keys hold pickled (file_name, image_bytes, info_lines); info_lines
    parse into structure tokens (line 2, comma-split) + one bbox per
    remaining line — the same annotation-file split the reference
    performs. Un-picklable/missing rows are skipped (the reference
    resamples). Pickle here parses OUR fixture writer's output and the
    reference's own tool output — the store format is pickled by spec."""
    import pickle

    import pandas as pd
    from pyspark.sql import functions as F

    with MdbReader(data_dir) as r:
        raw = r.get(b"__len__")
        total = int(pickle.loads(raw)) if raw is not None else 0
    schema = (
        "idx bigint, file_name string, structure array<string>, "
        "bboxes array<array<int>>, image binary"
    )
    if total == 0:
        return spark.createDataFrame([], schema)
    idx = spark.range(1, total + 1, 1, num_partitions).select(
        F.col("id").alias("idx")
    )

    def fetch(batches):
        r = MdbReader(data_dir)
        try:
            for pdf in batches:
                out = {"idx": [], "file_name": [], "structure": [],
                       "bboxes": [], "image": []}
                for i in pdf["idx"]:
                    raw = r.get(str(int(i)).encode("utf-8"))
                    if raw is None:
                        continue
                    try:
                        file_name, img, info_lines = pickle.loads(raw)
                        lines = info_lines.strip().split("\n")
                        structure = lines[1].split(",")
                        bboxes = [
                            [int(x) for x in ln.strip().split(",")]
                            for ln in lines[2:]
                        ]
                    except Exception:
                        continue
                    out["idx"].append(int(i))
                    out["file_name"].append(file_name)
                    out["structure"].append(structure)
                    out["bboxes"].append(bboxes)
                    out["image"].append(img)
                # an all-skipped batch would materialize the list
                # columns as empty float64 ndarrays, which Arrow cannot
                # map to list<string> — yield nothing instead
                if out["idx"]:
                    yield pd.DataFrame(out)
        finally:
            r.close()

    return idx.mapInPandas(fetch, schema)
