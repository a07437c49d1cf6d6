"""LMDB (MDB format) reader/writer + the distributed LMDBDataSet analog.

The structural tests pin the byte layout to the PUBLIC format spec
(liblmdb mdb.c): meta magic/version/txnid offsets, page flags, node
packing arithmetic, overflow page headers — so the reader is checked
against the format itself, not merely against this repo's writer.
"""

from __future__ import annotations

import os
import struct

import pytest

from paddleocr_spark.sources.lmdb_store import (
    MDB_MAGIC,
    P_INVALID,
    PAGESIZE,
    MdbReader,
    find_lmdb_envs,
    read_lmdb_dataset,
    write_mdb,
)


def test_meta_page_structural_bytes(tmp_path):
    env = write_mdb(str(tmp_path / "env"), {b"a": b"1", b"num-samples": b"2"})
    raw = open(os.path.join(env, "data.mdb"), "rb").read()
    # page 0: header pgno=0, P_META flag at offset 10
    assert struct.unpack_from("<Q", raw, 0)[0] == 0
    assert struct.unpack_from("<H", raw, 10)[0] & 0x08
    # MDB_meta: magic at +16, version at +20 (mdb.c MDB_meta layout)
    assert struct.unpack_from("<I", raw, 16)[0] == MDB_MAGIC == 0xBEEFC0DE
    assert struct.unpack_from("<I", raw, 20)[0] == 1
    # main DB struct at 16 + 24 (head) + 48 (free db) = 88; entries at +32
    assert struct.unpack_from("<Q", raw, 88 + 32)[0] == 2
    # txnid at 40 + 2*48 + 8 = 144: page 0 live (1), page 1 stale (0)
    assert struct.unpack_from("<Q", raw, 144)[0] == 1
    assert struct.unpack_from("<Q", raw, PAGESIZE + 144)[0] == 0
    # the single leaf page: P_LEAF flag, NUMKEYS = (lower-16)>>1 = 2
    root = struct.unpack_from("<Q", raw, 88 + 40)[0]
    base = root * PAGESIZE
    assert struct.unpack_from("<H", raw, base + 10)[0] & 0x02
    lower = struct.unpack_from("<H", raw, base + 12)[0]
    assert (lower - 16) >> 1 == 2
    # node 0 is the smallest key (b"a"): header mn_lo=dsize=1, ksize=1
    ptr0 = struct.unpack_from("<H", raw, base + 16)[0]
    lo, hi, flags, ksize = struct.unpack_from("<HHHH", raw, base + ptr0)
    assert (lo, hi, flags, ksize) == (1, 0, 0, 1)
    assert raw[base + ptr0 + 8 : base + ptr0 + 9] == b"a"


def test_overflow_page_layout(tmp_path):
    val = bytes(range(256)) * 40  # 10240 bytes -> F_BIGDATA
    env = write_mdb(str(tmp_path / "env"), {b"big": val, b"k": b"v"})
    raw = open(os.path.join(env, "data.mdb"), "rb").read()
    with MdbReader(env) as r:
        assert r.get(b"big") == val
        assert r.overflow_pages == (16 + len(val) + PAGESIZE - 1) // PAGESIZE
    # find the overflow page: P_OVERFLOW flag, pb_pages count at +12,
    # data contiguous from +16 across pages with no further headers
    n_ov = (16 + len(val) + PAGESIZE - 1) // PAGESIZE
    found = False
    for pg in range(2, len(raw) // PAGESIZE):
        if struct.unpack_from("<H", raw, pg * PAGESIZE + 10)[0] & 0x04:
            assert struct.unpack_from("<I", raw, pg * PAGESIZE + 12)[0] == n_ov
            start = pg * PAGESIZE + 16
            assert raw[start : start + len(val)] == val
            found = True
            break
    assert found


def test_roundtrip_multilevel_tree(tmp_path):
    # 3000 entries force at least one branch level; include an empty
    # value, a 3 KB value (overflow), and byte keys out of write order
    items = {b"key-%06d" % i: (b"v%d" % i) * (i % 7) for i in range(3000)}
    items[b"empty"] = b""
    items[b"zz-big"] = b"\x01\x02" * 1500
    env = write_mdb(str(tmp_path / "env"), items)
    with MdbReader(env) as r:
        assert r.depth >= 2 and r.branch_pages >= 1
        assert len(r) == len(items)
        for k, v in items.items():
            assert r.get(k) == v, k
        assert r.get(b"key-999999") is None
        assert r.get(b"") is None
        assert list(r.items()) == sorted(items.items())


def test_empty_db(tmp_path):
    env = write_mdb(str(tmp_path / "env"), {})
    with MdbReader(env) as r:
        assert len(r) == 0 and r.root == P_INVALID
        assert r.get(b"x") is None
        assert list(r.items()) == []


def _make_rec_env(path: str, n: int, missing: set[int]) -> None:
    items = {b"num-samples": str(n).encode()}
    for i in range(1, n + 1):
        if i in missing:
            continue
        items[b"label-%09d" % i] = ("text_%d" % i).encode()
        items[b"image-%09d" % i] = (b"\x89IMG" + i.to_bytes(4, "big")) * 50
    write_mdb(path, items)


def test_spark_lmdb_dataset(spark, tmp_path):
    # hierarchical layout: two leaf env dirs at different depths
    # (lmdb_dataset.py:51-71 walks for dirs with no subdirectories)
    root = str(tmp_path / "data")
    _make_rec_env(os.path.join(root, "set_a"), 30, missing={7})
    _make_rec_env(os.path.join(root, "nested", "set_b"), 20, missing=set())

    envs = dict(find_lmdb_envs(root))
    assert set(envs.values()) == {30, 20}

    df = read_lmdb_dataset(spark, root, num_partitions=8)
    rows = df.collect()
    # sample 7 of set_a has no label key -> skipped, like the reference
    assert len(rows) == 30 - 1 + 20
    assert len({(r["dirpath"], r["idx"]) for r in rows}) == len(rows)
    by_key = {(os.path.basename(r["dirpath"].rstrip("/")), r["idx"]): r for r in rows}
    assert ("set_a", 7) not in by_key
    r = by_key[("set_a", 12)]
    assert r["label"] == "text_12"
    assert bytes(r["image"]) == (b"\x89IMG" + (12).to_bytes(4, "big")) * 50
    assert by_key[("set_b", 20)]["label"] == "text_20"
