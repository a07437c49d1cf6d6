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


def test_spark_lmdb_dataset_sample_ratio(spark, tmp_path):
    """ratio_list analog: deterministic hash-gated subsampling — same
    rows on every run and partitioning, fraction near the target."""
    root = str(tmp_path / "data_r")
    _make_rec_env(os.path.join(root, "set_a"), 200, missing=set())
    a = read_lmdb_dataset(spark, root, num_partitions=8, sample_ratio=0.5)
    b = read_lmdb_dataset(spark, root, num_partitions=3, sample_ratio=0.5)
    ra = sorted(r["idx"] for r in a.collect())
    rb = sorted(r["idx"] for r in b.collect())
    assert ra == rb                       # partitioning-invariant
    assert 70 <= len(ra) <= 130           # ~0.5 of 200


def test_spark_lmdb_dataset_sr(spark, tmp_path):
    """LMDBDataSetSR keys + str_filt semantics: hr/lr pairs, vocab
    filtering, over-max_len and missing-key rows skipped."""
    from paddleocr_spark.sources.lmdb_store import (
        read_lmdb_dataset_sr,
        str_filt,
        write_mdb,
    )

    assert str_filt("Ab-1 c!", "upper") == "Ab1c"
    assert str_filt("Ab-1 c!", "lower") == "ab1c"
    assert str_filt("Ab-1 c!", "all") == "Ab-1c!"

    env = str(tmp_path / "sr" / "env0")
    items = {b"num-samples": b"4"}
    labels = {1: "Word One", 2: "x" * 200, 3: "ok3!"}  # 4 has no keys
    for i, w in labels.items():
        items[b"label-%09d" % i] = w.encode()
        items[b"image_hr-%09d" % i] = b"HR" * 64 + i.to_bytes(2, "big")
        items[b"image_lr-%09d" % i] = b"lr" * 16 + i.to_bytes(2, "big")
    write_mdb(env, items)

    rows = {r["idx"]: r for r in
            read_lmdb_dataset_sr(spark, str(tmp_path / "sr")).collect()}
    assert set(rows) == {1, 3}            # 2 over max_len, 4 missing
    assert rows[1]["label"] == "WordOne"  # space stripped by str_filt
    assert rows[3]["label"] == "ok3"      # '!' stripped under 'upper'
    assert bytes(rows[1]["image_hr"]).startswith(b"HR")
    assert bytes(rows[1]["image_lr"]).startswith(b"lr")


def test_spark_lmdb_dataset_tablemaster(spark, tmp_path):
    """TableMaster layout: single env, pickled __len__, str(i) keys
    holding (file_name, image, info_lines); structure tokens + bboxes
    parsed like the reference's annotation split; bad rows skipped."""
    import pickle

    from paddleocr_spark.sources.lmdb_store import (
        read_lmdb_dataset_tablemaster,
        write_mdb,
    )

    env = str(tmp_path / "tm")
    items = {b"__len__": pickle.dumps(3)}
    info = "img_1.png\n<td>,<td>,</tr>\n1,2,3,4\n5,6,7,8"
    items[b"1"] = pickle.dumps(("img_1.png", b"\xffIMG1", info))
    items[b"2"] = b"not a pickle"          # skipped
    items[b"3"] = pickle.dumps(("img_3.png", b"\xffIMG3",
                                "img_3.png\n<td>\n9,10,11,12"))
    write_mdb(env, items)

    rows = {r["idx"]: r for r in
            read_lmdb_dataset_tablemaster(spark, env).collect()}
    assert set(rows) == {1, 3}
    assert rows[1]["structure"] == ["<td>", "<td>", "</tr>"]
    assert [list(b) for b in rows[1]["bboxes"]] == [[1, 2, 3, 4], [5, 6, 7, 8]]
    assert bytes(rows[3]["image"]) == b"\xffIMG3"


def test_reader_rejects_garbage_and_truncation(tmp_path):
    """Corrupt inputs fail fast with MdbError at construction (the
    meta-arbitration gate), never a hang or a raw unpack crash."""
    import pytest

    from paddleocr_spark.sources.lmdb_store import MdbError, MdbReader

    g = tmp_path / "garbage"
    g.mkdir()
    (g / "data.mdb").write_bytes(b"\x00" * 8192)
    with pytest.raises(MdbError):
        MdbReader(str(g))

    t = tmp_path / "trunc"
    t.mkdir()
    (t / "data.mdb").write_bytes(b"\x13\x37" * 100)  # < one page
    with pytest.raises(MdbError):
        MdbReader(str(t))


def test_psize_stamped_and_honored(tmp_path):
    """The writer stamps mm_psize (mm_dbs[FREE_DBI].md_pad — real
    liblmdb refuses files without it, MDB_INVALID), and the reader
    honors a stamped non-4096 page size instead of hardcoding 4096 —
    e.g. a data.mdb produced by liblmdb on a 16K-page host."""
    env = write_mdb(str(tmp_path / "env"), {b"k": b"v", b"z": b"9"})
    raw = open(os.path.join(env, "data.mdb"), "rb").read()
    # free DB struct at 16 + 24 = 40; its pad field IS mm_psize
    assert struct.unpack_from("<I", raw, 40)[0] == PAGESIZE

    # synthesize the same file at psize 8192 by re-laying the pages
    # (each 4096-page payload fits an 8192 page; headers stay at the
    # page head, node ptrs are page-relative so only the slot offsets
    # computed from `upper` shift — rebuild instead with the writer's
    # own primitives at a larger psize is overkill: just check the
    # reader trusts a stamped psize for meta-1 location)
    big = bytearray(8192 * 2)
    big[0:4096] = raw[0:4096]                 # meta 0 at offset 0
    big[8192 : 8192 + 4096] = raw[4096:8192]  # meta 1 at offset psize
    struct.pack_into("<I", big, 40, 8192)                  # meta0 mm_psize
    struct.pack_into("<I", big, 8192 + 40, 8192)           # meta1 mm_psize
    import paddleocr_spark.sources.lmdb_store as L

    p = tmp_path / "env8k"
    p.mkdir()
    (p / "data.mdb").write_bytes(bytes(big))
    r = L.MdbReader(str(p))
    assert r.psize == 8192
    # root leaf was page 2 at 4096-paging; at 8192 paging the data
    # pages don't exist — the point here is ONLY meta arbitration:
    # txnid 1 (meta 0) must win and entries must read through
    assert r.entries == 2
    r.close()


def test_write_mdb_rejects_oversized_key(tmp_path):
    """mdb_put's MDB_BAD_VALSIZE analog: a key over the lmdb max key
    size must raise at write time — silently appending it would
    overwrite the page header and corrupt the fixture."""
    import pytest

    from paddleocr_spark.sources.lmdb_store import MdbError

    with pytest.raises(MdbError, match="max key size"):
        write_mdb(str(tmp_path / "env"), {b"k" * 600: b"v"})
