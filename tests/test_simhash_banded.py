"""Banded 64-bit SimHash near-dup join: pigeonhole recall guarantee.

The round-1 design bucketed a 16-bit signature on its top byte, which
missed hamming<=3 pairs whose differing bits fell inside the prefix
byte. The banded join (4 x 16-bit band tables) must find EVERY pair
with hamming <= 3 — any 3 differing bits leave at least one of the 4
bands identical — so against a brute-force Hamming scan the result set
is exactly equal, not just a subset.
"""

from __future__ import annotations

import random

from paddleocr_spark.functions.dedup import (
    banded_near_dup_pairs,
    simhash64_near_dup_pairs,
)


def _sig_df(spark, sigs):
    rows = [(i, b[0], b[1], b[2], b[3]) for i, b in sigs]
    return spark.createDataFrame(
        rows, "doc_id bigint, b0 int, b1 int, b2 int, b3 int"
    )


def _brute_pairs(sigs, max_hamming=3):
    out = set()
    for i, (ia, a) in enumerate(sigs):
        for ib, b in sigs[i + 1 :]:
            h = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
            if h <= max_hamming:
                lo, hi = min(ia, ib), max(ia, ib)
                out.add((lo, hi, h))
    return out


def test_banded_finds_straddling_hamming3_pair(spark):
    """A hamming-3 pair whose 3 differing bits are spread across three
    DIFFERENT bands (the shape a single-prefix bucket join misses —
    e.g. bits inside the old prefix byte). Band 4 is identical, so the
    band join must surface it."""
    sigs = [
        (1, (0, 0, 0, 0)),
        (2, (1, 2, 4, 0)),      # 3 bits differ, one in each of bands 0-2
        (3, (8, 8, 8, 8)),      # 4 bits differ from doc 1, one per band
        (4, (0, 0, 0, 0)),      # exact signature dup of doc 1
    ]
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in banded_near_dup_pairs(_sig_df(spark, sigs)).collect()
    }
    assert got == {(1, 2, 3), (1, 4, 0), (2, 4, 3)}
    # doc 3 shares no band with anyone -> correctly absent (hamming 4
    # exceeds the threshold anyway; the guarantee is only for <= 3)
    assert not any(3 in (a, b) for a, b, _ in got)


def test_banded_equals_brute_force_on_random_sigs(spark):
    """Property: on random signatures with planted near-dups, the
    banded join returns EXACTLY the brute-force hamming<=3 pair set
    (pigeonhole completeness + exact verification)."""
    rng = random.Random(7)
    sigs = []
    for i in range(30):
        sigs.append((i, tuple(rng.randrange(1 << 16) for _ in range(4))))
    # plant near-dups: flip 0-3 random bits of existing signatures
    next_id = 100
    for base in range(0, 30, 5):
        sig = list(sigs[base][1])
        for _ in range(rng.randrange(4)):
            j = rng.randrange(64)
            sig[j // 16] ^= 1 << (j % 16)
        sigs.append((next_id, tuple(sig)))
        next_id += 1

    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in banded_near_dup_pairs(_sig_df(spark, sigs)).collect()
    }
    assert got == _brute_pairs(sigs)
    assert len(got) > 0


def test_simhash64_end_to_end_finds_text_dups(spark):
    """Exact-duplicate texts have identical 64-bit signatures
    (hamming 0); a fully unrelated text does not pair with them."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words about spark execution engines"),
        ],
        "doc_id bigint, text string",
    )
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in simhash64_near_dup_pairs(df).collect()}
    assert (1, 2, 0) in got
    assert not any(3 in (a, b) for a, b, _ in got)
