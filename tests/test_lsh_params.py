"""MinHash/LSH production parameterization: the banding S-curve.

The oracle queries use the 8-signature / 4-band miniature; the
production path must accept e.g. 128/16 and actually deliver the
banding formula's recall: P(candidate | jaccard=s) = 1 - (1 - s^r)^b
with r rows per band, monotone in s. Synthetic pairs with measured
word-3-gram jaccard validate both sides of the curve."""

from __future__ import annotations

import random

from paddleocr_spark.functions.dedup import lsh_candidate_pairs

WORDS = [f"w{i:03d}" for i in range(400)]


def _shingles(words, k=3):
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def _jaccard(a, b):
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


def _make_pairs(rng, n_pairs, n_replace, length=60):
    """Pairs where the second doc replaces `n_replace` words of the
    first with fresh vocabulary — jaccard drops with n_replace."""
    rows, pairs, jacs = [], [], []
    next_id = 0
    for _ in range(n_pairs):
        base = [rng.choice(WORDS) for _ in range(length)]
        other = list(base)
        for _ in range(n_replace):
            other[rng.randrange(length)] = f"x{rng.randrange(10**6)}"
        a, b = next_id, next_id + 1
        next_id += 2
        rows.append((a, " ".join(base)))
        rows.append((b, " ".join(other)))
        pairs.append((a, b))
        jacs.append(_jaccard(base, other))
    return rows, pairs, jacs


def test_production_banding_recall_meets_formula(spark):
    rng = random.Random(3)
    # near-dups: 2 replacements in 60 words -> jaccard ~0.75-0.95
    rows, pairs, jacs = _make_pairs(rng, 24, n_replace=2)
    # far pairs: heavy replacement -> jaccard well under 0.2
    far_rows, far_pairs, far_jacs = _make_pairs(rng, 12, n_replace=40)
    base = 10_000
    far_rows = [(i + base, t) for i, t in far_rows]
    far_pairs = [(a + base, b + base) for a, b in far_pairs]
    assert min(jacs) >= 0.6 and max(far_jacs) <= 0.25

    df = spark.createDataFrame(rows + far_rows, "doc_id bigint, text string")
    n_minhash, n_bands = 128, 16
    r = n_minhash // n_bands
    got = {
        (r_["id_a"], r_["id_b"])
        for r_ in lsh_candidate_pairs(
            df, n_minhash=n_minhash, n_bands=n_bands
        ).collect()
    }

    # recall on the near side must beat the formula bound evaluated at
    # the WEAKEST pair's jaccard (monotone; sampling slack 0.15)
    s_min = min(jacs)
    bound = 1 - (1 - s_min**r) ** n_bands
    hit = sum((a, b) in got for a, b in pairs)
    recall = hit / len(pairs)
    assert recall >= max(0.0, bound - 0.15), (recall, bound, s_min)

    # the far side must stay on the floor of the S-curve
    far_hit = sum((a, b) in got for a, b in far_pairs)
    assert far_hit / len(far_pairs) <= 0.25, far_hit


def test_param_validation():
    import pytest

    with pytest.raises(ValueError):
        lsh_candidate_pairs(None, n_minhash=10, n_bands=4)
