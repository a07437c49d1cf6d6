"""Semantic signature store: 2-day lifecycle, admission semantics,
convergence on re-run (the embedding twin of the exact store's
lifecycle tests)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from paddleocr_spark.functions import semdedup_store as S

DIM = 16
TAU = 0.9


def _vec(seed: int) -> list[float]:
    """Deterministic pseudo-random unit vector (md5-mixed per dim, so
    distinct seeds are uncorrelated — a linear generator here made every
    vector a shifted sawtooth and everything a near-dup of everything)."""
    xs = [
        int.from_bytes(hashlib.md5(f"{seed}:{j}".encode()).digest()[:4], "big")
        / 2**31 - 1.0
        for j in range(DIM)
    ]
    n = math.sqrt(sum(x * x for x in xs)) or 1.0
    return [x / n for x in xs]


def _frame(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


@pytest.fixture()
def seeded_store(spark, tmp_path):
    corpus = _frame(spark, [(i, _vec(i)) for i in range(120)])
    store = str(tmp_path / "semstore")
    stats = S.seed_semantic_store(
        corpus, store, target_cluster_size=16, tau=TAU, refine_iters=1,
    )
    return store, stats


def test_seed_builds_model_vectors_and_sigs(spark, seeded_store):
    store, stats = seeded_store
    assert stats["mode"] == "seed"
    assert 0 < stats["admitted"] <= stats["n_input"] == 120
    m = S._read_model(store)
    assert m["tau"] == TAU and len(m["cents"]) >= 2
    n_vec = S.read_store_vectors(spark, store).count()
    assert n_vec == stats["admitted"]
    # n_tables signature rows per stored vector
    assert S.read_store_sigs(spark, store).count() == n_vec * m["n_tables"]


def test_admission_semantics(spark, seeded_store):
    store, _ = seeded_store
    # a vector ALREADY KEPT in the corpus (read it back from the store)
    stored = S.read_store_vectors(spark, store).orderBy("vec_id").first()
    dup_of_corpus = [float(x) for x in stored["embedding"]]
    novel = _vec(777_001)
    batch = _frame(
        spark,
        [
            (1_000, dup_of_corpus),   # exact corpus dup -> rejected
            (1_001, novel),           # novel pair, min id -> admitted
            (1_002, novel),           # same vector, larger id -> dropped
            (1_003, _vec(777_002)),   # novel singleton -> admitted
        ],
    )
    admitted, stats = S.admit_against_semantic_store(spark, store, batch)
    ids = sorted(r["vec_id"] for r in admitted.select("vec_id").collect())
    assert ids == [1_001, 1_003]
    assert stats["rejected_corpus"] == 1
    assert stats["rejected_batch"] == 1
    assert stats["admitted"] == 2


def test_rerun_of_admitted_batch_admits_zero(spark, seeded_store):
    store, _ = seeded_store
    batch = _frame(spark, [(2_000 + i, _vec(888_000 + i)) for i in range(5)])
    admitted, stats = S.admit_against_semantic_store(spark, store, batch)
    S.append_admitted(admitted, store)
    assert stats["admitted"] == 5  # all novel on day 1

    # day 2: the identical batch collides with itself at cos 1.0
    _, stats2 = S.admit_against_semantic_store(spark, store, batch)
    assert stats2["admitted"] == 0
    assert stats2["rejected_corpus"] == 5


def test_store_growth_matches_admissions(spark, seeded_store):
    store, seed_stats = seeded_store
    before = S.read_store_vectors(spark, store).count()
    batch = _frame(spark, [(3_000 + i, _vec(999_000 + i)) for i in range(7)])
    admitted, stats = S.admit_against_semantic_store(spark, store, batch)
    S.append_admitted(admitted, store)
    after = S.read_store_vectors(spark, store).count()
    assert after - before == stats["admitted"]
    m = S._read_model(store)
    assert S.read_store_sigs(spark, store).count() == after * m["n_tables"]


def test_job_surface_seed_then_admit(spark, tmp_path):
    from jobs.semdedup import run_semdedup_store

    src = str(tmp_path / "emb.parquet")
    _frame(spark, [(i, _vec(i)) for i in range(80)]).write.parquet(src)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")

    s1 = run_semdedup_store(
        spark, src, out, store, target_cluster_size=16, tau=TAU, refine_iters=1
    )
    assert s1["mode"] == "seed" and s1["store_total"] == s1["admitted"]

    # second run over the SAME input: everything already admitted
    s2 = run_semdedup_store(spark, src, out, store, tau=TAU)
    assert s2["mode"] == "admit"
    assert s2["admitted"] == 0
    assert s2["store_total"] == s1["store_total"]
    assert (
        spark.read.parquet(s2["admitted_path"]).count() == 0
    )


def test_reseed_swaps_in_a_working_store(spark, seeded_store, tmp_path):
    store, seed_stats = seeded_store
    # grow the store a bit first
    batch = _frame(spark, [(4_000 + i, _vec(555_000 + i)) for i in range(6)])
    admitted, _ = S.admit_against_semantic_store(spark, store, batch)
    S.append_admitted(admitted, store)

    # reseed from a NEW corpus: old signatures must be gone, the new
    # store must admit against the new corpus only
    corpus2 = _frame(spark, [(9_000 + i, _vec(111_000 + i)) for i in range(60)])
    stats = S.reseed_semantic_store(
        corpus2, store, target_cluster_size=16, tau=TAU, refine_iters=1
    )
    assert stats["mode"] == "reseed"
    total = S.read_store_vectors(spark, store).count()
    assert total == stats["admitted"] <= 60
    ids = {r["vec_id"] for r in S.read_store_vectors(spark, store).collect()}
    assert ids <= set(range(9_000, 9_060))  # nothing from the old store
    # a dup of the NEW corpus is rejected; the old corpus' vector is novel now
    stored = S.read_store_vectors(spark, store).orderBy("vec_id").first()
    probe = _frame(
        spark,
        [(5_000, [float(x) for x in stored["embedding"]]), (5_001, _vec(0))],
    )
    _, st2 = S.admit_against_semantic_store(spark, store, probe)
    assert st2["rejected_corpus"] == 1 and st2["admitted"] == 1


def test_recover_promotes_completed_next_after_crashed_swap(spark, seeded_store, tmp_path):
    """Simulate the reseed crash window BETWEEN the two renames: the
    store dir is gone, a completed .next exists. Any entry point's
    store_exists() must promote .next instead of letting the next
    daily run silently re-seed from its own batch."""
    import os
    import shutil

    store, _ = seeded_store
    before_ids = {r["vec_id"] for r in S.read_store_vectors(spark, store).collect()}
    # the "new" store that a crashed reseed had fully built
    nxt = store.rstrip("/") + ".next"
    corpus2 = _frame(spark, [(9_500 + i, _vec(222_000 + i)) for i in range(40)])
    S.seed_semantic_store(corpus2, nxt, target_cluster_size=16, tau=TAU,
                          refine_iters=1)
    os.rename(store, store.rstrip("/") + ".old")  # crash: store missing

    assert S.store_exists(store)  # promotion happened
    assert not os.path.exists(nxt)
    assert not os.path.exists(store.rstrip("/") + ".old")
    ids = {r["vec_id"] for r in S.read_store_vectors(spark, store).collect()}
    assert ids and ids.isdisjoint(before_ids)  # it IS the new store
