"""connected_components: known-graph fixtures (the dup-cluster resolver,
functions/graph.py) — chain, clique, disjoint components, determinism
across partitionings."""

from __future__ import annotations

from paddleocr_spark.functions.graph import connected_components


def _cc(spark, pairs, n_parts=1):
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint").repartition(n_parts)
    out = connected_components(df)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_cc_chain_and_disjoint(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # separate pair 10-11
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_clique_merge_order_independent(spark):
    # two cliques bridged by one edge -> single component rooted at min id
    pairs = [(5, 6), (6, 7), (5, 7), (20, 21), (21, 22), (7, 20)]
    got = _cc(spark, pairs)
    assert set(got.values()) == {5}
    assert set(got) == {5, 6, 7, 20, 21, 22}


def test_cc_partitioning_invariant(spark):
    pairs = [(1, 2), (3, 4), (4, 5), (2, 3), (100, 101)]
    assert _cc(spark, pairs, n_parts=1) == _cc(spark, pairs, n_parts=7)


def _cc2(spark, pairs):
    from paddleocr_spark.functions.graph import connected_components_two_phase

    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    out = connected_components_two_phase(df)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_two_phase_matches_propagation_on_random_graphs(spark):
    """large-star/small-star output == min-label propagation output on
    seeded random graphs (the O(log n) path must be semantics-identical
    to the simple path)."""
    import random

    rng = random.Random(42)
    for _trial in range(4):
        n = rng.randint(6, 24)
        n_edges = rng.randint(3, 2 * n)
        pairs = [
            (rng.randint(0, n), rng.randint(0, n)) for _ in range(n_edges)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        assert _cc2(spark, pairs) == _cc(spark, pairs), pairs


def test_two_phase_long_chain(spark):
    """A 40-node chain (diameter 39): the adversarial case the two-phase
    algorithm exists for — must resolve to a single min-rooted star."""
    chain = [(i, i + 1) for i in range(40)]
    got = _cc2(spark, chain)
    assert set(got.values()) == {0}
    assert set(got) == set(range(41))


def test_two_phase_bridged_cliques(spark):
    pairs = [(5, 6), (6, 7), (5, 7), (20, 21), (21, 22), (7, 20), (100, 101)]
    got = _cc2(spark, pairs)
    assert {k: v for k, v in got.items() if k < 100} == {
        5: 5, 6: 5, 7: 5, 20: 5, 21: 5, 22: 5
    }
    assert got[100] == got[101] == 100
