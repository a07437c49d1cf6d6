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
