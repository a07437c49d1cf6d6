"""Iterative graph operators: connected components over candidate-pair
edges (the dup-cluster resolver that sits downstream of LSH banding).

The reference's transitive-closure merge (`merge_fragmented`
tools/infer/utility.py:735-790, a visited-set fixpoint over box overlap
pairs) operates per-document on <=10^3 boxes; the corpus-scale analog is
connected components over near-duplicate candidate pairs, where the
edge list itself is distributed.

Implementation: min-label propagation — every node repeatedly takes the
minimum label among itself and its neighbors until a fixpoint. Each
iteration is one join + one groupBy (two shuffles over (id, label)
pairs only, never document bodies). Convergence is O(graph diameter)
iterations; near-dup clusters are dense and shallow (diameter ~2-3), so
this settles in a handful of rounds. For adversarially long chain
graphs at 10^12-row scale, swap the step for large-star/small-star
(Kiveris et al., "Connected Components in MapReduce"), which contracts
chains in O(log n) rounds — same driver loop, different step function.

The driver-side loop is control flow only (a bounded iteration counter
and an empty-check); all data stays distributed. Lineage is truncated
with localCheckpoint every iteration so plans don't grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id_a, id_b) undirected edges -> (id, cluster_id) with
    cluster_id = min node id in the component. Deterministic: pure
    integer min-fixpoint, independent of partitioning.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )

    for _ in range(max_iter):
        # each node's new label: min(own, min over neighbors' labels)
        nbr = (
            edges.join(labels, edges.dst == labels.id)
            .select(F.col("src").alias("id"), "label")
        )
        new_labels = (
            labels.select("id", "label")
            .union(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.select("id", F.col("label").alias("cluster_id"))
