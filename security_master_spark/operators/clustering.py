"""Connected components over a similarity graph — the dedup-cluster
closure (near_dedup_minhash's one-pass pair-drop collapses chains
greedily; this is the exact fixed point).

Algorithm: iterative min-label propagation (each node takes the min
label among itself and its neighbors until no label changes) — the
simple member of the large-star/small-star family. Per iteration: one
equi-join of the symmetrized edge list against current labels + one
min-groupBy; lineage is truncated with ``localCheckpoint`` every round
so the plan stays O(1) deep (on a cluster use ``checkpoint`` with a
checkpoint dir for fault tolerance). Iterations needed = graph
diameter, which for near-dup clusters is small; ``max_iterations``
bounds the worst case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node in the undirected edge list;
    ``component`` is the minimum node id of the component."""
    sym = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
    nodes = sym.select(F.col("s").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint()

    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels, sym.d == labels.node)
            .select(F.col("s").alias("node"), "label")
        )
        new_labels = (
            labels.select("node", "label")
            .union(nbr_min)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
