"""Connected components by iterative min-label propagation — the cluster
step of a dedup pipeline (near-dup PAIRS -> duplicate GROUPS, so one
canonical document per group survives).

Spark has no recursive-query primitive, so this is the standard iterative
DataFrame loop: every node starts labeled with itself; each round adopts the
minimum label among itself and its neighbors; fixpoint = component minimum.

Scale design
------------
- Each round is one equi-join + one hash aggregate on node id — shuffle
  volume O(E + V) per round; rounds needed = graph diameter (near-dup
  graphs are shallow: duplicate clusters are dense and tiny).
- ``localCheckpoint`` truncates lineage every round: without it the plan
  doubles per iteration and the job dies on plan size long before data size.
- Convergence check is a count of changed labels per round — one tiny
  action on an already-shuffled frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Edges (assumed symmetric; symmetrized defensively here) ->
    (node, cluster_id=component minimum)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("cluster_id", F.col("node")).localCheckpoint()

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.a == labels.node)
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("cluster_id").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.node2, "left")
            .select(
                "node",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.cluster_id") < F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
