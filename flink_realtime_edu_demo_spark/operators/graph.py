"""Connected components over an undirected edge list — the grouping
step of a near-duplicate pipeline (pairs → dup GROUPS → one keeper per
group), which Flink users write with iterative DataSet/Gelly jobs.

Spark-first lowering: min-label propagation — every node starts
labelled with itself; each round a node takes the min of its own label
and its neighbors' labels; fixpoint = each node holds its component's
global min id. Rounds needed = graph diameter (dup clusters are
shallow: near-clique, diameter ~2), each round is one shuffle
(join + groupBy on node id). The driver holds ONE scalar per round (the
changed-row probe); labels are localCheckpoint'ed so lineage doesn't
grow with iterations. For web-scale graphs with long chains swap the
per-round step for large-star/small-star (Kiveris et al., SoCC'14) —
same join/agg primitives, O(log n) rounds; the fixpoint (and thus the
result hash) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 50
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; component
    is the smallest node id reachable from the node. Deterministic: the
    fixpoint of min-label propagation is unique regardless of partition
    or iteration order, so the result is hash-stable."""
    # materialize the (possibly expensive) edge plan ONCE before the
    # symmetrizing union references it twice
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint()
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.distinct().localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("id")).distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nb = (
            sym.join(labels.withColumnRenamed("id", "b_id"),
                     F.col("b") == F.col("b_id"))
            .groupBy("a")
            .agg(F.min("label").alias("nb_label"))
        )
        new = (
            labels.join(nb, F.col("id") == F.col("a"), "left")
            .select(
                "id",
                F.least(F.col("label"),
                        F.coalesce("nb_label", "label")).alias("new_label"),
                F.col("label").alias("old_label"),
            )
        )
        # checkpoint once, then both the changed-probe and the next
        # round's labels read the materialized result — one job per
        # round, one scalar to the driver
        cp = new.localCheckpoint()
        changed = cp.filter(F.col("new_label") < F.col("old_label")).limit(1).count()
        labels = cp.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels
