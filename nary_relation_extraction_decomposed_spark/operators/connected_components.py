"""Connected components over an edge DataFrame — iterative joins, no
GraphFrames (the north star allows "GraphFrames OR iterative-join"; no
GraphFrames jar ships in this sandbox, and iterative joins keep the engine
dependency-free).

Algorithm: min-label propagation. label(v) starts as v; each round every
node takes the min label over itself and its neighbors; stop when no label
changes. Rounds = graph diameter, which for ER/dedup candidate graphs is
tiny (alias clusters, near-dup clusters). Each round is one shuffle join +
one aggregation; lineage is truncated every round with localCheckpoint so
plans don't grow (the classic iterative-DataFrame pitfall).

Scale notes: labels and edges are both keyed by node id (long) so the join
partitioning is reused round to round; AQE coalesces/splits as needed. For
web-graph-diameter inputs swap in large-star/small-star — the driver loop
below is the only thing that would change.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """edges(src long, dst long) -> (node long, comp long); comp is the min
    node id reachable. Nodes appearing only in edges are covered; pass
    isolated nodes as self-loops if they must appear."""
    spark = edges.sparkSession
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        bidir.select(F.col("u").alias("node"))
        .union(edges.select(F.col(src).alias("node")))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        nbr_min = (
            bidir.join(labels, bidir["v"] == labels["node"])
            .groupBy(F.col("u").alias("node2"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # lazy localCheckpoint: the convergence count below is the ONLY
        # action per iteration and materializes the checkpoint as it runs
        # (eager=True would cost a second full job per round)
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["node2"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
                (F.col("nbr_comp") < F.col("comp")).alias("_changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels
