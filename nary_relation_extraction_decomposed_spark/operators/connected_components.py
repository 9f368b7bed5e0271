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


def _star_contraction(edges: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star / small-star contraction (Kiveris et al.,
    'Connected Components in MapReduce and Beyond') — O(log n) rounds on any
    graph shape, vs O(diameter) for plain label propagation. Public
    algorithm, DataFrame formulation:

      large-star: for each node u with neighborhood G(u),
                  m = min(G(u) u {u}); emit (v, m) for v in G(u), v > u
      small-star: orient edges (u = max, v = min); per u,
                  m = min neighbor; emit (v, m) for v in G(u) u {u}, v != m

    Converged when the edge set is stable (checked by count + order-
    independent hash-sum; both must match). At convergence edges form stars
    (node -> component-min root)."""
    e = (
        edges.select(F.col("u"), F.col("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def signature(df: DataFrame) -> tuple[int, int]:
        # order-independent set signature: count + XOR of row hashes
        # (bit_xor cannot overflow under ANSI mode, unlike sum)
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    sig = signature(e)
    for _ in range(max_iter):
        # ---- large star
        bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = bidir.groupBy("u").agg(F.min("v").alias("mn"))
        m = mins.select("u", F.least("u", "mn").alias("m"))
        ls = (
            bidir.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small star
        directed = ls.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins2 = directed.groupBy("u").agg(F.min("v").alias("m"))
        ss_nbrs = (
            directed.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        ss_self = mins2.select(F.col("u"), F.col("m").alias("v"))
        e_next = (
            ss_nbrs.union(ss_self)
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        new_sig = signature(e_next)
        e = e_next
        if new_sig == sig:
            break
        sig = new_sig
    return e  # star edges: (node, root)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    driver_threshold: int = 200_000,
    algorithm: str = "auto",
) -> DataFrame:
    """edges(src long, dst long) -> (node long, comp long); comp is the min
    node id reachable. Nodes appearing only in edges are covered; pass
    isolated nodes as self-loops if they must appear.

    Size-adaptive physical strategy (same idea as broadcast-vs-shuffle join
    selection): an edge set under `driver_threshold` is collected and solved
    with union-find on the driver — one job instead of ~4 iterations x
    joins, which at small sizes are pure scheduler latency. Larger graphs
    take the distributed min-label-propagation path below. Both paths are
    deterministic and produce identical labels."""
    spark = edges.sparkSession

    head = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).limit(
        driver_threshold + 1
    ).collect()
    if len(head) <= driver_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in head:
            for n in (r["u"], r["v"]):
                parent.setdefault(n, n)
        for r in head:
            ra, rb = find(r["u"]), find(r["v"])
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        rows = [(n, find(n)) for n in parent]
        if not rows:
            return spark.createDataFrame([], "node long, comp long")
        return spark.createDataFrame(rows, "node long, comp long")

    if algorithm in ("auto", "star"):
        # large graphs: star contraction, O(log n) rounds on any shape
        # (min-label propagation below needs O(diameter) rounds)
        e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        stars = _star_contraction(e, max_iter)
        all_nodes = (
            e.select(F.col("u").alias("node"))
            .union(e.select(F.col("v").alias("node")))
            .distinct()
        )
        labeled = stars.select(F.col("u").alias("node"), F.col("v").alias("comp"))
        return (
            all_nodes.join(labeled, "node", "left")
            .select("node", F.coalesce("comp", F.col("node")).alias("comp"))
        )

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
