"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: broadcast the (small) query set against the
  (huge) corpus; dot products via zip_with/aggregate — JVM higher-order
  functions, no Python, no shuffle except the final per-query top-k.
- LSH-bucketed variant (random hyperplanes): the scale path — candidates
  only within matching sign-buckets, then exact rerank. Hyperplanes are
  derived deterministically from a seed via content hashing, so signatures
  are identical across runs/clusters.
- Centroid per group: grouped-agg over exploded positions (SQL) or a
  grouped-map pandas UDAF (numpy) — both provided.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.functions import broadcast


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def ann_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """(q_id, n_id, cosine, rank) — exact top-k by cosine.
    Rank orders by ROUNDED cosine then neighbor id so ordering is stable
    under last-ulp float differences (cross-engine determinism)."""
    q = broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), as_double(F.col(vec_col)).alias("q_vec")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"), as_double(F.col(vec_col)).alias("n_vec")
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(cosine_col(F.col("q_vec"), F.col("n_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signature_col(vec: Column, dim: int, n_planes: int, seed: int = 42) -> Column:
    """Random-hyperplane LSH signature as a bigint bucket key. Plane (p, d)
    component = deterministic pseudo-random in {-1,+1} from xxhash64(seed,p,d)
    — content-free, reproducible on any cluster, no stored model."""
    def _signer(p: int):
        def sign(x, d):
            return F.when(
                F.pmod(F.xxhash64(F.lit(seed), F.lit(p), d), F.lit(2)) == 0, x
            ).otherwise(-x)

        return sign

    sig = None
    for p in range(n_planes):
        comp = F.zip_with(vec, F.sequence(F.lit(0), F.lit(dim - 1)), _signer(p))
        s = F.aggregate(comp, F.lit(0.0), lambda acc, x: acc + x)
        bit = F.when(s >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return sig


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate top-k: OR-amplified random-hyperplane LSH — n_tables
    independent sign-bucket tables (per-table AND over n_planes), candidates
    = union over tables, then exact cosine rerank + dedup.

    At 100 TB the bucket equi-join replaces the cross join; recall ~
    1-(1-p^planes)^tables where p = 1 - angle/pi. More tables -> higher
    recall, linearly more candidate volume."""

    def with_buckets(df, prefix):
        v = as_double(F.col(vec_col))
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).cast("int").alias("tbl"),
                    hyperplane_signature_col(v, dim, n_planes, seed=42 + t).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            v.alias(f"{prefix}_vec"),
            F.explode(buckets).alias("bb"),
        ).select(f"{prefix}_id", f"{prefix}_vec", "bb.tbl", "bb.bucket")

    # NO broadcast hint on the query side (same reasoning as ann_topk_ivf):
    # AQE broadcasts genuinely small query sets on its own, while a
    # full-table self-query (the dedup shape) would force-ship the whole
    # bucketed corpus to every executor — measured 43% slower at sf0.1
    q = with_buckets(queries, "q")
    c = with_buckets(corpus, "n")
    cands = (
        c.join(q, ["tbl", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", "q_vec", "n_vec")
        .dropDuplicates(["q_id", "n_id"])  # union over tables
    )
    scored = cands.select(
        "q_id", "n_id",
        F.round(cosine_col(F.col("q_vec"), F.col("n_vec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(
        F.col("rank") <= k
    )


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    lloyd_iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse index: deterministic k-means (seeds = nlist smallest ids,
    `lloyd_iters` Lloyd rounds, all DataFrame ops) -> (centroids, lists).

    centroids: (cid int, c_vec array<double>) — tiny, broadcast everywhere.
    lists:     (cid, id, vec) — the corpus bucketed by nearest centroid
               (the inverted lists; at scale this is the partitioned/
               bucketed layout the index is stored in).

    Determinism: seeds are content-chosen (smallest ids), assignment ties
    break by cid, so the index is identical across runs/clusters — no
    stored model, resume-safe."""
    # c is referenced by the seeds, every Lloyd assignment, AND the final
    # lists — truncate once (the caller's corpus may be an expensive chain)
    c = corpus.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("vec")
    ).localCheckpoint(eager=False)
    # seed table is nlist rows — the single-partition window is trivial
    seeds = (
        c.orderBy("id")
        .limit(nlist)
        .select(
            (F.row_number().over(Window.orderBy("id")) - 1).cast("int").alias("cid"),
            F.col("vec").alias("c_vec"),
        )
    )
    centroids = seeds.localCheckpoint(eager=False)
    for _ in range(lloyd_iters):
        assigned = _assign_nearest(c, centroids)
        # localCheckpoint per round: each centroid table is referenced by
        # the next assignment AND the final lists/probes — unmaterialized
        # iterative lineage would recompute the whole chain per reference.
        # Means via integer micro-unit sums, NOT avg(double): float sums
        # are accumulation-order-dependent, so avg() would make centroids
        # (and thus the whole index) partition-order-sensitive; quantized
        # integer sums are exact and bit-identical on any partitioning.
        q = F.round(F.col("v") * 1000000.0, 0).cast("bigint")
        centroids = (
            assigned.select("cid", F.posexplode("vec").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.sum(q).alias("s"), F.count("*").alias("n"))
            .select("cid", "pos", (F.col("s") / (F.col("n") * 1000000.0)).alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.transform("pm", lambda s: s["m"]).alias("c_vec"))
            .localCheckpoint(eager=False)
        )
    lists = _assign_nearest(c, centroids).select("cid", "id", "vec")
    return centroids, lists


def _assign_nearest(
    vecs: DataFrame, centroids: DataFrame, n_probe: int = 1
) -> DataFrame:
    """Assign each vector to its n_probe nearest centroids (by cosine,
    ties -> smaller cid): broadcast the tiny centroid table, rank, filter."""
    scored = vecs.crossJoin(broadcast(centroids)).select(
        "id", "vec", "cid",
        F.round(cosine_col(F.col("vec"), F.col("c_vec")), 9).alias("sim"),
    )
    w = Window.partitionBy("id").orderBy(F.col("sim").desc(), F.col("cid"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_probe)
        .drop("_r", "sim")
    )


def ann_topk_ivf(
    corpus: DataFrame | None,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    n_probe: int = 2,
    lloyd_iters: int = 2,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF ANN: queries probe their n_probe nearest coarse centroids and
    rerank exactly ONLY within those inverted lists — the third ANN
    strategy next to brute-force (exact, small query sets) and
    hyperplane-LSH (hash-bucketed). Work per query ~ n_probe/nlist of the
    corpus; recall rises with n_probe. The cid equi-join replaces the
    crossJoin at scale; lists are the bucketed storage layout.

    `index` = a prebuilt (centroids, lists) pair — e.g. straight from
    plans/catalog.read_ivf_index (cid-partitioned parquet) — so the Lloyd
    build is paid ONCE per corpus snapshot, not per query batch; corpus
    may then be None. Without it the index is built in-query."""
    if index is not None:
        centroids, lists = index
    else:
        centroids, lists = ivf_index(corpus, id_col, vec_col, nlist, lloyd_iters)
    q = queries.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("vec")
    )
    probes = _assign_nearest(q, centroids, n_probe=n_probe).select(
        F.col("id").alias("q_id"), F.col("vec").alias("q_vec"), "cid"
    )
    # NO broadcast hint on probes: for small query sets AQE broadcasts them
    # anyway, but a full-table self-query (the bench shape) would broadcast
    # the whole corpus x n_probe to every executor — let the planner choose
    cands = (
        lists.join(probes, "cid")
        .filter(F.col("q_id") != F.col("id"))
        .select(
            "q_id",
            F.col("id").alias("n_id"),
            F.round(cosine_col(F.col("q_vec"), F.col("vec")), 6).alias("cosine"),
        )
        .dropDuplicates(["q_id", "n_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return cands.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(
        F.col("rank") <= k
    )


def embed_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: Column | str,
    block: Column,
    threshold: float,
) -> DataFrame:
    """Blocked embedding-cosine near-dup pairs (id_a < id_b, cosine)."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    # self-join sides share g — truncate the lineage once
    g = df.select(
        F.col(id_col).alias("id"), block.alias("blk"), as_double(vec).alias("v")
    ).localCheckpoint(eager=False)
    a = g.select("blk", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = g.select("blk", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine_col(F.col("v_a"), F.col("v_b")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def centroids_sql(df: DataFrame, group_col: str, vec_col: str = "embedding") -> DataFrame:
    """(group, pos, centroid) via posexplode + avg — pure SQL path.

    Cross-engine exactness: elements are quantized to integer micro-units
    BEFORE summing (float sums are accumulation-order-dependent; integer
    sums are exact), then one double division at the end."""
    ex = df.select(F.col(group_col), F.posexplode(vec_col).alias("pos", "v"))
    q = F.round(F.col("v").cast("double") * 1000000.0, 0).cast("bigint")
    return (
        ex.groupBy(group_col, "pos")
        .agg(F.sum(q).alias("sum_micro"), F.count("*").alias("n"))
        .select(
            group_col,
            F.col("pos").cast("bigint").alias("pos"),
            F.round(F.col("sum_micro") / (F.col("n") * 1000000.0), 6).alias("centroid"),
        )
    )


def centroids_pandas(df: DataFrame, group_col: str, vec_col: str = "embedding") -> DataFrame:
    """Grouped-map pandas UDAF path: numpy mean per group (Arrow batches)."""
    import numpy as np

    def agg(key, pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf[vec_col].to_numpy())
        return pd.DataFrame({group_col: [key[0]], "centroid_vec": [np.round(mat.mean(axis=0), 6).tolist()]})

    gtype = dict(df.dtypes)[group_col]
    return df.select(group_col, vec_col).groupBy(group_col).applyInPandas(
        agg, schema=f"{group_col} {gtype}, centroid_vec array<double>"
    )
