"""Entity resolution: MinHash signatures -> LSH blocking -> exact-jaccard
verify -> connected components -> canonical label per surface form.

Everything up to connected components is pure Spark SQL (higher-order
functions + xxhash64) — zero Python in the hot path. Determinism:
- MinHash 'permutations' are seeded hashes, identical across runs/clusters.
- Oversized LSH buckets (stopword-ish blocks, the classic LSH skew bomb) are
  DROPPED deterministically by size cap, not sampled.
- Canonical label = lexicographically smallest surface_norm in the
  component: content-derived, partition-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import lsh_band_hashes_col, minhash_signature_col
from ..functions.textnorm import JACCARD_THRESHOLD, shingles_col
from .connected_components import connected_components

MAX_BLOCK_SIZE = 64  # LSH buckets larger than this are skew-dropped


def minhash_signatures(surfaces: DataFrame, col: str = "surface_norm") -> DataFrame:
    """(surface_norm) -> (surface_norm, shingles array<string>, sig array<bigint>)."""
    return (
        surfaces.select(col)
        .distinct()
        .withColumn("shingles", shingles_col(F.col(col)))
        .withColumn("sig", minhash_signature_col(F.col("shingles")))
    )


def lsh_candidate_pairs(sigs: DataFrame, col: str = "surface_norm") -> DataFrame:
    """Band the signatures, bucket-join within (band, bucket), emit candidate
    pairs (a < b). Bucket-size cap bounds the quadratic blowup."""
    bands = sigs.select(
        F.col(col), F.explode(lsh_band_hashes_col(F.col("sig"))).alias("bb")
    ).select(col, "bb.band", "bb.bucket")

    # Window-free size cap: aggregate bucket sizes once, keep only small ones.
    sizes = bands.groupBy("band", "bucket").agg(F.count("*").alias("cnt"))
    ok = bands.join(
        sizes.filter(F.col("cnt") <= MAX_BLOCK_SIZE).select("band", "bucket"),
        ["band", "bucket"],
    )
    a = ok.select("band", "bucket", F.col(col).alias("a"))
    b = ok.select("band", "bucket", F.col(col).alias("b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def verify_pairs(
    pairs: DataFrame,
    sigs: DataFrame,
    col: str = "surface_norm",
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Exact shingle-jaccard on candidate pairs; keep >= threshold.
    array_intersect/array_union are JVM-side; shingle arrays are small."""
    sh = sigs.select(F.col(col), F.col("shingles"))
    pa = pairs.join(sh.withColumnRenamed(col, "a").withColumnRenamed("shingles", "sh_a"), "a")
    pab = pa.join(sh.withColumnRenamed(col, "b").withColumnRenamed("shingles", "sh_b"), "b")
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return pab.filter(jac >= F.lit(threshold)).select("a", "b")


def canonical_map(surfaces: DataFrame, col: str = "surface_norm") -> DataFrame:
    """Full ER: (surface_norm) -> (surface_norm, canonical).

    Surfaces that never pair stay their own canonical. Node ids for the CC
    step are xxhash64(surface) — content-derived longs.
    """
    sigs = minhash_signatures(surfaces, col).localCheckpoint(eager=True)
    pairs = verify_pairs(lsh_candidate_pairs(sigs, col), sigs, col)

    ids = sigs.select(F.col(col), F.xxhash64(F.col(col)).alias("node"))
    edges = (
        pairs.join(ids.withColumnRenamed(col, "a").withColumnRenamed("node", "src"), "a")
        .join(ids.withColumnRenamed(col, "b").withColumnRenamed("node", "dst"), "b")
        .select("src", "dst")
    )
    comps = connected_components(edges)

    labeled = ids.join(comps, ids["node"] == comps["node"], "left").select(
        F.col(col), F.coalesce("comp", ids["node"]).alias("comp")
    )
    canon = labeled.groupBy("comp").agg(F.min(col).alias("canonical"))
    return labeled.join(canon, "comp").select(col, "canonical")
