"""Generate the committed signature fixtures for the value-level
cross-engine dedup-pair oracles (VERDICT r4 #6).

MinHash/SimHash SIGNATURE values are xxhash64-family — DuckDB cannot
recompute them, which is why dedup_minhash/dedup_simhash are rows-only
keys. But the PAIR GENERATION downstream of the signatures is pure
relational logic (band grouping, bucket truncation, pair expansion,
hamming threshold), and on a committed signature fixture that both engines
read, DuckDB can recompute the pair sets exactly:
- minhash bucket equality xxhash64(h_i..h_j) == xxhash64(h_i'..h_j')
  reduces to tuple equality of the band's raw values — group on the tuple;
- simhash band keys are plain shift/mask bit arithmetic, identical in both
  engines (verified: arithmetic >> on negative BIGINT, bit_count, xor).

Corpus = sf0.001 documents (500 rows) + planted near-duplicates
(doc_id+100000, one leading token changed) + exact duplicates
(doc_id+200000) — the same recipe as tests/test_dedup_similarity.py's
docs_with_dupes fixture, so the pair sets are non-trivial: exact dups
collide in every band, near-dups in most.

Deterministic: every value is content-derived (xxhash64 of text shingles /
tokens); regeneration from the same testdata is byte-stable in VALUES
(parquet encoding may differ; the oracle compares values, not files).

Usage: python fixtures/gen_sigs.py    # writes tests/fixtures/data/*.parquet
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "data",
)


def docs_with_planted_dupes(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    near = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("zzz "), F.substring("text", 5, 1000000)).alias("text"),
    )
    exact = d.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    return d.select("doc_id", "text").unionByName(near).unionByName(exact)


def main() -> None:
    from pyspark.sql import SparkSession

    from nary_relation_extraction_decomposed_spark.operators import dedup as D

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = docs_with_planted_dupes(spark)

    mh = D.minhash_signatures_wide(
        docs, "doc_id", F.col("text"), shingle_n=3, num_perms=64
    ).toPandas().sort_values("id").reset_index(drop=True)
    sh = (
        D.simhash_signatures(docs, "doc_id", F.col("text"))
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    mh.to_parquet(os.path.join(OUT_DIR, "minhash_sigs.parquet"), index=False)
    sh.to_parquet(os.path.join(OUT_DIR, "simhash_sigs.parquet"), index=False)
    print(f"minhash_sigs: {len(mh)} rows x {len(mh.columns)} cols")
    print(f"simhash_sigs: {len(sh)} rows")

    # hyperplane sign table: the ONE xxhash64-derived artifact of the
    # ann_lsh key. sgn(tbl, plane, pos) = +1/-1 from the SAME IntegerType
    # xxhash64 parity similarity.hyperplane_buckets evaluates, so DuckDB
    # can recompute buckets (integer micro-unit sums + bit-fold) and the
    # full ANN result exactly (plans/q_vector.py ORACLES['ann_lsh']).
    # dim=64 (the embeddings fixture), n_planes=4, n_tables=8, seed 42 —
    # the ann_lsh key's parameters.
    sg = (
        spark.range(8).select(F.col("id").cast("int").alias("tbl"))
        .crossJoin(spark.range(4).select(F.col("id").cast("int").alias("plane")))
        .crossJoin(spark.range(64).select(F.col("id").cast("int").alias("pos")))
        .select(
            "tbl", "plane", "pos",
            F.when(
                F.pmod(
                    F.xxhash64(
                        (F.col("tbl") + F.lit(42)).cast("int"),
                        F.col("plane"),
                        F.col("pos"),
                    ),
                    F.lit(2),
                )
                == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .cast("bigint")
            .alias("sgn"),
        )
        .toPandas()
        .sort_values(["tbl", "plane", "pos"]).reset_index(drop=True)
    )
    sg.to_parquet(os.path.join(OUT_DIR, "hyperplane_signs.parquet"), index=False)
    print(f"hyperplane_signs: {len(sg)} rows, sum sgn = {int(sg.sgn.sum())}")
    spark.stop()


if __name__ == "__main__":
    main()
