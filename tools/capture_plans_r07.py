"""Capture .explain('formatted') for every query/operator chain touched in
round 7, writing plans/r07/<name>_{before,after}.txt.

Run from a checkout: `python tools/capture_plans_r07.py <outdir> <tag>`
where tag is 'before' (round-start tree) or 'after' (optimized tree).
Explain only — nothing is executed, so the capture is cheap and identical
regardless of host load.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    outdir, tag = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)

    from nary_relation_extraction_decomposed_spark.session import build_session

    spark = build_session(
        app_name=f"r07-plans-{tag}", master="local[4]", shuffle_partitions=32,
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def cap(name, df):
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(_explain_str(df))
        print("captured", name, flush=True)

    from nary_relation_extraction_decomposed_spark.plans.queries import register_all

    Q = register_all()
    for key in ("kg_pattern", "conn_comp", "canonicalize", "ann_lsh",
                "extract_text", "doc_graph_bfs"):
        try:
            cap(key, Q[key](spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            print(f"skip {key}: {e}", flush=True)

    # bench-entry operator chains not covered by declared queries
    from nary_relation_extraction_decomposed_spark.operators import (
        er, similarity as S, textprep,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    cores = d.select(
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"), "doc_id"
    ).select(
        F.substring(
            F.md5(F.concat_ws("#", F.col("doc_id").cast("string"), F.col("i"))), 1, 10
        ).alias("core")
    )
    surfaces = (
        cores.select(F.col("core").alias("surface_norm"))
        .union(cores.select(F.concat(
            F.substring("core", 1, 5), F.lit(" "), F.substring("core", 6, 5)
        ).alias("surface_norm")))
        .union(cores.select(F.concat(
            F.substring("core", 1, 3), F.lit("-"), F.substring("core", 4, 7)
        ).alias("surface_norm")))
    ).repartition(8)
    try:
        cap("er_canon_map", er.canonical_map(
            surfaces, cc_driver_threshold=0, cc_algorithm="star"))
    except Exception as e:  # noqa: BLE001
        print("skip er_canon_map:", e, flush=True)

    em = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cap("ann_lsh_selfquery", S.ann_topk_lsh(
        em, em, k=5, dim=64, n_planes=8, n_tables=8))
    cent, lists = S.ivf_index(em, nlist=32, lloyd_iters=1)
    cap("ann_ivf_query", S.ann_topk_ivf(
        None, em, k=5, n_probe=2, index=(cent, lists)))

    pages = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.concat(F.lit("u"), F.col("doc_id")).alias("url"),
        F.current_timestamp().alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    res = textprep.resolve_text(textprep.filter_pages(pages, "en"))
    cap("resolve_text", res)
    cap("dedup_latest_text", textprep.dedup_latest_text(res, num_partitions=8))

    spark.stop()


if __name__ == "__main__":
    main()
