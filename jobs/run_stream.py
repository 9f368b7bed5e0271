"""spark-submit entry point for STREAMING KG construction — the streaming
twin of jobs/run_pipeline.py (north rule: the whole job launches via
spark-submit --py-files; this covers the continuously-arriving-crawl face).

  spark-submit --py-files dist/nary_kg.zip jobs/run_stream.py \
      --pages <pages parquet dir (files appear over time)> \
      --fixtures tests/fixtures/data --output /data/stream_out \
      --checkpoint /data/stream_ckpt [--merge] [--canonicalize]

Behavior:
- drains everything currently in --pages (availableNow trigger) through
  the BATCH pipeline per micro-batch (foreachBatch; one code path, no
  semantic fork), appending URL-LEVEL triple deltas tagged with batch_id
  plus the processed-urls manifest sidecar (re-crawl supersede semantics,
  streaming/kg_stream.py);
- rerunning with the same --checkpoint picks up only NEW files — the
  incremental-crawl loop is: drop files in, rerun, merge;
- --merge materializes the current triple set from ALL deltas so far
  (latest batch per url, replay-safe distinct) to <output>/triples;
- --canonicalize applies merge-time ER with ONE canonical map built over
  the union corpus' MENTION surfaces — read from the per-batch surfaces
  sidecar, each url reduced to its latest processed batch — the exact
  input the batch pipeline's ER sees (triples' subj/obj alone would both
  include superseded-batch surfaces and miss mention-only cluster
  minima / CC bridges). Per-batch maps would break delta additivity,
  which stream_pages_to_triples rejects.

Prints one JSON line with delta/merge counts (driver-parseable, same
contract style as run_pipeline.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet dir (streamed)")
    ap.add_argument("--fixtures", default="tests/fixtures/data")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--max-files", type=int, default=1)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--merge", action="store_true",
                    help="materialize the merged current triple set")
    ap.add_argument(
        "--canonicalize", action="store_true",
        help="with --merge: apply merge-time ER with one shared canonical "
             "map over the union surfaces (exact batch parity)",
    )
    args = ap.parse_args(argv)
    if args.canonicalize and not args.merge:
        ap.error("--canonicalize requires --merge (merge-time ER runs on the "
                 "merged triple set; without --merge nothing is canonicalized)")

    from nary_relation_extraction_decomposed_spark.session import (
        ENGINE_CONFS,
        apply_engine_confs,
    )
    from nary_relation_extraction_decomposed_spark.plans.pipeline import PipelineConfig
    from nary_relation_extraction_decomposed_spark.streaming import kg_stream as KS

    builder = SparkSession.builder.appName("nary-kg-stream")
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()
    apply_engine_confs(spark)

    gaz = spark.read.parquet(os.path.join(args.fixtures, "gazetteer.parquet"))
    rules = spark.read.parquet(os.path.join(args.fixtures, "pred_rules.parquet"))
    config = PipelineConfig(canonicalize=False)  # ER happens at merge time
    deltas_path = os.path.join(args.output, "deltas")

    t0 = time.time()
    KS.stream_pages_to_triples(
        KS.read_pages_stream(spark, args.pages, max_files=args.max_files),
        gaz, rules, config, deltas_path,
        os.path.join(args.checkpoint, "stream"),
        url_level=True,
    )
    from nary_relation_extraction_decomposed_spark.plans.checkpoint import HadoopFS

    # a drain can yield ZERO batches (empty source dir, or nothing new on a
    # rerun where every batch was empty) — the delta dir then never comes
    # into existence and the entry must report that, not crash
    if not HadoopFS(spark, deltas_path).exists(deltas_path):
        stats = {"n_delta_rows": 0, "n_batches_total": 0,
                 "n_urls_processed": 0, "wall_sec": round(time.time() - t0, 2)}
        print(json.dumps(stats))
        return stats

    deltas = spark.read.parquet(deltas_path)
    man = KS.read_urls_manifest(spark, deltas_path)
    stats = {
        "n_delta_rows": deltas.count(),
        "n_batches_total": deltas.select("batch_id").distinct().count(),
        "n_urls_processed": (
            man.select("url").distinct().count() if man is not None else 0
        ),
    }

    if args.merge:
        if args.canonicalize:
            from nary_relation_extraction_decomposed_spark.operators.er import (
                canonical_map,
            )

            surfaces = KS.union_corpus_surfaces(spark, deltas_path)
            if surfaces is None:
                raise SystemExit(
                    "--canonicalize needs the mention-surfaces sidecar "
                    f"({KS.surfaces_sidecar_path(deltas_path)}); these deltas "
                    "were written by an older writer — re-drain, or merge "
                    "without --canonicalize"
                )
            merged = KS.canonicalize_url_deltas(
                deltas, canonical_map(surfaces), man
            )
        else:
            merged = KS.merge_triple_deltas(spark, deltas_path)
        from nary_relation_extraction_decomposed_spark.plans.catalog import (
            write_triples_table,
        )

        triples_path = os.path.join(args.output, "triples")
        write_triples_table(merged, triples_path)
        stats["n_triples"] = spark.read.parquet(triples_path).count()

    stats["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()
