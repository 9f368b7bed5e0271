"""spark-submit entry point for querying a constructed KG triple table.

The downstream half of the engine: run_pipeline.py writes the
(subj, pred, obj, support) table; this job answers queries over it.

Launch:
  # basic graph pattern (SPARQL-ish; '.'-separated hops, ?vars, constants;
  # quote multi-word entity ids: '"acme corp" in_city ?c')
  spark-submit --py-files dist/nary_kg.zip jobs/run_query.py \
      --triples /data/out/triples --output /data/ans \
      --pattern "?s supplies ?p . ?p ships_in ?o"

  # bounded property-path reachability (pred{1,k}), optionally seeded
  spark-submit jobs/run_query.py --triples /data/out/triples \
      --output /data/ans --reach supplies --max-hops 3 --from S17

Without --output the job prints the row count and up to --show rows.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--triples", required=True, help="triples table path")
    ap.add_argument("--format", choices=("parquet", "nt"), default="parquet",
                    help="triples input format: parquet (the pipeline "
                         "sink) or nt (an N-Triples export)")
    ap.add_argument("--pattern", default=None,
                    help="BGP: '.'-separated hops of 'subj pred obj' terms; "
                         "terms starting with ? are variables; quote "
                         "multi-word constants")
    ap.add_argument("--reach", default=None, metavar="PRED",
                    help="bounded reachability over one predicate")
    ap.add_argument("--max-hops", type=int, default=None,
                    help="with --reach: path-length bound (default 3)")
    ap.add_argument("--from", dest="src", default=None,
                    help="with --reach: seed the frontier at this entity "
                         "(single-source expansion, not post-filtering)")
    ap.add_argument("--reorder", action="store_true",
                    help="with --pattern: greedily reorder hops by "
                         "estimated selectivity (one pred-histogram "
                         "aggregate) before joining")
    ap.add_argument("--output", default=None, help="answer parquet path")
    ap.add_argument("--show", type=int, default=20)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)
    if bool(args.pattern) == bool(args.reach):
        ap.error("pass exactly one of --pattern / --reach")
    if args.pattern and (args.src is not None or args.max_hops is not None):
        ap.error("--from / --max-hops only apply to --reach "
                 "(constrain a pattern with constant terms instead)")
    if args.reach and args.reorder:
        ap.error("--reorder only applies to --pattern")

    from nary_relation_extraction_decomposed_spark.session import build_session
    from nary_relation_extraction_decomposed_spark.operators.kg_query import (
        match_pattern,
        parse_pattern,
        reach_pairs,
    )
    from nary_relation_extraction_decomposed_spark.sources.ntriples import (
        read_ntriples,
    )

    spark = build_session(
        app_name="nary-kg-query", shuffle_partitions=args.shuffle_partitions
    )

    if args.format == "nt":
        triples = read_ntriples(spark, args.triples)
    else:
        triples = spark.read.parquet(args.triples)
    t0 = time.time()
    if args.pattern:
        out = match_pattern(
            triples, parse_pattern(args.pattern), reorder=args.reorder
        )
    else:
        out = reach_pairs(
            triples, args.reach,
            args.max_hops if args.max_hops is not None else 3,
            sources=[args.src] if args.src is not None else None,
        )
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        out = out.persist()  # count + show share one computation
        n = out.count()
        out.show(args.show, truncate=False)
        out.unpersist()
    print(f"rows={n} wall={time.time() - t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
