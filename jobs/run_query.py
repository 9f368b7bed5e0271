"""spark-submit entry point for querying a constructed KG triple table.

The downstream half of the engine: run_pipeline.py writes the
(subj, pred, obj, support) table; this job answers queries over it.

Launch:
  # basic graph pattern (SPARQL-ish; '.'-separated hops, ?vars, constants)
  spark-submit --py-files dist/nary_kg.zip jobs/run_query.py \
      --triples /data/out/triples --output /data/ans \
      --pattern "?s supplies ?p . ?p ships_in ?o"

  # bounded property-path reachability (pred{1,k})
  spark-submit jobs/run_query.py --triples /data/out/triples \
      --output /data/ans --reach supplies --max-hops 3

Without --output the job prints the row count and up to --show rows.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def parse_pattern(text: str) -> list[tuple[str, str, str]]:
    """'?s supplies ?p . ?p ships_in ?o' -> [(s,p,o), ...]. Terms are
    whitespace-separated; exactly three per '.'-separated hop."""
    pattern = []
    for hop in text.split("."):
        hop = hop.strip()
        if not hop:
            continue
        terms = hop.split()
        if len(terms) != 3:
            raise ValueError(
                f"each hop needs exactly 3 terms (subj pred obj), got {hop!r}"
            )
        pattern.append(tuple(terms))
    if not pattern:
        raise ValueError("empty pattern")
    return pattern


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--triples", required=True, help="triples parquet path")
    ap.add_argument("--pattern", default=None,
                    help="BGP: '.'-separated hops of 'subj pred obj' terms; "
                         "terms starting with ? are variables")
    ap.add_argument("--reach", default=None, metavar="PRED",
                    help="bounded reachability over one predicate")
    ap.add_argument("--max-hops", type=int, default=3)
    ap.add_argument("--from", dest="src", default=None,
                    help="with --reach: restrict to paths starting at this "
                         "entity (filter pushed to the first frontier)")
    ap.add_argument("--output", default=None, help="answer parquet path")
    ap.add_argument("--show", type=int, default=20)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)
    if bool(args.pattern) == bool(args.reach):
        ap.error("pass exactly one of --pattern / --reach")

    from nary_relation_extraction_decomposed_spark.session import (
        ENGINE_CONFS,
        apply_engine_confs,
    )
    from nary_relation_extraction_decomposed_spark.operators.kg_query import (
        match_pattern,
        reach_pairs,
    )

    builder = SparkSession.builder.appName("nary-kg-query")
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()
    apply_engine_confs(spark)

    triples = spark.read.parquet(args.triples)
    t0 = time.time()
    if args.pattern:
        out = match_pattern(triples, parse_pattern(args.pattern))
    else:
        out = reach_pairs(
            triples, args.reach, args.max_hops,
            sources=[args.src] if args.src is not None else None,
        )
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = out.count()
        out.show(args.show, truncate=False)
    print(f"rows={n} wall={time.time() - t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
