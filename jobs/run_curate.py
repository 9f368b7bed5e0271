"""spark-submit entry point for the corpus-curation funnel.

quality gate -> exact dedup -> MinHash near-dup clustering ->
deterministic stratified sampling, over a documents-shaped parquet
(doc_id, text, lang, ...). Deterministic end to end: rerunning emits the
identical curated corpus, and raising a stratum's --rate later only ADDS
documents (nested samples).

Launch:
  spark-submit --py-files dist/nary_kg.zip jobs/run_curate.py \
      --input /data/documents --output /data/curated \
      --min-quality 0.3 --rate en=0.5 --rate de=0.25 --default-rate 0.1

Prints a one-line JSON funnel: rows surviving each stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_rate(text: str) -> tuple[str, float]:
    if "=" not in text:
        raise argparse.ArgumentTypeError(
            f"--rate wants STRATUM=RATE, got {text!r}"
        )
    k, v = text.split("=", 1)
    return k, float(v)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="curated parquet path")
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--rate", action="append", type=parse_rate, default=[],
                    metavar="STRATUM=RATE",
                    help="per-stratum sample rate (repeatable)")
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--stratum-col", default="lang")
    ap.add_argument("--salt", default="curate")
    ap.add_argument("--verify-threshold", type=float, default=0.5,
                    help="min estimated jaccard (fraction of agreeing "
                         "minhashes) for an LSH candidate pair to enter "
                         "near-dup clustering; negative disables "
                         "verification (pre-r7 behavior)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from nary_relation_extraction_decomposed_spark.session import build_session
    from nary_relation_extraction_decomposed_spark.operators.curate import (
        curate_corpus,
    )

    spark = build_session(
        app_name="nary-kg-curate", shuffle_partitions=args.shuffle_partitions
    )

    docs = spark.read.parquet(args.input)
    t0 = time.time()
    stages = curate_corpus(
        docs,
        stratum_col=args.stratum_col,
        min_quality=args.min_quality,
        rates=dict(args.rate),
        default_rate=args.default_rate,
        salt=args.salt,
        verify_threshold=(
            None if args.verify_threshold < 0 else args.verify_threshold
        ),
    )
    stages["sampled"].write.mode("overwrite").parquet(args.output)
    funnel = {"input": docs.count()}
    for name in ("quality", "exact", "neardup"):
        funnel[name] = stages[name].count()
    funnel["sampled"] = spark.read.parquet(args.output).count()
    funnel["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(funnel))
    spark.stop()


if __name__ == "__main__":
    main()
