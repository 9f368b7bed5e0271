"""Capture .explain('formatted') evidence for the load-bearing plans into
BENCH/PLANS.md: pushdown reaching the scan (PushedFilters/ReadSchema),
broadcast choices, partitioning reuse, codegen coverage.

Usage: python tools/explain_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

CASES = [
    ("filter_lang", "predicate pushdown + column pruning reach the parquet scan"),
    ("join_broadcast", "dimension joins planned as BroadcastHashJoin"),
    ("agg_stats", "partial (map-side) + final HashAggregate, whole-stage codegen"),
    ("rejoin_triples", "the decompose/rejoin equi-join shape"),
    ("win_topk", "window top-k: single shuffle on the partition key"),
    ("dedup_minhash", "explode + 64 min() aggregates stay in codegen"),
]


def main() -> None:
    from nary_relation_extraction_decomposed_spark.session import build_session
    from nary_relation_extraction_decomposed_spark.plans.queries import register_all

    spark = build_session(
        master="local[4]", shuffle_partitions=8,
        extra_confs={"spark.ui.enabled": "false",
                     "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = register_all()

    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "BENCH", "PLANS.md")
    with open(out_path, "w") as f:
        f.write("# Physical-plan evidence (.explain formatted)\n\n"
                "Captured at sf0.01, local[4]; AQE on. What to look for is\n"
                "noted per plan; regenerate with tools/explain_plans.py.\n")
        for key, why in CASES:
            df = queries[key](spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            f.write(f"\n## {key}\n\n*{why}*\n\n```\n{buf.getvalue().strip()}\n```\n")
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
