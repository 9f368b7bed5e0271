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
    ("agg_stats", "partial (map-side) + final HashAggregate + distinct expand, whole-stage codegen"),
    ("rejoin_triples", "the decompose/rejoin equi-join shape"),
    ("rejoin_nary4", "generalized arity-4 rejoin: rules joined via BroadcastHashJoin; the intermediate slot-join output keeps its (url, pivot_mid, pred) partitioning so the second slot join adds NO extra shuffle on that side"),
    ("win_topk", "rank family + top-k: ONE window shuffle computes all six rank functions"),
    ("topk_global", "orderBy+limit compiles to TakeOrderedAndProject, not a global sort"),
    ("dedup_minhash", "explode + 64 min() aggregates stay in codegen"),
    ("salt_key", "two-phase skew aggregation: salted partial then merge"),
    ("set_ops", "union/intersect/except as one plan: agg-dedup, left-semi, left-anti branches"),
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
