"""Two-parallelism scaling probe for the curation funnel (north-rule
evidence shape: same input, N vs 4N cores, report throughput + raw
efficiency).

Builds a synthetic corpus of FIXED-SIZE duplicate clusters: one cluster
per (base doc, group) with 16 members — cluster content is 40 generated
hash-words unique to the cluster, even members byte-identical (exact
dups), odd members with a one-token mutated tail (near-dups, Jaccard
~0.95). Growing REPL adds MORE clusters of constant size, so per-doc
work stays constant and the candidate-pair count scales linearly — the
realistic corpus-growth shape. (Two rejected generators, kept for the
record: replicating the real sf0.1 text into one ever-growing cluster
makes the pair stage QUADRATIC in REPL and by 320k docs the probe
measures the pathological corpus, not the engine; appending a small
per-group token doesn't separate clusters either, because the shared
base prose still dominates every shingle set and LSH re-merges the
groups.) The corpus is materialized first; timed work is ONLY the
funnel: quality gate -> exact dedup -> MinHash-LSH + connected
components -> stratified sample.

Usage: python tools/curate_scaling.py            # runs 4 then 16 cores
       python tools/curate_scaling.py 8          # one leg (subprocess)

Legs default to 4 and 16 cores — the repo's N->4N methodology (local[32]
would co-schedule SMT siblings and measure the host's hyperthread
topology, not the engine; see BENCH/BASELINE.md scaling digest).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPL = int(os.environ.get("SPARK_GRAFT_CURATE_REPL", "16"))


def cluster_corpus(spark, sf: str, repl: int, parts: int):
    """The fixed-size-cluster corpus (see module docstring), repartitioned
    to `parts` and persisted; caller counts to materialize."""
    import pyspark.sql.functions as F

    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    member = F.col("c") % 16
    group = F.floor(F.col("c") / 16)
    cluster_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda i: F.substring(
                F.md5(
                    F.concat_ws(
                        "#",
                        F.col("doc_id").cast("string"),
                        group.cast("string"),
                        i.cast("string"),
                    )
                ),
                1,
                8,
            ),
        ),
    )
    docs = (
        d.select(
            F.explode(F.sequence(F.lit(0), F.lit(repl - 1))).alias("c"),
            "doc_id", "lang",
        )
        # text FIRST, in its own select: a same-select `doc_id` re-alias
        # would capture cluster_text's doc_id reference via Spark's
        # LATERAL column-alias resolution and silently make every row's
        # text unique (no clusters at all — a measured footgun)
        .select(
            "c", "doc_id", "lang",
            F.concat(
                cluster_text,
                F.when(
                    member % 2 == 1,
                    F.concat(F.lit(" variant "), member.cast("string")),
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
        .select(
            (F.col("doc_id") * repl + F.col("c")).alias("doc_id"),
            "text", "lang",
        )
        .repartition(parts)
        .persist()
    )
    return docs


def run_leg(cores: int) -> None:
    from nary_relation_extraction_decomposed_spark.operators.curate import (
        curate_corpus,
    )
    from nary_relation_extraction_decomposed_spark.session import build_session

    spark = build_session(
        app_name=f"curate-scale-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.driver.extraJavaOptions":
                f"-XX:ActiveProcessorCount={cores}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = cluster_corpus(spark, SF, REPL, cores * 2)
    n = docs.count()
    t0 = time.monotonic()
    out = curate_corpus(
        docs, min_quality=0.05, rates={"en": 0.5}, default_rate=0.25
    )["sampled"]
    kept = out.count()
    wall = time.monotonic() - t0
    print(json.dumps({
        "cores": cores, "docs": n, "kept": kept,
        "wall_sec": round(wall, 2), "docs_per_sec": round(n / wall, 1),
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1:
        run_leg(int(sys.argv[1]))
        return
    results = []
    for cores in (4, 16):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(cores)],
            capture_output=True, text=True, timeout=1800,
        )
        if out.returncode != 0:
            raise SystemExit(out.stderr[-2000:])
        line = out.stdout.strip().splitlines()[-1]
        print(line)
        results.append(json.loads(line))
    lo, hi = results
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    print(json.dumps({"raw_4x_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
