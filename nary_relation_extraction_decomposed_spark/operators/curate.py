"""Corpus curation: the training-data composite over the engine's own
operators — quality gate -> exact dedup -> MinHash near-dup clustering ->
deterministic stratified sampling.

Every stage is deterministic (re-running yields the identical corpus, the
property that makes a 100 TB curation run auditable and resumable):

1. quality gate   — quality_score_col >= min_quality; pure scan-side
                    filter, zero shuffle.
2. exact dedup    — one groupBy on md5(text), min-id survivor
                    (operators/dedup.exact_dedup), then a semi-join back.
3. near-dup drop  — MinHash-LSH candidate pairs (capped buckets, skew
                    guard) -> connected components over the pair graph ->
                    keep each cluster's min-id representative. Clustering
                    (not pairwise greedy) makes the survivor set
                    order-independent: A~B, B~C keeps exactly min(A,B,C)
                    even though A and C never pair directly.
4. sampling       — deterministic md5-threshold per-stratum rates
                    (operators/sampling); partition-invariant and NESTED,
                    so raising a rate later only adds documents.

Returns the curated DataFrame plus each stage's frame so callers can
count/inspect lazily (the CLI prints a per-stage funnel).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text_metrics import quality_score_col
from .connected_components import connected_components
from .dedup import exact_dedup, minhash_dup_candidates
from .sampling import sample_stratified
from .similarity import _widen_if_narrow


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str = "lang",
    min_quality: float = 0.0,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    salt: str = "curate",
    shingle_n: int = 3,
) -> dict[str, DataFrame]:
    """Run the 4-stage funnel; returns {'quality', 'exact', 'neardup',
    'sampled'} — each the surviving corpus after that stage ('sampled' is
    the final curated output)."""
    # a single-split corpus scan would run the regex quality gate — and
    # everything after it — on ONE core (the round-6 AQE/under-partition
    # starvation pattern); widen up front, keyed by id
    docs = _widen_if_narrow(docs, id_col)
    # quality feeds BOTH the dedup-group build and the survivor semi-join;
    # exact feeds BOTH the MinHash stage and the near-dup anti-join — each
    # is lineage-truncated so one action executes the regex gate and the
    # dedup chain once, not once per downstream reference (measured 2x
    # wall on the 80k-doc scaling probe before truncation)
    quality = docs.filter(
        quality_score_col(F.col(text_col)) >= F.lit(min_quality)
    ).localCheckpoint(eager=False)

    keep = exact_dedup(quality, id_col, F.col(text_col)).select(
        F.col("keep_id").alias(id_col)
    )
    exact = quality.join(keep, on=id_col, how="left_semi").localCheckpoint(
        eager=False
    )

    # the semi-join's few-MB shuffle output is AQE-coalesced to one
    # partition, which would single-thread the shingle-explode + 64-agg
    # MinHash stage — the same starvation shape er.py fixed in round 6;
    # the explicit exchange is AQE-exempt and id-clustered
    pairs = minhash_dup_candidates(
        _widen_if_narrow(
            exact.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")),
            "id",
        ),
        "id",
        F.col("t"),
        shingle_n=shingle_n,
    )
    comps = connected_components(pairs, src="id_a", dst="id_b")
    # every clustered doc that is NOT its cluster's min-label rep drops;
    # docs in no pair never appear in comps and survive
    drops = comps.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    neardup = exact.join(drops, on=id_col, how="left_anti")

    sampled = sample_stratified(
        neardup,
        key=F.col(id_col),
        stratum=F.col(stratum_col),
        rates=rates or {},
        default_rate=default_rate,
        salt=salt,
    )
    return {
        "quality": quality,
        "exact": exact,
        "neardup": neardup,
        "sampled": sampled,
    }
