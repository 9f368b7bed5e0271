"""Deterministic (seedable, retry-stable) sampling for training-data
pipelines.

Why not `df.sample()` at 100 TB: Spark's sampler draws per-partition from
a seeded RNG stream, so the selected ROWS change whenever partitioning
changes — a task retry, an AQE re-plan, a different file split, or a
re-run over a re-compacted copy of the same data all yield a different
sample. A pipeline that must be re-runnable (and auditable) needs a
sample that is a pure function of each row's KEY.

The rule here: keep a row iff the first 8 hex chars of
md5(salt || ":" || key) sort lexicographically below a per-stratum
threshold. Lowercase-hex order == numeric order, so the comparison is a
uniform [0, 1) draw with 2^-32 resolution, computed identically by any
engine with md5 (the DuckDB oracle recomputes it verbatim). Properties:

- deterministic and partition-invariant: pure row function, no RNG state,
  no shuffle, whole-stage codegen (a literal create_map lookup + one md5);
- NESTED: rate r1 <= r2 implies sample(r1) is a subset of sample(r2) —
  growing a stratum's rate only ADDS rows, so curriculum re-draws never
  churn previously selected training data;
- stratified for free: the threshold is looked up from a small literal
  map on the stratum column (no join, no broadcast needed for O(100)
  strata; for a million-stratum dim use a broadcast join upstream and
  pass the precomputed `threshold` column to sample_by_threshold).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

HEX_SPAN = 16 ** 8  # 8 hex chars = 32 bits of the md5 prefix
# lexicographically above every hex digit -> rate >= 1.0 keeps all rows
KEEP_ALL = "g"


def rate_threshold(rate: float) -> str:
    """Hex threshold string t such that P[md5-prefix < t] == rate (to
    2^-32). Monotone in rate, which is what makes samples nested."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return KEEP_ALL
    return format(int(rate * HEX_SPAN), "08x")


def _draw(key: Column, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.lit(":"), key.cast("string")).cast("binary")),
        1,
        8,
    )


def sample_by_threshold(
    df: DataFrame, key: Column, threshold: Column, salt: str = "s42"
) -> DataFrame:
    """Keep rows whose md5-prefix draw for `key` sorts below `threshold`
    (an 8-char lowercase-hex column, e.g. from rate_threshold). The
    general form: threshold may come from any upstream computation."""
    return df.filter(_draw(key, salt) < threshold)


def sample_uniform(
    df: DataFrame, key: Column, rate: float, salt: str = "s42"
) -> DataFrame:
    """Deterministic uniform sample: pure function of (salt, key)."""
    return sample_by_threshold(df, key, F.lit(rate_threshold(rate)), salt)


def sample_stratified(
    df: DataFrame,
    key: Column,
    stratum: Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "s42",
) -> DataFrame:
    """Deterministic stratified sample: per-stratum rates from a literal
    map (codegen scalar lookup — zero shuffle, zero join). Strata absent
    from `rates` fall back to default_rate (0.0 = drop, the usual
    curated-mixture behavior)."""
    pairs: list[Column] = []
    for k, r in sorted(rates.items()):
        pairs += [F.lit(k), F.lit(rate_threshold(r))]
    thr = F.coalesce(
        F.element_at(F.create_map(*pairs), stratum) if pairs else F.lit(None),
        F.lit(rate_threshold(default_rate)),
    )
    return sample_by_threshold(df, key, thr, salt)
