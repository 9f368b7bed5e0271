"""operators/sampling: deterministic md5-threshold sampling invariants.

The sample_strat driver key value-checks the selected ROW SET against
DuckDB recomputing the same md5 rule; these tests pin the operator
properties that make it the right sampler at scale — determinism across
partitionings (df.sample() is not), nesting across rate increases, rate
accuracy, and the stratum fallback.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nary_relation_extraction_decomposed_spark.operators.sampling import (
    KEEP_ALL,
    rate_threshold,
    sample_by_threshold,
    sample_stratified,
    sample_uniform,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 4000).select(
        F.col("id").alias("k"),
        (F.pmod(F.col("id"), F.lit(4))).cast("string").alias("grp"),
    )


def _keys(df):
    return {r["k"] for r in df.select("k").collect()}


def test_rate_threshold_values():
    assert rate_threshold(0.0) == "00000000"
    assert rate_threshold(0.5) == "80000000"
    assert rate_threshold(0.25) == "40000000"
    assert rate_threshold(1.0) == KEEP_ALL
    with pytest.raises(ValueError):
        rate_threshold(1.5)
    with pytest.raises(ValueError):
        rate_threshold(-0.1)


def test_deterministic_and_partition_invariant(ids):
    a = _keys(sample_uniform(ids, F.col("k"), 0.3))
    b = _keys(sample_uniform(ids.repartition(17, "grp"), F.col("k"), 0.3))
    c = _keys(sample_uniform(ids.coalesce(1), F.col("k"), 0.3))
    assert a == b == c and a


def test_nested_across_rates(ids):
    s1 = _keys(sample_uniform(ids, F.col("k"), 0.1))
    s3 = _keys(sample_uniform(ids, F.col("k"), 0.3))
    s10 = _keys(sample_uniform(ids, F.col("k"), 1.0))
    assert s1 <= s3 <= s10
    assert len(s10) == 4000


def test_rate_accuracy(ids):
    n = len(_keys(sample_uniform(ids, F.col("k"), 0.5)))
    # binomial(4000, 0.5): 5 sigma ~ 158
    assert abs(n - 2000) < 160


def test_salt_changes_the_draw(ids):
    a = _keys(sample_uniform(ids, F.col("k"), 0.3, salt="s1"))
    b = _keys(sample_uniform(ids, F.col("k"), 0.3, salt="s2"))
    assert a != b
    assert abs(len(a) - len(b)) < 300


def test_stratified_rates_and_default_drop(ids):
    out = sample_stratified(
        ids, F.col("k"), F.col("grp"), {"0": 1.0, "1": 0.25}
    )
    rows = out.groupBy("grp").count().collect()
    got = {r["grp"]: r["count"] for r in rows}
    assert got["0"] == 1000
    assert abs(got.get("1", 0) - 250) < 100
    assert "2" not in got and "3" not in got  # default_rate=0 drops


def test_stratified_default_rate_fallback(ids):
    out = sample_stratified(
        ids, F.col("k"), F.col("grp"), {"0": 0.0}, default_rate=1.0
    )
    got = {r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()}
    assert got == {"1": 1000, "2": 1000, "3": 1000}


def test_threshold_column_form_matches_literal_form(ids):
    lit = sample_uniform(ids, F.col("k"), 0.25)
    col = sample_by_threshold(ids, F.col("k"), F.lit(rate_threshold(0.25)))
    assert _keys(lit) == _keys(col)


def test_no_exchange_in_plan(ids):
    """The sampler must stay a scan-side filter: no Exchange in the
    optimized plan (zero shuffle at any scale)."""
    out = sample_stratified(
        ids, F.col("k"), F.col("grp"), {"0": 0.5, "1": 0.25}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
