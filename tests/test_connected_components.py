"""Both physical strategies of connected_components (driver union-find and
distributed min-label propagation) must produce identical labels."""

from __future__ import annotations

import pyspark.sql.functions as F

from nary_relation_extraction_decomposed_spark.operators.connected_components import (
    connected_components,
)


def _edges(spark):
    # two chains, one star, one isolated self-loop, plus a cycle
    rows = [
        (1, 2), (2, 3), (3, 4),            # chain -> comp 1
        (10, 11), (11, 12),                # chain -> comp 10
        (20, 21), (20, 22), (20, 23),      # star -> comp 20
        (30, 30),                          # self loop -> comp 30
        (40, 41), (41, 42), (42, 40),      # cycle -> comp 40
    ]
    return spark.createDataFrame(rows, "src long, dst long")


EXPECTED = {
    1: 1, 2: 1, 3: 1, 4: 1,
    10: 10, 11: 10, 12: 10,
    20: 20, 21: 20, 22: 20, 23: 20,
    30: 30,
    40: 40, 41: 40, 42: 40,
}


def test_driver_path(spark):
    got = {r["node"]: r["comp"] for r in connected_components(_edges(spark)).collect()}
    assert got == EXPECTED


def test_star_contraction_path(spark):
    got = {
        r["node"]: r["comp"]
        for r in connected_components(
            _edges(spark), driver_threshold=0, algorithm="star"
        ).collect()
    }
    assert got == EXPECTED


def test_minlabel_path(spark):
    got = {
        r["node"]: r["comp"]
        for r in connected_components(
            _edges(spark), driver_threshold=0, algorithm="minlabel"
        ).collect()
    }
    assert got == EXPECTED


def test_all_paths_agree_on_random_graph(spark):
    e = (
        spark.range(0, 3000)
        .select(
            (F.xxhash64("id") % 500).alias("src"),
            (F.xxhash64("id", F.lit(1)) % 500).alias("dst"),
        )
        .filter((F.col("src") >= 0) & (F.col("dst") >= 0))
    )
    a = {r["node"]: r["comp"] for r in connected_components(e).collect()}
    b = {r["node"]: r["comp"]
         for r in connected_components(e, driver_threshold=0, algorithm="star").collect()}
    c = {r["node"]: r["comp"]
         for r in connected_components(e, driver_threshold=0, algorithm="minlabel").collect()}
    assert a == b == c and len(a) > 100


def test_star_converges_on_long_chain(spark):
    """A 400-node chain has diameter 399: min-label propagation cannot finish
    in 20 rounds, star contraction must (O(log n))."""
    n = 400
    e = spark.range(0, n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    got = {
        r["node"]: r["comp"]
        for r in connected_components(
            e, driver_threshold=0, algorithm="star", max_iter=20
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}
