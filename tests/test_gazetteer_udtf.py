"""As-of gazetteer snapshots + the Python UDTF triple emitter."""

from __future__ import annotations

import datetime as dt
import os

import pyspark.sql.functions as F

from nary_relation_extraction_decomposed_spark.operators.mentions import (
    gazetteer_as_of,
)


def test_gazetteer_as_of(spark, fixture_dir):
    gaz = spark.read.parquet(os.path.join(fixture_dir, "gazetteer.parquet"))
    snaps = sorted(r["snap_ts"] for r in gaz.select("snap_ts").distinct().collect())
    assert len(snaps) == 2  # fixture writes two snapshot dates

    # as-of BEFORE the second snapshot -> only first-snapshot rows survive
    early = gazetteer_as_of(gaz, snaps[0])
    assert early.filter(F.col("snap_ts") > snaps[0]).count() == 0
    # one row per (surface, ent) and full surface coverage
    assert (
        early.groupBy("surface_norm", "ent_id").count().filter("count > 1").count() == 0
    )
    assert early.select("surface_norm").distinct().count() == \
        gaz.select("surface_norm").distinct().count()

    # as-of AFTER both -> DRUG entries resolve to the later snapshot
    late = gazetteer_as_of(gaz, snaps[1] + dt.timedelta(days=1))
    drug_snaps = {r["snap_ts"] for r in late.filter(F.col("ent_type") == "DRUG")
                  .select("snap_ts").distinct().collect()}
    assert drug_snaps == {snaps[1]}
    assert (
        late.groupBy("surface_norm", "ent_id").count().filter("count > 1").count() == 0
    )


def test_udtf_triple_emitter(spark):
    from nary_relation_extraction_decomposed_spark.functions.udtf_triples import (
        EmitTriples,
    )

    spark.udtf.register("emit_triples", EmitTriples)
    df = spark.createDataFrame(
        [("adrivax", "inhibits", "brc7", "inhibits.ctx", "v600e")],
        "pn string, pa string, an string, pb string, bn string",
    )
    df.createOrReplaceTempView("joined_pairs")
    out = spark.sql(
        "SELECT t.* FROM joined_pairs, "
        "LATERAL emit_triples(pn, pa, an, pb, bn) t"
    ).collect()
    assert sorted(map(tuple, out)) == [
        ("adrivax", "inhibits", "brc7"),
        ("adrivax", "inhibits.ctx", "v600e"),
    ]
