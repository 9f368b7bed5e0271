"""Scalar-function surface: string/hash/date/salt/array/map/json/binary/
explode (SURVEY.md §2 H), each with a DuckDB oracle twin.

Hash notes: cross-engine-checkable hashing uses md5 (identical hex in Spark
and DuckDB). Internal pipeline ids use xxhash64 (JVM-only, faster) — those
ops are oracle'd structurally (see q_kg) or covered by pytest.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions.textnorm import normalize_surface_col
from .oracles import ORACLES
from .common import _t
from .queries import query


@query("str_norm")
def str_norm(spark, sf_dir):
    """String normalization + deterministic content-derived ids in ONE key
    (SURVEY §2 rows 38-39; merged round 2). md5 is the cross-engine twin of
    the pipeline's internal xxhash64 ids."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        normalize_surface_col(F.substring("text", 1, 50)).alias("norm"),
        F.lower(F.trim(F.col("source"))).alias("src_norm"),
        F.levenshtein(F.col("lang"), F.lit("en")).cast("bigint").alias("lang_dist"),
        F.md5(F.concat_ws("/", "source", F.col("doc_id").cast("string"))).alias("row_md5"),
    )

ORACLES["str_norm"] = """
SELECT doc_id,
       trim(regexp_replace(lower(substr(text, 1, 50)), '[^a-z0-9]+', ' ', 'g')) AS norm,
       lower(trim(source)) AS src_norm,
       CAST(levenshtein(lang, 'en') AS BIGINT) AS lang_dist,
       md5(source || '/' || CAST(doc_id AS VARCHAR)) AS row_md5
FROM documents
"""


@query("date_trunc")
def date_trunc(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(F.count("*").alias("n_orders"))
    )

ORACLES["date_trunc"] = """
SELECT date_trunc('month', o_orderdate) AS month,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       count(*) AS n_orders
FROM orders GROUP BY 1, 2
"""


@query("salt_key")
def salt_key(spark, sf_dir):
    """Content-derived salting (md5 twin of the xxhash64 salt_expr used by
    the pipeline): hot keys spread over 8 salted sub-keys, then the partial
    aggregates are merged — the two-phase skew-agg pattern end-to-end."""
    d = _t(spark, sf_dir, "documents")
    salted = d.select(
        "lang",
        F.pmod(F.ascii(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)), F.lit(8))
        .cast("bigint")
        .alias("salt"),
    )
    partial = salted.groupBy("lang", "salt").agg(F.count("*").alias("c"))
    return partial.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.countDistinct("salt").alias("n_salts"),
    )

ORACLES["salt_key"] = """
WITH salted AS (
  SELECT lang, CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 8 AS BIGINT) AS salt
  FROM documents
), partial AS (
  SELECT lang, salt, count(*) AS c FROM salted GROUP BY lang, salt
)
SELECT lang, CAST(sum(c) AS BIGINT) AS n_docs, count(DISTINCT salt) AS n_salts
FROM partial GROUP BY lang
"""


@query("arr_shingle")
def arr_shingle(spark, sf_dir):
    """Higher-order array functions: character shingling without UDFs."""
    d = _t(spark, sf_dir, "documents").filter(F.length("text") >= 10)
    prefix = F.substring("text", 1, 60)
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(prefix) - 2, F.lit(1))),
            lambda i: F.substr(prefix, i, F.lit(3)),
        )
    )
    return d.select(
        "doc_id",
        F.size(sh).cast("bigint").alias("n_distinct_shingles"),
        F.array_join(F.slice(F.array_sort(sh), 1, 5), "|").alias("first5"),
    )

ORACLES["arr_shingle"] = """
SELECT doc_id,
       CAST(len(list_distinct(list_transform(
            range(1, greatest(length(substr(text,1,60)) - 2, 1) + 1),
            i -> substr(substr(text,1,60), i, 3)))) AS BIGINT) AS n_distinct_shingles,
       array_to_string(list_sort(list_distinct(list_transform(
            range(1, greatest(length(substr(text,1,60)) - 2, 1) + 1),
            i -> substr(substr(text,1,60), i, 3))))[1:5], '|') AS first5
FROM documents WHERE length(text) >= 10
"""


@query("map_metrics")
def map_metrics(spark, sf_dir):
    """Map construction + explode (per-partition metrics map pattern)."""
    d = _t(spark, sf_dir, "documents")
    agg = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").cast("bigint").alias("n_chars")
    )
    m = agg.select(
        "lang",
        F.create_map(
            F.lit("n_docs"), F.col("n_docs"),
            F.lit("n_chars"), F.col("n_chars"),
        ).alias("metrics"),
    )
    return m.select("lang", F.explode("metrics").alias("metric", "value"))

ORACLES["map_metrics"] = """
WITH agg AS (
  SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY lang
)
SELECT lang, 'n_docs' AS metric, n_docs AS value FROM agg
UNION ALL
SELECT lang, 'n_chars' AS metric, n_chars AS value FROM agg
"""


@query("json_props")
def json_props(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
    )

ORACLES["json_props"] = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
FROM events
"""


@query("explode_mentions")
def explode_mentions(spark, sf_dir):
    """ArrayType explode with position (1 doc row -> N element rows)."""
    em = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return em.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val_raw")
    ).select(
        "vec_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.round(F.col("val_raw").cast("double"), 6).alias("val"),
    )

ORACLES["explode_mentions"] = """
SELECT vec_id, CAST(u - 1 AS BIGINT) AS pos,
       round(CAST(embedding[u] AS DOUBLE), 6) AS val
FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(u)
WHERE vec_id < 50
"""


# binary_meta (byte length + md5 over an opaque binary column) merged into
# mm_meta round 6 — the blob rows still execute there, tagged
# kind='application/octet-stream' (see plans/q_text.py).
