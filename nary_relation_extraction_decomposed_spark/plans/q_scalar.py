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
    """Map construction + explode (per-partition metrics map pattern).

    Merged round 6 (the established tagged-union idiom, freeing a
    driver-window slot for sample_strat): the former `json_props` key's
    JSON-extraction rows — get_json_object string + bigint casts over the
    events props column — run here too, tagged kind='json' with
    id = event_id; the map-explode rows are tagged kind='map' with
    id = lang. Both original operators still execute."""
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
    maps = m.select(
        F.lit("map").alias("kind"),
        F.col("lang").alias("id"),
        F.explode("metrics").alias("k_str", "k_num"),
    )
    e = _t(spark, sf_dir, "events")
    jsons = e.select(
        F.lit("json").alias("kind"),
        F.col("event_id").cast("string").alias("id"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
    )
    return maps.unionByName(jsons)

ORACLES["map_metrics"] = """
WITH agg AS (
  SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY lang
)
SELECT 'map' AS kind, lang AS id, 'n_docs' AS k_str, n_docs AS k_num FROM agg
UNION ALL
SELECT 'map', lang, 'n_chars', n_chars FROM agg
UNION ALL
SELECT 'json', CAST(event_id AS VARCHAR),
       json_extract_string(props, '$.k'),
       CAST(json_extract_string(props, '$.k') AS BIGINT)
FROM events
"""


@query("sample_strat")
def sample_strat(spark, sf_dir):
    """Deterministic stratified sampling (new r6; training-data mixture
    curation): per-lang rates via operators/sampling.sample_stratified —
    keep iff the 8-hex md5(salt:doc_id) prefix sorts below the stratum's
    threshold. Pure row function: retry/AQE/partitioning-invariant where
    df.sample() is not, zero shuffle, nested across rate increases. The
    DuckDB oracle recomputes the identical md5 rule, so the SELECTED ROW
    SET (not just its size) is value-checked cross-engine."""
    from ..operators.sampling import sample_stratified

    d = _t(spark, sf_dir, "documents")
    rates = {"en": 0.5, "de": 0.25, "fr": 0.125, "es": 1.0}  # zh -> default 0
    return sample_stratified(
        d.select("doc_id", "lang"),
        key=F.col("doc_id"),
        stratum=F.col("lang"),
        rates=rates,
        salt="s42",
    ).select("doc_id", "lang")

ORACLES["sample_strat"] = """
SELECT doc_id, lang
FROM documents
WHERE substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE lang WHEN 'en' THEN '80000000' WHEN 'de' THEN '40000000'
                WHEN 'fr' THEN '20000000' WHEN 'es' THEN 'g'
                ELSE '00000000' END
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
