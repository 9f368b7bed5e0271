"""Vector/similarity query keys over `embeddings`.

Cross-engine float determinism: all dot products run in double with
sequential accumulation on both engines; emitted cosines are rounded to 6dp
and rankings order by the ROUNDED value with id tie-breaks.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from ..operators import similarity as S
from .oracles import ORACLES
from .common import _t
from .queries import query


@query("ann_topk")
def ann_topk(spark, sf_dir):
    em = _t(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 5)
    return S.ann_topk_bruteforce(em, q, k=5)

ORACLES["ann_topk"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))),
               6) AS cosine
  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
), ranked AS (
  SELECT q_id, n_id, cosine,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS BIGINT) AS rank
  FROM scored
)
SELECT q_id, n_id, cosine, rank FROM ranked WHERE rank <= 5
"""


@query("ann_lsh")
def ann_lsh(spark, sf_dir):
    """Random-hyperplane bucketed ANN. Oracle-bearing since r5: the only
    xxhash64-derived piece is the plane SIGN pattern, committed as
    tests/fixtures/data/hyperplane_signs.parquet (fixtures/gen_sigs.py,
    verified to reproduce hyperplane_buckets bit-for-bit) — from it DuckDB
    recomputes the bucket keys exactly (integer micro-unit signed sums +
    bit-fold are order-free in both engines), joins buckets per table,
    dedups candidates and reranks with the same 6dp-rounded cosine as
    ann_topk. Recall-vs-bruteforce additionally asserted in
    tests/test_dedup_similarity.py."""
    em = _t(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 5)
    return S.ann_topk_lsh(em, q, k=5, dim=64, n_planes=4, n_tables=8)


_SIGNS_FIX = os.path.abspath(
    os.path.join(
        os.path.dirname(__file__), "..", "..",
        "tests", "fixtures", "data", "hyperplane_signs.parquet",
    )
)

ORACLES["ann_lsh"] = f"""
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
comp AS (
  SELECT id, t.i AS pos, CAST(round(v[t.i + 1] * 1000000.0, 0) AS BIGINT) AS q
  FROM e, range(64) t(i)
),
signs AS (SELECT * FROM read_parquet('{_SIGNS_FIX}')),
sums AS (
  SELECT c.id, s.tbl, s.plane, sum(s.sgn * c.q) AS ssum
  FROM comp c JOIN signs s ON s.pos = c.pos
  GROUP BY c.id, s.tbl, s.plane
),
buckets AS (
  SELECT id, tbl,
         sum(CASE WHEN ssum >= 0 THEN (1::BIGINT << plane) ELSE 0 END) AS bucket
  FROM sums GROUP BY id, tbl
),
cands AS (
  SELECT DISTINCT q.id AS q_id, n.id AS n_id
  FROM buckets n JOIN buckets q ON n.tbl = q.tbl AND n.bucket = q.bucket
  WHERE q.id < 5 AND q.id <> n.id
),
ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT c.q_id, c.n_id,
         round(list_dot_product(qv.v, nv.v)
               / (sqrt(list_dot_product(qv.v, qv.v))
                  * sqrt(list_dot_product(nv.v, nv.v))), 6) AS cosine
  FROM cands c
  JOIN ev qv ON qv.vec_id = c.q_id
  JOIN ev nv ON nv.vec_id = c.n_id
),
ranked AS (
  SELECT q_id, n_id, cosine,
         CAST(row_number() OVER (PARTITION BY q_id
                                 ORDER BY cosine DESC, n_id) AS BIGINT) AS rank
  FROM scored
)
SELECT q_id, n_id, cosine, rank FROM ranked WHERE rank <= 5
"""


@query("dedup_embed")
def dedup_embed(spark, sf_dir):
    em = _t(spark, sf_dir, "embeddings")
    return S.embed_near_dup_pairs(
        em, "vec_id", "embedding", F.col("label"), threshold=0.25
    )

ORACLES["dedup_embed"] = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
             6) AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
            6) >= 0.25
"""


@query("agg_centroid")
def agg_centroid(spark, sf_dir):
    em = _t(spark, sf_dir, "embeddings")
    return S.centroids_sql(em, "label")

ORACLES["agg_centroid"] = """
WITH ex AS (
  SELECT label, u - 1 AS pos,
         CAST(round(CAST(embedding[u] AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(u)
)
SELECT label, CAST(pos AS BIGINT) AS pos,
       round(CAST(sum(q) AS BIGINT) / (count(*) * 1000000.0), 6) AS centroid
FROM ex GROUP BY label, pos
"""
