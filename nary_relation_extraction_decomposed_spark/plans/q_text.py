"""Text-analysis + dedup query keys over `documents` (training-data-pipeline
surface). SQL-expressible ones carry DuckDB oracles; hash-family ops
(xxhash64 MinHash/SimHash) are rows-only with pytest invariants instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions import text_metrics as TM
from ..operators import dedup as D
from ..operators.multimodal import extract_media_features, media_from_documents
from .oracles import ORACLES
from .common import _t
from .queries import query

# Shared DuckDB snippets (regex semantics identical under RE2)
_DUCK_TOKS = "len(regexp_extract_all(lower(text), '[a-z0-9]+'))"
_DUCK_EN = r"len(regexp_extract_all(lower(text), '\b(the|of|and|with|data|for)\b'))"
_DUCK_DE = r"len(regexp_extract_all(lower(text), '\b(der|die|das|und|mit|für)\b'))"
_DUCK_FR = r"len(regexp_extract_all(lower(text), '\b(le|la|les|et|des|pour)\b'))"
_DUCK_PUNCT = "len(regexp_extract_all(lower(text), '[.,;:!?]'))"


@query("text_metrics")
def text_metrics(spark, sf_dir):
    """Language-ID + quality score + token counting in ONE key (merged
    round 2 so every oracle-bearing key fits the driver's 50-key window) —
    all pure JVM SQL expressions, single scan, no shuffle."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        TM.lang_id_col(F.col("text")).alias("lang_pred"),
        TM.quality_score_col(F.col("text")).alias("q_score"),
        TM.token_count_col(F.col("text")).alias("n_tokens"),
        TM.bpe_ish_count_col(F.col("text")).alias("n_bpe_ish"),
        F.length("text").cast("bigint").alias("n_chars_seen"),
    )

ORACLES["text_metrics"] = f"""
SELECT doc_id, lang,
  CASE WHEN {_DUCK_EN} >= {_DUCK_DE} AND {_DUCK_EN} >= {_DUCK_FR} AND {_DUCK_EN} > 0 THEN 'en'
       WHEN {_DUCK_DE} >= {_DUCK_FR} AND {_DUCK_DE} > 0 THEN 'de'
       WHEN {_DUCK_FR} > 0 THEN 'fr'
       ELSE 'und' END AS lang_pred,
  round(least({_DUCK_TOKS} / 100.0, 1.0) * 0.5
      + least({_DUCK_EN} * 5.0 / greatest({_DUCK_TOKS}, 1), 1.0) * 0.4
      + (1 - least({_DUCK_PUNCT} * 1.0 / greatest({_DUCK_TOKS}, 1), 1.0)) * 0.1,
    6) AS q_score,
  CAST({_DUCK_TOKS} AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
    AS n_bpe_ish,
  CAST(length(text) AS BIGINT) AS n_chars_seen
FROM documents
"""


@query("fingerprint")
def fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TM.fingerprint_col(F.col("text")).alias("fp"))

ORACLES["fingerprint"] = """
SELECT doc_id,
       md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp
FROM documents
"""


@query("dedup_exact")
def dedup_exact(spark, sf_dir):
    """Exact dedup by content hash; grouping on a 30-char prefix so groups
    are non-trivial on the fixture data."""
    d = _t(spark, sf_dir, "documents")
    return D.exact_dedup(d, "doc_id", F.substring("text", 1, 30))

ORACLES["dedup_exact"] = """
SELECT md5(substr(text, 1, 30)) AS group_md5,
       min(doc_id) AS keep_id, count(*) AS group_size
FROM documents GROUP BY 1
"""


@query("dedup_ngram")
def dedup_ngram(spark, sf_dir):
    """Exact word-unigram jaccard >= 0.8 within (lang, source) blocks."""
    d = _t(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(
        d, "doc_id", F.col("text"),
        F.concat_ws("|", "lang", "source"), n=1, threshold=0.8,
    )

ORACLES["dedup_ngram"] = """
WITH g AS (
  SELECT doc_id AS id, lang || '|' || source AS blk,
         list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS grams
  FROM documents
)
SELECT a.id AS id_a, b.id AS id_b,
       round(len(list_intersect(a.grams, b.grams))
             / (len(a.grams) + len(b.grams)
                - len(list_intersect(a.grams, b.grams))) * 1.0, 6) AS jac
FROM g a JOIN g b ON a.blk = b.blk AND a.id < b.id
WHERE round(len(list_intersect(a.grams, b.grams))
            / (len(a.grams) + len(b.grams)
               - len(list_intersect(a.grams, b.grams))) * 1.0, 6) >= 0.8
"""


@query("dedup_minhash")
def dedup_minhash(spark, sf_dir):
    """MinHash-LSH dup candidates (xxhash64 family -> rows-only check;
    recall/precision invariants live in tests/test_dedup_similarity.py)."""
    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism * 2
    )
    return D.minhash_dup_candidates(d, "doc_id", F.col("text"), shingle_n=3)


@query("dedup_simhash")
def dedup_simhash(spark, sf_dir):
    """SimHash signatures (xxhash64 family -> rows-only check)."""
    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism * 2
    )
    return D.simhash_signatures(d, "doc_id", F.col("text"))


@query("mm_features")
def mm_features(spark, sf_dir):
    """Multimodal plumbing: binary payload -> metadata + stub features via
    mapInPandas (Python-side stub decode -> rows-only check; the pure-SQL
    binary metadata twin is `binary_meta`). The raw array<double> `feat`
    column is projected through to_json for the driver's rows-only
    canonicalizer (pandas sort_values dies on list cells); internal
    consumers use extract_media_features directly for the raw arrays."""
    d = _t(spark, sf_dir, "documents")
    feats = extract_media_features(media_from_documents(d), fake_decode=True)
    return feats.select(
        "media_id", "kind", "n_bytes", "magic", "width", "height",
        F.to_json("feat").alias("feat_json"),
    )
