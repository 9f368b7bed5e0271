"""queries() registry: qkey -> callable(spark, sf_dir) -> DataFrame.

Every key here is an operator row from SURVEY.md §2; each SQL-expressible
key has a DuckDB twin in plans/oracles.py with IDENTICAL column aliases
(the driver hash-compares values with columns sorted by name).

REGISTRATION ORDER IS LOAD-BEARING: the driver's correctness gate checks
the first 50 keys of this dict in iteration order. Round 1 buried the
entire KG core past position 50, so KEY_ORDER now pins an explicit order:
all oracle-bearing keys first (KG pipeline keys leading), the rows-only
sketch/hash-family keys (6 as of r5) last. register_all() asserts the invariant so a
new oracle key can never silently land outside the checked window again.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

# Keys whose output is xxhash64/sketch-family (engine-specific values, no
# cross-engine SQL twin by design); they are pinned by pytest invariants
# and MUST sort after every oracle-bearing key.
ROWS_ONLY_KEYS = (
    # ann_lsh left this list in r5: its one hash-derived artifact (the
    # plane-sign pattern) is committed as a fixture DuckDB reads, making
    # the full ANN result exactly recomputable cross-engine.
    "minhash_sig",
    "lsh_blocks",
    "agg_approx",
    "dedup_minhash",
    "dedup_simhash",
    "mm_features",
)

# The driver checks this many keys, in registration order.
DRIVER_KEY_WINDOW = 50

KEY_ORDER = (
    # --- KG pipeline core (the product; SURVEY §2 rows 2, 4, 13, 52-54,
    #     58-62, 65-66) ---
    "scan_pages",
    "extract_text",
    "detect_mentions",
    "doc_graph_bfs",
    "decompose_nary",
    "rejoin_triples",
    "rejoin_nary4",
    # downstream KG-query surface (new r6; slot freed by folding
    # binary_meta into mm_meta)
    "kg_pattern",
    "conn_comp",
    "canonicalize",
    # --- streaming-window surface (rows 47-49, batch-window twins) ---
    "win_tumble",
    "win_slide",
    "win_session",
    # --- vector / similarity (rows 27, 55 + LLM-pipeline surface) ---
    "ann_topk",
    # oracle-bearing since r5 (hyperplane-sign fixture; slot freed by
    # folding win_rownum into win_topk)
    "ann_lsh",
    "dedup_embed",
    "agg_centroid",
    # --- text analysis + dedup (LLM-pipeline surface) ---
    "text_metrics",
    "fingerprint",
    "dedup_exact",
    "dedup_ngram",
    # pair generation of the hash-family dedups, value-checked against a
    # committed signature fixture (r5; the signatures themselves stay
    # rows-only — see ROWS_ONLY_KEYS)
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    # deterministic stratified sampling (new r6; slot freed by folding
    # json_props into map_metrics)
    "sample_strat",
    # --- scalar-function surface (rows 38-46) ---
    "str_norm",
    # binary_meta folded into mm_meta r6 (blob rows still execute there,
    # tagged by kind)
    "mm_meta",
    "date_trunc",
    "salt_key",
    "arr_shingle",
    # json_props folded into map_metrics r6 (JSON rows still execute
    # there, tagged kind='json')
    "map_metrics",
    "explode_mentions",
    # --- relational surface (rows 8-37) ---
    "project_basic",
    # filter_lang + regex_filter merged r5 (both filters still run, tagged)
    "filter_regex",
    "dedup_url",
    "join_broadcast",
    "join_left",
    # join_semi + join_anti merged r5 (both join types still run, tagged)
    "join_semi_anti",
    "pairs_selfjoin",
    "join_interval",
    "join_asof",
    "join_bnl",
    "agg_stats",
    "agg_collect",
    "agg_rollup",
    "agg_pivot",
    # win_rownum folded into win_topk r5 (row_number + top-k filter both
    # still execute there)
    "win_frame",
    "win_topk",
    "topk_global",
    "set_ops",
    "tpch_q3ish",
    # --- rows-only keys: past the driver window by design ---
    *ROWS_ONLY_KEYS,
)


def query(name: str):
    def deco(fn):
        QUERIES[name] = fn
        return fn

    return deco


def register_all() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Import the q_* modules for their @query side effects (lazily, so
    importing any single q_* module directly never recurses) and return the
    registry reordered per KEY_ORDER (oracle-bearing keys inside the
    driver's checked window, rows-only keys last)."""
    from . import q_kg  # noqa: F401
    from . import q_stream  # noqa: F401
    from . import q_vector  # noqa: F401
    from . import q_text  # noqa: F401
    from . import q_scalar  # noqa: F401
    from . import q_relational  # noqa: F401
    from .oracles import ORACLES

    unknown = set(QUERIES) - set(KEY_ORDER)
    assert not unknown, f"keys registered but missing from KEY_ORDER: {unknown}"
    ordered = {k: QUERIES[k] for k in KEY_ORDER if k in QUERIES}
    late_oracles = [
        k for i, k in enumerate(ordered) if k in ORACLES and i >= DRIVER_KEY_WINDOW
    ]
    assert not late_oracles, (
        f"oracle-bearing keys outside the driver's {DRIVER_KEY_WINDOW}-key "
        f"window: {late_oracles}"
    )
    return ordered
