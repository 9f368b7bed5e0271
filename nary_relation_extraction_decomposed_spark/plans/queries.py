"""queries() registry: qkey -> callable(spark, sf_dir) -> DataFrame.

Every key here is an operator row from SURVEY.md §2; each SQL-expressible
key has a DuckDB twin in plans/oracles.py with IDENTICAL column aliases
(the driver hash-compares values with columns sorted by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def query(name: str):
    def deco(fn):
        QUERIES[name] = fn
        return fn

    return deco


def register_all() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Import the q_* modules for their @query side effects (lazily, so
    importing any single q_* module directly never recurses) and return the
    registry."""
    from . import q_relational  # noqa: F401
    from . import q_scalar  # noqa: F401
    from . import q_text  # noqa: F401
    from . import q_vector  # noqa: F401
    from . import q_kg  # noqa: F401
    from . import q_stream  # noqa: F401

    return QUERIES
