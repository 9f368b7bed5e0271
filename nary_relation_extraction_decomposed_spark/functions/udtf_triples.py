"""Python UDTF surface (Spark 4): a table function emitting the two triples
of a rejoined n-ary instance.

The production pipeline uses explode() for this (JVM-side, no Python hop) —
this UDTF exists to cover the UDTF operator surface (SURVEY.md §2 row 56)
and as the seam for table functions that genuinely need Python logic.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="subj string, pred string, obj string")
class EmitTriples:
    """lateral-join table function: one rejoined instance row in, its two
    (subj, pred, obj) rows out."""

    def eval(self, pivot_norm: str, pred_a: str, a_norm: str,
             pred_b: str, b_norm: str):
        yield (pivot_norm, pred_a, a_norm)
        yield (pivot_norm, pred_b, b_norm)
