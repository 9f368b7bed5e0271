"""Local replica of the driver's correctness gate.

Runs every queries() key on Spark at --sf, runs the matching oracle_sql()
on DuckDB over the same parquet tables, and compares:
  row count -> column names (sorted) -> cell values (rows sorted, exact).

Usage:
  python tools/check_oracles.py [--sf /root/testdata/sf0.001] [--keys a,b,c]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return f"{v:.9g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--keys", default=None)
    args = ap.parse_args()

    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    queries = E.queries()
    oracles = E.oracle_sql()
    keys = args.keys.split(",") if args.keys else list(queries)

    n_ok = n_weak = n_fail = 0
    for k in keys:
        t0 = time.time()
        try:
            sdf = queries[k](spark, args.sf)
            pdf = sdf.toPandas()
        except Exception as ex:
            print(f"FAIL  {k}: spark error: {ex}")
            n_fail += 1
            continue
        if k not in oracles:
            print(f"weak  {k}: rows={len(pdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[k]).df()
        except Exception as ex:
            print(f"FAIL  {k}: duckdb error: {ex}")
            n_fail += 1
            continue
        if len(pdf) != len(odf):
            print(f"FAIL  {k}: rowcount spark={len(pdf)} duck={len(odf)}")
            n_fail += 1
            continue
        if sorted(pdf.columns) != sorted(odf.columns):
            print(f"FAIL  {k}: columns spark={sorted(pdf.columns)} duck={sorted(odf.columns)}")
            n_fail += 1
            continue
        a, b = canon(pdf), canon(odf)
        if a != b:
            bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL  {k}: values differ at sorted-row {bad}:")
            print(f"      spark={a[bad]}")
            print(f"      duck ={b[bad]}")
            n_fail += 1
            continue
        print(f"OK    {k}: rows={len(pdf)} [{time.time()-t0:.1f}s]")
        n_ok += 1

    print(f"\n{n_ok} ok, {n_weak} weak (rows-only), {n_fail} FAILED / {len(keys)} keys")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
