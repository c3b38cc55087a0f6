#!/usr/bin/env python
"""Local stand-in for the driver's t2 correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables; compare row count, column names, and an
order-insensitive value multiset.

Usage: python scripts/check_parity.py [query ...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from aws_logs_to_parquet_converter_spark.plans.registry import TABLES


def canon(rows, cols):
    """Order-insensitive canonical form: per row, sorted-by-name column
    values normalized to strings (floats rounded to 9 significant
    digits, NaN/None unified)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            return f"{v:.9g}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    return sorted("|".join(norm(r[i]) for i in order) for r in rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from aws_logs_to_parquet_converter_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)

    spark = get_spark(app_name="parity", extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only, no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            ores = con.sql(oracles[name])
            orows = ores.fetchall()
            ocols = ores.columns
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            sc, oc = canon(srows, scols), canon(orows, ocols)
            if sc != oc:
                diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
                problems.append(f"values differ, e.g. {diffs}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAIL")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
