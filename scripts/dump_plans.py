#!/usr/bin/env python
"""Dump .explain('formatted') for named registry queries to files.

Usage: python scripts/dump_plans.py --out plans/r15 --suffix _before [query ...]
Default query set: the headline bench entries.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aws_logs_to_parquet_converter_spark.plans import REGISTRY  # noqa: E402
from aws_logs_to_parquet_converter_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="plans/r15")
    ap.add_argument("--suffix", default="_before")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump_plans", extra_conf={"spark.ui.enabled": "false"})
    from aws_logs_to_parquet_converter_spark.functions.presto_compat import (
        register_presto_compat,
    )

    register_presto_compat(spark)

    names = args.names or [n for n, q in REGISTRY.items() if q.headline]
    for name in names:
        q = REGISTRY[name]
        try:
            df = q.builder(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out / f"{name}{args.suffix}.txt").write_text(buf.getvalue())
            print(f"wrote {name}{args.suffix}.txt")
        except Exception as e:
            print(f"SKIP {name}: {type(e).__name__}: {e}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
