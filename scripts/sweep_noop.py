#!/usr/bin/env python
"""Registry-wide warm noop-sink timing sweep (guide §1.4): time every
REGISTRY entry's builder to the noop sink at $SPARK_GRAFT_SF_DIR
(default sf0.1) after a per-plan toy-scale warm run, print a sorted
table.  Used to pick optimization targets — the slowest-N rows are
where wall time lives.

Usage: python scripts/sweep_noop.py [--sf DIR] [--warm-sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from aws_logs_to_parquet_converter_spark.plans import REGISTRY
    from aws_logs_to_parquet_converter_spark.session import get_spark

    spark = get_spark(app_name="sweep", extra_conf={"spark.ui.enabled": "false"})
    names = args.names or list(REGISTRY)

    rows = []
    for name in names:
        q = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        try:
            q.builder(spark, args.warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        try:
            q.builder(spark, args.sf).write.format("noop").mode("overwrite").save()
            secs = time.perf_counter() - t0
            rows.append((secs, name, ""))
        except Exception as exc:  # noqa: BLE001
            rows.append((time.perf_counter() - t0, name, f"ERR {type(exc).__name__}: {exc}"[:120]))
        spark.catalog.clearCache()
        print(f"{rows[-1][0]:8.2f}s  {name} {rows[-1][2]}", flush=True)

    print("\n=== slowest first ===")
    for secs, name, err in sorted(rows, reverse=True):
        print(f"{secs:8.2f}s  {name} {err}")
    print(f"\ntotal {sum(r[0] for r in rows):.1f}s over {len(rows)} entries")
    spark.stop()


if __name__ == "__main__":
    main()
