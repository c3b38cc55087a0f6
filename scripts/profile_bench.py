#!/usr/bin/env python
"""Per-query profiling for the headline bench: bench.py's exact warmup
and timed loop, plus (a) a builder-vs-sink time split and (b) an event
-log breakdown — jobs, stages, tasks, shuffle bytes per query — so
optimization work targets measured cost, not guesses (guide §1).

Usage: python scripts/profile_bench.py [query ...]   (default: all headline)
Writes a per-query table to stdout; raw event log stays in --event-dir.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aws_logs_to_parquet_converter_spark.plans import REGISTRY  # noqa: E402
from aws_logs_to_parquet_converter_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--event-dir", default="/tmp/spark-events-profile")
    args = ap.parse_args()

    sf_dir = args.sf
    ev_dir = Path(args.event_dir)
    ev_dir.mkdir(parents=True, exist_ok=True)
    import shutil

    for old in ev_dir.glob("*"):
        shutil.rmtree(old) if old.is_dir() else old.unlink()

    spark = get_spark(
        app_name="profile_bench",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": str(ev_dir),
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )

    # --- bench.py's warmup, verbatim in spirit ---------------------------
    from pyspark.sql import functions as F  # noqa: N812
    from pyspark.sql import Window as _W

    spark.sparkContext.setJobDescription("warmup")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from aws_logs_to_parquet_converter_spark.functions.presto_compat import (
        register_presto_compat,
    )
    from aws_logs_to_parquet_converter_spark.plans.registry import t as _t

    register_presto_compat(spark)
    _t(spark, sf_dir, "events").count()
    _t(spark, sf_dir, "documents").select(F.sum(F.length("text"))).collect()
    _t(spark, sf_dir, "embeddings").select(F.avg(F.element_at("embedding", 1))).collect()
    _tiny = spark.range(256).select(F.col("id"), (F.col("id") % 7).alias("g"))
    (
        _tiny.join(F.broadcast(_tiny.where(F.col("id") < 3).select(F.col("id").alias("j"))), F.col("g") != F.col("j"))
        .select("id", "g", F.row_number().over(_W.partitionBy("g").orderBy("id")).alias("rn"))
        .where(F.col("rn") <= 5)
        .write.format("noop").mode("overwrite").save()
    )
    warm_sf = os.environ.get("SPARK_GRAFT_WARM_SF_DIR") or os.path.join(
        os.path.dirname(sf_dir.rstrip("/")), "sf0.001"
    )
    if not os.path.isdir(warm_sf):
        warm_sf = "/root/testdata/sf0.001"
    names = args.names or [n for n, q in REGISTRY.items() if q.headline]
    for name in names:
        q = REGISTRY[name]
        try:
            q.builder(spark, warm_sf).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        spark.catalog.clearCache()

    # --- timed loop with builder/sink split ------------------------------
    results = {}
    for name in names:
        q = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"Q::{name}")
        t0 = time.perf_counter()
        df = q.builder(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        results[name] = {"build_s": round(t1 - t0, 3), "sink_s": round(t2 - t1, 3),
                         "total_s": round(t2 - t0, 3)}
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # --- event-log breakdown --------------------------------------------
    per_q = defaultdict(lambda: {"jobs": 0, "stages": 0, "tasks": 0,
                                 "shuf_read_mb": 0.0, "shuf_write_mb": 0.0,
                                 "job_ms": 0})
    stage_to_q = {}
    job_desc = {}
    candidates = list(ev_dir.glob(f"*{app_id}*")) or list(ev_dir.glob("*"))
    files = []
    for c in candidates:
        if c.is_dir():  # Spark 4 rolling event-log dir (eventlog_v2_<app>)
            files.extend(f for f in sorted(c.iterdir())
                         if f.is_file() and "appstatus" not in f.name)
        else:
            files.append(c)
    for evf in files:
        for line in open(evf):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get("spark.job.description", "")
                jid = ev["Job ID"]
                job_desc[jid] = (desc, ev.get("Submission Time", 0))
                if desc.startswith("Q::"):
                    qn = desc[3:]
                    per_q[qn]["jobs"] += 1
                    for sid in [s["Stage ID"] for s in ev.get("Stage Infos", [])]:
                        stage_to_q[sid] = qn
            elif et == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                desc, sub = job_desc.get(jid, ("", 0))
                if desc.startswith("Q::") and sub:
                    per_q[desc[3:]]["job_ms"] += ev.get("Completion Time", sub) - sub
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                qn = stage_to_q.get(si["Stage ID"])
                if qn is None:
                    continue
                if si.get("Submission Time") is None:
                    continue  # skipped stage (reused exchange)
                per_q[qn]["stages"] += 1
                per_q[qn]["tasks"] += si.get("Number of Tasks", 0)
                for acc in si.get("Accumulables", []):
                    if acc.get("Name") == "internal.metrics.shuffle.read.remoteBytesRead" or \
                       acc.get("Name") == "internal.metrics.shuffle.read.localBytesRead":
                        per_q[qn]["shuf_read_mb"] += float(acc.get("Value", 0)) / 1e6
                    elif acc.get("Name") == "internal.metrics.shuffle.write.bytesWritten":
                        per_q[qn]["shuf_write_mb"] += float(acc.get("Value", 0)) / 1e6

    hdr = f"{'query':34s} {'total':>7s} {'build':>7s} {'sink':>7s} {'jobs':>4s} {'stg':>4s} {'tasks':>5s} {'shW MB':>7s} {'shR MB':>7s}"
    print(hdr)
    print("-" * len(hdr))
    for name in names:
        r = results[name]
        p = per_q.get(name, {})
        print(f"{name:34s} {r['total_s']:7.3f} {r['build_s']:7.3f} {r['sink_s']:7.3f} "
              f"{p.get('jobs', 0):4d} {p.get('stages', 0):4d} {p.get('tasks', 0):5d} "
              f"{p.get('shuf_write_mb', 0):7.2f} {p.get('shuf_read_mb', 0):7.2f}")
    print(json.dumps({"profile": {n: {**results[n], **per_q.get(n, {})} for n in names}}))


if __name__ == "__main__":
    main()
