"""Shared versioned-commit plumbing for the persisted indexes.

Both on-disk indexes (MinHash: ``dedup.save_minhash_index``; PQ:
``similarity.save_pq_index``) use the same crash-atomic layout — data
under ``{path}/v-<ver>/...``, a params row carrying the live version
written LAST — so the stale-version prune lives here once instead of
being hand-rolled per index (r10 review).

Concurrency contract (applies to every caller): SINGLE WRITER, and the
prune runs immediately after the commit, so a probe whose plan already
resolved the old version dir (vdir resolution is eager at plan build,
the parquet scan lazy at execution) can hit deleted files if a refresh
commits mid-job.  Crash-recovery readers are always safe — they
re-resolve through the params pointer; concurrent long-running probes
must be scheduled apart from refreshes, or the caller passes
``prune=False`` to the save function and prunes in a later maintenance
window (``prune_stale_versions`` is public for exactly that).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def prune_stale_versions(
    spark: SparkSession,
    path: str,
    live_ver: str,
    extra_stale: "tuple[str, ...]" = (),
) -> None:
    """Delete every ``v-*`` dir under ``path`` except the live one,
    plus any ``extra_stale`` literal names (e.g. the pre-versioning
    flat-layout dirs a migrating refresh supersedes).  Best effort,
    post-commit; see the module docstring for the concurrency
    contract."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        stale_v = name.startswith("v-") and name != f"v-{live_ver}"
        if stale_v or name in extra_stale:
            fs.delete(st.getPath(), True)
