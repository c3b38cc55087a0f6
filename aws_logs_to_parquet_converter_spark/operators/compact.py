"""Write discipline: compact many small inputs into few sorted Parquet files.

Mirrors the reference's "Hotfix: Sorting issue" layout
(oss_s3_server_side_logging_compacter.py:244-262):

  * ``repartition(n)`` — exactly-N output files per day partition
    (compaction of >1M KB-sized raw objects, slides p.20/p.33);
  * ``sortWithinPartitions(request_time)`` — rows time-ordered within
    each file so Parquet row-group min/max stats give time-range data
    skipping.  Deliberately NOT a global sort (no range-exchange);
  * snappy Parquet.

Divergence (upgrade): a real ``partitionBy('dt')`` partition column
instead of string-formatted destination paths (compacter.py:246-251),
plus dynamic partition overwrite so re-running a day is idempotent
(the reference gets this by overwriting one day's directory per job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact(
    df: DataFrame,
    dest: str,
    num_files: int = 10,
    sort_keys: tuple[str, ...] = ("request_time",),
    partition_cols: tuple[str, ...] = ("dt",),
    compression: str = "snappy",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``dest/dt=YYYY-MM-DD/part-*.snappy.parquet``.

    ``num_files`` bounds files *per task wave*: each of the N tasks
    writes at most one file per dt it holds, so a single-day input
    yields exactly N files (reference ``--num-output-files`` contract,
    compacter.py:337-342).
    """
    # Replace only the partitions present in df (idempotent day
    # re-run).  Writer-scoped option, NOT spark.conf.set: a session-
    # level set would leak dynamic-overwrite semantics into every
    # later write in the session — an unrelated full-table overwrite
    # would then silently keep stale partitions (round-7 review
    # finding; streaming/corpus.py uses the same scoped form).
    # Sort by (partition cols, sort keys): the dynamic-partition writer
    # requires a task-local sort on the partition columns; providing it
    # ourselves (prefixed) keeps rows time-ordered within each file —
    # otherwise the writer's own sort on dt alone would scramble them.
    local_sort = [*partition_cols, *sort_keys]
    writer = (
        df.repartition(num_files)
        .sortWithinPartitions(*local_sort)
        .write.option("compression", compression)
        .option("partitionOverwriteMode", "dynamic")
        .mode(mode)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(dest)


def recompact_partition(
    spark,
    dest: str,
    dt: str,
    num_files: int = 10,
    sort_keys: tuple[str, ...] = ("request_time",),
    compression: str = "snappy",
) -> int:
    """Maintenance: rewrite ONE day partition into ``num_files`` sorted
    files (streaming appends and late-data re-runs accrete small files;
    this is the background merge the reference achieves by re-running a
    whole day).  Returns the rewritten row count.  Only the target
    dt directory is read or replaced — partition pruning in, dynamic
    overwrite out."""
    # materialize before writing: the destination partition is both the
    # source and the overwrite target (localCheckpoint breaks the
    # read-your-writes dependency without a driver collect)
    part = spark.read.parquet(dest).where(F.col("dt") == dt).localCheckpoint(eager=True)
    n = part.count()
    if n:
        compact(part, dest, num_files=num_files, sort_keys=sort_keys, compression=compression)
    return n


def find_fragmented_partitions(
    spark,
    dest: str,
    max_files: int = 10,
    min_file_bytes: int = 16 * 1024 * 1024,
) -> list[dict]:
    """Discovery half of partition maintenance: which ``dt=`` partitions
    have accreted too many (or too small) files and deserve a
    ``recompact_partition`` pass.  Returns
    ``[{"dt", "n_files", "total_bytes", "avg_bytes"}, ...]`` for every
    partition exceeding ``max_files`` OR averaging under
    ``min_file_bytes`` (both symptoms of streaming append drift).

    Listing runs through Spark's Hadoop FileSystem API (driver-side
    metadata only, no data read) so it works on any supported
    filesystem — local, HDFS, s3a — exactly like the write path."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(dest)
    fs = path.getFileSystem(hconf)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("dt=")):
            continue
        files = [
            f
            for f in fs.listStatus(st.getPath())
            if f.isFile() and f.getPath().getName().endswith(".parquet")
        ]
        if not files:
            continue
        n = len(files)
        total = sum(f.getLen() for f in files)
        # a single-file partition cannot be made less fragmented —
        # flagging it for small average would re-flag (and re-rewrite)
        # a genuinely small day on every maintain pass, forever
        if n > max_files or (n > 1 and total / n < min_file_bytes):
            out.append(
                {
                    "dt": name[len("dt="):],
                    "n_files": n,
                    "total_bytes": total,
                    "avg_bytes": total // n,
                }
            )
    return sorted(out, key=lambda d: d["dt"])


def expire_partitions(
    spark,
    dest: str,
    before_dt: str,
    dry_run: bool = False,
) -> list[str]:
    """Retention half of partition maintenance: drop every ``dt=``
    partition strictly OLDER than ``before_dt`` (lexicographic compare
    — ``dt`` is zero-padded ISO by the write path's contract, so
    string order IS date order).  Returns the affected dt values;
    ``dry_run=True`` lists without deleting (the ``maintain``
    convention).  Metadata-only via the Hadoop FileSystem API, same as
    the fragmentation scanner; catalog partitions are dropped by the
    caller's MSCK/ALTER pass (``sources/catalog.py``) where a table
    exists.

    The cutoff must look like a ``dt`` value (``YYYY-MM-DD``): a typo
    like '2024-1-5' would silently compare wrong lexicographically, so
    malformed cutoffs raise.  Partition dirs whose dt value fails the
    same gate are SKIPPED (never deleted, never reported expired) —
    foreign layouts are not this operator's to destroy."""
    import re

    if not re.fullmatch(r"\d{4}-\d{2}-\d{2}", before_dt):
        raise ValueError(
            f"expire_partitions: before_dt must be YYYY-MM-DD, got {before_dt!r}"
        )
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(dest)
    fs = path.getFileSystem(hconf)
    if not fs.exists(path):
        return []
    expired = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("dt=")):
            continue
        dt = name[len("dt="):]
        # the same YYYY-MM-DD gate as the cutoff: a nonconforming dir
        # (dt=2024-1-5, dt=20240105) compares lexicographically wrong
        # and could be wrongly deleted — skip it, never delete it
        # (r11 advisor; delete is recursive and destructive)
        if not re.fullmatch(r"\d{4}-\d{2}-\d{2}", dt):
            continue
        if dt < before_dt:
            expired.append(dt)
            if not dry_run:
                fs.delete(st.getPath(), True)
    return sorted(expired)


def compact_to_size(
    df: DataFrame,
    dest: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_keys: tuple[str, ...] = ("request_time",),
    partition_cols: tuple[str, ...] = ("dt",),
    compression: str = "snappy",
    mode: str = "overwrite",
    compression_ratio: float = 4.0,
    max_files: int = 10_000,
) -> int:
    """``compact`` with the knob operators actually reason in: target
    output FILE SIZE, not file count.  A fixed ``num_files`` that is
    right for today's volume is wrong after the next 10x — this derives
    the count per run from the plan's own size estimate, so the layout
    converges on ~``target_file_bytes`` files (the 128 MB default
    matches ``spark.sql.files.maxPartitionBytes``: a later scan gets
    one well-sized task per file).

    Sizing uses Catalyst's logical-plan statistics when they are real
    (file-backed sources: sum of file sizes after pruning, zero data
    pass — the recompaction/maintenance case this lever is for).
    Derived plans (e.g. fresh parse output) propagate garbage row-width
    estimates through wide projections (measured: 1e20 for the log
    parser), so estimates above the sanity bound fall back to ONE
    measuring aggregate — rows x mean serialized row width — an extra
    pass that is explicit in the plan, never silent.  The estimate
    ``compression_ratio`` applies ONLY to that raw-byte fallback (raw
    text overstates snappy parquet ~4x); file-backed plan stats are
    already on-disk bytes and size the output directly.  Returns the
    per-wave file count used.

    Multi-partition inputs: ``compact``'s round-robin repartition puts
    every partition value in every task, so a task wave of N writes up
    to N files PER ``dt`` — sizing must therefore divide by the number
    of distinct partition values or a 30-day input would emit 30x too
    many files at 1/30 the target size.  The distinct count folds into
    the measuring aggregate on the fallback path (no extra job); the
    plan-stats path pays one column-pruned countDistinct job — cheap
    next to the rewrite itself.  Per-day file sizes then track each
    day's share of the bytes.
    """
    if target_file_bytes <= 0:
        raise ValueError(f"target_file_bytes must be positive, got {target_file_bytes}")
    # struct() wraps the partition key so NULL-valued combos still
    # count as partitions (countDistinct alone drops them, but the
    # writer emits a __HIVE_DEFAULT_PARTITION__ directory for them)
    part_key = F.countDistinct(F.struct(*partition_cols)) if partition_cols else F.lit(1)
    est_out = float(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if est_out > 1 << 50:  # Catalyst unknown/propagated-garbage stats
        row = df.agg(
            F.count("*").alias("n"),
            F.avg(F.length(F.to_json(F.struct(*df.columns)))).alias("w"),
            part_key.alias("p"),
        ).first()
        est_out = (row["n"] or 0) * (row["w"] or 1.0) / compression_ratio
        n_parts = max(1, row["p"] or 0)
    else:
        n_parts = max(1, df.agg(part_key).first()[0] or 0) if partition_cols else 1
    num_files = max(1, min(max_files, round(est_out / target_file_bytes / n_parts)))
    compact(
        df,
        dest,
        num_files=num_files,
        sort_keys=sort_keys,
        partition_cols=partition_cols,
        compression=compression,
        mode=mode,
    )
    return num_files
