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


def write_params(
    spark: SparkSession,
    params_path: str,
    row: tuple,
    schema_ddl: str,
) -> None:
    """Flip the single-row params pointer WITHOUT a Spark job.

    Every versioned commit used to end with
    ``spark.createDataFrame([row], ddl).write.mode("overwrite")
    .parquet(params)`` — a full write job (driver->executor round trip,
    task launch, Hadoop committer) costing ~0.5-0.8 s per commit for
    ONE row, paid per micro-batch by the streaming MVs and per refresh
    by the persisted indexes.  The pointer is driver-side metadata, so
    build the parquet bytes driver-side (pyarrow, schema mapped from
    the same DDL so readers see bit-identical types) and move them into
    place through the Hadoop FS API: write ``params.tmp-<uuid>``, then
    delete+rename.  Besides the job, this SHRINKS the no-pointer crash
    window — mode("overwrite") deleted the dir and then ran the whole
    job before a new pointer existed; now the gap is a delete+rename
    pair with the bytes already on disk.

    Scalar fields only (int/long/float/double/string/boolean) — every
    params row in the repo is flat; a composite field raises loudly.
    ``row`` is positional against ``schema_ddl``, mirroring
    ``createDataFrame([row], ddl)`` at the call sites.
    """
    import io
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
        _parse_datatype_string,
    )

    pa_types = {
        IntegerType: pa.int32(),
        LongType: pa.int64(),
        FloatType: pa.float32(),
        DoubleType: pa.float64(),
        StringType: pa.string(),
        BooleanType: pa.bool_(),
    }
    struct = _parse_datatype_string(schema_ddl)
    if len(row) != len(struct.fields):
        raise ValueError(
            f"write_params: row has {len(row)} values for "
            f"{len(struct.fields)} schema fields"
        )
    fields, cols = [], {}
    for value, f in zip(row, struct.fields):
        patype = pa_types.get(type(f.dataType))
        if patype is None:
            raise ValueError(
                f"write_params: field {f.name!r} has non-scalar type "
                f"{f.dataType.simpleString()}; params rows are flat scalars"
            )
        fields.append(pa.field(f.name, patype, nullable=True))
        cols[f.name] = [value]
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pydict(cols, schema=pa.schema(fields)), buf)

    jvm = spark._jvm
    final = jvm.org.apache.hadoop.fs.Path(params_path)
    fs = final.getFileSystem(spark._jsc.hadoopConfiguration())
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{params_path}.tmp-{uuid.uuid4().hex[:12]}"
    )
    out = fs.create(
        jvm.org.apache.hadoop.fs.Path(tmp, "part-00000.parquet"), True
    )
    out.write(bytearray(buf.getvalue()))
    out.close()
    fs.delete(final, True)
    if not fs.rename(tmp, final):
        raise IOError(
            f"write_params: rename {tmp} -> {final} failed (pointer flip "
            "did not commit; readers still see no/old params)"
        )


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
