"""Custom stateful streaming operator: state must survive across
micro-batches and final profiles must equal the batch aggregation."""

import json

from pyspark.sql import functions as F


def _write_batch(src, name, rows):
    src.mkdir(parents=True, exist_ok=True)
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_running_profiles_across_batches(spark, tmp_path):
    from aws_logs_to_parquet_converter_spark.streaming.stateful import running_profiles

    src = tmp_path / "stream_src"
    rows1 = [{"key": f"u{i % 3}", "bytes": 10 * i, "value": float(i)} for i in range(30)]
    rows2 = [{"key": f"u{i % 3}", "bytes": 5 * i, "value": float(50 - i)} for i in range(30)]
    _write_batch(src, "b1.json", rows1)
    _write_batch(src, "b2.json", rows2)

    schema = "key string, bytes long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force >=2 micro-batches => state must carry over
        .json(str(src))
    )
    out = str(tmp_path / "profiles")
    q = (
        running_profiles(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("profiles")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last emitted profile per key == batch ground truth over all files
    emitted = spark.sql("SELECT * FROM profiles").collect()
    final = {}
    for r in emitted:  # memory sink appends per batch; later rows override
        final[r.key] = (r.n_events, r.total_bytes, r.max_value)

    batch = (
        spark.read.schema(schema).json(str(src))
        .groupBy("key")
        .agg(
            F.count("*").alias("n"),
            F.sum("bytes").alias("tb"),
            F.max("value").alias("mx"),
        )
        .collect()
    )
    assert len(batch) == 3
    for r in batch:
        n, tb, mx = final[r.key]
        assert (n, tb, mx) == (r.n, r.tb, r.mx), f"{r.key}: {final[r.key]} != batch"


def test_stream_profile_maxby_extraction_multi_microbatch(spark, tmp_path):
    """The q_stream_profile entry's max_by(struct(...), n_events) final-state
    extraction must equal the batch aggregate even when the file source
    splits the replay into MANY micro-batches (maxFilesPerTrigger=1 over a
    multi-part events copy) — each intermediate update-mode emission then
    lands in the sink, and only monotonicity of n_events makes the
    extraction pick the last state (round-9 verdict item 1)."""
    from aws_logs_to_parquet_converter_spark.streaming.stateful import running_profiles

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    parts = str(tmp_path / "events_parts")
    events.repartition(5).write.parquet(parts)

    schema = spark.read.parquet(parts).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # >=5 micro-batches
        .parquet(parts)
    )
    # identical projection to plans/log_domain.q_stream_profile
    src = stream.select(
        F.col("user_id").cast("string").alias("key"),
        F.round(F.col("value") * 100).cast("long").alias("bytes"),
        F.col("value"),
    )
    q = (
        running_profiles(src, key_col="key")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("profiles_mb")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    sink = spark.table("profiles_mb")
    # multiple batches touched every key => sink holds >1 row per key
    assert sink.count() > sink.select("key").distinct().count()

    got = {
        r.key: (r.n_events, r.total_bytes, r.max_value)
        for r in sink.groupBy("key")
        .agg(F.max_by(F.struct("n_events", "total_bytes", "max_value"), F.col("n_events")).alias("f"))
        .select("key", "f.n_events", "f.total_bytes", F.round("f.max_value", 6).alias("max_value"))
        .collect()
    }
    want = {
        r.key: (r.n, r.tb, r.mx)
        for r in events.groupBy(F.col("user_id").cast("string").alias("key"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("tb"),
            F.round(F.max("value"), 6).alias("mx"),
        )
        .collect()
    }
    assert got == want
