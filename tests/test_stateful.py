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
