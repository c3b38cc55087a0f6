"""global_running_sum + token_stream_blocks: exact prefix-sum semantics
against a driver-side reference, on multi-partition inputs."""

import random

from pyspark.sql import functions as F

from aws_logs_to_parquet_converter_spark.operators.ranking import global_running_sum
from aws_logs_to_parquet_converter_spark.operators.sampling import token_stream_blocks


def test_global_running_sum_matches_sequential(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50)) for i in range(500)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "id long, v long").repartition(16)
    got = {
        r.id: r.s
        for r in global_running_sum(df, [F.col("id")], "v", sum_col="s").collect()
    }
    acc, want = 0, {}
    for i, v in sorted(rows):
        acc += v
        want[i] = acc
    assert got == want


def test_global_running_sum_empty_input(spark):
    df = spark.createDataFrame([], "id long, v long")
    out = global_running_sum(df, [F.col("id")], "v", sum_col="s")
    assert out.columns == ["id", "v", "s"] and out.count() == 0


def test_token_stream_blocks_layout(spark):
    # docs of 10 tokens each, block 25: boundaries straddle docs 2 and 4
    rows = [(i, 10) for i in range(1, 6)] + [(6, 0)]  # one empty doc at the end
    df = spark.createDataFrame(rows, "doc_id long, tc long").repartition(4)
    out = {
        r.doc_id: (r.n_tokens, r.start_offset, r.first_block, r.last_block)
        for r in token_stream_blocks(df, "doc_id", "tc", 25).collect()
    }
    assert out == {
        1: (10, 0, 0, 0),
        2: (10, 10, 0, 0),
        3: (10, 20, 0, 1),  # straddles the 25 boundary
        4: (10, 30, 1, 1),
        5: (10, 40, 1, 1),  # ends exactly at 50: last token index 49 -> block 1
        6: (0, 50, 2, 2),   # empty doc sits at its start offset's block
    }


def test_token_stream_blocks_rejects_bad_block_size(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, tc long")
    import pytest

    with pytest.raises(ValueError, match="block_size"):
        token_stream_blocks(df, "doc_id", "tc", 0)


def test_token_stream_blocks_no_single_task_window(spark):
    """The plan must not contain an unpartitioned ordered WindowExec —
    the whole point of the two-pass prefix sum."""
    rows = [(i, 5) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, tc long")
    plan = (
        token_stream_blocks(df, "doc_id", "tc", 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_pid" in line  # every window is pid-partitioned


def test_global_running_sum_rejects_fractional_value_col(spark):
    # offsets accumulate in exact ints and the result column is long —
    # a double value_col would silently truncate, so it raises (r11
    # advisor)
    import pytest

    df = spark.createDataFrame([(1, 1.5)], "id long, v double")
    with pytest.raises(ValueError, match="integral"):
        global_running_sum(df, [F.col("id")], "v", sum_col="s")
