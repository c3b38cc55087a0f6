"""Custom stateful streaming operator: per-key running profile via
``applyInPandasWithState`` (SURVEY §2.11 — the "custom stateful
operators" seam; genuinely non-SQL-expressible, so it is covered by
differential tests rather than the DuckDB oracle).

Shape: arbitrary per-key state evolved across micro-batches — the
pattern behind entity profiles, anomaly baselines, and dedup-seen-sets
over unbounded streams.  State is a fixed-width tuple (Arrow-encoded);
memory is O(distinct keys), not O(events), and GroupStateTimeout can
expire idle keys for true unbounded runs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROFILE_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n_events", LongType(), True),
        StructField("total_bytes", LongType(), True),
        StructField("max_value", DoubleType(), True),
    ]
)

PROFILE_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), True),
        StructField("total_bytes", LongType(), True),
        StructField("max_value", DoubleType(), True),
    ]
)


def _update_profile(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, mx = state.get if state.exists else (0, 0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += int(pdf["bytes"].fillna(0).sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"key": [key[0]], "n_events": [n], "total_bytes": [total], "max_value": [mx]}
    )


def running_profiles(events: DataFrame, key_col: str = "key") -> DataFrame:
    """Continuously-updated per-key profile (count / byte total / max).

    Input stream needs columns (key, bytes, value); each micro-batch
    emits the refreshed profile for keys that saw events.
    """
    return events.groupBy(key_col).applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        stateStructType=PROFILE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
