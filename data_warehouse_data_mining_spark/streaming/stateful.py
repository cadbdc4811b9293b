"""Custom stateful streaming operators via applyInPandasWithState.

Where the built-in windowed aggregations (streaming/windows.py) don't
fit, arbitrary per-key state machines go through
``applyInPandasWithState``: Arrow-batched, one state object per key,
watermark-driven timeouts. The example operator keeps running per-user
counters — the shape of sessionizers, rate limiters, and online feature
accumulators at 100 TB (state is partitioned by key across executors
and checkpointed by the engine).
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
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _running_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user running (event count, value total), updated every
    micro-batch — custom state the built-in aggregations can't express
    incrementally with arbitrary logic attached."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
