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


from pyspark.sql.streaming import StatefulProcessor


class RunningTotalsProcessor(StatefulProcessor):
    """transformWithStateInPandas processor: same per-user running
    totals as ``running_user_totals``, on the Spark 4 arbitrary-state
    API. vs applyInPandasWithState: named state variables (value/list/
    map) instead of one opaque tuple, timers decoupled from output, an
    initial-state hook, and schema evolution of state — the API new
    stateful operators should target; the RocksDB state store provider
    it requires is also the one that scales (incremental checkpoints,
    state larger than memory).
    """

    def init(self, handle) -> None:
        self._state = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        prev = self._state.get()
        n, total = prev if prev is not None else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events_stream: DataFrame) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas (Spark 4
    stateful v2). Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` package (the stateful-v2 Python↔JVM state protocol is
    protobuf-framed; without it the TWS driver worker crashes at stream
    start with an opaque 'exited unexpectedly')."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as ex:  # pragma: no cover - env-dependent
        raise ModuleNotFoundError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pip install protobuf); falling back to "
            "running_user_totals (applyInPandasWithState) which has no "
            "extra dependency"
        ) from ex
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


WALLET_OUTPUT_SCHEMA = StructType(
    [
        StructField("custkey", LongType()),
        StructField("end_balance_cents", LongType()),
        StructField("n_capped", LongType()),
        StructField("n_floored", LongType()),
        StructField("n_orders", LongType()),
    ]
)
WALLET_STATE_SCHEMA = StructType(
    [
        StructField("bal", LongType()),
        StructField("ncap", LongType()),
        StructField("nfloor", LongType()),
        StructField("n", LongType()),
    ]
)


def capped_wallet_stream(orders_stream: DataFrame, cap: int) -> DataFrame:
    """Streaming twin of ``operators/udfs.py::capped_running_balance``:
    the saturating per-customer wallet (balance clamped to [0, cap],
    cap/floor hits counted) as an ``applyInPandasWithState`` state
    machine — the batch operator's "transformWithState batch-ified"
    docstring claim, made literal. Input must carry (custkey,
    o_orderdate, o_orderkey, delta_cents).

    Ordering contract: a saturating recurrence is order-sensitive, so
    batches must arrive in event-time order (chronological file feed or
    a watermark-sorted upstream); rows WITHIN a micro-batch are sorted
    here. This is the same contract every streaming sequence processor
    (sessionizer, CDC applier) already carries. State is one 4-long
    tuple per customer — engine-checkpointed, RocksDB-ready."""

    def walk(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from data_warehouse_data_mining_spark.operators.udfs import (
            wallet_step,
        )

        (ck,) = key
        bal, ncap, nfloor, n = state.get if state.exists else (0, 0, 0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["o_orderdate", "o_orderkey"])
        for d in pdf["delta_cents"].to_numpy():
            bal, ncap, nfloor = wallet_step(bal, ncap, nfloor, int(d), cap)
            n += 1
        state.update((bal, ncap, nfloor, n))
        yield pd.DataFrame(
            {
                "custkey": [int(ck)],
                "end_balance_cents": [bal],
                "n_capped": [ncap],
                "n_floored": [nfloor],
                "n_orders": [n],
            }
        )

    return orders_stream.groupBy("custkey").applyInPandasWithState(
        walk,
        outputStructType=WALLET_OUTPUT_SCHEMA,
        stateStructType=WALLET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
