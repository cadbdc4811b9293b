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
    StringType,
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
            "(pip install protobuf); use running_user_totals "
            "(applyInPandasWithState) instead — same semantics, no "
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


# ---------------------------------------------------------------------------
# Oracle-backed batch twins of the stateful operators
#
# The true-streaming paths above are pinned by tests/test_streaming.py
# (memory sink + processAllAvailable); these registered twins put the
# SAME per-key state semantics under the driver's DuckDB hard-signal
# gate, so the stateful surface has exact-oracle rows, not test-only
# coverage.
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_data_mining_spark.catalog import load  # noqa: E402
from data_warehouse_data_mining_spark.registry import register  # noqa: E402


@register(
    "stateful_running_totals_final",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stateful_running_totals_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``running_user_totals``: the last UPDATE each key
    emits once the stream drains is exactly this aggregate (the
    stream≡batch identity test_stateful_running_totals pins). Registered
    so the per-key-state contract also has an exact DuckDB oracle row.
    total_value sums through exact DECIMAL before the 2-place round —
    the .xx5-tie canon rule (see tumbling_counts)."""
    ev = load(spark, sf_dir).events
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 2
        ).alias("total_value"),
    )


@register(
    "wallet_microbatch_replay",
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT o_custkey AS ck,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn,
             strftime(o_orderdate, '%Y') AS batch_id,
             CASE WHEN o_orderkey % 2 = 0
                  THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
                  ELSE -CAST(round(o_totalprice * 100, 0) AS BIGINT)
             END AS delta
      FROM orders
    ),
    walk(ck, rn, bal, ncap, nfloor) AS (
      SELECT ck, rn,
             LEAST(GREATEST(delta, 0), 2000000),
             CASE WHEN delta > 2000000 THEN 1 ELSE 0 END,
             CASE WHEN delta < 0 THEN 1 ELSE 0 END
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.ck, s.rn,
             LEAST(GREATEST(w.bal + s.delta, 0), 2000000),
             w.ncap   + CASE WHEN w.bal + s.delta > 2000000 THEN 1 ELSE 0 END,
             w.nfloor + CASE WHEN w.bal + s.delta < 0 THEN 1 ELSE 0 END
      FROM walk w JOIN seq s ON s.ck = w.ck AND s.rn = w.rn + 1
    ),
    batch_end AS (
      SELECT ck, batch_id, max(rn) AS rn
      FROM seq GROUP BY ck, batch_id
    )
    SELECT b.ck AS custkey, b.batch_id,
           CAST(w.bal AS BIGINT) AS end_balance_cents,
           CAST(w.ncap AS BIGINT) AS n_capped,
           CAST(w.nfloor AS BIGINT) AS n_floored,
           CAST(w.rn AS BIGINT) AS n_orders_cum
    FROM batch_end b JOIN walk w ON w.ck = b.ck AND w.rn = b.rn
    """,
)
def wallet_microbatch_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic replay of ``capped_wallet_stream``'s UPDATE-mode
    emission history: treating each order YEAR as one micro-batch (a
    chronological file feed), emit the per-customer wallet state the
    stream would publish at every batch boundary — not just the final
    state ``capped_running_balance`` checks. This is the streaming
    backtest/audit shape: replaying a stateful operator over a bounded
    log and checkpointing state at batch edges.

    Spark shape: ONE shuffle (groupBy custkey), then an Arrow-batched
    per-key walk via the SAME ``wallet_step`` recurrence the stream
    executes, emitting a row whenever the batch id rolls over. The
    oracle walks the identical recurrence as a recursive CTE and reads
    the state at each (customer, year)'s last order."""
    from data_warehouse_data_mining_spark.operators.udfs import (
        _BAL_CAP,
        wallet_step,
    )

    o = load(spark, sf_dir).orders
    src = o.select(
        F.col("o_custkey").alias("custkey"),
        "o_orderdate",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy").alias("batch_id"),
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.round(F.col("o_totalprice") * 100, 0).cast("long"),
        )
        .otherwise(-F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .alias("delta"),
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["o_orderdate", "o_orderkey"])
        ck = int(pdf["custkey"].iloc[0])
        bal = ncap = nfloor = n = 0
        out: list[tuple] = []
        cur = None
        for d, b in zip(pdf["delta"].to_numpy(), pdf["batch_id"].to_numpy()):
            if cur is not None and b != cur:
                out.append((ck, cur, bal, ncap, nfloor, n))
            cur = b
            bal, ncap, nfloor = wallet_step(bal, ncap, nfloor, int(d), _BAL_CAP)
            n += 1
        out.append((ck, cur, bal, ncap, nfloor, n))
        return pd.DataFrame(
            out,
            columns=[
                "custkey",
                "batch_id",
                "end_balance_cents",
                "n_capped",
                "n_floored",
                "n_orders_cum",
            ],
        )

    # Pinned-count repartition: the replay stage is Python-CPU-bound, so
    # AQE's byte-based shuffle coalescing (skips user repartitions, not
    # groupBy shuffles) must not squeeze the walks onto a few workers —
    # same guard as capped_running_balance.
    par = spark.sparkContext.defaultParallelism
    return (
        src.repartition(par, "custkey")
        .groupBy("custkey")
        .applyInPandas(
            replay,
            "custkey long, batch_id string, end_balance_cents long, "
            "n_capped long, n_floored long, n_orders_cum long",
        )
    )


@register(
    "custom_sessionizer_replay",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts) AS gap_us
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS session_n
      FROM seq
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_event
    FROM numbered
    GROUP BY user_id, session_n
    """,
)
def custom_sessionizer_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of ``custom_sessionizer`` (the EventTimeTimeout
    applyInPandasWithState operator below): every session the stream
    would emit once the watermark drains past the log's end — closed
    sessions AND the final open one per user — produced by feeding each
    user's full history through the SAME ``session_walk`` recurrence
    the streaming state machine executes per micro-batch. Strict-gap
    (30 min) semantics; oracle is the standard lag+cumsum SQL
    sessionization over exact integer microseconds.

    Spark shape: one shuffle on user_id into an Arrow-batched
    applyInPandas walk — per-key linear, state O(1), the same cost
    profile the streaming operator has per batch. The pinned-count
    repartition keeps AQE from byte-coalescing the Python-CPU-bound
    walk stage onto a few threads (the wallet-replay lesson)."""
    e = load(spark, sf_dir).events.select("user_id", "ts")
    gap_ns = 30 * 60 * 1_000_000_000

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        uid = int(pdf["user_id"].iloc[0])
        ts_ns = pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        closed, open_state = session_walk(ts_ns, gap_ns)
        return pd.DataFrame(
            [
                (uid, _fmt_ns(s), int(n), _fmt_ns(last))
                for s, last, n in [*closed, open_state]
            ],
            columns=["user_id", "session_start", "n_events", "last_event"],
        )

    par = spark.sparkContext.defaultParallelism
    return (
        e.repartition(par, "user_id")
        .groupBy("user_id")
        .applyInPandas(
            replay,
            "user_id long, session_start string, n_events long, "
            "last_event string",
        )
    )


def _fmt_ns(ns: int) -> str:
    return pd.Timestamp(ns).strftime("%Y-%m-%d %H:%M:%S")


def session_walk(
    ts_ns, gap_ns: int, state: tuple[int, int, int] | None = None
) -> tuple[list[tuple[int, int, int]], tuple[int, int, int]]:
    """The strict-gap session recurrence shared VERBATIM by the
    streaming ``custom_sessionizer`` (per micro-batch, state carried by
    the engine) and its batch replay twin ``custom_sessionizer_replay``
    (whole history in one pass, state carried locally) — the same
    function body is what makes the stream≡batch identity a code-level
    guarantee rather than two parallel implementations.

    Takes epoch-ns event times (sorted ascending) and the open-session
    state ``(start_ns, last_ns, n)`` or ``None``; returns
    ``(closed_sessions, open_state)`` where an event at exactly
    ``last + gap`` starts a NEW session (matching native
    ``session_window`` strict-gap semantics).

    Cross-batch disorder (streaming only — a watermark longer than the
    gap admits events BEFORE the carried state's interval; the sorted
    batch-replay path never reaches these branches):

    * an event within ``gap`` of the open interval MERGES it — start
      extends backward, last never regresses — exactly what native
      ``session_window``'s window-merge does;
    * an event ≥ ``gap`` before the open start forms its own EARLIER
      session, finalized at the end of this walk (single-interval
      state cannot hold it open for even-later arrivals; native
      multi-window state could additionally merge it with the open
      session via a bridging event — the one documented divergence,
      reachable only when disorder exceeds the gap)."""
    closed: list[tuple[int, int, int]] = []
    early: tuple[int, int, int] | None = None
    if state is None:
        start_ns = last_ns = int(ts_ns[0])
        n = 1  # first row opens the fresh session
        ts_ns = ts_ns[1:]
    else:
        start_ns, last_ns, n = state
    for t in ts_ns:
        t = int(t)
        if t >= last_ns:
            # the ordered fast path — the ONLY path sorted input takes
            if t - last_ns >= gap_ns:
                closed.append((start_ns, last_ns, n))
                start_ns = t
                n = 0
            last_ns = t
            n += 1
        elif t > start_ns - gap_ns:
            # late event inside/within-gap-of the open interval: merge
            start_ns = min(start_ns, t)
            n += 1
        elif early is not None and t - early[1] < gap_ns:
            # min() on the start guards direct callers that violate the
            # sorted-ascending precondition — under sorted input it is
            # a no-op (t >= early[0] always holds there)
            early = (min(early[0], t), max(early[1], t), early[2] + 1)
        else:
            if early is not None:
                closed.append(early)
            early = (t, t, 1)
    if early is not None:
        closed.append(early)
    return closed, (start_ns, last_ns, n)


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", StringType()),
        StructField("n_events", LongType()),
        StructField("last_event", StringType()),
    ]
)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ns", LongType()),
        StructField("last_ns", LongType()),
        StructField("n", LongType()),
    ]
)


def custom_sessionizer(
    events_stream: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Per-user inactivity sessionizer as an EXPLICIT state machine on
    ``applyInPandasWithState`` with **EventTimeTimeout** — the API
    surface the NoTimeout operators above don't exercise: the open
    session's finalization is driven by the WATERMARK (the engine calls
    the function with ``state.hasTimedOut`` once the watermark passes
    ``last_event + gap``), not by more data for that key arriving. This
    is how a custom stateful operator bounds both its state lifetime
    and its output latency; sessions that close WITHIN a batch (the
    next event is ≥ gap away) emit immediately.

    Matches the native ``session_window`` semantics (strict gap: an
    event at exactly last+gap starts a new session) and output columns,
    so the two implementations are directly comparable — pinned in
    tests/test_streaming.py."""
    gap_ns = gap_minutes * 60 * 1_000_000_000
    fmt = _fmt_ns

    def sessionize(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ns, last_ns, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(int(user_id), fmt(start_ns), int(n), fmt(last_ns))],
                columns=["user_id", "session_start", "n_events", "last_event"],
            )
            return
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_ns = pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        closed, open_state = session_walk(
            ts_ns, gap_ns, state.get if state.exists else None
        )
        state.update(open_state)
        # finalize via watermark: fire once event time passes last + gap
        state.setTimeoutTimestamp((open_state[1] + gap_ns) // 1_000_000)
        if closed:
            yield pd.DataFrame(
                [
                    (int(user_id), fmt(s), int(n), fmt(last))
                    for s, last, n in closed
                ],
                columns=["user_id", "session_start", "n_events", "last_event"],
            )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
