"""Structured Streaming: the batch-mirrored builders run as real
streaming queries (parquet-directory source → watermark → memory sink)
and agree with their batch twins."""

from __future__ import annotations

import os

import pytest

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.streaming.windows import (
    read_event_stream,
    streaming_tumbling_counts,
    tumbling_counts,
)

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """File streaming sources need a directory; stage one with a symlink
    to the read-only events parquet."""
    d = tmp_path_factory.mktemp("events_stream")
    os.symlink(f"{SF_SMALL}/events.parquet", d / "events.parquet")
    return str(d)


def test_streaming_tumbling_matches_batch(spark, events_dir):
    agg = streaming_tumbling_counts(spark, events_dir, watermark="365 days")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_tumbling")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM stream_tumbling").collect()
    }
    batch = {tuple(r) for r in tumbling_counts(load(spark, SF_SMALL).events).collect()}
    assert streamed == batch


def test_streaming_dedup_with_watermark(spark, events_dir):
    """Streaming exact-dedup: dropDuplicates over a watermarked stream
    (the streaming face of dedup_exact)."""
    ev = load(spark, SF_SMALL).events
    stream = read_event_stream(spark, events_dir, watermark="1 hour").dropDuplicates(
        ["event_id"]
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_stream = spark.sql("SELECT count(*) AS n FROM stream_dedup").collect()[0][0]
    assert n_stream == ev.select("event_id").distinct().count()


def test_streaming_dedup_within_watermark(spark, events_dir):
    """Bounded-state streaming dedup: dropDuplicatesWithinWatermark
    evicts per-key state once the key's event time falls behind the
    watermark — the variant that holds at 100 TB, where plain
    dropDuplicates accumulates one state row per key forever. The
    testdata has no cross-watermark duplicate event_ids, so the result
    matches exact distinct here; the point under test is the operator
    running with eviction enabled."""
    ev = load(spark, SF_SMALL).events
    stream = read_event_stream(
        spark, events_dir, watermark="1 hour"
    ).dropDuplicatesWithinWatermark(["event_id"])
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup_wm")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_stream = spark.sql("SELECT count(*) AS n FROM stream_dedup_wm").collect()[0][0]
    assert n_stream == ev.select("event_id").distinct().count()


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    """Stream-stream interval join (click→purchase attribution) must
    produce exactly the batch join's pairs once all input is processed."""
    from data_warehouse_data_mining_spark.streaming.joins import (
        attributed_pairs,
        streaming_attributed_pairs,
    )
    from pyspark.sql import functions as F

    joined = streaming_attributed_pairs(spark, events_dir, watermark="365 days")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_attr")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT click_id, purchase_id FROM stream_attr").collect()
    }
    ev = load(spark, SF_SMALL).events
    batch = {
        (r.click_id, r.purchase_id)
        for r in attributed_pairs(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_stateful_running_totals(spark, events_dir):
    """applyInPandasWithState custom stateful operator: per-user running
    totals match the batch aggregate after one pass of the stream."""
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.streaming.stateful import running_user_totals
    from data_warehouse_data_mining_spark.streaming.windows import read_event_stream

    stream = read_event_stream(spark, events_dir, watermark="365 days")
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stream_state")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM stream_state").collect()
    }
    expected = {
        r.user_id: (r.n, r.total)
        for r in load(spark, SF_SMALL)
        .events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .collect()
    }
    assert got == expected


def test_foreach_batch_sink(spark, events_dir, tmp_path):
    """foreachBatch: the exactly-once custom-sink pattern — each
    micro-batch written transactionally (here: parquet per epoch)."""
    out = str(tmp_path / "sink")
    from data_warehouse_data_mining_spark.streaming.windows import (
        read_event_stream,
        tumbling_counts,
    )

    agg = tumbling_counts(read_event_stream(spark, events_dir, watermark="365 days"))

    def write_epoch(batch_df, epoch_id):
        batch_df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    q = agg.writeStream.outputMode("complete").foreachBatch(write_epoch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    written = spark.read.parquet(f"{out}/epoch=0")
    batch = tumbling_counts(load(spark, SF_SMALL).events)
    assert written.count() == batch.count()


def test_streaming_session_windows_finalize(spark, tmp_path):
    """Session windows in a REAL watermarked stream: two micro-batches
    (maxFilesPerTrigger=1); the second batch advances the watermark past
    the first batch's sessions, which are then finalized and emitted in
    append mode — and must equal the batch sessionization of batch-1."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.streaming.windows import session_windows

    ev = load(spark, SF_SMALL).events
    t_split = "2024-01-05 00:00:00"
    t_resume = "2024-01-20 00:00:00"
    batch1 = ev.filter(F.col("ts") < F.lit(t_split).cast("timestamp"))
    batch2 = ev.filter(F.col("ts") >= F.lit(t_resume).cast("timestamp"))

    staged = tmp_path / "staged"
    staged.mkdir()
    for i, b in enumerate([batch1, batch2]):
        tmp_out = str(tmp_path / f"w{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        part = glob.glob(f"{tmp_out}/part-*.parquet")[0]
        shutil.copy(part, staged / f"{i:02d}.parquet")

    schema = spark.read.parquet(str(staged)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(staged))
        .withWatermark("ts", "1 hour")
    )
    q = (
        session_windows(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = {
        (r.user_id, r.session_start, r.n_events, r.last_event)
        for r in spark.sql("SELECT * FROM stream_sessions").collect()
    }
    batch1_sessions = {
        (r.user_id, r.session_start, r.n_events, r.last_event)
        for r in session_windows(batch1).collect()
    }
    batch2_sessions = {
        (r.user_id, r.session_start, r.n_events, r.last_event)
        for r in session_windows(batch2).collect()
    }
    # batch-1 sessions MUST all be finalized (the batch-2 watermark jump
    # passed them); emitted sessions can only come from real per-batch
    # sessionizations; the only sessions allowed to be missing are
    # batch-2 sessions still open near the stream's end (inside the
    # watermark delay).
    assert batch1_sessions <= emitted
    assert emitted <= batch1_sessions | batch2_sessions
    still_open = (batch1_sessions | batch2_sessions) - emitted
    max_ts = max(s[3] for s in batch2_sessions)
    assert all(s[3] >= "2024-01-29" for s in still_open), still_open
    assert len(emitted) > 0 and max_ts >= "2024-01-29"


def test_stream_static_enrichment_join(spark, events_dir):
    """Stream-static join: a streaming fact enriched by a broadcast
    static dimension (per-microbatch lookup, no stream-side state)."""
    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [("click", "engagement"), ("purchase", "revenue"), ("view", "engagement"),
         ("signup", "acquisition"), ("error", "ops")],
        "event_type string, category string",
    )
    stream = read_event_stream(spark, events_dir, watermark="365 days")
    enriched = (
        stream.join(F.broadcast(dim), "event_type")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        enriched.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_enriched")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r.category, r.n) for r in spark.sql("SELECT * FROM stream_enriched").collect()
    }
    ev = load(spark, SF_SMALL).events
    batch = {
        (r.category, r.n)
        for r in ev.join(dim, "event_type")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert streamed == batch and len(batch) == 4


def test_available_now_incremental_with_checkpoint(spark, tmp_path):
    """The production incremental-ingest pattern: Trigger.AvailableNow
    + a checkpoint directory = run-as-a-job streaming. First run
    processes everything available and stops; files landing afterwards
    are picked up by the NEXT run from the same checkpoint — each file
    exactly once, no reprocessing, no external bookkeeping. At 100 TB
    this replaces hand-rolled "which files are new?" manifest diffing."""
    from pyspark.sql import functions as F

    ev = load(spark, SF_SMALL).events
    src = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    first, second = ev.filter(F.col("event_id") % 2 == 0), ev.filter(
        F.col("event_id") % 2 == 1
    )
    first.write.parquet(src)

    def run_once():
        stream = read_event_stream(spark, src, watermark="1 hour")
        q = (
            stream.writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", out)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first == first.count()

    second.write.mode("append").parquet(src)
    run_once()
    sunk = spark.read.parquet(out)
    assert sunk.count() == ev.count()  # second run added ONLY the new files
    assert sunk.select("event_id").distinct().count() == ev.count()


def test_stateful_running_totals_tws(spark, events_dir):
    """transformWithStateInPandas (stateful v2, RocksDB state store):
    per-user running totals match the batch aggregate — the modern
    twin of test_stateful_running_totals."""
    from pyspark.sql import functions as F

    pytest.importorskip(
        "google.protobuf",
        reason="stateful v2's state protocol is protobuf-framed; the "
        "operator gates on it with an actionable error (see "
        "running_user_totals_tws)",
    )
    from data_warehouse_data_mining_spark.streaming.stateful import (
        running_user_totals_tws,
    )
    from data_warehouse_data_mining_spark.streaming.windows import read_event_stream

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, events_dir, watermark="365 days")
        q = (
            running_user_totals_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("stream_state_tws")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM stream_state_tws").collect()
    }
    expected = {
        r.user_id: (r.n, r.total)
        for r in load(spark, SF_SMALL)
        .events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .collect()
    }
    assert got == expected


def test_stateful_tws_gates_cleanly_without_protobuf(spark, events_dir):
    """When protobuf is absent the stateful-v2 operator must fail at
    CALL time with an actionable message, not crash the stream at
    runtime with an opaque worker error."""
    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf present; gate inactive")
    except ImportError:
        pass
    from data_warehouse_data_mining_spark.streaming.stateful import (
        running_user_totals_tws,
    )
    from data_warehouse_data_mining_spark.streaming.windows import read_event_stream

    stream = read_event_stream(spark, events_dir, watermark="365 days")
    with pytest.raises(ModuleNotFoundError, match="protobuf"):
        running_user_totals_tws(stream)


def test_streaming_ohlc_matches_batch(spark, events_dir):
    """OHLC bars maintained incrementally by the stream equal the batch
    rollup — min_by/max_by with struct tie-keys are streaming-safe
    aggregates."""
    from data_warehouse_data_mining_spark.streaming.windows import (
        ohlc_windowed,
        streaming_ohlc,
    )

    agg = streaming_ohlc(spark, events_dir, watermark="365 days")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_ohlc")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {tuple(r) for r in spark.sql("SELECT * FROM stream_ohlc").collect()}
    batch = {
        tuple(r) for r in ohlc_windowed(load(spark, SF_SMALL).events).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_cdc_scd2_merge_matches_rebuild(spark, tmp_path):
    """Streaming CDC → SCD2 maintenance: a file stream of change
    batches drives scd2_merge_batch from foreachBatch (dimension state
    parquet-persisted between micro-batches, the way a real pipeline
    keeps it in a table), and the final dimension must be
    INDISTINGUISHABLE from a full batch rebuild over all changes —
    the incremental-equals-rebuild contract, now proven under
    micro-batch execution order."""
    import time

    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.operators.scd import (
        scd2_merge_batch,
        scd2_versions,
    )

    orders = load(spark, SF_SMALL).orders.select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
    )
    c1 = F.lit("1998-01-01").cast("timestamp")
    c2 = F.lit("2000-01-01").cast("timestamp")

    dim_dir = str(tmp_path / "dim")
    src_dir = tmp_path / "changes"
    src_dir.mkdir()

    # seed dimension + two strictly later change batches (files appear
    # in event-time order, maxFilesPerTrigger=1 => one batch each)
    scd2_versions(orders.filter(F.col("o_orderdate") < c1)).write.mode(
        "overwrite"
    ).parquet(dim_dir)
    b1 = orders.filter((F.col("o_orderdate") >= c1) & (F.col("o_orderdate") < c2))
    b2 = orders.filter(F.col("o_orderdate") >= c2)
    b1.coalesce(1).write.parquet(str(src_dir / "b1"))
    time.sleep(1.1)  # file-source ordering is by modification time
    b2.coalesce(1).write.parquet(str(src_dir / "b2"))

    schema = orders.schema

    def merge(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        dim = batch_df.sparkSession.read.parquet(dim_dir)
        merged = scd2_merge_batch(dim, batch_df).localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(dim_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/*")
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    final = spark.read.parquet(dim_dir)
    rebuild = scd2_versions(orders)
    cols = ["o_custkey", "version_n", "attr_value", "eff_from", "eff_to"]
    got = sorted(map(tuple, final.select(*cols).collect()))
    want = sorted(map(tuple, rebuild.select(*cols).collect()))
    assert got == want


def test_stateful_wallet_stream_equals_batch(spark, tmp_path):
    """The saturating-wallet recurrence produces IDENTICAL final state
    whether run as the batch applyInPandas operator or as an
    applyInPandasWithState stream fed the same orders in three
    chronological micro-batches — state carries across batches, so this
    pins both the stream≡batch contract and the checkpointable-state
    shape of the operator."""
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.operators.udfs import (
        _BAL_CAP,
        capped_running_balance,
    )
    from data_warehouse_data_mining_spark.streaming.stateful import (
        capped_wallet_stream,
    )

    src = (
        load(spark, SF_SMALL)
        .orders.select(
            F.col("o_custkey").alias("custkey"),
            "o_orderdate",
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 2 == 0,
                F.round(F.col("o_totalprice") * 100, 0).cast("long"),
            )
            .otherwise(-F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .alias("delta_cents"),
        )
        .orderBy("o_orderdate", "o_orderkey")
    )
    rows = src.collect()
    feed = str(tmp_path / "wallet_feed")
    third = (len(rows) + 2) // 3
    for i in range(3):  # three chronological files => three micro-batches
        chunk = rows[i * third : (i + 1) * third]
        if chunk:
            spark.createDataFrame(chunk, src.schema).coalesce(1).write.parquet(
                f"{feed}/f{i}"
            )
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed}/f*")
    )
    q = (
        capped_wallet_stream(stream, _BAL_CAP)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("wallet_state")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode emits one row per (key, batch) — keep the final update
    got = {
        r.custkey: (r.end_balance_cents, r.n_capped, r.n_floored, r.n_orders)
        for r in spark.sql(
            "SELECT * FROM wallet_state"
        ).orderBy("n_orders").collect()  # later updates overwrite earlier
    }
    expected = {
        r.custkey: (r.end_balance_cents, r.n_capped, r.n_floored, r.n_orders)
        for r in capped_running_balance(spark, SF_SMALL).collect()
    }
    assert got == expected


def test_streaming_daily_active_users_matches_batch(spark, events_dir):
    """Streaming DAU — the streaming face of dau_mau_stickiness's daily
    distinct count: watermarked dropDuplicates on (day, user) collapses
    each user to one row per day, then a plain per-day count aggregates
    the deduped stream. Two stateful operators chained (dedup state +
    agg state), both watermark-bounded; the batch twin is the exact
    distinct count."""
    from pyspark.sql import functions as F

    ev = load(spark, SF_SMALL).events
    stream = (
        read_event_stream(spark, events_dir, watermark="365 days")
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .dropDuplicates(["day", "user_id"])
        .groupBy("day")
        .count()
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_dau")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        r["day"]: r["count"]
        for r in spark.sql("SELECT * FROM stream_dau").collect()
    }
    batch = {
        r["day"]: r["dau"]
        for r in ev.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
        )
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("dau"))
        .collect()
    }
    assert streamed == batch


def test_streaming_only_session_pins_utc(spark, events_dir):
    """A session that touches ONLY the streaming path must still get
    UTC-correct windows: read_event_stream pins session.timeZone=UTC +
    nanosAsLong itself (mirrors Catalog.table's guard) rather than
    depending on a batch-catalog side effect having run first. Simulate
    a fresh externally built session with newSession() (isolated
    SQLConf, shared JVM), deliberately mis-pinned to a non-UTC zone."""
    iso = spark.newSession()
    iso.conf.set("spark.sql.session.timeZone", "America/New_York")
    iso.conf.unset("spark.sql.legacy.parquet.nanosAsLong")

    agg = streaming_tumbling_counts(iso, events_dir, watermark="365 days")
    # the guard must have re-pinned the isolated session
    assert iso.conf.get("spark.sql.session.timeZone") == "UTC"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_utc_guard")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        tuple(r) for r in iso.sql("SELECT * FROM stream_utc_guard").collect()
    }
    batch = {tuple(r) for r in tumbling_counts(load(spark, SF_SMALL).events).collect()}
    assert streamed == batch


def test_stream_outer_interval_join_emits_unmatched_after_watermark(
    spark, events_dir
):
    """LEFT OUTER stream-stream interval join: inner pairs must equal
    the batch join's, and the NULL rows for unconverted clicks must be
    emitted once the watermark can prove no match is coming — exactly
    the batch outer join's NULL rows for every click old enough that
    ``click_ts + horizon < final watermark``. Clicks younger than that
    may legally still sit in state when the stream drains, so the
    comparison restricts to the provably-final region."""
    import datetime

    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.streaming.joins import (
        attributed_pairs_outer,
    )
    from data_warehouse_data_mining_spark.streaming.windows import (
        read_event_stream,
    )

    wm = "1 hour"
    clicks = read_event_stream(spark, events_dir, watermark=wm).filter(
        F.col("event_type") == "click"
    )
    purchases = read_event_stream(spark, events_dir, watermark=wm).filter(
        F.col("event_type") == "purchase"
    )
    joined = attributed_pairs_outer(clicks, purchases)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_outer_attr")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r.click_id, r.purchase_id)
        for r in spark.sql(
            "SELECT click_id, purchase_id FROM stream_outer_attr"
        ).collect()
    }

    ev = load(spark, SF_SMALL).events
    batch = attributed_pairs_outer(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    ).collect()
    # Final watermark: the event_type filters push BELOW the watermark
    # operator, so each side's watermark tracks only its own event type
    # and the query's global watermark is min(last click, last purchase)
    # minus the delay — NOT max(all events). The margin covers the
    # engine's internal ms truncation of the boundary.
    max_click = ev.filter(F.col("event_type") == "click").agg(F.max("ts")).collect()[0][0]
    max_purch = ev.filter(F.col("event_type") == "purchase").agg(F.max("ts")).collect()[0][0]
    final_wm = min(max_click, max_purch) - datetime.timedelta(hours=1, minutes=1)
    horizon = datetime.timedelta(hours=1)

    inner_batch = {
        (r.click_id, r.purchase_id) for r in batch if r.purchase_id is not None
    }
    finalized_nulls = {
        (r.click_id, None)
        for r in batch
        if r.purchase_id is None and r.click_ts + horizon < final_wm
    }
    streamed_inner = {p for p in streamed if p[1] is not None}
    streamed_nulls = {p for p in streamed if p[1] is None}

    assert streamed_inner == inner_batch and len(inner_batch) > 0
    # every provably-final unconverted click was emitted...
    assert finalized_nulls <= streamed_nulls and len(finalized_nulls) > 0
    # ...and nothing was emitted that the batch outer join doesn't have
    assert streamed_nulls <= {
        (r.click_id, None) for r in batch if r.purchase_id is None
    }


def test_custom_sessionizer_replay_equals_native_session_window(spark):
    """The registered batch twin (custom_sessionizer_replay — the
    shared session_walk recurrence over full history, open sessions
    included) must equal the native session_window batch
    sessionization row-for-row: in batch mode session_window finalizes
    everything, so the two outputs are the SAME set."""
    from data_warehouse_data_mining_spark.streaming.stateful import (
        custom_sessionizer_replay,
    )
    from data_warehouse_data_mining_spark.streaming.windows import session_windows

    replay = {
        (r.user_id, r.session_start, r.n_events, r.last_event)
        for r in custom_sessionizer_replay(spark, SF_SMALL).collect()
    }
    native = {
        (r.user_id, r.session_start, r.n_events, r.last_event)
        for r in session_windows(load(spark, SF_SMALL).events).collect()
    }
    assert replay == native and len(native) > 0


def test_custom_sessionizer_event_time_timeout(spark, tmp_path):
    """The applyInPandasWithState sessionizer with EventTimeTimeout must
    reproduce the native session_window's finalized sessions: two
    micro-batches separated by a 15-day silence — the second batch's
    watermark jump fires the timeout for every batch-1 open session, so
    all of batch-1's sessions (mid-batch closures AND the
    timeout-finalized tails) must be emitted and equal the batch
    sessionization. Batch-2 sessions may legally still sit in state."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.streaming.stateful import (
        custom_sessionizer,
    )
    from data_warehouse_data_mining_spark.streaming.windows import session_windows

    ev = load(spark, SF_SMALL).events
    t_split = "2024-01-05 00:00:00"
    t_resume = "2024-01-20 00:00:00"
    batch1 = ev.filter(F.col("ts") < F.lit(t_split).cast("timestamp"))
    batch2 = ev.filter(F.col("ts") >= F.lit(t_resume).cast("timestamp"))

    staged = tmp_path / "staged"
    staged.mkdir()
    for i, b in enumerate([batch1, batch2]):
        tmp_out = str(tmp_path / f"w{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        part = glob.glob(f"{tmp_out}/part-*.parquet")[0]
        shutil.copy(part, staged / f"{i:02d}.parquet")

    schema = spark.read.parquet(str(staged)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(staged))
        .withWatermark("ts", "1 hour")
    )
    q = (
        custom_sessionizer(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("custom_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = {
        (r.user_id, r.session_start, r.n_events, r.last_event)
        for r in spark.sql("SELECT * FROM custom_sessions").collect()
    }
    batch1_sessions = {
        (r.user_id, r.session_start, r.n_events, r.last_event)
        for r in session_windows(batch1).collect()
    }
    batch2_sessions = {
        (r.user_id, r.session_start, r.n_events, r.last_event)
        for r in session_windows(batch2).collect()
    }
    assert batch1_sessions <= emitted and len(batch1_sessions) > 0
    assert emitted <= batch1_sessions | batch2_sessions


def test_streaming_quality_gate_matches_batch(spark, tmp_path):
    """The shuffle-free Gopher rule bits (gopher_rule_flags_expr) are a
    pure projection, so the quality gate runs as a STATELESS streaming
    filter — no watermark, no state store, append mode — and a crawl
    stream drops failing documents before they land. Stream output must
    equal the batch gate row-for-row."""
    import os as _os

    from data_warehouse_data_mining_spark.operators.curation import (
        gopher_rule_flags_expr,
    )

    d = tmp_path / "docs_stream"
    d.mkdir()
    _os.symlink(f"{SF_SMALL}/documents.parquet", d / "documents.parquet")

    batch_docs = load(spark, SF_SMALL).documents
    stream_docs = spark.readStream.schema(batch_docs.schema).parquet(str(d))

    gated = gopher_rule_flags_expr(stream_docs, "doc_id", "text", ["source"]).filter(
        "pass_all"
    )
    q = (
        gated.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_quality_gate")
        .start()
    )
    try:
        q.processAllAvailable()
        # stateless: the plan must carry no stateful operator
        assert "stateOperators" not in str(q.lastProgress) or not (
            q.lastProgress and q.lastProgress.get("stateOperators")
        )
    finally:
        q.stop()
    streamed = {
        tuple(r)
        for r in spark.sql("SELECT * FROM stream_quality_gate").collect()
    }
    batch = {
        tuple(r)
        for r in gopher_rule_flags_expr(batch_docs, "doc_id", "text", ["source"])
        .filter("pass_all")
        .collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_gopher_filter_stateless(spark, tmp_path_factory):
    """curation.gopher_rule_flags_expr documents itself as usable as a
    STATELESS Structured Streaming filter (map-only: no token explode,
    no groupBy, so no watermark or state store needed). Prove the
    claim: run it as an append-mode streaming query over the documents
    parquet and pin (a) stream output == batch output exactly and
    (b) zero stateful operators in the executed streaming plan."""
    import os as _os

    from data_warehouse_data_mining_spark.operators import curation

    d = tmp_path_factory.mktemp("docs_stream")
    _os.symlink(f"{SF_SMALL}/documents.parquet", d / "documents.parquet")
    schema = spark.read.parquet(str(d)).schema
    stream = spark.readStream.schema(schema).parquet(str(d))
    flags = curation.gopher_rule_flags_expr(stream, "doc_id", "text", ["source"])
    q = (
        flags.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_gopher")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.lastProgress
    finally:
        q.stop()
    assert progress is not None and progress["stateOperators"] == []
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM stream_gopher").collect()
    }
    batch = {
        tuple(r)
        for r in curation.gopher_rule_flags_expr(
            load(spark, SF_SMALL).documents, "doc_id", "text", ["source"]
        ).collect()
    }
    assert len(streamed) > 0
    assert streamed == batch
