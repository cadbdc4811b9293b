"""Slowly-changing-dimension (Type 2) operators.

The classic warehouse dimension-versioning toolkit the reference's
course material describes but its script never implements: build a
versioned dimension from a change log, join facts against the version
valid at event time, and maintain the dimension INCREMENTALLY from a
new batch (the only shape that survives 100 TB — a full rebuild of a
dimension's history per batch does not).

The change log here is the orders table viewed as a CDC stream of each
customer's ``o_orderpriority``: every order is an observation; runs of
equal values collapse into one version with a validity interval.

Scale notes: every query shuffles once on the dimension key
(o_custkey) and does all window work inside that single partitioning —
the sequence-collapse lag, the version-numbering row_number, and the
interval lead all share one sort. The point-in-time join is an
EQUI-join on the key with the interval predicate as a post-join
filter, so it is a plain shuffled hash/sort-merge join — never a
nested-loop range join. The incremental merge touches only the
CURRENT rows of the existing dimension plus the new batch; history
rows stream through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.operators.relational import money_sum
from data_warehouse_data_mining_spark.registry import register

_FMT = "yyyy-MM-dd HH:mm:ss"

# Shared CTE chain: collapse the per-customer priority sequence into
# version rows. Used verbatim by all three oracles so the SQL and the
# DataFrame builders state the same semantics once.
_VERSIONS_CTE = """
    seq AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
             lag(o_orderpriority) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS prev_p
      FROM orders
    ),
    versions AS (
      SELECT o_custkey,
             CAST(row_number() OVER w AS INT) AS version_n,
             o_orderpriority AS attr_value,
             o_orderdate AS eff_from,
             lead(o_orderdate) OVER w AS eff_to
      FROM seq
      WHERE prev_p IS NULL OR prev_p <> o_orderpriority
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
"""


def scd2_versions(orders: DataFrame) -> DataFrame:
    """Collapse a (key, ts, value) change log into SCD2 version rows.

    One shuffle on the key; the change-detection lag and the
    interval/numbering window share the same partitioning and sort, so
    Catalyst plans a single Sort + two Window operators in one stage.
    Returns o_custkey, version_n, attr_value, eff_from, eff_to
    (eff_to IS NULL marks the current version).
    """
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
    ).withColumn("prev_p", F.lag("o_orderpriority").over(w))
    return (
        seq.filter(
            F.col("prev_p").isNull()
            | (F.col("prev_p") != F.col("o_orderpriority"))
        )
        .select(
            "o_custkey",
            F.row_number().over(w).alias("version_n"),
            F.col("o_orderpriority").alias("attr_value"),
            F.col("o_orderdate").alias("eff_from"),
            F.lead("o_orderdate").over(w).alias("eff_to"),
        )
    )


def _fmt_versions(v: DataFrame) -> DataFrame:
    return v.select(
        "o_custkey",
        "version_n",
        "attr_value",
        F.date_format("eff_from", _FMT).alias("effective_from"),
        F.date_format("eff_to", _FMT).alias("effective_to"),
        F.col("eff_to").isNull().alias("is_current"),
    )


@register(
    "scd2_build_history",
    oracle=f"""
    WITH {_VERSIONS_CTE}
    SELECT o_custkey, version_n, attr_value,
           strftime(eff_from, '%Y-%m-%d %H:%M:%S') AS effective_from,
           strftime(eff_to, '%Y-%m-%d %H:%M:%S') AS effective_to,
           eff_to IS NULL AS is_current
    FROM versions
    """,
)
def scd2_build_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a full SCD Type 2 dimension from a change log: runs of
    equal attribute values collapse into versions with
    [effective_from, effective_to) validity and an is_current flag."""
    o = load(spark, sf_dir).orders
    return _fmt_versions(scd2_versions(o))


@register(
    "scd2_point_in_time",
    oracle=f"""
    WITH {_VERSIONS_CTE}
    SELECT v.attr_value,
           count(*) AS n_orders,
           CAST(count(DISTINCT f.o_custkey) AS BIGINT) AS n_customers,
           CAST(round(sum(CAST(f.o_totalprice AS DECIMAL(28,4))), 2)
                AS DOUBLE) AS total_price
    FROM orders f
    JOIN versions v
      ON f.o_custkey = v.o_custkey
     AND f.o_orderdate >= v.eff_from
     AND (v.eff_to IS NULL OR f.o_orderdate < v.eff_to)
    GROUP BY v.attr_value
    """,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-was) fact→dimension join: each fact row joins
    the dimension version valid at its own timestamp, then revenue is
    attributed to the historical attribute value. Equi-join on the key;
    the interval predicate is a post-join filter, so the plan is a
    plain shuffled join, never a nested loop."""
    o = load(spark, sf_dir).orders
    v = scd2_versions(o)
    f_ = o.select(
        F.col("o_custkey").alias("f_custkey"),
        F.col("o_orderdate").alias("f_date"),
        "o_totalprice",
    )
    return (
        f_.join(
            v,
            (F.col("f_custkey") == F.col("o_custkey"))
            & (F.col("f_date") >= F.col("eff_from"))
            & (F.col("eff_to").isNull() | (F.col("f_date") < F.col("eff_to"))),
        )
        .groupBy("attr_value")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("f_custkey").alias("n_customers"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
    )


_MERGE_CUTOFF = "1999-01-01"


@register(
    "scd2_incremental_merge",
    oracle=f"""
    WITH {_VERSIONS_CTE}
    SELECT o_custkey, version_n, attr_value,
           strftime(eff_from, '%Y-%m-%d %H:%M:%S') AS effective_from,
           strftime(eff_to, '%Y-%m-%d %H:%M:%S') AS effective_to,
           eff_to IS NULL AS is_current
    FROM versions
    """,
)
def scd2_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance: merge a new change batch (orders
    on/after the cutoff) into an existing dimension (built from orders
    before it) WITHOUT rebuilding history. Current rows whose key
    changes in the batch are closed out; genuinely-new values append as
    new versions (a batch value equal to the key's current value is a
    continuation, not a version). The oracle is the full rebuild over
    all orders — the merge must be indistinguishable from it.

    At 100 TB this is the only viable maintenance shape: the batch and
    the dimension's current slice join on the key; closed history is
    never rewritten. Everything shuffles once on o_custkey.
    """
    o = load(spark, sf_dir).orders
    cutoff = F.lit(_MERGE_CUTOFF).cast("timestamp")
    dim = scd2_versions(o.filter(F.col("o_orderdate") < cutoff))
    batch = o.filter(F.col("o_orderdate") >= cutoff)
    return _fmt_versions(scd2_merge_batch(dim, batch))


def scd2_merge_batch(dim: DataFrame, batch: DataFrame) -> DataFrame:
    """Merge one CDC batch into an existing SCD2 dimension, returning
    the updated dimension in RAW interval form (o_custkey, version_n,
    attr_value, eff_from TIMESTAMP, eff_to TIMESTAMP|NULL) — the same
    shape ``scd2_versions`` emits, so merges CHAIN: feed the output
    back as ``dim`` for the next batch. This is the foreachBatch body
    of a streaming CDC pipeline (tests/test_streaming.py drives it
    from a file stream and proves batch-chained == full rebuild).

    ``batch`` carries raw change rows (o_custkey, o_orderdate,
    o_orderkey, o_orderpriority), all with event times at or after
    every eff_from already in ``dim``.
    """
    # Collapse runs WITHIN the batch.
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    inc = (
        batch.select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
        .withColumn("prev_p", F.lag("o_orderpriority").over(w))
        .filter(
            F.col("prev_p").isNull()
            | (F.col("prev_p") != F.col("o_orderpriority"))
        )
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("attr_value"),
            F.col("o_orderdate").alias("eff_from"),
            F.col("o_orderkey").alias("ord_key"),
        )
    )

    # Drop each key's FIRST batch version when it merely continues the
    # dimension's current value.
    cur = dim.filter(F.col("eff_to").isNull()).select(
        F.col("o_custkey").alias("c_key"), F.col("attr_value").alias("cur_value")
    )
    first_w = W.partitionBy("o_custkey").orderBy("eff_from", "ord_key")
    inc = (
        inc.withColumn("rn", F.row_number().over(first_w))
        .join(cur, F.col("o_custkey") == F.col("c_key"), "left")
        .filter(
            (F.col("rn") > 1)
            | F.col("cur_value").isNull()
            | (F.col("attr_value") != F.col("cur_value"))
        )
        .select("o_custkey", "attr_value", "eff_from", "ord_key")
    )

    # New versions: interval chain within the kept batch starts.
    new_w = W.partitionBy("o_custkey").orderBy("eff_from", "ord_key")
    new_v = inc.select(
        "o_custkey",
        F.row_number().over(new_w).alias("inc_n"),
        "attr_value",
        "eff_from",
        F.lead("eff_from").over(new_w).alias("eff_to"),
    )

    # Close out current rows that now have a successor; renumber the
    # appended versions after each key's existing max version.
    succ = new_v.groupBy(F.col("o_custkey").alias("s_key")).agg(
        F.min("eff_from").alias("succ_from"), F.count(F.lit(1)).alias("n_new")
    )
    closed = (
        dim.join(succ, F.col("o_custkey") == F.col("s_key"), "left")
        .withColumn(
            "eff_to",
            F.when(
                F.col("eff_to").isNull() & F.col("succ_from").isNotNull(),
                F.col("succ_from"),
            ).otherwise(F.col("eff_to")),
        )
        .select("o_custkey", "version_n", "attr_value", "eff_from", "eff_to")
    )
    base_n = dim.groupBy(F.col("o_custkey").alias("b_key")).agg(
        F.max("version_n").alias("max_n")
    )
    appended = (
        new_v.join(base_n, F.col("o_custkey") == F.col("b_key"), "left")
        .select(
            "o_custkey",
            (F.col("inc_n") + F.coalesce(F.col("max_n"), F.lit(0)))
            .cast("int")
            .alias("version_n"),
            "attr_value",
            "eff_from",
            "eff_to",
        )
    )
    return closed.unionByName(appended)


@register(
    "late_arriving_dimension",
    oracle="""
    WITH present AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 0
    ),
    facts AS (
      SELECT o_orderkey, o_custkey,
             EXISTS (SELECT 1 FROM present p WHERE p.c_custkey = o_custkey)
               AS has_dim
      FROM orders
    ),
    inferred AS (
      SELECT DISTINCT o_custkey FROM facts WHERE NOT has_dim
    ),
    backfill AS (
      SELECT i.o_custkey,
             EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = i.o_custkey)
               AS arrived
      FROM inferred i
    )
    SELECT CAST(count(*) AS BIGINT) AS n_facts,
           CAST(sum(CASE WHEN has_dim THEN 0 ELSE 1 END) AS BIGINT)
             AS n_orphan_facts,
           (SELECT CAST(count(*) AS BIGINT) FROM inferred)
             AS n_inferred_members,
           (SELECT CAST(count(*) AS BIGINT) FROM backfill WHERE arrived)
             AS n_members_backfilled,
           (SELECT CAST(count(*) AS BIGINT) FROM backfill WHERE NOT arrived)
             AS n_still_unknown
    FROM facts
    """,
)
def late_arriving_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kimball's late-arriving-dimension pattern as an auditable batch:
    facts (orders) land before some dimension rows exist (simulated:
    every 10th customer 'hasn't arrived'), so the load keys orphan
    facts to INFERRED members (distinct orphan keys with placeholder
    attributes) instead of dropping or stalling them; when the real
    dimension rows arrive, the backfill re-resolves inferred members
    in place. The one-row audit reports each stage: orphan facts,
    inferred members created, members later backfilled, and keys still
    unknown (referential debt).

    Membership tests are plain key equi-joins against the dim key
    sets (no forced broadcast — customer is SF-proportional, so AQE
    picks broadcast only when the dim actually fits); the inferred
    set is orphan-key-sized and drives the backfill join, so the
    reconciliation cost scales with the DEBT, not the fact table."""
    t = load(spark, sf_dir)
    present = t.customer.filter(F.col("c_custkey") % 10 != 0).select(
        "c_custkey"
    )
    facts = t.orders.select("o_custkey").join(
        present.select(F.col("c_custkey").alias("o_custkey"))
        .withColumn("has_dim", F.lit(True)),
        "o_custkey",
        "left",
    ).select(F.coalesce("has_dim", F.lit(False)).alias("has_dim"), "o_custkey")
    facts = facts.localCheckpoint(eager=True)
    inferred = (
        facts.filter(~F.col("has_dim")).select("o_custkey").distinct()
    )
    backfill = inferred.join(
        t.customer.select(F.col("c_custkey").alias("o_custkey"))
        .withColumn("arrived", F.lit(True)),
        "o_custkey",
        "left",
    ).select(F.coalesce("arrived", F.lit(False)).alias("arrived"))
    backfill = backfill.localCheckpoint(eager=True)
    agg = facts.agg(
        F.count(F.lit(1)).alias("n_facts"),
        F.sum(F.when(F.col("has_dim"), 0).otherwise(1))
        .cast("long")
        .alias("n_orphan_facts"),
    )
    inf_n = inferred.agg(F.count(F.lit(1)).alias("n_inferred_members"))
    bf = backfill.agg(
        F.sum(F.when(F.col("arrived"), 1).otherwise(0))
        .cast("long")
        .alias("n_members_backfilled"),
        F.sum(F.when(F.col("arrived"), 0).otherwise(1))
        .cast("long")
        .alias("n_still_unknown"),
    )
    return (
        agg.crossJoin(F.broadcast(inf_n))
        .crossJoin(F.broadcast(bf))
        .select(
            "n_facts",
            "n_orphan_facts",
            "n_inferred_members",
            "n_members_backfilled",
            "n_still_unknown",
        )
    )


@register(
    "accumulating_snapshot_orders",
    oracle="""
    WITH ship AS (
      SELECT l_orderkey,
             min(l_shipdate) AS first_ship,
             max(l_shipdate) AS last_ship,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey AS orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           strftime(s.first_ship, '%Y-%m-%d') AS first_ship_date,
           strftime(s.last_ship, '%Y-%m-%d') AS last_ship_date,
           CAST(date_diff('day', o.o_orderdate, s.first_ship) AS BIGINT)
             AS days_to_first_ship,
           CAST(date_diff('day', s.first_ship, s.last_ship) AS BIGINT)
             AS shipping_span_days,
           coalesce(s.n_lines, 0) AS n_lines,
           CASE WHEN s.l_orderkey IS NULL THEN 'PENDING'
                WHEN o.o_orderstatus = 'F' THEN 'COMPLETE'
                ELSE 'SHIPPING' END AS milestone_status
    FROM orders o LEFT JOIN ship s ON s.l_orderkey = o.o_orderkey
    ORDER BY orderkey
    """,
)
def accumulating_snapshot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kimball's third fact-table type — the ACCUMULATING SNAPSHOT: one
    row per order that collects its lifecycle milestones (placed →
    first shipment → last shipment) with the lag columns analysts
    actually query (days-to-first-ship, shipping span) and a milestone
    status; transactional facts (lineitem) and periodic snapshots
    (daily_kpi_build) are the other two types, so this completes the
    trio. In production this table is MERGE-updated as milestones land
    (merge_upsert's mechanics); here it materializes in one pass.

    One lineitem aggregate to order grain + one LEFT join on the order
    key — at 100 TB both sides co-shuffle on the natural key once
    (bucketed layouts make even that free); lags are exact integer day
    arithmetic and every milestone is emitted as a formatted date
    string per the timestamp canon."""
    t = load(spark, sf_dir)
    ship = t.lineitem.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    o = t.orders
    return (
        o.join(ship, o.o_orderkey == ship.l_orderkey, "left")
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.date_format("first_ship", "yyyy-MM-dd").alias(
                "first_ship_date"
            ),
            F.date_format("last_ship", "yyyy-MM-dd").alias("last_ship_date"),
            F.datediff("first_ship", "o_orderdate")
            .cast("long")
            .alias("days_to_first_ship"),
            F.datediff("last_ship", "first_ship")
            .cast("long")
            .alias("shipping_span_days"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.when(F.col("l_orderkey").isNull(), "PENDING")
            .when(F.col("o_orderstatus") == "F", "COMPLETE")
            .otherwise("SHIPPING")
            .alias("milestone_status"),
        )
        .orderBy("orderkey")
    )


@register(
    "multivalued_bridge_allocation",
    oracle="""
    WITH lines AS (
      SELECT l_orderkey, l_partkey,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_partkey, l_linenumber) AS rn,
             CAST(count(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n
      FROM lineitem
    ),
    alloc AS (
      SELECT l.l_partkey,
             (o.total_c - o.total_c % l.n) / l.n
               + CASE WHEN l.rn <= o.total_c % l.n THEN 1 ELSE 0 END
               AS alloc_c
      FROM lines l
      JOIN (SELECT o_orderkey,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_c
            FROM orders) o
        ON o.o_orderkey = l.l_orderkey
    )
    SELECT l_partkey AS partkey,
           CAST(count(*) AS BIGINT) AS n_order_lines,
           CAST(sum(CAST(alloc_c AS BIGINT)) AS BIGINT) AS allocated_cents
    FROM alloc
    GROUP BY l_partkey
    ORDER BY allocated_cents DESC, partkey
    LIMIT 50
    """,
)
def multivalued_bridge_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kimball's multivalued-dimension BRIDGE with an allocation factor:
    an order's header revenue splits equally across its line parts, and
    the weights are materialized with LARGEST-REMAINDER integer cents —
    base = total div n per line, plus one extra cent to the first
    (total mod n) lines in deterministic line order — so every order's
    allocations sum back to its header total EXACTLY (float weights
    1/n leak cents and double-count under aggregation; the bridge's
    whole point is that downstream sums reconcile).

    One lineitem window pass (order-partitioned row_number + count) +
    one key join to the order header; the per-part rollup is
    part-bounded, top-50 with exact integer ordering."""
    t = load(spark, sf_dir)
    w = W.partitionBy("l_orderkey").orderBy("l_partkey", "l_linenumber")
    lines = t.lineitem.select(
        "l_orderkey",
        "l_partkey",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("l_orderkey"))
        .cast("long")
        .alias("n"),
    )
    heads = t.orders.select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias(
            "total_c"
        ),
    )
    alloc = lines.join(
        heads, lines.l_orderkey == heads.o_orderkey
    ).select(
        "l_partkey",
        (
            F.expr("(total_c - total_c % n) div n")
            + F.when(F.col("rn") <= F.col("total_c") % F.col("n"), 1).otherwise(0)
        ).alias("alloc_c"),
    )
    return (
        alloc.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.count(F.lit(1)).alias("n_order_lines"),
            F.sum("alloc_c").cast("long").alias("allocated_cents"),
        )
        .orderBy(F.col("allocated_cents").desc(), "partkey")
        .limit(50)
    )


@register(
    "scd_type6_view",
    oracle=f"""
    WITH {_VERSIONS_CTE},
    cur AS (
      SELECT o_custkey, attr_value AS current_value
      FROM versions WHERE eff_to IS NULL
    )
    SELECT v.o_custkey, v.version_n, v.attr_value, c.current_value,
           strftime(v.eff_from, '%Y-%m-%d %H:%M:%S') AS effective_from,
           strftime(v.eff_to, '%Y-%m-%d %H:%M:%S') AS effective_to,
           v.eff_to IS NULL AS is_current,
           v.attr_value <> c.current_value AS is_restated
    FROM versions v JOIN cur c ON c.o_custkey = v.o_custkey
    """,
)
def scd_type6_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 6 (hybrid 1+2+3) read view: every Type 2 history row
    carries the key's CURRENT attribute value alongside the historical
    one — the \"as was\" and \"as is\" columns BI tools want on the same
    row, without re-joining the dimension at query time. ``is_restated``
    marks rows whose historical value differs from today's (the slice a
    restatement-aware report filters on).

    One extra window pass over the already-built version table: the
    current value is the last version per key (max_by on version_n),
    broadcast-joined back — the dimension is key-sized, so this is a
    dim-side-only operation at any fact scale."""
    o = load(spark, sf_dir).orders
    v = scd2_versions(o)
    cur = (
        v.filter(F.col("eff_to").isNull())
        .select("o_custkey", F.col("attr_value").alias("current_value"))
    )
    return (
        v.join(cur, "o_custkey")
        .select(
            "o_custkey",
            "version_n",
            "attr_value",
            "current_value",
            F.date_format("eff_from", _FMT).alias("effective_from"),
            F.date_format("eff_to", _FMT).alias("effective_to"),
            F.col("eff_to").isNull().alias("is_current"),
            (F.col("attr_value") != F.col("current_value")).alias("is_restated"),
        )
    )
