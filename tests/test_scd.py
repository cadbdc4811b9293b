"""SCD Type 2 invariants: interval partitioning, one current version
per key, and incremental merge == full rebuild. Oracle value parity is
covered by the auto-discovering parity sweep; these tests pin the
semantic invariants that a hash match alone would not explain."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.operators.scd import (
    scd2_build_history,
    scd2_incremental_merge,
    scd2_point_in_time,
    scd2_versions,
)
from tests.conftest import SF_SMALL


def test_scd2_one_current_version_per_key(spark):
    v = scd2_versions(load(spark, SF_SMALL).orders)
    per_key = v.groupBy("o_custkey").agg(
        F.sum(F.col("eff_to").isNull().cast("int")).alias("n_current"),
        F.count(F.lit(1)).alias("n_versions"),
        F.max("version_n").alias("max_n"),
    )
    bad = per_key.filter(
        (F.col("n_current") != 1) | (F.col("max_n") != F.col("n_versions"))
    )
    assert bad.count() == 0


def test_scd2_intervals_chain_without_gaps(spark):
    """Each version's eff_to equals the next version's eff_from — the
    validity intervals tile the key's timeline exactly."""
    from pyspark.sql import Window as W

    v = scd2_versions(load(spark, SF_SMALL).orders)
    w = W.partitionBy("o_custkey").orderBy("version_n")
    chained = v.withColumn("next_from", F.lead("eff_from").over(w))
    bad = chained.filter(
        F.col("next_from").isNotNull() & (F.col("eff_to") != F.col("next_from"))
    )
    assert bad.count() == 0


def test_scd2_no_consecutive_equal_values(spark):
    """Adjacent versions must differ — equal runs are collapsed."""
    from pyspark.sql import Window as W

    v = scd2_versions(load(spark, SF_SMALL).orders)
    w = W.partitionBy("o_custkey").orderBy("version_n")
    bad = v.withColumn("prev_val", F.lag("attr_value").over(w)).filter(
        F.col("prev_val") == F.col("attr_value")
    )
    assert bad.count() == 0


def test_scd2_point_in_time_covers_every_fact(spark):
    """The PIT join attributes every order exactly once."""
    n_orders = load(spark, SF_SMALL).orders.count()
    attributed = (
        scd2_point_in_time(spark, SF_SMALL)
        .agg(F.sum("n_orders").alias("s"))
        .collect()[0]["s"]
    )
    assert attributed == n_orders


def test_scd2_incremental_merge_equals_rebuild(spark):
    merged = scd2_incremental_merge(spark, SF_SMALL)
    rebuilt = scd2_build_history(spark, SF_SMALL)
    assert merged.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(merged).count() == 0


def test_bridge_allocation_reconciles_exactly(spark):
    """The largest-remainder bridge must conserve cents: the sum of ALL
    per-line allocations equals the sum of order-header totals exactly
    (orders with no lines allocate nothing) — the reconciliation
    property float 1/n weights cannot give."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.catalog import load

    from .conftest import SF_SMALL

    t = load(spark, SF_SMALL)
    w = W.partitionBy("l_orderkey").orderBy("l_partkey", "l_linenumber")
    lines = t.lineitem.select(
        "l_orderkey",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("l_orderkey"))
        .cast("long")
        .alias("n"),
    )
    heads = t.orders.select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("total_c"),
    )
    alloc_sum = (
        lines.join(heads, lines.l_orderkey == heads.o_orderkey)
        .select(
            (
                F.expr("(total_c - total_c % n) div n")
                + F.when(
                    F.col("rn") <= F.col("total_c") % F.col("n"), 1
                ).otherwise(0)
            ).alias("alloc_c")
        )
        .agg(F.sum("alloc_c").cast("long").alias("s"))
        .collect()[0]["s"]
    )
    header_sum = (
        heads.join(
            lines.select("l_orderkey").distinct(),
            heads.o_orderkey == F.col("l_orderkey"),
            "left_semi",
        )
        .agg(F.sum("total_c").cast("long").alias("s"))
        .collect()[0]["s"]
    )
    assert alloc_sum == header_sum
