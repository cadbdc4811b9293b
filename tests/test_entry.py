"""Smoke tests of the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 40, f"expected a broad operator surface, got {len(qs)}"
    assert set(oracles) <= set(qs)
    # every oracle is non-empty SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_queries_callable_signature(spark):
    qs = entrymod.queries()
    name = sorted(qs)[0]
    df = qs[name](spark, "/root/testdata/sf0.001")
    assert df.columns


def test_adhoc_sql_surface(spark):
    from data_warehouse_data_mining_spark import sql as engine_sql

    df = engine_sql.run(
        spark,
        "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1",
        "/root/testdata/sf0.001",
    )
    rows = {r.o_orderstatus: r.n for r in df.collect()}
    assert sum(rows.values()) == 1500


def test_approx_sketches_close_to_exact(spark):
    """The sketch queries now emit their accuracy checks as property
    flags (exact counts oracle-pinned, flags assert the sketch bound);
    verify the exact columns match an independent computation and every
    flag is raised."""
    from data_warehouse_data_mining_spark.catalog import load
    from data_warehouse_data_mining_spark.operators.advanced import (
        approx_quantiles_profile,
    )
    from data_warehouse_data_mining_spark.operators.relational import (
        approx_distinct_parts,
    )

    sf = "/root/testdata/sf0.001"
    row = approx_distinct_parts(spark, sf).collect()[0]
    exact_distinct = load(spark, sf).lineitem.select("l_partkey").distinct().count()
    assert row.exact_parts == exact_distinct
    assert row.parts_within_5pct == 1
    assert row.orders_within_5pct == 1

    prof = approx_quantiles_profile(spark, sf).collect()
    assert prof
    for r in prof:
        assert r.median_rank_ok == 1, r
        assert r.p99_rank_ok == 1, r
        assert r.parts_within_6pct == 1, r


def test_money_sum_paths_agree(spark):
    """The fast fixed-point money sum and the decimal money sum must
    produce identical rounded values (both exact by construction)."""
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.catalog import load
    from data_warehouse_data_mining_spark.operators.relational import (
        money_sum,
        money_sum_fast,
    )

    li = load(spark, "/root/testdata/sf0.001").lineitem
    expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    out = li.groupBy("l_returnflag").agg(
        money_sum(expr, 4).alias("dec"),
        money_sum_fast(expr, 4).alias("fast"),
    )
    rows = out.collect()
    assert rows and all(r.dec == r.fast for r in rows)
