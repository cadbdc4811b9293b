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
