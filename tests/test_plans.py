"""Physical-plan shape assertions: pushdown, pruning, broadcast.

These encode the 100 TB design contract — if a change makes a filter
stop reaching the parquet scan or turns a dimension broadcast into a
shuffle, these fail long before a cluster run would."""

from __future__ import annotations

from data_warehouse_data_mining_spark.operators.relational import (
    broadcast_dim_join,
    pricing_summary,
    revenue_by_nation,
)
from data_warehouse_data_mining_spark.plans import explain

from .conftest import SF_SMALL


def test_pricing_summary_pushdown_and_pruning(spark):
    df = pricing_summary(spark, SF_SMALL)
    assert explain.has_pushed_filters(df), "shipdate filter must reach the parquet scan"
    needed = {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    }
    assert explain.reads_only_columns(df, needed), "scan must prune to the 7 used columns"
    assert explain.codegen_operator_count(df) >= 3, (
        "filter/project/agg must run inside whole-stage codegen"
    )


def test_dimension_joins_broadcast(spark):
    assert explain.has_broadcast_join(broadcast_dim_join(spark, SF_SMALL))
    assert explain.has_broadcast_join(revenue_by_nation(spark, SF_SMALL))


def test_no_cartesian_in_registry(spark):
    """No registered query may contain an unconstrained cross join
    (CartesianProduct / BroadcastNestedLoopJoin with no condition is the
    n² trap at scale). Broadcast nested-loop joins from the tiny
    query-set similarity joins are allowed; plain CartesianProduct not."""
    from data_warehouse_data_mining_spark.registry import all_queries

    for name, q in all_queries().items():
        if name.startswith("ml_") or name in ("smote_rebalance_counts",):
            continue  # model fitting plans are MLlib-internal
        plan = explain.formatted_plan(q.builder(spark, SF_SMALL))
        assert "CartesianProduct" not in plan, f"{name} has a cartesian product"
