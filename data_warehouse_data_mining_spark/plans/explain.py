"""Plan introspection: assert the physical plan is the one we designed.

Correctness tests prove values; these helpers prove SCALE properties —
that a filter reached the parquet scan, that a dimension join is a
broadcast, that an aggregate has a partial (map-side) phase. Used by
tests/test_plans.py so a regression in plan shape fails CI, not a
100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def reads_only_columns(df: DataFrame, table_columns: set[str]) -> bool:
    """True if every parquet ReadSchema in the plan is a subset of
    ``table_columns`` — i.e. column pruning happened."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            cols = {
                c.split(":")[0]
                for c in line.split("struct<", 1)[-1].rstrip(">").split(",")
                if c
            }
            if not cols <= table_columns:
                return False
    return True


def codegen_operator_count(df: DataFrame, execute: bool = True) -> int:
    """Count operators inside WholeStageCodegen spans (the ``*``-marked
    nodes in formatted explain). Under AQE the final physical plan only
    exists after execution, so by default run the plan first."""
    import re

    if execute:
        # must execute THIS df's queryExecution (df.count() would build
        # a separate plan and leave this one un-finalized under AQE)
        df.collect()
    plan = formatted_plan(df)
    return len(re.findall(r"^\s*(?:[+:]-\s*)?\* \w", plan, flags=re.MULTILINE))


def final_plan(df: DataFrame, execute: bool = True) -> str:
    """The AQE FINAL physical plan (runtime join strategies, skew
    splits, coalesced readers). Hint-free dimension joins plan as
    SortMergeJoin statically — the stats of a join-derived dim are
    unknowable up front — and AQE converts them to broadcast at runtime
    from ACTUAL sizes; scale contracts about join strategy must
    therefore be asserted here, not on the static plan."""
    if execute:
        # must execute THIS df's queryExecution (a write/count builds a
        # separate plan and leaves this one un-finalized under AQE)
        df.collect()
    plan = formatted_plan(df)
    return plan.split("== Initial Plan ==")[0]
