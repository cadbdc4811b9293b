"""Every registered query with an oracle is executed BOTH ways (Spark at
sf0.001, the oracle SQL through DuckDB on the same parquet) and compared
exactly — a local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pytest

from data_warehouse_data_mining_spark.registry import all_queries

from .conftest import SF_SMALL

_QUERIES = all_queries()
ORACLE_NAMES = sorted(n for n, q in _QUERIES.items() if q.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, q in _QUERIES.items() if q.oracle is None)


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        return 0.0 if v == 0.0 else v  # -0.0 == 0.0
    if isinstance(v, (datetime, date)):
        return str(v)
    return v


def _rows(result, columns, col_order):
    idx = [columns.index(c) for c in col_order]
    canon = [tuple(_canon(r[i]) for i in idx) for r in result]
    return sorted(canon, key=lambda t: tuple(str(x) for x in t))


def _approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return a == b or math.isclose(a, b, rel_tol=0, abs_tol=0)
    return a == b


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    q = _QUERIES[name]
    sdf = q.builder(spark, SF_SMALL)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    cur = duck.execute(q.oracle)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    order = sorted(spark_cols)
    s = _rows(spark_rows, spark_cols, order)
    d = _rows(duck_rows, duck_cols, order)
    mismatches = [
        (i, sr, dr)
        for i, (sr, dr) in enumerate(zip(s, d))
        if not all(_approx_eq(a, b) for a, b in zip(sr, dr))
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]} "
        f"(columns={order})"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle must still run and return a stable,
    non-degenerate result (the driver's weaker check)."""
    q = _QUERIES[name]
    df = q.builder(spark, SF_SMALL)
    assert df.count() >= 0
    assert len(df.columns) > 0
