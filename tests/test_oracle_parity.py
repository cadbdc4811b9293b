"""Every registered query with an oracle is executed BOTH ways (Spark at
sf0.001, the oracle SQL through DuckDB on the same parquet) and compared
exactly — a local mirror of the driver's t2 correctness gate, via the
shared harness in data_warehouse_data_mining_spark.oracle."""

from __future__ import annotations

import pytest

from data_warehouse_data_mining_spark import oracle
from data_warehouse_data_mining_spark.registry import all_queries

from .conftest import SF_SMALL

_QUERIES = all_queries()
ORACLE_NAMES = sorted(n for n, q in _QUERIES.items() if q.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, q in _QUERIES.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck_small():
    con = oracle.duckdb_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck_small, name):
    err = oracle.compare_query(name, spark, duck_small, SF_SMALL)
    assert err is None, f"{name}: {err}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle must still run and return a stable,
    non-degenerate result (the driver's weaker check)."""
    q = _QUERIES[name]
    df = q.builder(spark, SF_SMALL)
    assert df.count() >= 0
    assert len(df.columns) > 0
