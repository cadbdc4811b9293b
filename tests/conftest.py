"""Shared fixtures: one tuned SparkSession per test session, plus a
DuckDB connection with the testdata views registered (mirroring the
driver's oracle harness)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_data_mining_spark.catalog import TABLE_NAMES
from data_warehouse_data_mining_spark.session import get_session

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        driver_memory="8g",
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_SMALL}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def bound_registry_dfs(spark):
    """ONE construction pass over every registered builder at sf0.001 —
    building a DataFrame triggers analysis plus any eager work (KMeans
    codebook fits, eager localCheckpoints), which is the expensive part.
    Shared by the type lints (test_oracle_types) and the registry-wide
    plan lints (test_plans); before r10 each file paid its own full
    ~3-minute binding pass. Values: bound DataFrame or an error string."""
    from concurrent.futures import ThreadPoolExecutor

    from data_warehouse_data_mining_spark import registry

    def bind(item):
        name, q = item
        try:
            return name, q.builder(spark, SF_SMALL)
        except Exception as exc:  # builder itself must bind
            return name, f"builder failed to bind: {exc!r}"

    # threaded (r12): binding is py4j/analysis latency, not compute —
    # eager fit work (localCheckpoints, codebook fits) releases the GIL
    # and the fit caches are deterministic+idempotent under races
    with ThreadPoolExecutor(max_workers=8) as ex:
        return dict(ex.map(bind, registry.all_queries().items()))
