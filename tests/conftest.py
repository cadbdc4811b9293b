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
