"""Named-query registry.

Every operator the engine claims (SURVEY.md §2) is registered here as a
named query: a builder ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, an oracle SQL string that DuckDB
runs over the same parquet tables. The driver compares the two
(row-count + schema + order-insensitive value-hash), so builders and
oracles must agree on column NAMES and on deterministic VALUES:

* every computed column is aliased identically on both sides;
* every double is rounded (sums: 2 decimals, ratios/avgs: 6) so that
  floating-point summation order cannot flip the hash;
* timestamps are emitted as formatted strings (session TZ is UTC);
* top-k queries order by a unique key chain so LIMIT is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    builder: QueryFn
    oracle: str | None = None
    headline: bool = False
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, headline, doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    _ensure_loaded()
    return dict(_REGISTRY)


def query_fns() -> dict[str, QueryFn]:
    return {n: q.builder for n, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}


def headline_queries() -> dict[str, Query]:
    return {n: q for n, q in all_queries().items() if q.headline}


_loaded = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    from data_warehouse_data_mining_spark.operators import (  # noqa: F401
        advanced,
        association,
        dedup,
        mining,
        multimodal,
        quality,
        relational,
        similarity,
        sketches,
        text,
        tpch,
        udfs,
        windows,
    )
    from data_warehouse_data_mining_spark.streaming import joins as stream_joins  # noqa: F401
    from data_warehouse_data_mining_spark.streaming import windows as stream_windows  # noqa: F401
    from data_warehouse_data_mining_spark.ml import queries as ml_queries  # noqa: F401
    from data_warehouse_data_mining_spark import pipelines  # noqa: F401

    _loaded = True
