"""Table catalog for the driver-provided warehouse tables.

Loads the TPC-H-ish star schema + events/documents/embeddings parquet
tables (TESTDATA.md) and registers them as temp views. Parquet is
self-describing so no inference pass is needed (unlike the reference's
double-scanning ``inferSchema=True`` CSV reads, stroke_predict.py:22-23).

Scale notes: these are plain ``spark.read.parquet`` scans — Catalyst
gets full predicate pushdown / column pruning / partition pruning. At
100 TB the same code works against a partitioned table root; nothing
here materializes or collects.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@dataclass
class Catalog:
    """Lazy handle over one scale-factor directory of parquet tables."""

    spark: SparkSession
    sf_dir: str
    _cache: dict[str, DataFrame] = field(default_factory=dict)

    def table(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
        if name not in self._cache:
            # events.parquet carries INT64 TIMESTAMP(NANOS); Spark rejects it
            # unless nanosAsLong is on. The conf is runtime-settable, and the
            # catalog may be handed an externally built SparkSession that
            # lacks it, so set it here rather than relying on session.py.
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = self.spark.read.parquet(
                os.path.join(self.sf_dir, f"{name}.parquet")
            )
            if name == "events":
                df = normalize_events(df)
            self._cache[name] = df
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for ``spark.sql`` use."""
        for name in TABLE_NAMES:
            self.table(name).createOrReplaceTempView(name)


def normalize_events(df: DataFrame) -> DataFrame:
    """events.ts arrives as a raw nanosecond long (see session.py's
    nanosAsLong); floor-divide to microseconds — exactly how DuckDB
    truncates ns → its us-precision TIMESTAMP — and materialize a real
    timestamp column. Applied by both the batch catalog and the
    streaming readers."""
    if dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load(spark: SparkSession, sf_dir: str | None = None) -> Catalog:
    return Catalog(spark, sf_dir or DEFAULT_SF_DIR)
