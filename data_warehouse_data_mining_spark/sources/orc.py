"""ORC source/sink — the second columnar format a warehouse ingests.

ORC ships inside the core Spark distribution (unlike Delta/Iceberg/
Avro, which are gated in ``sources/connectors.py``), with the same
scan-level optimizations as parquet: column pruning, predicate pushdown
into stripe/row-group min-max stats, and vectorized reads. Everything
downstream is format-agnostic — a DataFrame from ``read_orc`` feeds
every operator in this package unchanged; only the scan node differs.

Reference parity note: the reference reads only CSV
(stroke_predict.py:22-23); columnar ingest is north-star surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_orc(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """Scan an ORC file/directory. ``merge_schema=True`` reconciles
    per-file schemas (schema-evolved ingest folders) at the cost of a
    footer read per file — same trade-off as parquet's mergeSchema."""
    return spark.read.option("mergeSchema", str(merge_schema).lower()).orc(path)


def write_orc_sorted(
    df: DataFrame, path: str, sort_cols: Sequence[str]
) -> None:
    """Write ORC sorted WITHIN partitions on the columns future queries
    filter by, so stripe/row-group min-max stats actually prune — the
    ORC twin of ``sinks.writers.write_sorted_for_skipping``. Uses
    sortWithinPartitions (no global sort): at 100 TB a total order is
    pointless for skipping; per-file locality is what the reader's
    search argument (SArg) needs."""
    df.sortWithinPartitions(*sort_cols).write.mode("overwrite").orc(path)
