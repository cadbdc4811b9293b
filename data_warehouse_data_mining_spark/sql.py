"""Ad-hoc SQL surface: run any Spark SQL text against the warehouse
catalog — the "bring your own query" entry point a warehouse engine
owes its users (reference users drove everything through the DataFrame
DSL; SQL compiles to the identical Catalyst plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_data_mining_spark.catalog import load


def run(spark: SparkSession, sql_text: str, sf_dir: str | None = None) -> DataFrame:
    """Register the warehouse tables as views and execute ``sql_text``.

    Views are temp (session-scoped) and re-pointed at ``sf_dir`` on each
    call, so switching scale factors is safe within one session.
    """
    load(spark, sf_dir).register_views()
    return spark.sql(sql_text)
