"""Stream-stream interval join: click→purchase attribution.

The join is written ONCE against DataFrames and used two ways:

* batch — plain interval self-join over the events table, aggregated
  per user and oracle-checked against DuckDB;
* streaming — the same builder over two watermarked ``readStream``
  branches. The time bounds in the join condition are what let Spark
  size the join state: with both sides watermarked and ``p.ts`` bounded
  to ``[c.ts, c.ts + horizon]``, rows older than
  ``watermark + horizon`` are evicted from state — constant memory per
  key at any input rate, the property a 100 TB/day stream needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.registry import register

HORIZON = "1 hour"


def attributed_pairs(
    clicks: DataFrame, purchases: DataFrame, horizon: str = HORIZON
) -> DataFrame:
    """Join each click to the same user's purchases within ``horizon``
    after it. Works identically on batch and streaming inputs."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
    )


def _per_user(pairs: DataFrame) -> DataFrame:
    return (
        pairs.groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_attributed"),
            F.round(
                F.sum(F.col("purchase_value").cast("decimal(28,9)")), 2
            )
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("user_id")
    )


@register(
    "stream_join_attribution",
    oracle="""
    SELECT c.user_id,
           count(*) AS n_attributed,
           CAST(round(sum(CAST(p.value AS DECIMAL(28,9))), 2) AS DOUBLE)
             AS attributed_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    GROUP BY c.user_id
    ORDER BY c.user_id
    """,
)
def stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mirror of the stream-stream interval join: per-user count
    and value of purchases within one hour of a click. The per-value
    DECIMAL cast keeps the sum exact, so both engines round the same
    number."""
    ev = load(spark, sf_dir).events
    pairs = attributed_pairs(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    return _per_user(pairs)


def streaming_attributed_pairs(
    spark: SparkSession,
    source_dir: str,
    horizon: str = HORIZON,
    watermark: str = "2 hours",
) -> DataFrame:
    """The same join over two watermarked streaming branches of the
    events source. Append-mode capable: the interval bound + watermarks
    make the join state finite."""
    from data_warehouse_data_mining_spark.streaming.windows import read_event_stream

    stream = read_event_stream(spark, source_dir, watermark=watermark)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = read_event_stream(spark, source_dir, watermark=watermark).filter(
        F.col("event_type") == "purchase"
    )
    return attributed_pairs(clicks, purchases, horizon)
