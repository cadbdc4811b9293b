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
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = HORIZON,
    how: str = "inner",
) -> DataFrame:
    """Join each click to the same user's purchases within ``horizon``
    after it. Works identically on batch and streaming inputs. ``how``
    selects the join type so the inner attribution and the LEFT OUTER
    unconverted-click variants share ONE condition — a change to the
    horizon bound or keys can never desynchronize them."""
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
        how,
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
    # one reader, two filtered branches: a streaming self-join works on
    # branches of the SAME source DataFrame (the event-type filters push
    # below the watermark operator — test-pinned), so the second
    # schema-inference read the old second reader paid is gone
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    return attributed_pairs(clicks, purchases, horizon)


def attributed_pairs_outer(
    clicks: DataFrame, purchases: DataFrame, horizon: str = HORIZON
) -> DataFrame:
    """LEFT OUTER variant of ``attributed_pairs``: clicks with no
    purchase in the horizon survive with NULL purchase columns. On
    batch this is an ordinary outer join; on streaming it is the
    semantics only a watermarked interval join can provide — the NULL
    row for an unconverted click is emitted exactly when the watermark
    passes ``click_ts + horizon`` and the engine can PROVE no match is
    coming (the same eviction bound that keeps join state finite)."""
    return attributed_pairs(clicks, purchases, horizon, how="left_outer")


@register(
    "unconverted_clicks",
    oracle="""
    WITH pairs AS (
      SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
       AND p.ts >= c.ts
       AND p.ts <= c.ts + INTERVAL 1 HOUR
    )
    SELECT user_id,
           CAST(count(DISTINCT click_id) AS BIGINT) AS n_clicks,
           CAST(count(DISTINCT CASE WHEN purchase_id IS NOT NULL
                                    THEN click_id END) AS BIGINT) AS n_converted,
           CAST(count(DISTINCT CASE WHEN purchase_id IS NULL
                                    THEN click_id END) AS BIGINT) AS n_unconverted,
           round(count(DISTINCT CASE WHEN purchase_id IS NOT NULL
                                     THEN click_id END) * 1.0
                 / count(DISTINCT click_id), 6) AS conversion_rate
    FROM pairs GROUP BY user_id
    """,
)
def unconverted_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mirror of the LEFT OUTER stream-stream interval join
    (generic: attributed_pairs_outer): per user, how many clicks
    converted to a purchase within the horizon and how many never did.
    The unconverted side is precisely the rows the streaming engine
    emits on watermark expiry — the negative space the INNER
    attribution join cannot see (funnel drop-off, retargeting feeds)."""
    ev = load(spark, sf_dir).events
    pairs = attributed_pairs_outer(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    return pairs.groupBy(F.col("c_user").alias("user_id")).agg(
        F.countDistinct("click_id").alias("n_clicks"),
        F.countDistinct(
            F.when(F.col("purchase_id").isNotNull(), F.col("click_id"))
        ).alias("n_converted"),
        F.countDistinct(
            F.when(F.col("purchase_id").isNull(), F.col("click_id"))
        ).alias("n_unconverted"),
        F.round(
            F.countDistinct(
                F.when(F.col("purchase_id").isNotNull(), F.col("click_id"))
            )
            / F.countDistinct("click_id"),
            6,
        ).alias("conversion_rate"),
    )
