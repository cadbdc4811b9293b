"""Behavioral-mining analytics over the event stream: funnels, sequence
bigrams, cohort retention — the classic warehouse "data mining" query
shapes (the course the reference comes from), expressed scale-first:
every one is window functions + hash aggregation, no per-user collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.registry import register

_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "funnel_signup_purchase",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS first_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase_after
      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.first_signup
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT count(s.user_id) AS n_signed_up,
           count(p.user_id) AS n_converted,
           round(count(p.user_id) * 1.0 / count(s.user_id), 6) AS conversion_rate
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage funnel: users who signed up, and of those, who purchased
    AFTER their first signup. Two aggregates + one key-partitioned join."""
    e = load(spark, sf_dir).events
    s = e.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("first_signup")
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s.select(F.col("user_id").alias("s_uid"), "first_signup"),
              (F.col("user_id") == F.col("s_uid")) & (F.col("ts") > F.col("first_signup")))
        .groupBy(F.col("user_id").alias("p_uid"))
        .agg(F.min("ts").alias("first_purchase_after"))
    )
    return (
        s.join(p, F.col("user_id") == F.col("p_uid"), "left")
        .agg(
            F.count("user_id").alias("n_signed_up"),
            F.count("p_uid").alias("n_converted"),
            F.round(F.count("p_uid") / F.count("user_id"), 6).alias("conversion_rate"),
        )
    )


@register(
    "event_sequence_bigrams",
    oracle="""
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ) t
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def event_sequence_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining at bigram depth: consecutive event-type
    transitions per user → global transition counts (the input to a
    Markov-chain / next-event model). One shuffle on user_id, one agg."""
    e = load(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "cohort_retention",
    oracle="""
    WITH fw AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    aw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events)
    SELECT strftime(cohort_week, '%Y-%m-%d %H:%M:%S') AS cohort_week,
           CAST(date_diff('day', cohort_week, active_week) / 7 AS INT) AS week_offset,
           count(*) AS n_users
    FROM aw JOIN fw USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    counted in each subsequent active week. Both inputs partition on
    user_id, so the join is co-partitioned after the aggregates."""
    e = load(spark, sf_dir).events
    fw = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    aw = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        aw.join(fw, "user_id")
        .groupBy(
            F.date_format("cohort_week", _FMT).alias("cohort_week"),
            (F.datediff("active_week", "cohort_week") / 7).cast("int").alias(
                "week_offset"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "multires_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', h), '%Y-%m-%d %H:%M:%S') AS day,
           event_type,
           CAST(sum(n) AS BIGINT) AS n,
           round(sum(v), 2) AS total_value,
           count(*) AS n_hours
    FROM (
      SELECT date_trunc('hour', ts) AS h, event_type,
             count(*) AS n, sum(value) AS v
      FROM events GROUP BY 1, 2
    ) hourly
    GROUP BY 1, 2
    """,
)
def multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the DAILY rollup is
    REAGGREGATED from the hourly rollup, not recomputed from raw events
    — the multi-resolution pattern that makes time-series dashboards
    affordable at 100 TB (each resolution reads the previous one, ~24×
    smaller)."""
    e = load(spark, sf_dir).events
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    return hourly.groupBy(
        F.date_format(F.date_trunc("day", F.col("h")), _FMT).alias("day"),
        "event_type",
    ).agg(
        F.sum("n").alias("n"),
        F.round(F.sum("v"), 2).alias("total_value"),
        F.count(F.lit(1)).alias("n_hours"),
    )


@register(
    "timeseries_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events WHERE event_type = 'purchase'
    ),
    hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds
    ),
    actual AS (
      SELECT date_trunc('hour', ts) AS h, count(*) AS n,
             round(sum(value), 2) AS total
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT strftime(hour_start, '%Y-%m-%d %H:%M:%S') AS hour_start,
           coalesce(n, 0) AS n,
           coalesce(total, 0.0) AS total
    FROM hours LEFT JOIN actual ON actual.h = hours.hour_start
    """,
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time series from sparse events: generate the full hourly
    spine (sequence + explode) and left-join the actual aggregates, so
    silent gaps become explicit zeros — the prerequisite for any
    window/forecast model over event data. The spine generation is one
    row → N, driver-free."""
    e = load(spark, sf_dir).events.filter(F.col("event_type") == "purchase")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_start")
    )
    actual = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.round(F.sum("value"), 2).alias("total_raw"),
    )
    return (
        hours.join(actual, F.col("hour_start") == F.col("h"), "left")
        .select(
            F.date_format("hour_start", _FMT).alias("hour_start"),
            F.coalesce(F.col("n_raw"), F.lit(0)).alias("n"),
            F.coalesce(F.col("total_raw"), F.lit(0.0)).alias("total"),
        )
    )


@register(
    "rolling_distinct_users",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM daily)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           count(DISTINCT daily.user_id) AS users_7d
    FROM days
    JOIN daily ON daily.d <= days.d
              AND daily.d >  days.d - INTERVAL 7 DAY
    GROUP BY days.d
    ORDER BY day
    """,
)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the rolling
    COUNT(DISTINCT) a RANGE window cannot express distributively.

    Scale-right formulation: dedupe to (day, user) pairs first (one
    hash aggregate — the only pass over the raw events), then re-join
    the tiny day spine (broadcast) against the pairs with the trailing
    range predicate and re-count. No global single-partition window,
    no per-user state; the join fan-out is bounded at 7 pairs per
    (day, user)."""
    ev = load(spark, sf_dir).events
    daily = ev.select(
        F.date_trunc("day", F.col("ts")).alias("d"), "user_id"
    ).distinct()
    days = daily.select(F.col("d").alias("spine_d")).distinct()
    return (
        daily.join(
            F.broadcast(days),
            (F.col("d") <= F.col("spine_d"))
            & (F.col("d") > F.col("spine_d") - F.expr("INTERVAL 7 DAYS")),
        )
        .groupBy("spine_d")
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .select(F.date_format("spine_d", "yyyy-MM-dd").alias("day"), "users_7d")
        .orderBy("day")
    )


@register(
    "time_weighted_average",
    oracle="""
    WITH pts AS (
      SELECT user_id, value,
             epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t_next
      FROM events
    )
    SELECT user_id,
           round(CAST(sum(CAST(value AS DECIMAL(28,9)) * (t_next - t)) AS DOUBLE)
                 / (max(t_next) - min(t)), 6) AS twa_value,
           count(*) AS n_segments
    FROM pts
    WHERE t_next IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's value series (hypertable-
    style op for irregularly sampled series): each reading is held until
    the next one, weighted by its holding duration (last-observation-
    carried-forward integration). A plain arithmetic mean over-weights
    bursts; the TWA is the honest summary. One window pass + one hash
    aggregate, both partitioned by user — no global window. Durations
    are exact integer MICROSECONDS on both sides (DuckDB epoch() is
    fractional-seconds, Spark unix_timestamp() truncates — both traps);
    per-term DECIMAL keeps the weighted sum exact, so both engines
    round alike."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pts = load(spark, sf_dir).events.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("t"),
        F.lead(F.unix_micros("ts")).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    return (
        pts.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(28,9)") * (F.col("t_next") - F.col("t")))
                .cast("double")
                / (F.max("t_next") - F.min("t")),
                6,
            ).alias("twa_value"),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .orderBy("user_id")
    )


@register(
    "sessionize_events",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    numbered AS (
      SELECT user_id, event_id, ts,
             sum(CASE WHEN gap_us IS NULL OR gap_us > 14400000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_n
      FROM seq
    )
    SELECT user_id,
           CAST(session_n AS INT) AS session_n,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
    FROM numbered
    GROUP BY user_id, session_n
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: gap-based session assignment (a new
    session starts after >4 h of inactivity), the batch twin of the
    streaming session window (streaming/windows.py). The boundary lag,
    the session-numbering cumulative sum, and the per-session aggregate
    all partition on user_id — Catalyst plans ONE shuffle and one sort
    for the whole query, which is the shape that survives 100 TB of
    events. Gaps compare as exact integer microseconds on both engines
    (see time_weighted_average's trap notes)."""
    e = load(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    numbered = e.withColumn(
        "session_n",
        F.sum(
            F.when(gap.isNull() | (gap > 14_400_000_000), 1).otherwise(0)
        )
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("int"),
    )
    return numbered.groupBy("user_id", "session_n").agg(
        F.date_format(F.min("ts"), _FMT).alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
    )


@register(
    "ewma_per_user",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    acc AS (
      SELECT user_id, rn,
             power(0.8, rn) * sum(
               (CASE WHEN rn = 1 THEN 1.0 ELSE 0.2 END)
               * value / power(0.8, rn))
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS UNBOUNDED PRECEDING) AS ewma,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM seq
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           round(ewma, 6) AS ewma_value
    FROM acc WHERE rn = n ORDER BY user_id
    """,
)
def ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 0.2) of each
    user's event values — the standard online smoother, which is
    RECURSIVE (s_i = a*x_i + (1-a)*s_{i-1}) and so looks
    window-inexpressible. The closed form
    s_n = (1-a)^n * sum_i(w_i * x_i / (1-a)^i), w_1 = 1, w_i = a,
    turns it into one cumulative-sum window — no recursion, no UDF, one
    shuffle on user_id shared by the row-number and the cumsum.

    Numerics: (1-a)^-i grows exponentially; doubles overflow past
    ~6700 events per user at a=0.2 — beyond that, chunk the series and
    chain chunk-final states (the same recursion, applied per chunk).
    Rounded to 6 decimals: libm pow differs from JVM pow by ulps
    (correlation_matrix canon)."""
    e = load(spark, sf_dir).events
    w = W.partitionBy("user_id")
    seq = e.select(
        "user_id",
        "value",
        F.row_number().over(w.orderBy("ts", "event_id")).alias("rn"),
    )
    decay = F.pow(F.lit(0.8), F.col("rn"))
    term = (
        F.when(F.col("rn") == 1, 1.0).otherwise(0.2) * F.col("value") / decay
    )
    acc = seq.select(
        "user_id",
        "rn",
        (
            decay
            * F.sum(term).over(
                w.orderBy("rn").rowsBetween(W.unboundedPreceding, W.currentRow)
            )
        ).alias("ewma"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return (
        acc.filter(F.col("rn") == F.col("n"))
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_events"),
            F.round("ewma", 6).alias("ewma_value"),
        )
        .orderBy("user_id")
    )


@register(
    "ohlc_bars",
    oracle="""
    WITH base AS (
      SELECT date_trunc('hour', ts) AS bar, event_type, value, ts, event_id
      FROM events
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY bar, event_type
                                ORDER BY ts, event_id)            AS rn_a,
             row_number() OVER (PARTITION BY bar, event_type
                                ORDER BY ts DESC, event_id DESC)  AS rn_d
      FROM base
    )
    SELECT strftime(bar, '%Y-%m-%d %H:%M:%S') AS bar,
           event_type,
           round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
           round(max(value), 2)                              AS high,
           round(min(value), 2)                              AS low,
           round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
           count(*) AS n_events
    FROM ranked
    GROUP BY bar, event_type
    ORDER BY bar, event_type
    """,
)
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling: per (hour, event_type) bar, the opening value,
    high, low, and closing value — the canonical time-series
    downsampling every metrics/market warehouse ships.

    One hash aggregate, no window: open/close come from min_by/max_by
    keyed on a (ts, event_id) struct (event_id breaks timestamp ties,
    so the pick is deterministic in both engines — the oracle mirrors
    with double row_number ranking). Partial aggregation is map-side;
    at 100 TB this is a single shuffle of (bar, type) partials, not a
    per-bar sort.
    """
    e = load(spark, sf_dir).events
    okey = F.struct("ts", "event_id")
    return (
        e.select(
            F.date_trunc("hour", F.col("ts")).alias("bar_ts"),
            "event_type",
            "value",
            "ts",
            "event_id",
        )
        .groupBy("bar_ts", "event_type")
        .agg(
            F.round(F.min_by("value", okey), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", okey), 2).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format("bar_ts", "yyyy-MM-dd HH:mm:ss").alias("bar"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
        .orderBy("bar", "event_type")
    )


@register(
    "ab_test_conversion",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN md5(CAST(user_id AS VARCHAR)) < '8' THEN 'A' ELSE 'B' END AS arm,
             CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
             CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS BIGINT) AS conv_b
      FROM assign
    )
    SELECT n_a, conv_a, n_b, conv_b,
           round(conv_a * 1.0 / n_a, 6) AS rate_a,
           round(conv_b * 1.0 / n_b, 6) AS rate_b,
           CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
             round((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
                   / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                          * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                          * (1.0 / n_a + 1.0 / n_b)), 6)
           END AS z_score
    FROM arms
    """,
)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically hash-split into
    two arms (md5 first-nibble threshold — the same engine-stable
    assignment trick as deterministic_hash_sample, so re-runs and
    backfills agree), per-arm purchase-conversion rates, and the
    pooled two-proportion z statistic the analyst compares to ±1.96.

    Conversion is "14+ purchases" (every synthetic user purchases at
    least once, so a has-purchase flag would saturate both arms at 1.0
    and zero the pooled variance — ANSI Spark then raises on the 0/0).
    The z column is NULL when the pool is degenerate (all or none
    converted), guarded identically in both engines.

    One scan: per-user conversion flags come from a user-keyed
    hash-agg (map-side partials), the arm rollup is a 1-row conditional
    aggregate of that, and the z arithmetic runs once on exact integer
    counts — no doubles accumulate, both engines agree bit-for-bit."""
    e = load(spark, sf_dir).events
    arm = F.when(F.md5(F.col("user_id").cast("string")) < "8", "A").otherwise("B")
    assign = e.groupBy("user_id").agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 14, 1
        )
        .otherwise(0)
        .alias("converted")
    ).withColumn("arm", arm)
    arms = assign.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    ra = F.col("conv_a") / F.col("n_a")
    rb = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    z = (ra - rb) / F.sqrt(pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    n_conv = F.col("conv_a") + F.col("conv_b")
    n_all = F.col("n_a") + F.col("n_b")
    return arms.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.when((n_conv > 0) & (n_conv < n_all), F.round(z, 6)).alias("z_score"),
    )


@register(
    "target_mean_encoding",
    oracle="""
    WITH cat AS (
      SELECT o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY o_orderpriority
    ),
    overall AS (SELECT CAST(sum(sum_price) AS DOUBLE) AS gsum,
                       CAST(sum(n_orders) AS BIGINT) AS gn FROM cat)
    SELECT priority, n_orders,
           round(sum_price, 2) AS sum_price,
           round((sum_price + 10.0 * (gsum / gn)) / (n_orders + 10.0), 6)
               AS enc_smoothed
    FROM cat CROSS JOIN overall
    ORDER BY priority
    """,
)
def target_mean_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target-mean encoding (the leakage-prone trick done
    right): each o_orderpriority category encoded as the shrinkage
    blend (sum_cat + m·global_mean) / (n_cat + m), m=10 — rare
    categories pull toward the global mean instead of memorizing noise.

    One fact scan; category sums go through DECIMAL (the money_sum
    canon) so the per-category totals are exact rationals and the
    global mean is derived sum/count — every double in the encoding
    expression is identical in both engines. The encoder output is a
    category-sized broadcastable mapping table, the standard shape for
    joining back onto a 100 TB training set."""
    o = load(spark, sf_dir).orders
    # 5-row category table; checkpoint so the global-mean regroup and
    # the encoder projection don't each re-scan orders.
    cat = (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
            .cast("double")
            .alias("sum_price"),
        )
        .localCheckpoint(eager=True)
    )
    glob = cat.agg(
        F.sum("sum_price").cast("double").alias("gsum"), F.sum("n_orders").alias("gn")
    )
    enc = (F.col("sum_price") + 10.0 * (F.col("gsum") / F.col("gn"))) / (
        F.col("n_orders") + 10.0
    )
    return (
        cat.crossJoin(F.broadcast(glob))
        .select(
            "priority",
            "n_orders",
            F.round("sum_price", 2).alias("sum_price"),
            F.round(enc, 6).alias("enc_smoothed"),
        )
        .orderBy("priority")
    )


@register(
    "chi2_feature_association",
    oracle="""
    WITH cells AS (
      SELECT c_mktsegment AS segment,
             CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS pos,
             count(*) AS n
      FROM customer GROUP BY 1, 2
    ),
    rt AS (SELECT segment, CAST(sum(n) AS BIGINT) AS row_n FROM cells GROUP BY segment),
    ct AS (SELECT pos, CAST(sum(n) AS BIGINT) AS col_n FROM cells GROUP BY pos),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM cells)
    SELECT segment, pos, CAST(n AS BIGINT) AS n_obs,
           round(row_n * col_n * 1.0 / t, 6) AS n_exp,
           round(pow(n - row_n * col_n * 1.0 / t, 2)
                 / (row_n * col_n * 1.0 / t), 6) AS chi2_term
    FROM cells JOIN rt USING (segment) JOIN ct USING (pos) CROSS JOIN tot
    ORDER BY segment, pos
    """,
)
def chi2_feature_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square feature/label association (the filter-method feature
    selector): contingency of c_mktsegment × sign(c_acctbal) with the
    per-cell (obs − exp)²/exp contribution in long format — the
    consumer sums chi2_term against chi-square((r−1)(c−1)) to rank
    features before training.

    One scan builds the cell counts (segments × 2 hash-agg); marginals
    and the total are regroups of that tiny table, expectations are
    exact integer ratios, and the chi2 arithmetic is per-cell — no
    accumulated doubles anywhere (the same long-format determinism
    pattern as dq_distribution_drift's psi_term)."""
    c = load(spark, sf_dir).customer
    cells = (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("pos"),
        )
        .groupBy("segment", "pos")
        .agg(F.count(F.lit(1)).alias("n"))
        # <=10 rows; checkpoint so the three regroups below don't re-scan.
        .localCheckpoint(eager=True)
    )
    rt = cells.groupBy("segment").agg(F.sum("n").alias("row_n"))
    ct = cells.groupBy("pos").agg(F.sum("n").alias("col_n"))
    tot = cells.agg(F.sum("n").alias("t"))
    exp = F.col("row_n") * F.col("col_n") / F.col("t")
    return (
        cells.join(F.broadcast(rt), "segment")
        .join(F.broadcast(ct), "pos")
        .crossJoin(F.broadcast(tot))
        .select(
            "segment",
            "pos",
            F.col("n").alias("n_obs"),
            F.round(exp, 6).alias("n_exp"),
            F.round(F.pow(F.col("n") - exp, 2) / exp, 6).alias("chi2_term"),
        )
        .orderBy("segment", "pos")
    )


@register(
    "groupwise_ols_trend",
    oracle="""
    WITH pts AS (
      SELECT n_name,
             CAST(year(o_orderdate) - 1995 AS BIGINT) AS x,
             CAST(o_totalprice AS DECIMAL(28,4)) AS y
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    ),
    sums AS (
      SELECT n_name,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * y) AS DOUBLE) AS sxy
      FROM pts GROUP BY n_name
    )
    SELECT n_name, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
               AS intercept
    FROM sums ORDER BY n_name
    """,
)
def groupwise_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Many-models regression: per-nation closed-form OLS of order
    value against (centered) order year — slope = yearly revenue trend
    per market, the grouped-regression shape that fits millions of
    per-key models in ONE aggregation pass instead of millions of
    MLlib fits.

    The moment sums (n, Σx, Σx², Σy, Σxy) are the entire sufficient
    statistic: x is a small centered integer and the y sums go through
    DECIMAL (money canon), so every sum is an exact rational; the
    decimal→double conversion is IEEE round-to-nearest of the same
    exact value in both engines and the slope/intercept arithmetic is
    one fixed-order expression — bit-identical results. The dim joins
    carry no forced hints (customer is SF-proportional — AQE broadcasts
    when it fits); the only guaranteed fact shuffle is the final
    25-group agg's."""
    t = load(spark, sf_dir)
    pts = (
        t.orders.join(
            t.customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            (F.year("o_orderdate") - 1995).cast("long").alias("x"),
            F.col("o_totalprice").cast("decimal(28,4)").alias("y"),
        )
    )
    sums = pts.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "n_name",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    ).orderBy("n_name")


@register(
    "conversion_latency_quantiles",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS first_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.first_signup
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT CAST(isodow(s.first_signup) AS INT) AS signup_dow,
             CAST(date_diff('microsecond', s.first_signup, p.first_purchase)
                  AS BIGINT) AS latency_us
      FROM s JOIN p USING (user_id)
    )
    SELECT signup_dow,
           CAST(count(*) AS BIGINT) AS n_conversions,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY latency_us) / 1e6, 6)
               AS p50_latency_s,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY latency_us) / 1e6, 6)
               AS p90_latency_s
    FROM lat GROUP BY signup_dow ORDER BY signup_dow
    """,
)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: exact p50/p90 of the first-signup →
    first-subsequent-purchase latency, grouped by signup weekday — the
    funnel-latency readout product teams watch, with EXACT interpolated
    percentiles at any scale via the sketch-bracketed selection helper
    (`exact_group_percentiles` — no per-group whole-column agg buffer).

    Latencies rank as exact integer microsecond differences; the
    engines' percentile interpolations can differ in the last ulp
    (different a·(1−f)+b·f orderings), so the OUTPUT is seconds —
    dividing by 1e6 puts the 6-decimal rounding four orders above the
    ulp noise. Joins partition on user_id (the aggregates already
    shuffled there)."""
    from data_warehouse_data_mining_spark.operators.relational import (
        exact_group_percentiles,
    )

    e = load(spark, sf_dir).events
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(
            s.select(F.col("user_id").alias("s_uid"), "first_signup"),
            (F.col("user_id") == F.col("s_uid")) & (F.col("ts") > F.col("first_signup")),
        )
        .groupBy(F.col("user_id").alias("p_uid"))
        .agg(F.min("ts").alias("first_purchase"))
    )
    lat = (
        s.join(p, F.col("user_id") == F.col("p_uid"))
        .select(
            (F.weekday("first_signup") + 1).cast("int").alias("signup_dow"),
            (F.unix_micros("first_purchase") - F.unix_micros("first_signup")).alias(
                "latency_us"
            ),
        )
        # converted-users-sized; the percentile helper makes three passes
        # (sketch, counting, bracket rank) and the count regroup a fourth —
        # checkpoint so none of them re-runs the two event joins.
        .localCheckpoint(eager=True)
    )
    per_p = exact_group_percentiles(lat, "signup_dow", "latency_us", [0.5, 0.9])
    counts = lat.groupBy("signup_dow").agg(F.count(F.lit(1)).alias("n_conversions"))
    return (
        per_p.groupBy("signup_dow")
        .pivot("pid", [0, 1])
        .agg(F.first("val"))
        .join(F.broadcast(counts), "signup_dow")
        .select(
            "signup_dow",
            "n_conversions",
            F.round(F.col("0") / 1e6, 6).alias("p50_latency_s"),
            F.round(F.col("1") / 1e6, 6).alias("p90_latency_s"),
        )
        .orderBy("signup_dow")
    )


@register(
    "survival_km_curve",
    oracle="""
    WITH spans AS (
      SELECT user_id,
             CAST(date_trunc('day', min(ts)) AS DATE) AS first_day,
             CAST(date_trunc('day', max(ts)) AS DATE) AS last_day
      FROM events GROUP BY user_id
    ),
    bounds AS (SELECT CAST(date_trunc('day', max(ts)) AS DATE) AS end_day FROM events),
    lives AS (
      SELECT CAST(date_diff('day', first_day, last_day) AS BIGINT) AS t_days,
             CASE WHEN date_diff('day', last_day, end_day) < 14 THEN 0 ELSE 1 END
               AS churned
      FROM spans CROSS JOIN bounds
    ),
    per_t AS (
      SELECT t_days,
             CAST(sum(churned) AS BIGINT) AS n_churned,
             CAST(sum(1 - churned) AS BIGINT) AS n_censored,
             CAST(count(*) AS BIGINT) AS n_total
      FROM lives GROUP BY t_days
    ),
    risk AS (
      SELECT t_days, n_churned, n_censored,
             CAST(sum(n_total) OVER (ORDER BY t_days ROWS BETWEEN CURRENT ROW
                    AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      FROM per_t
    )
    SELECT t_days, n_risk, n_churned, n_censored,
           round(exp(sum(CASE WHEN n_churned > 0
                              THEN ln(1 - n_churned * 1.0 / n_risk)
                              ELSE 0.0 END)
                     OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)), 6) AS km_survival
    FROM risk ORDER BY t_days
    """,
)
def survival_km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival (product-limit) estimate of user lifetime:
    per distinct lifetime-day, the at-risk count (reverse cumulative),
    churn/censor counts, and S(t) = Π_{s≤t} (1 − d_s/n_s) — retention
    survival with right-censoring (users last seen within 14 days of
    the dataset end may still be active and only leave the risk set).

    The event stream collapses to one row per user (one user_id
    shuffle), then to one row per distinct lifetime-day, so both
    windows run over a ~hundreds-row table (manifest-sized-window
    argument). The product is exp of a running ln-sum; terms are exact
    integer ratios, the sum is O(100) values of O(1), so the 1e-16-ulp
    window-tree differences between engines sit ~8 orders below the
    6-decimal rounding."""
    e = load(spark, sf_dir).events
    spans = e.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("first_day"),
        F.to_date(F.max("ts")).alias("last_day"),
    )
    bounds = e.agg(F.to_date(F.max("ts")).alias("end_day"))
    lives = spans.crossJoin(F.broadcast(bounds)).select(
        F.datediff("last_day", "first_day").cast("long").alias("t_days"),
        F.when(F.datediff("end_day", "last_day") < 14, 0).otherwise(1).alias("churned"),
    )
    per_t = (
        lives.groupBy("t_days")
        .agg(
            F.sum("churned").alias("n_churned"),
            F.sum(1 - F.col("churned")).alias("n_censored"),
            F.count(F.lit(1)).alias("n_total"),
        )
        # distinct-lifetime-sized; checkpoint so the two windows below
        # don't each re-run the user collapse.
        .localCheckpoint(eager=True)
    )
    w_risk = W.orderBy("t_days").rowsBetween(W.currentRow, W.unboundedFollowing)
    w_km = W.orderBy("t_days").rowsBetween(W.unboundedPreceding, W.currentRow)
    risk = per_t.withColumn("n_risk", F.sum("n_total").over(w_risk))
    ln_term = F.when(
        F.col("n_churned") > 0, F.log(1 - F.col("n_churned") / F.col("n_risk"))
    ).otherwise(0.0)
    return risk.select(
        "t_days",
        "n_risk",
        "n_churned",
        "n_censored",
        F.round(F.exp(F.sum(ln_term).over(w_km)), 6).alias("km_survival"),
    ).orderBy("t_days")


@register(
    "cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(n_events) AS BIGINT) AS n_tot FROM daily),
    cus AS (
      SELECT day, n_events,
             CAST(sum(n_days * n_events - n_tot)
                  OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS cusum_scaled
      FROM daily CROSS JOIN tot
    ),
    peak AS (SELECT max(abs(cusum_scaled)) AS peak_abs FROM cus)
    SELECT day, n_events, cusum_scaled,
           CASE WHEN abs(cusum_scaled) = peak_abs THEN 1 ELSE 0 END AS is_changepoint
    FROM cus CROSS JOIN peak
    ORDER BY day
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on the daily event rate: the
    cumulative sum of deviations from the global mean peaks (in
    absolute value) at the most likely level-shift day — the classic
    single-change-point estimator, flagged per day.

    Deviations stay in INTEGER space: cusum_k = Σ(n_days·y_i − n_tot)
    is the ×n_days-scaled deviation sum, so no double ever exists and
    both engines agree exactly. The fact scan collapses to a days-sized
    table first; both the running window and the 1-row peak regroup
    run over that (checkpointed once)."""
    e = load(spark, sf_dir).events
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=True)
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("n_events").alias("n_tot")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    cus = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn(
            "cusum_scaled",
            F.sum(
                F.col("n_days") * F.col("n_events") - F.col("n_tot")
            ).over(w),
        )
        .localCheckpoint(eager=True)
    )
    peak = cus.agg(F.max(F.abs(F.col("cusum_scaled"))).alias("peak_abs"))
    return (
        cus.crossJoin(F.broadcast(peak))
        .select(
            "day",
            "n_events",
            "cusum_scaled",
            F.when(F.abs(F.col("cusum_scaled")) == F.col("peak_abs"), 1)
            .otherwise(0)
            .alias("is_changepoint"),
        )
        .orderBy("day")
    )


@register(
    "funnel_three_step",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS t_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s.t_signup
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_signup,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase,
           round((SELECT count(*) FROM c) * 1.0
                 / (SELECT count(*) FROM s), 6) AS click_rate,
           round((SELECT count(*) FROM p) * 1.0
                 / (SELECT count(*) FROM c), 6) AS purchase_rate
    """,
)
def funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered three-step funnel (signup → later click → later
    purchase): each stage's earliest qualifying timestamp must follow
    the previous stage's, the sequential-conversion shape one window
    short of full funnel analytics tools.

    Each stage is a user-keyed filter+agg joined to the previous
    stage's (user, ts) — all three joins and aggs partition on
    user_id, so after the first shuffle every stage is co-partitioned;
    the final readout is three 1-row counts. All integers until two
    final exact-ratio divisions."""
    e = load(spark, sf_dir).events
    # each stage table is users-sized and feeds BOTH the next stage's
    # join and its own count — checkpoint so the event scan per stage
    # happens once instead of once per downstream consumer.
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
        .localCheckpoint(eager=True)
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s.withColumnRenamed("user_id", "s_uid"),
              (F.col("user_id") == F.col("s_uid")) & (F.col("ts") > F.col("t_signup")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .localCheckpoint(eager=True)
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c.withColumnRenamed("user_id", "c_uid"),
              (F.col("user_id") == F.col("c_uid")) & (F.col("ts") > F.col("t_click")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    ns = s.agg(F.count(F.lit(1)).alias("n_signup"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase"))
    return (
        ns.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_signup",
            "n_click",
            "n_purchase",
            F.round(F.col("n_click") / F.col("n_signup"), 6).alias("click_rate"),
            F.round(F.col("n_purchase") / F.col("n_click"), 6).alias("purchase_rate"),
        )
    )


@register(
    "session_bounce_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    numbered AS (
      SELECT user_id,
             sum(CASE WHEN gap_us IS NULL OR gap_us > 14400000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_n
      FROM seq
    ),
    sessions AS (
      SELECT user_id, session_n, count(*) AS n_events
      FROM numbered GROUP BY user_id, session_n
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS bounce_rate,
           round(sum(n_events) * 1.0 / count(*), 6) AS avg_session_events
    FROM sessions
    """,
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-quality readout over the gap-based sessionization (same
    4 h boundary as sessionize_events): bounce rate (single-event
    sessions) and mean session depth — the engagement KPI pair on top
    of the session table. Everything stays in the one user_id
    shuffle the sessionizer already pays; the readout is a 1-row
    integer aggregate with exact-ratio divisions."""
    e = load(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    numbered = e.withColumn(
        "session_n",
        F.sum(F.when(gap.isNull() | (gap > 14_400_000_000), 1).otherwise(0)).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    sessions = numbered.groupBy("user_id", "session_n").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return sessions.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounce.alias("n_bounces"),
        F.round(bounce / F.count(F.lit(1)), 6).alias("bounce_rate"),
        F.round(F.sum("n_events") / F.count(F.lit(1)), 6).alias(
            "avg_session_events"
        ),
    )


@register(
    "time_decay_ltv",
    oracle="""
    WITH ref AS (SELECT max(ts) AS now_ts FROM events),
    scored AS (
      SELECT user_id,
             value * exp(-0.05 * (date_diff('microsecond', ts, now_ts)
                                  / 86400000000.0)) AS decayed
      FROM events CROSS JOIN ref
      WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(decayed), 4) AS decayed_ltv
    FROM scored GROUP BY user_id
    ORDER BY round(sum(decayed), 4) DESC, user_id
    LIMIT 50
    """,
)
def time_decay_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay customer value (half-life ≈ 14 days,
    λ=0.05/day): each purchase contributes value·e^(−λ·age) against
    the dataset's reference time — the recency-weighted LTV ranking
    marketing scores segments by, and the batch analogue of a
    streaming decayed counter.

    One scan with an early event_type pushdown filter; ages are exact
    integer microseconds scaled by one division, so each per-row decay
    factor is the same IEEE double in both engines. Per-user sums
    accumulate ~tens of O(1) doubles — 1e-14 error against 4-decimal
    rounding. Top-50 ordered by the ROUNDED value (then user) so the
    cut can't flip on summation-order ulps."""
    e = load(spark, sf_dir).events
    ref = e.agg(F.max("ts").alias("now_ts"))
    age_days = (F.unix_micros("now_ts") - F.unix_micros("ts")) / 86_400_000_000.0
    scored = (
        e.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(ref))
        .select("user_id", (F.col("value") * F.exp(-0.05 * age_days)).alias("decayed"))
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("decayed"), 4).alias("decayed_ltv"),
        )
        .orderBy(F.col("decayed_ltv").desc(), "user_id")
        .limit(50)
    )


@register(
    "activity_heatmap",
    oracle="""
    SELECT CAST(isodow(ts) AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity heatmap (events + distinct users per
    cell) — the load-profile matrix behind capacity planning and
    anomaly baselines. One scan, 168-cell hash-agg; the distinct count
    shuffles on (dow, hour, user) partials first, never holding a
    per-cell user set in one task."""
    e = load(spark, sf_dir).events
    return (
        e.groupBy(
            (F.weekday("ts") + 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("dow", "hour_of_day")
    )


@register(
    "gaps_islands_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    anchored AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', day)
               - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, island, CAST(count(*) AS BIGINT) AS streak_len
      FROM anchored GROUP BY user_id, island
    )
    SELECT streak_len,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM streaks
    GROUP BY streak_len
    ORDER BY streak_len
    """,
)
def gaps_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user,
    reduced to a streak-length distribution (how many runs of exactly N
    consecutive active days exist, and how many users have one).

    The classic SQL pattern — anchor = day_number − row_number is
    constant within a run of consecutive days — needs only a window
    partitioned BY USER, so it parallelizes perfectly: one shuffle on
    user_id, then two hash-aggs. Day arithmetic is done on integer
    epoch-day anchors so both engines agree exactly."""
    e = load(spark, sf_dir).events
    days = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    anchored = days.select(
        "user_id",
        (
            F.datediff("day", F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("island"),
    )
    streaks = anchored.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return (
        streaks.groupBy("streak_len")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("streak_len")
    )


@register(
    "acf_daily_orders",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT l.lag AS lag_days, d1.n AS x, d2.n AS y
      FROM daily d1
      CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
      JOIN daily d2 ON d2.day = d1.day + CAST(l.lag AS INT)
    ),
    m AS (
      -- DECIMAL(38,0) moments: int64 sits at ~93% of range for the
      -- squared sums at extreme scale (the gini precedent)
      SELECT lag_days,
             CAST(count(*)   AS DECIMAL(38,0)) AS np,
             CAST(sum(x)     AS DECIMAL(38,0)) AS sx,
             CAST(sum(y)     AS DECIMAL(38,0)) AS sy,
             CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy,
             CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(y * y) AS DECIMAL(38,0)) AS syy
      FROM pairs GROUP BY lag_days
    )
    SELECT CAST(lag_days AS BIGINT) AS lag_days,
           CAST(np AS BIGINT) AS n_pairs,
           CASE WHEN CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                 AND CAST(np AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                THEN round((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / sqrt((CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                  * (CAST(np AS DOUBLE) * CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                ELSE 0.0 END AS acf
    FROM m
    ORDER BY lag_days
    """,
)
def acf_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily order-count series at lags 1..7 —
    the weekly-seasonality diagnostic (a spike at lag 7 = weekly cycle).

    The series is built once (one scan, day hash-agg), the 7 lags come
    from ONE self-join: the left side explodes each day into (day,
    lag→match_day) probes, so every lag shares a single shuffle instead
    of 7 joins. Pearson correlation per lag is assembled from exact
    integer moment sums (Σx, Σxy, …) — only the final ratio is floating
    point, computed identically from identical integers in both
    engines. Degenerate (zero-variance) lags report 0."""
    o = load(spark, sf_dir).orders
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        # days-sized; probe and match sides both read it — one scan
        .localCheckpoint(eager=True)
    )
    probes = daily.select(
        "day",
        F.col("n").alias("x"),
        F.explode(F.array(*[F.lit(i) for i in range(1, 8)])).alias("lag_days"),
    ).withColumn("match_day", F.date_add("day", F.col("lag_days")))
    pairs = probes.join(
        daily.select(F.col("day").alias("match_day"), F.col("n").alias("y")),
        "match_day",
    )
    # moments accumulate in DECIMAL(38,0) (exact at any scale — int64
    # squared-sums overflow around SF 1e5); the corr ratio converts the
    # exact decimals to double identically in both engines
    m = pairs.groupBy("lag_days").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("np"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    d = {c: F.col(c).cast("double") for c in ("np", "sx", "sy", "sxy", "sxx", "syy")}
    varx = d["np"] * d["sxx"] - d["sx"] * d["sx"]
    vary = d["np"] * d["syy"] - d["sy"] * d["sy"]
    cov = d["np"] * d["sxy"] - d["sx"] * d["sy"]
    return m.select(
        F.col("lag_days").cast("long").alias("lag_days"),
        F.col("np").cast("long").alias("n_pairs"),
        F.when(
            (varx > 0) & (vary > 0),
            F.round(cov / F.sqrt(varx * vary), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("acf"),
    ).orderBy("lag_days")


@register(
    "xyz_demand_variability",
    oracle="""
    WITH weekly AS (
      SELECT l_partkey AS pk, date_trunc('week', l_shipdate) AS wk,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    m AS (
      SELECT pk,
             CAST(count(*)  AS BIGINT) AS n,
             CAST(sum(q)    AS BIGINT) AS sq,
             CAST(sum(q * q) AS BIGINT) AS sqq
      FROM weekly GROUP BY pk
    ),
    classed AS (
      SELECT pk, sq,
             CASE WHEN 4 * (n * sqq - sq * sq) < sq * sq THEN 'X'
                  WHEN n * sqq - sq * sq < sq * sq THEN 'Y'
                  ELSE 'Z' END AS xyz_class,
             sqrt(CAST(n * sqq - sq * sq AS DOUBLE)) / sq AS cv
      FROM m
    )
    SELECT xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(sq) AS BIGINT) AS total_qty,
           round(min(cv), 6) AS min_cv,
           round(max(cv), 6) AS max_cv
    FROM classed
    GROUP BY xyz_class
    ORDER BY xyz_class
    """,
)
def xyz_demand_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification — the companion axis to ABC
    revenue classification (`abc_pareto_classification`): parts are X
    (steady, CV < 0.5), Y (variable, CV < 1.0) or Z (erratic) by the
    coefficient of variation of their weekly shipped quantity.

    Everything stays in exact integer moments (n, Σq, Σq² per part);
    the X/Y/Z boundary tests are the SQUARED inequalities — 4·(nΣq²−Σq²)
    vs Σq² — so classification never touches floating point and both
    engines agree on every boundary part. Only the reported min/max CV
    per class is a double (min/max are order-insensitive, unlike a
    mean, so they stay hash-stable). Two hash-aggs, one scan."""
    li = load(spark, sf_dir).lineitem
    weekly = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.date_trunc("week", "l_shipdate").alias("wk"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    m = weekly.groupBy("pk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
    )
    var_num = F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq")
    classed = m.select(
        "sq",
        F.when(4 * var_num < F.col("sq") * F.col("sq"), "X")
        .when(var_num < F.col("sq") * F.col("sq"), "Y")
        .otherwise("Z")
        .alias("xyz_class"),
        (F.sqrt(var_num.cast("double")) / F.col("sq")).alias("cv"),
    )
    return (
        classed.groupBy("xyz_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("sq").cast("long").alias("total_qty"),
            F.round(F.min("cv"), 6).alias("min_cv"),
            F.round(F.max("cv"), 6).alias("max_cv"),
        )
        .orderBy("xyz_class")
    )


def day_user_activity(events: DataFrame, checkpoint: bool = False) -> DataFrame:
    """(day, user_id, n_events, n_purch, is_new) — THE shared
    day×user activity grain: one events scan, one user_id-partitioned
    min() window marking each user's first-ever active day. Both
    `new_vs_returning` and `pipelines.py::daily_kpi_build` derive from
    this, so the new-user definition lives in exactly one place."""
    du = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purch"),
    )
    if checkpoint:
        du = du.localCheckpoint(eager=True)
    return du.select(
        "day",
        "user_id",
        "n_events",
        "n_purch",
        F.when(
            F.col("day") == F.min("day").over(W.partitionBy("user_id")), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )


@register(
    "new_vs_returning",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    flagged AS (
      SELECT day,
             CASE WHEN day = min(day) OVER (PARTITION BY user_id)
                  THEN 1 ELSE 0 END AS is_new
      FROM days
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(is_new) AS BIGINT) AS n_new,
           CAST(count(*) - sum(is_new) AS BIGINT) AS n_returning,
           round(sum(is_new) * 1.0 / count(*), 6) AS new_pct
    FROM flagged
    GROUP BY day
    ORDER BY day
    """,
)
def new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split — the acquisition/retention
    topline: a user is 'new' on their first-ever active day and
    'returning' on every later one.

    One shuffle total: the first-seen day comes from a min() window
    partitioned by user over the (user, day) activity grain
    (day_user_activity — shared with daily_kpi_build so the new-user
    definition cannot drift), then a day-level hash-agg. At 100 TB the
    day×user collapse does the heavy lifting and everything after is
    day-cardinality."""
    flagged = day_user_activity(load(spark, sf_dir).events)
    return (
        flagged.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum("is_new").cast("long").alias("n_new"),
            (F.count(F.lit(1)) - F.sum("is_new")).cast("long").alias("n_returning"),
            F.round(F.sum("is_new") / F.count(F.lit(1)), 6).alias("new_pct"),
        )
        .orderBy("day")
    )


@register(
    "multitouch_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, ts AS pts, event_id AS pid FROM events
      WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts, event_id, event_type AS channel FROM events
      WHERE event_type IN ('view', 'click')
    ),
    touched AS (
      SELECT p.pid, t.channel, t.ts, t.event_id
      FROM p JOIN t ON t.user_id = p.user_id
        AND t.ts < p.pts AND t.ts >= p.pts - INTERVAL 7 DAY
    ),
    credited AS (
      SELECT pid, channel,
             row_number() OVER (PARTITION BY pid ORDER BY ts, event_id) AS r,
             CAST(count(*) OVER (PARTITION BY pid) AS BIGINT) AS n
      FROM touched
    ),
    long AS (
      SELECT 'first_touch' AS model, channel,
             CASE WHEN r = 1 THEN 10000 ELSE 0 END AS credit FROM credited
      UNION ALL
      SELECT 'last_touch', channel,
             CASE WHEN r = n THEN 10000 ELSE 0 END FROM credited
      UNION ALL
      SELECT 'linear', channel,
             10000 // n + CASE WHEN r <= 10000 % n THEN 1 ELSE 0 END
      FROM credited
    ),
    agg AS (
      SELECT model, channel,
             CAST(sum(CASE WHEN credit > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS credited_touches,
             CAST(sum(credit) AS BIGINT) AS credit_bp
      FROM long GROUP BY model, channel
    )
    SELECT model, channel, credited_touches, credit_bp,
           round(credit_bp * 1.0 /
                 CAST(sum(credit_bp) OVER (PARTITION BY model) AS BIGINT), 6)
             AS credit_share
    FROM agg
    ORDER BY model, channel
    """,
)
def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution under three models at once — first-touch,
    last-touch, linear — crediting each purchase's view/click
    touchpoints from the 7 days before it.

    Credit is integer basis points (10000 per purchase); the linear
    model uses largest-remainder quotas (earliest touches get the
    remainder), so every purchase's credit sums to exactly 10000 and
    the whole report is exact integers until the final share division —
    no floating-point credit drift at any scale. The touch↔purchase
    pairing is one watermark-bounded interval join on user_id (the
    stream-stream join's batch shape); per-purchase ranking partitions
    by purchase. Purchases with no prior touch carry no credit by
    design (the 'unattributed' line a real report would add)."""
    e = load(spark, sf_dir).events
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
    )
    t = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts", "event_id", F.col("event_type").alias("channel")
    )
    touched = t.join(
        p,
        (F.col("user_id") == F.col("p_uid"))
        & (F.col("ts") < F.col("pts"))
        & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
    )
    wp = W.partitionBy("pid")
    credited = touched.select(
        "pid",
        "channel",
        F.row_number().over(wp.orderBy("ts", "event_id")).alias("r"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
    )
    long = credited.selectExpr(
        "channel",
        "stack(3, "
        "'first_touch', CASE WHEN r = 1 THEN 10000L ELSE 0L END, "
        "'last_touch',  CASE WHEN r = n THEN 10000L ELSE 0L END, "
        "'linear',      10000L div n + CASE WHEN r <= 10000 % n THEN 1L ELSE 0L END"
        ") AS (model, credit)",
    )
    agg = long.groupBy("model", "channel").agg(
        F.sum((F.col("credit") > 0).cast("int")).cast("long").alias(
            "credited_touches"
        ),
        F.sum("credit").cast("long").alias("credit_bp"),
    )
    wm = W.partitionBy("model")  # 3x2 rows — bounded by construction
    return agg.select(
        "model",
        "channel",
        "credited_touches",
        "credit_bp",
        F.round(
            F.col("credit_bp") / F.sum("credit_bp").over(wm).cast("long"), 6
        ).alias("credit_share"),
    ).orderBy("model", "channel")


@register(
    "repeat_purchase_rate",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN prev_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           CAST(sum(CASE WHEN prev_ts IS NOT NULL
                          AND ts <= prev_ts + INTERVAL 30 DAY
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat_within_30d,
           round(sum(CASE WHEN prev_ts IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS repeat_rate,
           round(sum(CASE WHEN prev_ts IS NOT NULL
                           AND ts <= prev_ts + INTERVAL 30 DAY
                     THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS repeat_30d_rate
    FROM p
    """,
)
def repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase KPI: the share of purchases that are a user's
    2nd-or-later, and the share arriving within 30 days of that user's
    previous purchase — the loyalty/retention topline next to
    `cohort_retention`.

    One shuffle on user_id: a lag() window over each user's purchase
    stream marks repeats and their spacing; everything after is a
    single global aggregate of exact integer flags."""
    e = load(spark, sf_dir).events
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = p.select(
        "ts", F.lag("ts").over(w).alias("prev_ts")
    )
    is_rep = F.col("prev_ts").isNotNull().cast("int")
    is_rep30 = (
        F.col("prev_ts").isNotNull()
        & (F.col("ts") <= F.col("prev_ts") + F.expr("INTERVAL 30 DAY"))
    ).cast("int")
    return flagged.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(is_rep).cast("long").alias("n_repeat"),
        F.sum(is_rep30).cast("long").alias("n_repeat_within_30d"),
        F.round(F.sum(is_rep) / F.count(F.lit(1)), 6).alias("repeat_rate"),
        F.round(F.sum(is_rep30) / F.count(F.lit(1)), 6).alias(
            "repeat_30d_rate"
        ),
    )


@register(
    "order_gap_stats",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap
      FROM orders
    ),
    pc AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gap) AS BIGINT) AS s,
             CAST(min(gap) AS BIGINT) AS mn,
             CAST(max(gap) AS BIGINT) AS mx
      FROM g WHERE gap IS NOT NULL GROUP BY o_custkey
    ),
    nat AS (
      SELECT n.n_name AS nation,
             CAST(count(*) AS BIGINT) AS n_repeat_customers,
             CAST(sum(pc.n_gaps) AS BIGINT) AS n_gaps,
             CAST(sum(pc.s) AS BIGINT) AS s,
             CAST(min(pc.mn) AS BIGINT) AS min_gap_days,
             CAST(max(pc.mx) AS BIGINT) AS max_gap_days
      FROM pc
      JOIN customer c ON c.c_custkey = pc.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    )
    SELECT nation, n_repeat_customers, n_gaps,
           ((200 * s + n_gaps) // (2 * n_gaps)) / 100.0 AS avg_gap_days,
           min_gap_days, max_gap_days
    FROM nat
    ORDER BY nation
    """,
)
def order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order purchase-gap KPI per nation: for every customer with
    >=2 orders, the days between consecutive orders, rolled up to
    (repeat customers, gap count, avg/min/max gap days) by nation —
    the order-cadence complement to `repeat_purchase_rate` (event
    stream) and `cohort_retention` (monthly grid).

    Scale shape: one shuffle on o_custkey serves BOTH the lag() window
    and the per-customer pre-aggregate (same key, partitioning reused),
    so the customer join moves one row per repeat customer, not one per
    order; the 25-row nation dim broadcasts. The gap multiset depends
    only on each customer's sorted date multiset (ties share a date),
    so results are engine- and tie-break-independent. avg_gap_days is
    computed half-up to 2 decimals in EXACT integer arithmetic
    ((200*s + n) div (2*n) / 100.0) on both sides — no float-sum
    rounding hazard (ROADMAP numeric-parity playbook)."""
    t = load(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        t.orders.select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).cast("long").alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    per_cust = gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap").alias("s"),
        F.min("gap").alias("mn"),
        F.max("gap").alias("mx"),
    )
    nat = (
        per_cust.join(
            t.customer.select("c_custkey", "c_nationkey"),
            per_cust.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_repeat_customers"),
            F.sum("n_gaps").alias("n_gaps"),
            F.sum("s").alias("s"),
            F.min("mn").alias("min_gap_days"),
            F.max("mx").alias("max_gap_days"),
        )
    )
    return nat.select(
        "nation",
        "n_repeat_customers",
        "n_gaps",
        (
            F.expr("(200 * s + n_gaps) div (2 * n_gaps)") / F.lit(100.0)
        ).alias("avg_gap_days"),
        "min_gap_days",
        "max_gap_days",
    ).orderBy("nation")


@register(
    "peak_concurrent_sessions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(CASE WHEN gap_us IS NULL OR gap_us > 14400000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_n
      FROM seq
    ),
    sess AS (
      SELECT user_id * 1000000 + session_n AS sid,
             min(ts) AS s, max(ts) AS e
      FROM numbered GROUP BY user_id, session_n
    ),
    b AS (
      SELECT sid, epoch_us(s) * 2 AS k, 1 AS delta, s AS t FROM sess
      UNION ALL
      SELECT sid, epoch_us(e) * 2 + 1, -1, e FROM sess
    ),
    c AS (
      SELECT t, delta,
             CAST(sum(delta) OVER (ORDER BY k, sid
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
      FROM b
    )
    SELECT strftime(t, '%Y-%m-%d') AS day,
           CAST(max(conc) AS BIGINT) AS peak_concurrent,
           CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions_started
    FROM c GROUP BY day ORDER BY day
    """,
)
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous sessions per day — the capacity-planning KPI:
    sessionize events (same 4 h gap rule as sessionize_events), turn
    every session into a +1 boundary at its start and a -1 at its end
    (closed intervals: at an exact shared instant, starts are processed
    before ends, so back-to-back sessions count as overlapping), then
    sweep-line: concurrency after a boundary is the GLOBAL prefix sum of
    the deltas in time order, and a day's peak is the max over its
    boundaries (days with no boundary events don't emit a row).

    The global prefix sum is the textbook single-partition
    ``SUM() OVER (ORDER BY time)`` — computed here with the distributed
    two-phase prefix sum (operators/ranking.py). Epoch-microsecond sort
    keys make log2 bucketing degenerate (a year of timestamps shares one
    bucket), so this query passes an equal-width ``bucket_expr`` over
    the observed [kmin, kmax] span — 256 near-uniform buckets for
    near-uniform event time. Ties are fully ordered by (k, sid), where
    the boundary key k = 2·µs + {start: 0, end: 1} and sid is a unique
    session id, so both engines assign identical per-row prefix values
    (sid = user_id·10⁶ + session_n assumes < 10⁶ sessions per user —
    sessions per user are bounded by events per user)."""
    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
    )

    e = load(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    numbered = e.select(
        "user_id",
        "ts",
        F.sum(F.when(gap.isNull() | (gap > 14_400_000_000), 1).otherwise(0))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_n"),
    )
    sess = (
        numbered.groupBy("user_id", "session_n")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
        .select(
            (F.col("user_id") * 1_000_000 + F.col("session_n")).alias("sid"),
            "s",
            "e",
        )
    )
    b = (
        sess.select(
            "sid",
            (F.unix_micros("s") * 2).alias("k"),
            F.lit(1).alias("delta"),
            F.col("s").alias("t"),
        )
        .unionAll(
            sess.select(
                "sid",
                (F.unix_micros("e") * 2 + 1).alias("k"),
                F.lit(-1).alias("delta"),
                F.col("e").alias("t"),
            )
        )
        # boundary table feeds the bounds aggregate AND the ranked pass —
        # materialize once instead of re-sessionizing the event stream
        .localCheckpoint(eager=True)
    )
    bounds = b.agg(F.min("k").alias("kmin"), F.max("k").alias("kmax"))
    bb = b.crossJoin(F.broadcast(bounds))
    ranked = global_order_stats(
        bb,
        "k",
        "sid",
        measure_col="delta",
        ascending=True,
        bucket_expr=F.expr("(k - kmin) * 256 div (kmax - kmin + 1)"),
    )
    return (
        ranked.groupBy(F.date_format("t", "yyyy-MM-dd").alias("day"))
        .agg(
            F.max("global_cum").cast("long").alias("peak_concurrent"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_sessions_started"),
        )
        .orderBy("day")
    )


@register(
    "dau_mau_stickiness",
    oracle="""
    WITH base AS (
      SELECT DISTINCT strftime(ts, '%Y-%m') AS month,
             strftime(ts, '%Y-%m-%d') AS day,
             user_id
      FROM events
    ),
    dau AS (
      SELECT month, day, CAST(count(*) AS BIGINT) AS dau
      FROM base GROUP BY month, day
    ),
    mau AS (
      SELECT month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM base GROUP BY month
    )
    SELECT d.month, any_value(mau) AS mau,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(dau) AS BIGINT) AS sum_dau,
           round(sum(dau) * 1.0 / (count(*) * any_value(mau)), 6)
             AS stickiness
    FROM dau d JOIN mau m ON d.month = m.month
    GROUP BY d.month ORDER BY d.month
    """,
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per calendar month — the engagement KPI:
    average daily active users divided by monthly active users, plus the
    raw MAU / day-count / DAU-sum it derives from.

    One distinct pass over (month, day, user) feeds BOTH counts: DAU is
    a hash-agg of the distinct set by day, MAU a second distinct-agg of
    the same (user-day-sized, checkpointed) intermediate — the event
    table is scanned once no matter how many KPIs read it. Stickiness is
    one division of exact integer counts, computed as
    sum_dau/(n_days·mau) so only a single rounding step exists."""
    e = load(spark, sf_dir).events
    base = (
        e.select(
            F.date_format("ts", "yyyy-MM").alias("month"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "user_id",
        )
        .distinct()
        # user-day-sized; the DAU and MAU branches both read it
        .localCheckpoint(eager=True)
    )
    dau = base.groupBy("month", "day").agg(F.count(F.lit(1)).alias("dau"))
    mau = base.select("month", "user_id").distinct().groupBy("month").agg(
        F.count(F.lit(1)).alias("mau")
    )
    return (
        dau.join(mau, "month")
        .groupBy("month")
        .agg(
            F.first("mau").alias("mau"),
            F.count(F.lit(1)).alias("n_days"),
            F.sum("dau").cast("long").alias("sum_dau"),
            F.round(
                F.sum("dau") * 1.0 / (F.count(F.lit(1)) * F.first("mau")), 6
            ).alias("stickiness"),
        )
        .orderBy("month")
    )


@register(
    "match_recognize_funnel",
    oracle="""
    WITH enc AS (
      SELECT user_id,
             string_agg(upper(substr(event_type, 1, 1)), ''
                        ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT user_id, CAST(length(s) AS BIGINT) AS n_events,
             regexp_extract_all(s, 'S[CV]*P') AS runs
      FROM enc
    )
    SELECT user_id, n_events,
           CAST(length(runs) AS BIGINT) AS n_funnels,
           CAST(coalesce(list_max(list_transform(runs, x -> length(x))), 0)
                AS BIGINT) AS longest_funnel_len
    FROM m ORDER BY user_id
    """,
)
def match_recognize_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 MATCH_RECOGNIZE emulation — row-pattern matching over
    each user's event sequence. Events encode to one char each (Signup,
    Click, View, Purchase, Error); the pattern S[CV]*P finds completed
    signup→browse→purchase funnels where an intervening Error aborts
    the run — the quantified-regex-over-rows semantics that plain
    window functions can't express (funnel_three_step counts fixed
    3-step paths; this matches arbitrary-length runs).

    Spark has no MATCH_RECOGNIZE operator, so the scalable emulation
    is: one groupBy(user) shuffle, order each user's events INSIDE the
    aggregate (array_sort over (ts, event_id, ch) structs — collect_list
    alone is arrival-ordered, i.e. nondeterministic), join to a string,
    and run the regex per user — all codegen expressions, parallelism =
    #users. Per-user state is the encoded string (bounded by events per
    user); at stream scale the same pattern chunks by day with a
    carry-over prefix. Regex semantics (leftmost non-overlapping, greedy
    star) agree across engines because the alphabet classes are
    disjoint — no backtracking ambiguity exists."""
    e = load(spark, sf_dir).events
    enc = (
        e.select(
            "user_id",
            "ts",
            "event_id",
            F.upper(F.substring("event_type", 1, 1)).alias("ch"),
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(struct(ts, event_id, ch))), x -> x.ch), '')"
            ).alias("s")
        )
    )
    runs = F.expr("regexp_extract_all(s, 'S[CV]*P', 0)")
    return enc.select(
        "user_id",
        F.length("s").cast("long").alias("n_events"),
        F.size(runs).cast("long").alias("n_funnels"),
        F.coalesce(
            F.array_max(F.transform(runs, lambda x: F.length(x))), F.lit(0)
        )
        .cast("long")
        .alias("longest_funnel_len"),
    ).orderBy("user_id")


_CUPED_SPLIT = "2024-01-15 00:00:00"
_EV_CENTS = "CAST(round(value * 100, 0) AS BIGINT)"


@register(
    "ab_cuped_adjustment",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN md5(CAST(user_id AS VARCHAR)) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                           THEN {_EV_CENTS} ELSE 0 END) AS BIGINT) AS pre_c,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                           THEN {_EV_CENTS} ELSE 0 END) AS BIGINT) AS post_c
      FROM events GROUP BY user_id
    ),
    pooled AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pre_c) AS BIGINT) AS sp,
             CAST(sum(post_c) AS BIGINT) AS so,
             CAST(sum(pre_c * pre_c) AS BIGINT) AS spp,
             CAST(sum(pre_c * post_c) AS BIGINT) AS spo,
             CAST(sum(post_c * post_c) AS BIGINT) AS soo
      FROM per_user
    ),
    th AS (
      SELECT n, sp, so,
             CASE WHEN n * spp - sp * sp = 0 THEN 0.0
                  ELSE (CAST(n AS DOUBLE) * spo - CAST(sp AS DOUBLE) * so)
                       / (CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp)
             END AS theta,
             CASE WHEN (n * spp - sp * sp) = 0 OR (n * soo - so * so) = 0
                  THEN 0.0
                  ELSE pow(CAST(n AS DOUBLE) * spo
                           - CAST(sp AS DOUBLE) * so, 2)
                       / ((CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp)
                          * (CAST(n AS DOUBLE) * soo
                             - CAST(so AS DOUBLE) * so))
             END AS rho2
      FROM pooled
    ),
    arms AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(pre_c) AS BIGINT) AS sp_a,
             CAST(sum(post_c) AS BIGINT) AS so_a
      FROM per_user GROUP BY arm
    )
    SELECT arm, n_users,
           round(so_a * 1.0 / (n_users * 100), 6) AS mean_post,
           round(so_a * 1.0 / (n_users * 100)
                 - theta * (sp_a * 1.0 / (n_users * 100)
                            - sp * 1.0 / (n * 100)), 6) AS mean_adjusted,
           round(theta, 6) AS theta,
           round(rho2, 6) AS var_reduction
    FROM arms CROSS JOIN th
    ORDER BY arm
    """,
)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the hash-split experiment
    (ab_test_conversion's arms): each user's PRE-period spend (before
    2024-01-15) is the covariate, θ = cov(pre, post)/var(pre) is fit
    POOLED, and each arm reports its raw vs CUPED-adjusted mean with
    the achievable variance reduction ρ² — the standard trick that
    shrinks experiment runtimes ~(1-ρ²)× without touching assignment.

    Everything reduces to exact integer moment sums from ONE per-user
    aggregation pass (cents fixed-point, pooled + per-arm in two tiny
    rollups of the same user table), so θ/ρ²/means are single identical
    double expressions on both engines; degenerate variance pools guard
    to 0 with a CASE on the exact integer denominator (ANSI Spark
    raises on double/0 — the ab_test_conversion lesson)."""
    e = load(spark, sf_dir).events
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    cents = F.expr(_EV_CENTS)
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < split, cents).otherwise(0))
            .cast("long")
            .alias("pre_c"),
            F.sum(F.when(F.col("ts") >= split, cents).otherwise(0))
            .cast("long")
            .alias("post_c"),
        )
        .select(
            F.when(F.md5(F.col("user_id").cast("string")) < "8", "A")
            .otherwise("B")
            .alias("arm"),
            "pre_c",
            "post_c",
        )
        # user-count sized; pooled stats and per-arm rollup both read it
        .localCheckpoint(eager=True)
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre_c").cast("long").alias("sp"),
        F.sum("post_c").cast("long").alias("so"),
        F.sum(F.col("pre_c") * F.col("pre_c")).cast("long").alias("spp"),
        F.sum(F.col("pre_c") * F.col("post_c")).cast("long").alias("spo"),
        F.sum(F.col("post_c") * F.col("post_c")).cast("long").alias("soo"),
    )
    nd = F.col("n").cast("double")
    spd = F.col("sp").cast("double")
    sod = F.col("so").cast("double")
    var_pre = nd * F.col("spp") - spd * spd
    var_post = nd * F.col("soo") - sod * sod
    cov = nd * F.col("spo") - spd * sod
    th = pooled.select(
        "n",
        "sp",
        F.when(F.col("n") * F.col("spp") - F.col("sp") * F.col("sp") == 0, 0.0)
        .otherwise(cov / var_pre)
        .alias("theta"),
        F.when(
            (F.col("n") * F.col("spp") - F.col("sp") * F.col("sp") == 0)
            | (F.col("n") * F.col("soo") - F.col("so") * F.col("so") == 0),
            0.0,
        )
        .otherwise(F.pow(cov, 2) / (var_pre * var_post))
        .alias("rho2"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("pre_c").cast("long").alias("sp_a"),
        F.sum("post_c").cast("long").alias("so_a"),
    )
    mean_post = F.col("so_a") * 1.0 / (F.col("n_users") * 100)
    mean_pre_arm = F.col("sp_a") * 1.0 / (F.col("n_users") * 100)
    mean_pre_pool = F.col("sp") * 1.0 / (F.col("n") * 100)
    return (
        arms.crossJoin(F.broadcast(th))
        .select(
            "arm",
            "n_users",
            F.round(mean_post, 6).alias("mean_post"),
            F.round(
                mean_post - F.col("theta") * (mean_pre_arm - mean_pre_pool), 6
            ).alias("mean_adjusted"),
            F.round("theta", 6).alias("theta"),
            F.round("rho2", 6).alias("var_reduction"),
        )
        .orderBy("arm")
    )


@register(
    "running_drawdown",
    oracle="""
    WITH seq AS (
      SELECT o_custkey AS ck,
             CASE WHEN o_orderkey % 2 = 0
                  THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
                  ELSE -CAST(round(o_totalprice * 100, 0) AS BIGINT)
             END AS delta,
             o_orderdate, o_orderkey
      FROM orders
    ),
    bals AS (
      SELECT ck, o_orderdate, o_orderkey,
             CAST(sum(delta) OVER (PARTITION BY ck
                                   ORDER BY o_orderdate, o_orderkey
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS bal,
             CAST(row_number() OVER (PARTITION BY ck
                                     ORDER BY o_orderdate, o_orderkey)
                  AS BIGINT) AS rn
      FROM seq
    ),
    walk AS (
      SELECT ck, bal, rn,
             CAST(max(bal) OVER (PARTITION BY ck
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
      FROM bals
    )
    SELECT ck AS custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(max(peak - bal) AS BIGINT) AS max_drawdown_cents,
           CAST(max(peak) AS BIGINT) AS peak_balance_cents,
           CAST(arg_max(bal, rn) AS BIGINT) AS final_balance_cents
    FROM walk
    GROUP BY ck
    ORDER BY ck
    """,
)
def running_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per customer over the signed running balance
    (even orders credit, odd debit — capped_running_balance's ledger
    without the clamp): drawdown_t = running_peak_t − balance_t, and
    the report keeps each customer's worst drawdown, peak, and final
    balance — the financial risk statistic that needs a window OVER a
    window (running max of a running sum), which plain aggregation
    can't express.

    Both windows and the final rollup partition on custkey — one
    shuffle, one sort, exact integer cents end to end. The final
    balance is the last running sum, read with max_by over the time
    rank that rides the same window sort."""
    o = load(spark, sf_dir).orders
    seq = o.select(
        F.col("o_custkey").alias("ck"),
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"),
        )
        .otherwise(F.expr("-CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .alias("delta"),
        "o_orderdate",
        "o_orderkey",
    )
    w = (
        W.partitionBy("ck")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # two window levels: engines (and ANSI SQL) forbid nesting a window
    # call inside another window call, and both levels share one
    # (ck)-partitioned sort anyway
    bals = seq.select(
        "ck",
        "o_orderdate",
        "o_orderkey",
        F.sum("delta").over(w).cast("long").alias("bal"),
        F.row_number()
        .over(W.partitionBy("ck").orderBy("o_orderdate", "o_orderkey"))
        .cast("long")
        .alias("rn"),
    )
    walk = bals.select(
        "ck",
        "bal",
        "rn",
        F.max("bal").over(w).cast("long").alias("peak"),
    )
    return (
        walk.groupBy(F.col("ck").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max(F.col("peak") - F.col("bal"))
            .cast("long")
            .alias("max_drawdown_cents"),
            F.max("peak").cast("long").alias("peak_balance_cents"),
            F.expr("max_by(bal, rn)")
            .cast("long")
            .alias("final_balance_cents"),
        )
        .orderBy("custkey")
    )


_WF_WINDOW_US = 86_400_000_000  # 24 hours — spreads depths 1/2/3 on this data


@register(
    "window_funnel_bounded",
    oracle=f"""
    WITH anch AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id) AS s_us
      FROM events
    ),
    c AS (
      SELECT user_id, s_us,
             min(CASE WHEN event_type = 'click'
                       AND epoch_us(ts) > s_us
                       AND epoch_us(ts) <= s_us + {_WF_WINDOW_US}
                      THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id) AS c_us
      FROM anch
    ),
    per_user AS (
      SELECT t.user_id, t.s_us, t.c_us,
             min(CASE WHEN e.event_type = 'purchase'
                       AND epoch_us(e.ts) > t.c_us
                       AND epoch_us(e.ts) <= t.s_us + {_WF_WINDOW_US}
                      THEN epoch_us(e.ts) END) AS p_us
      FROM (SELECT DISTINCT user_id, s_us, c_us FROM c) t
      LEFT JOIN events e ON e.user_id = t.user_id
      GROUP BY t.user_id, t.s_us, t.c_us
    ),
    depths AS (
      SELECT CASE WHEN s_us IS NULL THEN 0
                  WHEN c_us IS NULL THEN 1
                  WHEN p_us IS NULL THEN 2
                  ELSE 3 END AS depth
      FROM per_user
    )
    SELECT CAST(depth AS INT) AS depth,
           CAST(count(*) AS BIGINT) AS n_users,
           round(count(*) * 1.0 / (SELECT count(*) FROM depths), 6)
             AS share_of_users
    FROM depths GROUP BY depth ORDER BY depth
    """,
)
def window_funnel_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded window funnel (ClickHouse windowFunnel semantics,
    anchored): from each user's FIRST signup, how deep does the strict
    signup→click→purchase chain get within 24 HOURS of the anchor?
    Reported as a depth histogram (0 = never signed up). Unbounded
    funnels (funnel_three_step) overstate conversion by joining events
    days apart; the bounded variant is the campaign/UX metric.

    One user_id shuffle carries everything: the signup anchor and the
    first qualifying click are two window passes over the same
    partition, the qualifying purchase folds in the final per-user
    aggregate, and all time bounds are exact integer µs comparisons."""
    e = load(spark, sf_dir).events
    w = W.partitionBy("user_id")
    anch = e.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
        F.min(
            F.when(F.col("event_type") == "signup", F.unix_micros("ts"))
        )
        .over(w)
        .alias("s_us"),
    )
    c = anch.withColumn(
        "c_us",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("t") > F.col("s_us"))
                & (F.col("t") <= F.col("s_us") + _WF_WINDOW_US),
                F.col("t"),
            )
        ).over(w),
    )
    per_user = c.groupBy("user_id").agg(
        F.first("s_us").alias("s_us"),
        F.first("c_us").alias("c_us"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("t") > F.col("c_us"))
                & (F.col("t") <= F.col("s_us") + _WF_WINDOW_US),
                F.col("t"),
            )
        ).alias("p_us"),
    )
    depths = per_user.select(
        F.when(F.col("s_us").isNull(), 0)
        .when(F.col("c_us").isNull(), 1)
        .when(F.col("p_us").isNull(), 2)
        .otherwise(3)
        .cast("int")
        .alias("depth")
    ).localCheckpoint(eager=True)
    t = depths.agg(F.count(F.lit(1)).alias("total"))
    return (
        depths.crossJoin(F.broadcast(t))
        .groupBy("depth")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.count(F.lit(1)) * 1.0 / F.first("total"), 6).alias(
                "share_of_users"
            ),
        )
        .orderBy("depth")
    )


_GAP_THRESHOLDS_H = (1, 4, 12)


@register(
    "sessionize_sensitivity",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    marks AS (
      SELECT CASE WHEN gap_us IS NULL OR gap_us > 1 * 3600000000
                  THEN 1 ELSE 0 END AS b1,
             CASE WHEN gap_us IS NULL OR gap_us > 4 * 3600000000
                  THEN 1 ELSE 0 END AS b4,
             CASE WHEN gap_us IS NULL OR gap_us > 12 * 3600000000
                  THEN 1 ELSE 0 END AS b12
      FROM seq
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(b1) AS BIGINT) AS s1,
             CAST(sum(b4) AS BIGINT) AS s4,
             CAST(sum(b12) AS BIGINT) AS s12
      FROM marks
    )
    SELECT CAST(gap_hours AS INT) AS gap_hours, n_sessions, n_events,
           round(n_events * 1.0 / n_sessions, 6) AS mean_session_events
    FROM (
      SELECT 1 AS gap_hours, s1 AS n_sessions, n_events FROM t
      UNION ALL SELECT 4, s4, n_events FROM t
      UNION ALL SELECT 12, s12, n_events FROM t
    )
    ORDER BY gap_hours
    """,
)
def sessionize_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-boundary sensitivity analysis: how many sessions (and
    events per session) the corpus yields at 1 h / 4 h / 12 h
    inactivity gaps — the parameter-tuning readout behind
    sessionize_events' fixed 4 h rule (a threshold where session count
    still swings steeply is a bad place to stand).

    The trick: a session COUNT doesn't need the session-id cumsum at
    all — every session has exactly one boundary row (first event or
    gap > threshold), so ALL thresholds are counted from ONE lag pass
    over ONE user_id shuffle, three conditional sums side by side.
    Gaps compare as exact integer microseconds; the sweep costs the
    same as a single sessionization."""
    e = load(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    marks = e.select(
        *[
            F.when(gap.isNull() | (gap > h * 3_600_000_000), 1)
            .otherwise(0)
            .alias(f"b{h}")
            for h in _GAP_THRESHOLDS_H
        ]
    )
    t = marks.agg(
        F.count(F.lit(1)).alias("n_events"),
        *[
            F.sum(f"b{h}").cast("long").alias(f"s{h}")
            for h in _GAP_THRESHOLDS_H
        ],
    )
    rows = None
    for h in _GAP_THRESHOLDS_H:
        r = t.select(
            F.lit(h).cast("int").alias("gap_hours"),
            F.col(f"s{h}").alias("n_sessions"),
            "n_events",
        )
        rows = r if rows is None else rows.unionAll(r)
    return rows.select(
        "gap_hours",
        "n_sessions",
        "n_events",
        F.round(F.col("n_events") * 1.0 / F.col("n_sessions"), 6).alias(
            "mean_session_events"
        ),
    ).orderBy("gap_hours")


@register(
    "event_burstiness",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS ss
      FROM hourly GROUP BY event_type
    )
    SELECT event_type, n_hours, s AS n_events,
           round(CAST(s AS DOUBLE) / n_hours, 6) AS mean_per_hour,
           round((CAST(ss AS DOUBLE) * n_hours - CAST(s AS DOUBLE) * s)
                 / (CAST(n_hours AS DOUBLE) * n_hours), 6) AS variance,
           round(((CAST(ss AS DOUBLE) * n_hours - CAST(s AS DOUBLE) * s)
                  / (CAST(n_hours AS DOUBLE) * n_hours))
                 / (CAST(s AS DOUBLE) / n_hours), 6) AS fano_factor
    FROM m ORDER BY event_type
    """,
)
def event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor = variance/mean of hourly counts) per
    event type over hours WITH activity: a Poisson-like steady stream
    sits near 1, clumpy/bursty traffic well above — the dispersion
    diagnostic that decides whether rate alarms (event_rate_anomalies)
    need burst-robust thresholds. Population variance assembles from
    exact integer moment sums (Σc, Σc²) over the hour-grain rollup, so
    both engines evaluate one identical double expression; two
    hash-aggs total, the second over (type × hours) rows."""
    e = load(spark, sf_dir).events
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    m = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    nh = F.col("n_hours").cast("double")
    sd = F.col("s").cast("double")
    var = (F.col("ss").cast("double") * F.col("n_hours") - sd * F.col("s")) / (
        nh * F.col("n_hours")
    )
    return m.select(
        "event_type",
        "n_hours",
        F.col("s").alias("n_events"),
        F.round(sd / F.col("n_hours"), 6).alias("mean_per_hour"),
        F.round(var, 6).alias("variance"),
        F.round(var / (sd / F.col("n_hours")), 6).alias("fano_factor"),
    ).orderBy("event_type")


@register(
    "abc_xyz_matrix",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000,
                                 0) AS BIGINT)) AS BIGINT) AS rev_fp
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, rev_fp,
             CAST(sum(rev_fp) OVER (ORDER BY rev_fp DESC, l_partkey
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_fp,
             CAST(sum(rev_fp) OVER () AS BIGINT) AS total_fp
      FROM rev
    ),
    abc AS (
      SELECT l_partkey,
             CASE WHEN cum_fp * 100 <= total_fp * 80 THEN 'A'
                  WHEN cum_fp * 100 <= total_fp * 95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    ),
    weekly AS (
      SELECT l_partkey AS pk, date_trunc('week', l_shipdate) AS wk,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    m AS (
      SELECT pk, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(q) AS BIGINT) AS sq,
             CAST(sum(q * q) AS BIGINT) AS sqq
      FROM weekly GROUP BY pk
    ),
    xyz AS (
      SELECT pk,
             CASE WHEN 4 * (n * sqq - sq * sq) < sq * sq THEN 'X'
                  WHEN n * sqq - sq * sq < sq * sq THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM m
    )
    SELECT a.abc_class, x.xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           a.abc_class || x.xyz_class AS cell,
           CASE a.abc_class || x.xyz_class
                WHEN 'AX' THEN 'automate'
                WHEN 'AY' THEN 'automate_buffered'
                WHEN 'AZ' THEN 'manual_review'
                WHEN 'CX' THEN 'bulk_reorder'
                WHEN 'CZ' THEN 'rationalize'
                ELSE 'standard' END AS policy
    FROM abc a JOIN xyz x ON x.pk = a.l_partkey
    GROUP BY a.abc_class, x.xyz_class
    ORDER BY a.abc_class, x.xyz_class
    """,
)
def abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ABC × XYZ inventory-policy matrix — the composition the two
    single-axis classifications exist FOR: revenue importance
    (abc_pareto_classification's distributed global cumsum) crossed
    with demand steadiness (xyz_demand_variability's squared-integer CV
    classes) yields the 9 planning cells and their standard policies
    (AX automate, AZ manual review, CZ rationalize/drop).

    Both classifications reuse their documented shapes over ONE
    lineitem source each (revenue agg + weekly-demand agg); the matrix
    join is part-keyed. Every boundary — the 80/95 revenue cuts and
    the 0.5/1.0 CV cuts — is an exact integer inequality, so the cell
    assignment is engine-identical part by part."""
    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
    )

    li = load(spark, sf_dir).lineitem
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(l_extendedprice * (1 - l_discount) * 10000,"
                    " 0) AS BIGINT)"
                )
            )
            .cast("long")
            .alias("rev_fp")
        )
        .localCheckpoint(eager=True)
    )
    ranked = global_order_stats(
        rev, "rev_fp", "l_partkey", measure_col="rev_fp", ascending=False
    )
    total = rev.agg(F.sum("rev_fp").cast("long").alias("total_fp"))
    abc = ranked.crossJoin(F.broadcast(total)).select(
        "l_partkey",
        F.when(F.col("global_cum") * 100 <= F.col("total_fp") * 80, "A")
        .when(F.col("global_cum") * 100 <= F.col("total_fp") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    weekly = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.date_trunc("week", "l_shipdate").alias("wk"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    m = weekly.groupBy("pk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
    )
    var_n = F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq")
    xyz = m.select(
        "pk",
        F.when(4 * var_n < F.col("sq") * F.col("sq"), "X")
        .when(var_n < F.col("sq") * F.col("sq"), "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    cell = F.concat(F.col("abc_class"), F.col("xyz_class"))
    return (
        abc.join(xyz, abc.l_partkey == xyz.pk)
        .groupBy("abc_class", "xyz_class")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .select(
            "abc_class",
            "xyz_class",
            "n_parts",
            cell.alias("cell"),
            F.when(cell == "AX", "automate")
            .when(cell == "AY", "automate_buffered")
            .when(cell == "AZ", "manual_review")
            .when(cell == "CX", "bulk_reorder")
            .when(cell == "CZ", "rationalize")
            .otherwise("standard")
            .alias("policy"),
        )
        .orderBy("abc_class", "xyz_class")
    )


_NEYMAN_BUDGET = 1000


@register(
    "neyman_allocation",
    oracle=f"""
    WITH m AS (
      SELECT c_nationkey AS nk,
             CAST(count(*) AS BIGINT) AS nh,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS s,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                      * CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS ss
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey
    ),
    w AS (
      SELECT nk, nh,
             sqrt((CAST(ss AS DOUBLE) * nh - CAST(s AS DOUBLE) * s))
               / nh * nh AS wt
      FROM m
    ),
    q AS (
      SELECT nk, nh, wt,
             {_NEYMAN_BUDGET} * wt / (SELECT sum(wt) FROM w) AS quota
      FROM w
    ),
    fl AS (
      SELECT nk, nh, wt, quota,
             CAST(floor(quota) AS BIGINT) AS base,
             quota - floor(quota) AS rem
      FROM q
    ),
    short AS (
      SELECT {_NEYMAN_BUDGET} - CAST(sum(base) AS BIGINT) AS k FROM fl
    ),
    ranked AS (
      SELECT nk, nh, quota, base,
             row_number() OVER (ORDER BY rem DESC, nk) AS rr
      FROM fl
    )
    SELECT nk AS nationkey, nh AS n_orders,
           round(quota, 6) AS exact_quota,
           CAST(base + CASE WHEN rr <= (SELECT k FROM short)
                            THEN 1 ELSE 0 END AS BIGINT) AS allocated
    FROM ranked
    ORDER BY nationkey
    """,
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal sample allocation: split a {_NEYMAN_BUDGET}-unit
    audit budget across nation strata proportional to N_h·S_h (stratum
    size × spend standard deviation) — the survey-design rule that
    minimizes estimator variance for a fixed budget, and the statistical
    sibling of token_budget_allocation's share-based split.

    S_h comes from exact integer moment sums (one joined aggregate);
    quotas are identical doubles on both engines, integerized with
    LARGEST REMAINDER (floor + top-k remainders, nation tiebreak) so
    allocations sum to exactly the budget. The remainder ranking runs
    over the ≤25-row strata table — bounded by construction."""
    t = load(spark, sf_dir)
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    m = (
        t.orders.join(t.customer, t.orders.o_custkey == t.customer.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).alias("nh"),
            F.sum(cents).cast("long").alias("s"),
            F.sum(cents * cents).cast("long").alias("ss"),
        )
        # strata-sized; weight, total-weight and ranking all read it
        .localCheckpoint(eager=True)
    )
    wt = (
        F.sqrt(
            F.col("ss").cast("double") * F.col("nh")
            - F.col("s").cast("double") * F.col("s")
        )
        / F.col("nh")
        * F.col("nh")
    )
    w = m.select("nk", "nh", wt.alias("wt"))
    tot = w.agg(F.sum("wt").alias("twt"))
    q = w.crossJoin(F.broadcast(tot)).select(
        "nk",
        "nh",
        (F.lit(_NEYMAN_BUDGET) * F.col("wt") / F.col("twt")).alias("quota"),
    )
    fl = q.select(
        "nk",
        "nh",
        "quota",
        F.floor("quota").cast("long").alias("base"),
        (F.col("quota") - F.floor("quota")).alias("rem"),
    ).localCheckpoint(eager=True)
    short = fl.agg(
        (F.lit(_NEYMAN_BUDGET) - F.sum("base").cast("long")).alias("k")
    )
    wrk = W.orderBy(F.col("rem").desc(), F.col("nk"))  # ≤25 strata rows
    return (
        fl.withColumn("rr", F.row_number().over(wrk))
        .crossJoin(F.broadcast(short))
        .select(
            F.col("nk").alias("nationkey"),
            F.col("nh").alias("n_orders"),
            F.round("quota", 6).alias("exact_quota"),
            (
                F.col("base")
                + F.when(F.col("rr") <= F.col("k"), 1).otherwise(0)
            )
            .cast("long")
            .alias("allocated"),
        )
        .orderBy("nationkey")
    )


_LOOK_CUTS = ("2024-01-11 00:00:00", "2024-01-21 00:00:00", "2024-02-01 00:00:00")
_OBF_BOUNDS = (3.471, 2.454, 2.004)  # O'Brien-Fleming, 3 looks, two-sided 0.05


def _interim_oracle() -> str:
    looks = []
    for i, (cut, bound) in enumerate(zip(_LOOK_CUTS, _OBF_BOUNDS)):
        looks.append(f"""
      SELECT {i + 1} AS look, '{cut[:10]}' AS cutoff,
             CAST(sum(CASE WHEN arm = 'A' AND first_ts < TIMESTAMP '{cut}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN arm = 'A' AND conv_ts < TIMESTAMP '{cut}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(sum(CASE WHEN arm = 'B' AND first_ts < TIMESTAMP '{cut}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN arm = 'B' AND conv_ts < TIMESTAMP '{cut}'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c_b,
             CAST({bound} AS DOUBLE) AS boundary
      FROM per_user""")
    union = " UNION ALL ".join(looks)
    return f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN md5(CAST(user_id AS VARCHAR)) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             min(ts) AS first_ts,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS conv_ts
      FROM events GROUP BY user_id
    ),
    looks AS ({union}),
    z AS (
      SELECT look, cutoff, n_a, c_a, n_b, c_b, boundary,
             CASE WHEN n_a = 0 OR n_b = 0
                   OR (c_a + c_b) = 0 OR (c_a + c_b) = (n_a + n_b) THEN 0.0
                  ELSE (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
                       / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                              * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                              * (1.0 / n_a + 1.0 / n_b))
             END AS zval
      FROM looks
    )
    SELECT look, cutoff, n_a, c_a, n_b, c_b,
           round(zval, 6) AS z, boundary,
           CASE WHEN abs(zval) > boundary THEN 1 ELSE 0 END AS crossed
    FROM z ORDER BY look
    """


@register(
    "ab_interim_monitoring",
    oracle=_interim_oracle(),
)
def ab_interim_monitoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential A/B monitoring: the hash-split experiment
    (ab_test_conversion's arms) evaluated at THREE interim looks (day
    10 / 20 / end) against O'Brien-Fleming z-boundaries (3.471 / 2.454
    / 2.004, two-sided α=0.05 over 3 looks) — the peeking-safe early-
    stop protocol; a naive fixed 1.96 cut at every look inflates false
    positives ~3×, which is the whole reason the spending boundaries
    exist.

    ONE per-user aggregate (first event, first conversion) feeds all
    looks; each look is a conditional sum over the same user table, and
    each z is the pooled two-proportion statistic over exact counts
    with the degenerate-pool guard (the ab_test_conversion lesson).
    Boundary crossings compare identical doubles against literal
    thresholds."""
    e = load(spark, sf_dir).events
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("conv_ts"),
        )
        .select(
            F.when(F.md5(F.col("user_id").cast("string")) < "8", "A")
            .otherwise("B")
            .alias("arm"),
            "first_ts",
            "conv_ts",
        )
        # user-count sized; all three looks read it
        .localCheckpoint(eager=True)
    )
    rows = None
    for i, (cut, bound) in enumerate(zip(_LOOK_CUTS, _OBF_BOUNDS)):
        cutc = F.lit(cut).cast("timestamp")
        r = per_user.agg(
            F.lit(i + 1).alias("look"),
            F.lit(cut[:10]).alias("cutoff"),
            F.sum(
                F.when((F.col("arm") == "A") & (F.col("first_ts") < cutc), 1)
                .otherwise(0)
            ).cast("long").alias("n_a"),
            F.sum(
                F.when((F.col("arm") == "A") & (F.col("conv_ts") < cutc), 1)
                .otherwise(0)
            ).cast("long").alias("c_a"),
            F.sum(
                F.when((F.col("arm") == "B") & (F.col("first_ts") < cutc), 1)
                .otherwise(0)
            ).cast("long").alias("n_b"),
            F.sum(
                F.when((F.col("arm") == "B") & (F.col("conv_ts") < cutc), 1)
                .otherwise(0)
            ).cast("long").alias("c_b"),
            F.lit(bound).alias("boundary"),
        )
        rows = r if rows is None else rows.unionAll(r)
    p = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    zval = F.when(
        (F.col("n_a") == 0)
        | (F.col("n_b") == 0)
        | (F.col("c_a") + F.col("c_b") == 0)
        | (F.col("c_a") + F.col("c_b") == F.col("n_a") + F.col("n_b")),
        0.0,
    ).otherwise(
        (
            F.col("c_a").cast("double") / F.col("n_a")
            - F.col("c_b").cast("double") / F.col("n_b")
        )
        / F.sqrt(p * (1 - p) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    )
    return rows.select(
        "look",
        "cutoff",
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.round(zval, 6).alias("z"),
        "boundary",
        F.when(F.abs(zval) > F.col("boundary"), 1).otherwise(0).alias(
            "crossed"
        ),
    ).orderBy("look")


@register(
    "training_set_pit_features",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER w AS rn,
             max(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_ts,
             last_value(CASE WHEN event_type = 'click' THEN value END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id AS label_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS label_ts,
           round(value, 2) AS label_value,
           CAST(rn - 1 AS BIGINT) AS n_prior_events,
           round(last_click_value, 2) AS last_click_value,
           CAST(CASE WHEN last_click_ts IS NOT NULL
                     THEN floor(date_part('epoch', ts)
                                - date_part('epoch', last_click_ts))
                END AS BIGINT) AS secs_since_click
    FROM seq
    WHERE event_type = 'purchase'
    ORDER BY user_id, label_event_id
    """,
)
def training_set_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct training-set assembly — the feature-store
    discipline that keeps label leakage out of ML data: for every
    purchase (the label event), every feature is computed over STRICTLY
    PRIOR events only (ROWS … 1 PRECEDING frames) — the as-of click
    value, the prior-event count, and the staleness of the last click.
    Using a plain groupBy-per-user aggregate here (the classic mistake)
    would fold post-label events into the features.

    One shuffle on user_id; all three features share the same
    partitioned sort, so Catalyst plans a single Sort + one Window
    operator — the PIT join at 100 TB is a window, not an interval
    join, when features and labels live on the same event log."""
    e = load(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prior = w.rowsBetween(W.unboundedPreceding, -1)
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    click_v = F.when(F.col("event_type") == "click", F.col("value"))
    seq = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        (F.row_number().over(w) - 1).cast("long").alias("n_prior_events"),
        F.max(click_ts).over(prior).alias("last_click_ts"),
        F.last(click_v, ignorenulls=True).over(prior).alias("last_click_value"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("label_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("label_ts"),
            F.round("value", 2).alias("label_value"),
            "n_prior_events",
            F.round("last_click_value", 2).alias("last_click_value"),
            # CAST(ts AS DOUBLE) keeps the microsecond fraction, matching
            # DuckDB's fractional date_part('epoch'); unix_timestamp()
            # would truncate each side first and drift by 1s when the
            # fractional parts wrap
            F.floor(
                F.col("ts").cast("double") - F.col("last_click_ts").cast("double")
            )
            .cast("long")
            .alias("secs_since_click"),
        )
        .orderBy("user_id", "label_event_id")
    )


@register(
    "ab_welch_ttest",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN md5(CAST(user_id AS VARCHAR)) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(sum({_EV_CENTS}) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN arm = 'A' THEN c ELSE 0 END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN arm = 'B' THEN c ELSE 0 END) AS BIGINT) AS sb,
             CAST(sum(CASE WHEN arm = 'A' THEN c * c ELSE 0 END) AS BIGINT) AS ssa,
             CAST(sum(CASE WHEN arm = 'B' THEN c * c ELSE 0 END) AS BIGINT) AS ssb
      FROM per_user
    ),
    x AS (
      SELECT na, nb,
             sa / (CAST(na AS DOUBLE) * 100) AS mean_a,
             sb / (CAST(nb AS DOUBLE) * 100) AS mean_b,
             (CAST(na AS DOUBLE) * ssa - CAST(sa AS DOUBLE) * sa)
               / (CAST(na AS DOUBLE) * (na - 1)) / 10000.0 / na AS sq_a,
             (CAST(nb AS DOUBLE) * ssb - CAST(sb AS DOUBLE) * sb)
               / (CAST(nb AS DOUBLE) * (nb - 1)) / 10000.0 / nb AS sq_b
      FROM m
    )
    SELECT na AS n_a, nb AS n_b,
           round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round(CASE WHEN sq_a + sq_b = 0 THEN 0.0
                      ELSE (mean_a - mean_b) / sqrt(sq_a + sq_b) END, 6)
             AS t_stat,
           round(CASE WHEN sq_a + sq_b = 0 THEN 0.0
                      ELSE (sq_a + sq_b) * (sq_a + sq_b)
                           / (sq_a * sq_a / (na - 1) + sq_b * sq_b / (nb - 1))
                 END, 6) AS welch_df
    FROM x
    """,
)
def ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the hash-split arms
    (ab_test_conversion's assignment) on per-user total spend: the
    t statistic and the Welch-Satterthwaite degrees of freedom — the
    default two-sample test when arm variances differ (Welch 1947).

    Same discipline as ab_cuped_adjustment: ONE per-user aggregation
    pass (cents fixed-point), exact bigint moment sums (n, sum, sum of
    squares per arm via conditional aggregation — no second shuffle),
    then t and df as single identical double expressions on both
    engines; the degenerate zero-variance pool guards to 0 with a CASE
    on the double standard error (ANSI Spark raises on double/0).
    p-values need the t CDF (not expressible identically in both
    engines) — consumers threshold |t| against a fixed critical value,
    which at these df is 1.96 for alpha=0.05."""
    e = load(spark, sf_dir).events
    cents = F.expr(_EV_CENTS)
    per_user = e.groupBy("user_id").agg(
        F.sum(cents).cast("long").alias("c")
    ).select(
        F.when(F.md5(F.col("user_id").cast("string")) < "8", "A")
        .otherwise("B")
        .alias("arm"),
        "c",
    )
    one_if = lambda a: F.sum(F.when(F.col("arm") == a, 1).otherwise(0))
    c_if = lambda a: F.sum(F.when(F.col("arm") == a, F.col("c")).otherwise(0))
    cc_if = lambda a: F.sum(
        F.when(F.col("arm") == a, F.col("c") * F.col("c")).otherwise(0)
    )
    m = per_user.agg(
        one_if("A").cast("long").alias("na"),
        one_if("B").cast("long").alias("nb"),
        c_if("A").cast("long").alias("sa"),
        c_if("B").cast("long").alias("sb"),
        cc_if("A").cast("long").alias("ssa"),
        cc_if("B").cast("long").alias("ssb"),
    )
    nad, nbd = F.col("na").cast("double"), F.col("nb").cast("double")
    sad, sbd = F.col("sa").cast("double"), F.col("sb").cast("double")
    x = m.select(
        "na",
        "nb",
        (F.col("sa") / (nad * 100)).alias("mean_a"),
        (F.col("sb") / (nbd * 100)).alias("mean_b"),
        (
            (nad * F.col("ssa") - sad * F.col("sa"))
            / (nad * (F.col("na") - 1))
            / 10000.0
            / F.col("na")
        ).alias("sq_a"),
        (
            (nbd * F.col("ssb") - sbd * F.col("sb"))
            / (nbd * (F.col("nb") - 1))
            / 10000.0
            / F.col("nb")
        ).alias("sq_b"),
    )
    se2 = F.col("sq_a") + F.col("sq_b")
    return x.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(
            F.when(se2 == 0, 0.0).otherwise(
                (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2)
            ),
            6,
        ).alias("t_stat"),
        F.round(
            F.when(se2 == 0, 0.0).otherwise(
                se2
                * se2
                / (
                    F.col("sq_a") * F.col("sq_a") / (F.col("na") - 1)
                    + F.col("sq_b") * F.col("sq_b") / (F.col("nb") - 1)
                )
            ),
            6,
        ).alias("welch_df"),
    )


_QTE_PS = [0.25, 0.5, 0.75]


@register(
    "quantile_treatment_effects",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN md5(CAST(user_id AS VARCHAR)) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(sum({_EV_CENTS}) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    q AS (
      SELECT arm,
             percentile_cont(0.25) WITHIN GROUP (ORDER BY c) AS p25,
             percentile_cont(0.50) WITHIN GROUP (ORDER BY c) AS p50,
             percentile_cont(0.75) WITHIN GROUP (ORDER BY c) AS p75
      FROM per_user GROUP BY arm
    ),
    wide AS (
      SELECT CAST(p AS DOUBLE) AS p,
             CASE p WHEN 0.25 THEN max(CASE WHEN arm = 'A' THEN p25 END)
                    WHEN 0.50 THEN max(CASE WHEN arm = 'A' THEN p50 END)
                    ELSE max(CASE WHEN arm = 'A' THEN p75 END) END AS qa,
             CASE p WHEN 0.25 THEN max(CASE WHEN arm = 'B' THEN p25 END)
                    WHEN 0.50 THEN max(CASE WHEN arm = 'B' THEN p50 END)
                    ELSE max(CASE WHEN arm = 'B' THEN p75 END) END AS qb
      FROM q CROSS JOIN (SELECT unnest([0.25, 0.50, 0.75]) AS p) ps
      GROUP BY p
    )
    SELECT p, round(qa / 100.0, 6) AS q_a, round(qb / 100.0, 6) AS q_b,
           round(qb / 100.0 - qa / 100.0, 6) AS qte
    FROM wide ORDER BY p
    """,
)
def quantile_treatment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects for the hash-split experiment: the
    per-arm exact interpolated quartiles of per-user total spend and
    their B-minus-A gaps — the distributional view a mean-only t-test
    (ab_welch_ttest) misses when a treatment moves the tails, not the
    center (Koenker-Bassett quantile-effect framing).

    Exact quantiles come from exact_group_percentiles'
    sketch-bracketed selection (the median_exact machinery — never a
    per-group whole-column agg buffer, so per-arm order statistics
    stay scale-safe); inputs are exact cent integers so the
    percentile_cont interpolation is the same two-value double lerp on
    both engines."""
    from data_warehouse_data_mining_spark.operators.relational import (
        exact_group_percentiles,
    )

    e = load(spark, sf_dir).events
    cents = F.expr(_EV_CENTS)
    per_user = (
        e.groupBy("user_id")
        .agg(F.sum(cents).cast("long").alias("c"))
        .select(
            F.when(F.md5(F.col("user_id").cast("string")) < "8", "A")
            .otherwise("B")
            .alias("arm"),
            "c",
        )
    )
    per_p = exact_group_percentiles(per_user, "arm", "c", _QTE_PS)
    p_of = F.element_at(
        F.array(*[F.lit(p) for p in _QTE_PS]), F.col("pid") + 1
    )
    return (
        per_p.groupBy("pid")
        .pivot("arm", ["A", "B"])
        .agg(F.first("val"))
        .select(
            p_of.alias("p"),
            F.round(F.col("A") / 100.0, 6).alias("q_a"),
            F.round(F.col("B") / 100.0, 6).alias("q_b"),
            F.round(F.col("B") / 100.0 - F.col("A") / 100.0, 6).alias("qte"),
        )
        .orderBy("p")
    )


# Cumulative Poisson(1) CDF thresholds P(X <= k), k = 0..8; computed
# once in Python and embedded as IDENTICAL double literals in the Spark
# plan and the oracle SQL, so the inverse-CDF step function is the same
# on both engines. Replicate weights beyond 9 are astronomically rare
# (P > 9 with lambda=1 is ~1e-7) and truncate to 9.
import math as _math

_POIS_CUM: list[float] = []
_acc, _term = 0.0, _math.exp(-1.0)
for _k in range(9):
    _acc += _term
    _POIS_CUM.append(_acc)
    _term /= _k + 1

BOOTSTRAP_B = 32

_BOOT_HEXWORD_SQL = (
    "list_reduce(list_transform(range(1, 9), "
    "i -> CAST(strpos('0123456789abcdef', substr(m, CAST(i AS INT), 1)) - 1"
    " AS BIGINT)), (a, b) -> a * 16 + b)"
)


@register(
    "poisson_bootstrap_ci",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, CAST(sum({_EV_CENTS}) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    reps AS (
      SELECT u.user_id, u.c, b.b,
             md5('boot|' || CAST(u.user_id AS VARCHAR)
                 || '|' || CAST(b.b AS VARCHAR)) AS m
      FROM per_user u
      CROSS JOIN (SELECT unnest(range(0, {BOOTSTRAP_B})) AS b) b
    ),
    wts AS (
      SELECT b, c,
             ({" + ".join(f"(CASE WHEN ({_BOOT_HEXWORD_SQL} + 0.5) / 4294967296.0 >= {t!r} THEN 1 ELSE 0 END)" for t in _POIS_CUM)})
               AS w
      FROM reps
    ),
    means AS (
      SELECT b, CAST(sum(w * c) AS BIGINT) AS swc, CAST(sum(w) AS BIGINT) AS sw
      FROM wts GROUP BY b
    ),
    ranked AS (
      SELECT swc / (CAST(sw AS DOUBLE) * 100) AS mean_b,
             row_number() OVER (ORDER BY swc / (CAST(sw AS DOUBLE) * 100)) AS rn
      FROM means
    ),
    fs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             sum(c) / (CAST(count(*) AS DOUBLE) * 100) AS mean_spend
      FROM per_user
    )
    SELECT f.n_users, {BOOTSTRAP_B} AS b_replicates,
           round(f.mean_spend, 6) AS mean_spend,
           round(max(CASE WHEN rn = 1 THEN mean_b END), 6) AS env_lo,
           round(max(CASE WHEN rn = {BOOTSTRAP_B} THEN mean_b END), 6)
             AS env_hi
    FROM ranked CROSS JOIN fs f
    GROUP BY f.n_users, f.mean_spend
    """,
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap confidence interval for mean per-user
    spend: every (user, replicate) pair draws an independent Poisson(1)
    resample weight, so each of the B=32 replicate means is computable
    in ONE streaming pass with no resampling shuffle — the
    single-pass bootstrap that works when the data cannot be
    materialized B times (Chamandy et al. 2012, "Estimating Uncertainty
    for Massive Data Streams"). The interval is the SYMMETRIC full
    replicate envelope — min and max of the B=32 replicate means
    (ranks 1 and B) — which under the (B+1) order-statistic rule is an
    equal-tailed ~94% percentile interval (1 - 2/(B+1)); with B=32 no
    order statistic lands at exactly 2.5%/97.5%, so the output is
    labeled env_lo/env_hi rather than claiming an exact 95% CI.

    Determinism: weights come from the inverse Poisson CDF applied to
    the md5-dyadic uniform (the dp_noisy_group_counts recipe — exactly
    representable, never compared against a computed constant: the CDF
    thresholds are baked as identical double literals in both plans);
    replicate sums are exact integer (weight x cents) adds, so every
    replicate mean is the same single double division on both engines.
    Scale shape: explode B=32 on the per-user table (dimension-sized,
    not event-sized), one (b)-keyed 32-group aggregate with full
    map-side combine, then O(B) driver-free order statistics."""
    e = load(spark, sf_dir).events
    cents = F.expr(_EV_CENTS)
    per_user = (
        e.groupBy("user_id")
        .agg(F.sum(cents).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    reps = per_user.withColumn(
        "b", F.explode(F.array(*[F.lit(b) for b in range(BOOTSTRAP_B)]))
    )
    m = F.md5(
        F.concat(
            F.lit("boot|"),
            F.col("user_id").cast("string"),
            F.lit("|"),
            F.col("b").cast("string"),
        )
    )
    u = (F.conv(F.substring(m, 1, 8), 16, 10).cast("bigint").cast("double") + 0.5) / 4294967296.0
    w = sum(
        (F.when(u >= F.lit(t), 1).otherwise(0) for t in _POIS_CUM),
        F.lit(0),
    )
    means = (
        reps.select("b", "c", w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("c")).cast("long").alias("swc"),
            F.sum("w").cast("long").alias("sw"),
        )
    )
    mean_b = F.col("swc") / (F.col("sw").cast("double") * 100)
    ranked = means.select(mean_b.alias("mean_b")).withColumn(
        "rn", F.row_number().over(W.orderBy("mean_b"))
    )
    full = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        (F.sum("c") / (F.count(F.lit(1)).cast("double") * 100)).alias(
            "mean_spend"
        ),
    )
    return (
        ranked.crossJoin(F.broadcast(full))
        .groupBy("n_users", "mean_spend")
        .agg(
            F.round(F.max(F.when(F.col("rn") == 1, F.col("mean_b"))), 6).alias(
                "env_lo"
            ),
            F.round(
                F.max(
                    F.when(F.col("rn") == BOOTSTRAP_B, F.col("mean_b"))
                ),
                6,
            ).alias("env_hi"),
        )
        .select(
            "n_users",
            F.lit(BOOTSTRAP_B).alias("b_replicates"),
            F.round("mean_spend", 6).alias("mean_spend"),
            "env_lo",
            "env_hi",
        )
    )


HILL_K = 64
_OP_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"


@register(
    "hill_tail_index",
    oracle=f"""
    WITH topk AS (
      SELECT c, row_number() OVER (ORDER BY c DESC) AS rn
      FROM (SELECT {_OP_CENTS} AS c FROM orders
            ORDER BY 1 DESC LIMIT {HILL_K + 1})
    ),
    thr AS (SELECT c AS xk FROM topk WHERE rn = {HILL_K + 1}),
    terms AS (
      SELECT CAST(floor(ln(t.c / CAST(thr.xk AS DOUBLE)) * 1000000 + 1e-3)
                  AS BIGINT) AS term_micro
      FROM topk t CROSS JOIN thr
      WHERE t.rn <= {HILL_K}
    ),
    s AS (SELECT CAST(sum(term_micro) AS BIGINT) AS sum_micro FROM terms),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_obs FROM orders)
    SELECT n.n_obs, {HILL_K} AS k,
           round(thr.xk / 100.0, 2) AS threshold,
           round(s.sum_micro / ({HILL_K} * 1000000.0), 6) AS hill_mean_log_excess,
           round({HILL_K} * 1000000.0 / s.sum_micro, 6) AS tail_index_alpha
    FROM s CROSS JOIN thr CROSS JOIN n
    """,
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the right-tail index of the order-price
    distribution over the top k=64 order statistics: mean log-excess
    over the (k+1)-th largest value, whose reciprocal is the Pareto
    tail exponent alpha (Hill 1975) — the heavy-tail diagnostic that
    says whether means/variances of spend (or document length, at the
    curation layer) are even stable enough to report.

    Scale shape: the ONLY data-sized step is the top-(k+1) selection,
    which Catalyst executes as TakeOrderedAndProject (per-partition
    partial top-k, merged — never a global sort); everything after is
    a 65-row program. Determinism: ties at the boundary don't matter
    (only the VALUES enter the estimator, and any tie-resolution keeps
    the same multiset); each log-excess is one ln() of a deterministic
    exact-integer ratio, floored to 1e-6 fixed point with the +1e-3
    nudge (the dsir discipline), so the k-term sum is an exact BIGINT
    add on both engines."""
    o = load(spark, sf_dir).orders
    topk = (
        o.select(F.expr(_OP_CENTS).alias("c"))
        .orderBy(F.col("c").desc())
        .limit(HILL_K + 1)
        .withColumn("rn", F.row_number().over(W.orderBy(F.col("c").desc())))
        .localCheckpoint(eager=True)
    )
    thr = topk.filter(F.col("rn") == HILL_K + 1).select(
        F.col("c").alias("xk")
    )
    term = F.floor(
        F.log(F.col("c") / F.col("xk").cast("double")) * 1_000_000 + 1e-3
    ).cast("bigint")
    s = (
        topk.filter(F.col("rn") <= HILL_K)
        .crossJoin(F.broadcast(thr))
        .select(term.alias("term_micro"))
        .agg(F.sum("term_micro").cast("long").alias("sum_micro"))
    )
    n = o.agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    return (
        s.crossJoin(F.broadcast(thr))
        .crossJoin(F.broadcast(n))
        .select(
            "n_obs",
            F.lit(HILL_K).alias("k"),
            F.round(F.col("xk") / 100.0, 2).alias("threshold"),
            F.round(
                F.col("sum_micro") / (HILL_K * 1_000_000.0), 6
            ).alias("hill_mean_log_excess"),
            F.round(
                HILL_K * 1_000_000.0 / F.col("sum_micro"), 6
            ).alias("tail_index_alpha"),
        )
    )


@register(
    "mann_whitney_u",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN md5(CAST(user_id AS VARCHAR)) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(sum({_EV_CENTS}) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    vals AS (
      SELECT c, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a
      FROM per_user GROUP BY c
    ),
    ranked AS (
      SELECT c, cnt, cnt_a,
             CAST(coalesce(sum(cnt) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_prev
      FROM vals
    ),
    agg AS (
      SELECT CAST(sum(cnt_a * (2 * cum_prev + cnt + 1)) AS BIGINT) AS r_a2,
             CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term,
             CAST(sum(cnt_a) AS BIGINT) AS na,
             CAST(sum(cnt - cnt_a) AS BIGINT) AS nb
      FROM ranked
    ),
    u AS (
      SELECT na, nb, tie_term,
             r_a2 - na * (na + 1) AS u_a2,
             CAST(na AS DOUBLE) * nb / 12.0
               * ((na + nb + 1)
                  - tie_term / (CAST(na + nb AS DOUBLE) * (na + nb - 1)))
               AS var_u
      FROM agg
    )
    SELECT na AS n_a, nb AS n_b,
           round(u_a2 / 2.0, 1) AS u_a,
           round(CAST(na AS DOUBLE) * nb - u_a2 / 2.0, 1) AS u_b,
           tie_term,
           round((u_a2 - CAST(na AS DOUBLE) * nb) / (2.0 * sqrt(var_u)), 6)
             AS z_score
    FROM u
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between the hash-split
    arms on per-user spend — the nonparametric companion to
    ab_welch_ttest for skewed metrics where rank shift, not mean shift,
    is the honest question; includes the tie-corrected normal
    approximation z.

    Exactness: ranks never materialize per row — the distinct-value
    table carries (value, tie count, arm-A count), average tie ranks
    are kept DOUBLED so every rank sum is an exact BIGINT
    (2*avg_rank = 2*cum_prev + cnt + 1), and the tie correction
    sum(t³−t) is integer too; the only doubles are the final
    variance/z expressions, identical on both engines. Scale shape:
    one per-user pass, one distinct-value aggregate, one ordered
    prefix window over the (bounded-cardinality) value table."""
    e = load(spark, sf_dir).events
    cents = F.expr(_EV_CENTS)
    per_user = e.groupBy("user_id").agg(
        F.sum(cents).cast("long").alias("c")
    ).select(
        F.when(F.md5(F.col("user_id").cast("string")) < "8", "A")
        .otherwise("B")
        .alias("arm"),
        "c",
    )
    vals = per_user.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("long")
        .alias("cnt_a"),
    ).localCheckpoint(eager=True)  # bounded distinct-value table; the
    # two-phase ranking reads it several times — pin it so the events
    # fact table is scanned exactly once
    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
    )

    # exclusive prefix count via the two-phase distributed ordering (the
    # distinct-value table is value-cardinality sized — a plain
    # ORDER BY window here would be the banned single-partition shape)
    ranked = global_order_stats(
        vals, "c", "c", measure_col="cnt", ascending=True
    ).withColumn(
        "cum_prev", (F.col("global_cum") - F.col("cnt")).cast("long")
    )
    agg = ranked.agg(
        F.sum(
            F.col("cnt_a") * (2 * F.col("cum_prev") + F.col("cnt") + 1)
        )
        .cast("long")
        .alias("r_a2"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("tie_term"),
        F.sum("cnt_a").cast("long").alias("na"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("long").alias("nb"),
    )
    nad = F.col("na").cast("double")
    u_a2 = F.col("r_a2") - F.col("na") * (F.col("na") + 1)
    n = F.col("na") + F.col("nb")
    var_u = (
        nad
        * F.col("nb")
        / 12.0
        * ((n + 1) - F.col("tie_term") / (n.cast("double") * (n - 1)))
    )
    return agg.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(u_a2 / 2.0, 1).alias("u_a"),
        F.round(nad * F.col("nb") - u_a2 / 2.0, 1).alias("u_b"),
        "tie_term",
        F.round((u_a2 - nad * F.col("nb")) / (2.0 * F.sqrt(var_u)), 6).alias(
            "z_score"
        ),
    )


@register(
    "ks_two_sample",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN md5(CAST(user_id AS VARCHAR)) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(sum({_EV_CENTS}) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    vals AS (
      SELECT c,
             CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM per_user GROUP BY c
    ),
    cums AS (
      SELECT c,
             CAST(sum(ca) OVER (ORDER BY c) AS BIGINT) AS cum_a,
             CAST(sum(cb) OVER (ORDER BY c) AS BIGINT) AS cum_b
      FROM vals
    ),
    tot AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
      FROM vals
    ),
    gaps AS (
      SELECT c, abs(cum_a * nb - cum_b * na) AS gap_num
      FROM cums CROSS JOIN tot
    ),
    best AS (
      SELECT CAST(max(gap_num) AS BIGINT) AS d_num FROM gaps
    ),
    att AS (
      SELECT CAST(min(c) AS BIGINT) AS at_value_cents
      FROM gaps CROSS JOIN best WHERE gap_num = d_num
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           round(b.d_num / (CAST(t.na AS DOUBLE) * t.nb), 6) AS ks_d,
           round(a.at_value_cents / 100.0, 2) AS at_value,
           round(sqrt((CAST(t.na AS DOUBLE) * t.nb) / (t.na + t.nb))
                 * (b.d_num / (CAST(t.na AS DOUBLE) * t.nb)), 6)
             AS scaled_statistic
    FROM best b CROSS JOIN tot t CROSS JOIN att a
    """,
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the arms'
    per-user spend distributions: D = max |F_A − F_B|, the value where
    the supremum is attained, and the sqrt(na·nb/n)·D scaled statistic
    consumers compare against the Kolmogorov critical values — the
    whole-distribution companion to ab_welch_ttest (means) and
    mann_whitney_u (ranks).

    Exactness: both ECDFs stay integer — the gap is compared as
    |cum_a·nb − cum_b·na| (exact cross-multiplied BIGINTs), so the
    argmax and the tie-break (smallest attaining value) are
    engine-exact; division by na·nb happens once at the end. Scale
    shape: one per-user pass, one distinct-value aggregate, ECDF
    prefix sums via the two-phase distributed ordering (one pass per
    arm), then O(1) rollups."""
    e = load(spark, sf_dir).events
    cents = F.expr(_EV_CENTS)
    per_user = e.groupBy("user_id").agg(
        F.sum(cents).cast("long").alias("c")
    ).select(
        F.when(F.md5(F.col("user_id").cast("string")) < "8", "A")
        .otherwise("B")
        .alias("arm"),
        "c",
    )
    vals = per_user.groupBy("c").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    ).localCheckpoint(eager=True)  # read by two two-phase passes + totals
    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
    )

    # inclusive ECDF prefix sums, one two-phase pass per arm (no
    # single-partition window over the value-cardinality table)
    ca_cum = global_order_stats(
        vals.select("c", "ca"), "c", "c", measure_col="ca", ascending=True
    ).select("c", F.col("global_cum").cast("long").alias("cum_a"))
    cb_cum = global_order_stats(
        vals.select("c", "cb"), "c", "c", measure_col="cb", ascending=True
    ).select(F.col("c").alias("c2"), F.col("global_cum").cast("long").alias("cum_b"))
    cums = ca_cum.join(cb_cum, F.col("c2") == F.col("c")).select(
        "c", "cum_a", "cum_b"
    )
    tot = vals.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    gaps = cums.crossJoin(F.broadcast(tot)).select(
        "c",
        "na",
        "nb",
        F.abs(
            F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na")
        ).alias("gap_num"),
    )
    best = gaps.agg(F.max("gap_num").cast("long").alias("d_num"))
    att = (
        gaps.crossJoin(F.broadcast(best))
        .filter(F.col("gap_num") == F.col("d_num"))
        .agg(F.min("c").cast("long").alias("at_value_cents"))
    )
    nad = F.col("na").cast("double")
    d = F.col("d_num") / (nad * F.col("nb"))
    return (
        best.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(att))
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.round(d, 6).alias("ks_d"),
            F.round(F.col("at_value_cents") / 100.0, 2).alias("at_value"),
            F.round(
                F.sqrt((nad * F.col("nb")) / (F.col("na") + F.col("nb"))) * d,
                6,
            ).alias("scaled_statistic"),
        )
    )


@register(
    "theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT n.n_name,
             date_diff('day', DATE '1996-01-01', CAST(o.o_orderdate AS DATE))
               AS d,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.n_name,
             (b.rev_c - a.rev_c) / (CAST(b.d AS DOUBLE) - a.d) AS slope,
             a.d AS d1, b.d AS d2
      FROM daily a JOIN daily b
        ON b.n_name = a.n_name AND b.d > a.d
    ),
    ranked AS (
      SELECT n_name, slope,
             row_number() OVER (PARTITION BY n_name
                                ORDER BY slope, d1, d2) AS rn,
             count(*) OVER (PARTITION BY n_name) AS n_pairs
      FROM pairs
    ),
    meta AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
    )
    SELECT r.n_name AS nation, m.n_days,
           CAST(r.n_pairs AS BIGINT) AS n_pairs,
           round(r.slope / 100.0, 6) AS theil_sen_slope
    FROM ranked r JOIN meta m ON m.n_name = r.n_name
    WHERE r.rn = (r.n_pairs + 1) // 2
    ORDER BY nation
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of 1996 daily revenue per nation: the
    LOWER MEDIAN of all pairwise day-to-day slopes — the
    breakdown-point-29% alternative to groupwise_ols_trend's
    least-squares slope, immune to the outlier days OLS chases
    (Theil 1950 / Sen 1968).

    Scale shape: pairwise work is bounded by the TIME WINDOW, not the
    corpus — daily aggregation first (one fact pass), then ≤(365
    choose 2) pairs per nation generated by a nation-keyed self-join of
    the bounded daily table. Determinism: slopes are exact-integer
    differences in one double division; the median is the row_number
    lower median with a full (slope, d1, d2) tie-break order, so both
    engines select the identical pair even among equal slopes."""
    t = load(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    daily = (
        orders.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1996-01-01").cast("date"),
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("rev_c")
        )
        # bounded: <= nations x 366 rows; consumed by self-join + meta
        .localCheckpoint(eager=True)
    )
    a = daily.select(
        F.col("n_name"), F.col("d").alias("d1"), F.col("rev_c").alias("r1")
    )
    b = daily.select(
        F.col("n_name").alias("n2"),
        F.col("d").alias("d2"),
        F.col("rev_c").alias("r2"),
    )
    pairs = a.join(
        b, (F.col("n2") == F.col("n_name")) & (F.col("d2") > F.col("d1"))
    ).select(
        "n_name",
        ((F.col("r2") - F.col("r1")) / (F.col("d2").cast("double") - F.col("d1")))
        .alias("slope"),
        "d1",
        "d2",
    )
    wrank = W.partitionBy("n_name").orderBy("slope", "d1", "d2")
    wcnt = W.partitionBy("n_name")
    ranked = pairs.select(
        "n_name",
        "slope",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wcnt).alias("n_pairs"),
    ).filter(F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2).cast("long"))
    meta = daily.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    return (
        ranked.join(F.broadcast(meta), "n_name")
        .select(
            F.col("n_name").alias("nation"),
            "n_days",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(F.col("slope") / 100.0, 6).alias("theil_sen_slope"),
        )
        .orderBy("nation")
    )


CONFORMAL_ALPHA = 0.1


@register(
    "conformal_interval_calibration",
    oracle="""
    WITH daily AS (
      SELECT n.n_name,
             date_diff('day', DATE '1996-01-01', CAST(o.o_orderdate AS DATE))
               AS d,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    fit AS (
      SELECT n_name,
             CAST(count(*) AS BIGINT) AS nf,
             CAST(sum(d) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(d * d) AS BIGINT) AS sxx,
             CAST(sum(d * y) AS BIGINT) AS sxy
      FROM daily WHERE d % 2 = 0 GROUP BY n_name
      HAVING count(*) >= 2 AND count(*) * sum(d * d) <> sum(d) * sum(d)
    ),
    coef AS (
      SELECT n_name, nf,
             (CAST(nf AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(nf AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
             (sy - (CAST(nf AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(nf AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   * sx) / nf AS a
      FROM fit
    ),
    resid AS (
      SELECT c.n_name, c.nf, c.a, c.b,
             abs(dd.y - (c.a + c.b * dd.d)) AS r
      FROM coef c JOIN daily dd ON dd.n_name = c.n_name AND dd.d % 2 = 1
    ),
    ranked AS (
      SELECT n_name, nf, a, b, r,
             row_number() OVER (PARTITION BY n_name ORDER BY r) AS rn,
             count(*) OVER (PARTITION BY n_name) AS nc
      FROM resid
    ),
    q AS (
      SELECT n_name, nf, CAST(nc AS BIGINT) AS nc, a, b, r AS q_resid
      FROM ranked
      WHERE rn = least(CAST(ceil((nc + 1) * 0.9) AS BIGINT), nc)
    ),
    cov AS (
      SELECT r.n_name,
             CAST(sum(CASE WHEN r.r <= q.q_resid THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_covered
      FROM resid r JOIN q ON q.n_name = r.n_name
      GROUP BY r.n_name
    )
    SELECT q.n_name AS nation, q.nf AS n_fit, q.nc AS n_cal,
           round(q.b / 100.0, 6) AS slope,
           round(q.q_resid / 100.0, 2) AS q90_resid,
           c.n_covered,
           round(c.n_covered / CAST(q.nc AS DOUBLE), 4) AS cal_coverage,
           CASE WHEN c.n_covered * 10 >= q.nc * 9 THEN 1 ELSE 0 END
             AS covers_target
    FROM q JOIN cov c ON c.n_name = q.n_name
    ORDER BY nation
    """,
)
def conformal_interval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals per nation (Vovk / Lei et
    al.): fit the 1996 daily-revenue OLS trend on EVEN days, take the
    ceil((n+1)·0.9)-th smallest absolute residual on the disjoint ODD
    days as the 90% conformal radius, and report the achieved
    calibration coverage — which is >= 90% on the calibration split BY
    CONSTRUCTION (test-pinned), the distribution-free guarantee that
    makes conformal the default uncertainty wrapper for any point
    forecaster.

    Determinism: OLS coefficients come from exact bigint moment sums in
    one identical double expression (the cuped discipline); residual
    ranking and the conformal order statistic are plain row_number over
    deterministic doubles; the coverage gate is the exact integer
    inequality 10·covered >= 9·n_cal. Scale shape: one fact pass to
    bounded daily cells, per-nation moment rollups, and windows over
    <=183-row calibration slivers — nothing corpus-sized past the
    first aggregate."""
    t = load(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    daily = (
        orders.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1996-01-01").cast("date"),
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("y")
        )
        .localCheckpoint(eager=True)
    )
    fit = (
        daily.filter(F.col("d") % 2 == 0)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nf"),
            F.sum("d").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("d") * F.col("d")).cast("long").alias("sxx"),
            F.sum(F.col("d") * F.col("y")).cast("long").alias("sxy"),
        )
        .filter(
            (F.col("nf") >= 2)
            & (F.col("nf") * F.col("sxx") != F.col("sx") * F.col("sx"))
        )
    )
    nfd = F.col("nf").cast("double")
    sxd = F.col("sx").cast("double")
    b = (nfd * F.col("sxy") - sxd * F.col("sy")) / (
        nfd * F.col("sxx") - sxd * F.col("sx")
    )
    coef = fit.select(
        "n_name", "nf", b.alias("b"), ((F.col("sy") - b * F.col("sx")) / F.col("nf")).alias("a")
    )
    resid = (
        coef.join(daily.filter(F.col("d") % 2 == 1), "n_name")
        .select(
            "n_name",
            "nf",
            "a",
            "b",
            F.abs(F.col("y") - (F.col("a") + F.col("b") * F.col("d"))).alias("r"),
        )
        .localCheckpoint(eager=True)
    )
    wr = W.partitionBy("n_name").orderBy("r")
    wc = W.partitionBy("n_name")
    q = (
        resid.select(
            "n_name",
            "nf",
            "a",
            "b",
            "r",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wc).cast("long").alias("nc"),
        )
        .filter(
            F.col("rn")
            == F.least(
                F.ceil((F.col("nc") + 1) * 0.9).cast("long"), F.col("nc")
            )
        )
        .select("n_name", "nf", "nc", "a", "b", F.col("r").alias("q_resid"))
    )
    cov = (
        resid.join(F.broadcast(q.select("n_name", "q_resid")), "n_name")
        .groupBy("n_name")
        .agg(
            F.sum(F.when(F.col("r") <= F.col("q_resid"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered")
        )
    )
    return (
        q.join(cov, "n_name")
        .select(
            F.col("n_name").alias("nation"),
            F.col("nf").alias("n_fit"),
            F.col("nc").alias("n_cal"),
            F.round(F.col("b") / 100.0, 6).alias("slope"),
            F.round(F.col("q_resid") / 100.0, 2).alias("q90_resid"),
            "n_covered",
            F.round(F.col("n_covered") / F.col("nc").cast("double"), 4).alias(
                "cal_coverage"
            ),
            F.when(F.col("n_covered") * 10 >= F.col("nc") * 9, 1)
            .otherwise(0)
            .alias("covers_target"),
        )
        .orderBy("nation")
    )


@register(
    "binseg_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    pre AS (
      SELECT day, y,
             CAST(sum(y) OVER (ORDER BY day) AS BIGINT) AS sl,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS nl
      FROM daily
    ),
    tot AS (
      SELECT CAST(sum(y) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
      FROM daily
    ),
    scored AS (
      SELECT p.day, p.sl, p.nl, t.s - p.sl AS sr, t.n - p.nl AS nr, t.s, t.n,
             CAST(p.sl AS DOUBLE) * p.sl / p.nl
               + CAST(t.s - p.sl AS DOUBLE) * (t.s - p.sl) / (t.n - p.nl)
               AS f
      FROM pre p CROSS JOIN tot t
      WHERE p.nl < t.n
    ),
    best AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (ORDER BY f DESC, day) AS rn FROM scored
      ) WHERE rn = 1
    )
    SELECT CAST(day AS VARCHAR) AS split_after_day,
           nl AS n_left, nr AS n_right,
           round(sl / CAST(nl AS DOUBLE), 6) AS mean_left,
           round(sr / CAST(nr AS DOUBLE), 6) AS mean_right,
           round(f - CAST(s AS DOUBLE) * s / n, 6) AS sse_reduction
    FROM best
    """,
)
def binseg_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoint over the daily order-count
    series: the split that maximizes the between-segment SSE reduction
    — since SSE = Σy² − S²/n, the y² term cancels and the objective
    reduces to f(t) = S_L²/n_L + S_R²/n_R, so the scan needs only ONE
    prefix sum over exact integer daily counts (Scott & Knott 1974
    binary segmentation; the location complement to cusum_changepoint's
    drift detector).

    Determinism: S_L/n_L are exact BIGINTs from one ordered window over
    the bounded daily table; f(t) is products of exact integers in
    IEEE double — bit-identical across engines — and the argmax
    tie-breaks on the earlier day. Scale shape: one fact-table date
    rollup, one window over ~#days rows, one O(1) pick."""
    o = load(spark, sf_dir).orders
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    wpre = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        F.sum("y").over(wpre).cast("long").alias("sl"),
        F.row_number().over(W.orderBy("day")).cast("long").alias("nl"),
    )
    tot = daily.agg(
        F.sum("y").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("n")
    )
    sld = F.col("sl").cast("double")
    srd = (F.col("s") - F.col("sl")).cast("double")
    scored = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("n"))
        .select(
            "day",
            "sl",
            "nl",
            (F.col("s") - F.col("sl")).alias("sr"),
            (F.col("n") - F.col("nl")).alias("nr"),
            "s",
            "n",
            (
                sld * F.col("sl") / F.col("nl")
                + srd * (F.col("s") - F.col("sl")) / (F.col("n") - F.col("nl"))
            ).alias("f"),
        )
    )
    best = (
        scored.withColumn(
            "rn", F.row_number().over(W.orderBy(F.col("f").desc(), "day"))
        )
        .filter(F.col("rn") == 1)
    )
    return best.select(
        F.col("day").cast("string").alias("split_after_day"),
        F.col("nl").alias("n_left"),
        F.col("nr").alias("n_right"),
        F.round(F.col("sl") / F.col("nl").cast("double"), 6).alias("mean_left"),
        F.round(F.col("sr") / F.col("nr").cast("double"), 6).alias("mean_right"),
        F.round(
            F.col("f") - F.col("s").cast("double") * F.col("s") / F.col("n"), 6
        ).alias("sse_reduction"),
    )


# Newsvendor cost weights: underage (lost margin) 3, overage (holding) 1
# -> critical ratio 3/4, so q* is the smallest q with F(q) >= 0.75.
NV_CU = 3
NV_CO = 1


@register(
    "newsvendor_order_quantity",
    oracle=f"""
    WITH weekly AS (
      SELECT p.p_brand AS brand, date_trunc('week', l.l_shipdate) AS wk,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS d
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT brand, d,
             row_number() OVER (PARTITION BY brand ORDER BY d, wk) AS rn,
             count(*) OVER (PARTITION BY brand) AS n
      FROM weekly
    ),
    qstar AS (
      SELECT brand, CAST(n AS BIGINT) AS n_weeks, d AS q_star
      FROM ranked
      WHERE rn = ({NV_CU} * n + {NV_CU + NV_CO - 1}) // {NV_CU + NV_CO}
    ),
    naive AS (
      SELECT brand,
             CAST((2 * sum(d) + count(*)) // (2 * count(*)) AS BIGINT)
               AS q_naive
      FROM weekly GROUP BY brand
    ),
    costs AS (
      SELECT w.brand,
             CAST(sum({NV_CO} * greatest(q.q_star - w.d, 0)
                      + {NV_CU} * greatest(w.d - q.q_star, 0))
                  AS BIGINT) AS cost_qstar,
             CAST(sum({NV_CO} * greatest(nv.q_naive - w.d, 0)
                      + {NV_CU} * greatest(w.d - nv.q_naive, 0))
                  AS BIGINT) AS cost_naive
      FROM weekly w
      JOIN qstar q ON q.brand = w.brand
      JOIN naive nv ON nv.brand = w.brand
      GROUP BY w.brand
    )
    SELECT q.brand, q.n_weeks, q.q_star, nv.q_naive,
           c.cost_qstar, c.cost_naive,
           round((c.cost_naive - c.cost_qstar) * 100.0
                 / greatest(c.cost_naive, 1), 6) AS saving_pct
    FROM qstar q
    JOIN naive nv ON nv.brand = q.brand
    JOIN costs c ON c.brand = q.brand
    ORDER BY q.brand
    """,
)
def newsvendor_order_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor optimal order quantity per brand from the empirical
    weekly-demand distribution: with underage cost 3 and overage cost 1
    the critical ratio is 3/4, so q* is the ceil(3n/4)-th smallest
    weekly demand — evaluated against the naive order-the-mean policy
    with both policies' exact empirical costs (the classic result that
    the profit-maximizing stock level is a QUANTILE, not the mean;
    Arrow-Harris-Marschak 1951).

    Everything is exact integers: demands are summed BIGINT quantities,
    the critical order statistic uses the integer identity
    ceil(3n/4) = (3n+3)//4, costs are integer-weighted piecewise sums,
    and the only double is the final saving percentage. Scale shape:
    one fact pass to the bounded (brand, week) table; per-brand windows
    over week-count slivers; two broadcast-sized policy joins."""
    t = load(spark, sf_dir)
    weekly = (
        t.lineitem.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("week", F.col("l_shipdate")).alias("wk"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("d"))
        .localCheckpoint(eager=True)
    )
    wr = W.partitionBy("brand").orderBy("d", "wk")
    wn = W.partitionBy("brand")
    k = F.expr(
        f"({NV_CU} * n + {NV_CU + NV_CO - 1}) div {NV_CU + NV_CO}"
    )
    qstar = (
        weekly.select(
            "brand",
            "d",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == k)
        .select(
            "brand",
            F.col("n").cast("long").alias("n_weeks"),
            F.col("d").alias("q_star"),
        )
    )
    naive = (
        weekly.groupBy("brand")
        .agg(
            F.sum("d").cast("long").alias("sd"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
        # round-half-up integer mean, exact: (2S + n) div (2n)
        .select("brand", F.expr("(2 * sd + cnt) div (2 * cnt)").cast("long").alias("q_naive"))
    )
    costs = (
        weekly.join(qstar.select("brand", "q_star"), "brand")
        .join(naive, "brand")
        .groupBy("brand")
        .agg(
            F.sum(
                NV_CO * F.greatest(F.col("q_star") - F.col("d"), F.lit(0))
                + NV_CU * F.greatest(F.col("d") - F.col("q_star"), F.lit(0))
            )
            .cast("long")
            .alias("cost_qstar"),
            F.sum(
                NV_CO * F.greatest(F.col("q_naive") - F.col("d"), F.lit(0))
                + NV_CU * F.greatest(F.col("d") - F.col("q_naive"), F.lit(0))
            )
            .cast("long")
            .alias("cost_naive"),
        )
    )
    return (
        qstar.join(naive, "brand")
        .join(costs, "brand")
        .select(
            "brand",
            "n_weeks",
            "q_star",
            "q_naive",
            "cost_qstar",
            "cost_naive",
            F.round(
                (F.col("cost_naive") - F.col("cost_qstar"))
                * 100.0
                / F.greatest(F.col("cost_naive"), F.lit(1)),
                6,
            ).alias("saving_pct"),
        )
        .orderBy("brand")
    )


@register(
    "diff_in_diff",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN md5(CAST(user_id AS VARCHAR)) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                           THEN {_EV_CENTS} ELSE 0 END) AS BIGINT) AS pre_c,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                           THEN {_EV_CENTS} ELSE 0 END) AS BIGINT) AS post_c
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN arm = 'A' THEN pre_c ELSE 0 END) AS BIGINT) AS pa,
             CAST(sum(CASE WHEN arm = 'B' THEN pre_c ELSE 0 END) AS BIGINT) AS pb,
             CAST(sum(CASE WHEN arm = 'A' THEN post_c ELSE 0 END) AS BIGINT) AS qa,
             CAST(sum(CASE WHEN arm = 'B' THEN post_c ELSE 0 END) AS BIGINT) AS qb,
             CAST(sum(CASE WHEN arm = 'A'
                           THEN (post_c - pre_c) * (post_c - pre_c)
                           ELSE 0 END) AS BIGINT) AS dda,
             CAST(sum(CASE WHEN arm = 'B'
                           THEN (post_c - pre_c) * (post_c - pre_c)
                           ELSE 0 END) AS BIGINT) AS ddb
      FROM per_user
    ),
    x AS (
      SELECT na, nb,
             pa / (CAST(na AS DOUBLE) * 100) AS pre_a,
             pb / (CAST(nb AS DOUBLE) * 100) AS pre_b,
             qa / (CAST(na AS DOUBLE) * 100) AS post_a,
             qb / (CAST(nb AS DOUBLE) * 100) AS post_b,
             (CAST(na AS DOUBLE) * dda - CAST(qa - pa AS DOUBLE) * (qa - pa))
               / (CAST(na AS DOUBLE) * (na - 1)) / 10000.0 / na AS sq_a,
             (CAST(nb AS DOUBLE) * ddb - CAST(qb - pb AS DOUBLE) * (qb - pb))
               / (CAST(nb AS DOUBLE) * (nb - 1)) / 10000.0 / nb AS sq_b
      FROM m
    )
    SELECT na AS n_a, nb AS n_b,
           round(pre_a, 6) AS pre_a, round(post_a, 6) AS post_a,
           round(pre_b, 6) AS pre_b, round(post_b, 6) AS post_b,
           round((post_b - pre_b) - (post_a - pre_a), 6) AS did_estimate,
           round(CASE WHEN sq_a + sq_b = 0 THEN 0.0
                      ELSE ((post_b - pre_b) - (post_a - pre_a))
                           / sqrt(sq_a + sq_b) END, 6) AS t_stat
    FROM x
    """,
)
def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on the hash-split panel: each user is
    observed pre and post the 2024-01-15 cutover (ab_cuped_adjustment's
    periods), so DiD = (post_B − pre_B) − (post_A − pre_A) removes both
    the arm-level baseline and the common time shock — the workhorse
    causal estimator when assignment isn't randomized; its t uses the
    per-arm variance of the user-level CHANGE post−pre (the panel form,
    which differences out user fixed effects).

    Same one-pass discipline as ab_welch_ttest: exact bigint per-arm
    moment sums (now including Σ(post−pre)²), every statistic a single
    identical double expression, degenerate variances guarded by a
    CASE. Scale shape: one per-user aggregate, one 1-row rollup."""
    e = load(spark, sf_dir).events
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    cents = F.expr(_EV_CENTS)
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, cents).otherwise(0))
        .cast("long")
        .alias("pre_c"),
        F.sum(F.when(F.col("ts") >= split, cents).otherwise(0))
        .cast("long")
        .alias("post_c"),
    ).select(
        F.when(F.md5(F.col("user_id").cast("string")) < "8", "A")
        .otherwise("B")
        .alias("arm"),
        "pre_c",
        "post_c",
    )
    d = F.col("post_c") - F.col("pre_c")
    s_if = lambda a, c: F.sum(F.when(F.col("arm") == a, c).otherwise(0)).cast("long")
    m = per_user.agg(
        s_if("A", F.lit(1)).alias("na"),
        s_if("B", F.lit(1)).alias("nb"),
        s_if("A", F.col("pre_c")).alias("pa"),
        s_if("B", F.col("pre_c")).alias("pb"),
        s_if("A", F.col("post_c")).alias("qa"),
        s_if("B", F.col("post_c")).alias("qb"),
        s_if("A", d * d).alias("dda"),
        s_if("B", d * d).alias("ddb"),
    )
    nad, nbd = F.col("na").cast("double"), F.col("nb").cast("double")
    da = (F.col("qa") - F.col("pa")).cast("double")
    db = (F.col("qb") - F.col("pb")).cast("double")
    x = m.select(
        "na",
        "nb",
        (F.col("pa") / (nad * 100)).alias("pre_a"),
        (F.col("pb") / (nbd * 100)).alias("pre_b"),
        (F.col("qa") / (nad * 100)).alias("post_a"),
        (F.col("qb") / (nbd * 100)).alias("post_b"),
        (
            (nad * F.col("dda") - da * (F.col("qa") - F.col("pa")))
            / (nad * (F.col("na") - 1))
            / 10000.0
            / F.col("na")
        ).alias("sq_a"),
        (
            (nbd * F.col("ddb") - db * (F.col("qb") - F.col("pb")))
            / (nbd * (F.col("nb") - 1))
            / 10000.0
            / F.col("nb")
        ).alias("sq_b"),
    )
    did = (F.col("post_b") - F.col("pre_b")) - (F.col("post_a") - F.col("pre_a"))
    se2 = F.col("sq_a") + F.col("sq_b")
    return x.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round("pre_a", 6).alias("pre_a"),
        F.round("post_a", 6).alias("post_a"),
        F.round("pre_b", 6).alias("pre_b"),
        F.round("post_b", 6).alias("post_b"),
        F.round(did, 6).alias("did_estimate"),
        F.round(
            F.when(se2 == 0, 0.0).otherwise(did / F.sqrt(se2)), 6
        ).alias("t_stat"),
    )


@register(
    "kendall_tau_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN (a.n - b.n) * (a.rev - b.rev) > 0 THEN 1 ELSE 0 END AS c,
             CASE WHEN (a.n - b.n) * (a.rev - b.rev) < 0 THEN 1 ELSE 0 END AS d,
             CASE WHEN a.n = b.n AND a.rev <> b.rev THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.rev = b.rev AND a.n <> b.n THEN 1 ELSE 0 END AS ty
      FROM daily a JOIN daily b ON a.day < b.day
    ),
    agg AS (
      SELECT CAST(sum(c) AS BIGINT) AS nc, CAST(sum(d) AS BIGINT) AS nd,
             CAST(sum(tx) AS BIGINT) AS ntx, CAST(sum(ty) AS BIGINT) AS nty,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM pairs
    )
    SELECT n_pairs, nc AS concordant, nd AS discordant,
           ntx AS ties_x_only, nty AS ties_y_only,
           round((nc - nd) / sqrt((CAST(n_pairs AS DOUBLE) - ntx)
                                  * (CAST(n_pairs AS DOUBLE) - nty)), 6)
             AS tau_b
    FROM agg
    """,
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b rank correlation between daily 1996 order count
    and daily revenue — the outlier-immune alternative to Pearson
    (acf/correlation_matrix) built from concordant/discordant pair
    counts, with the τ-b tie correction.

    Exactness: every pair classification is an exact integer sign test
    ((Δn)·(Δrev) > 0 on BIGINTs), so concordant/discordant/tie counts
    are exact; τ-b is one double expression over them. Scale shape:
    pairwise work is bounded by the TIME WINDOW (≤366·365/2 pairs —
    SF-independent), after one fact-table date rollup; the same
    bounded-pairs discipline as theil_sen_trend."""
    o = load(spark, sf_dir).orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("rev"),
        )
        .localCheckpoint(eager=True)
    )
    a = daily.select(
        F.col("day").alias("d1"), F.col("n").alias("n1"), F.col("rev").alias("r1")
    )
    b = daily.select(
        F.col("day").alias("d2"), F.col("n").alias("n2"), F.col("rev").alias("r2")
    )
    prod = (F.col("n1") - F.col("n2")) * (F.col("r1") - F.col("r2"))
    agg = (
        a.join(b, F.col("d1") < F.col("d2"))
        .select(
            F.when(prod > 0, 1).otherwise(0).alias("c"),
            F.when(prod < 0, 1).otherwise(0).alias("d"),
            F.when(
                (F.col("n1") == F.col("n2")) & (F.col("r1") != F.col("r2")), 1
            )
            .otherwise(0)
            .alias("tx"),
            F.when(
                (F.col("r1") == F.col("r2")) & (F.col("n1") != F.col("n2")), 1
            )
            .otherwise(0)
            .alias("ty"),
        )
        .agg(
            F.sum("c").cast("long").alias("nc"),
            F.sum("d").cast("long").alias("nd"),
            F.sum("tx").cast("long").alias("ntx"),
            F.sum("ty").cast("long").alias("nty"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
    )
    npd = F.col("n_pairs").cast("double")
    return agg.select(
        "n_pairs",
        F.col("nc").alias("concordant"),
        F.col("nd").alias("discordant"),
        F.col("ntx").alias("ties_x_only"),
        F.col("nty").alias("ties_y_only"),
        F.round(
            (F.col("nc") - F.col("nd"))
            / F.sqrt((npd - F.col("ntx")) * (npd - F.col("nty"))),
            6,
        ).alias("tau_b"),
    )


@register(
    "durbin_watson_residuals",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE))
               AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS y
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(d) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(d * d) AS BIGINT) AS sxx,
             CAST(sum(d * y) AS BIGINT) AS sxy
      FROM daily
    ),
    coef AS (
      SELECT n,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
             (sy - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   * sx) / n AS a
      FROM m
    ),
    resid AS (
      SELECT d, y - (c.a + c.b * d) AS e FROM daily CROSS JOIN coef c
    ),
    lagged AS (
      SELECT e, lag(e) OVER (ORDER BY d) AS ep FROM resid
    )
    SELECT (SELECT n FROM coef) AS n_days,
           round((SELECT b FROM coef) / 100.0, 6) AS slope,
           round(sum(CASE WHEN ep IS NULL THEN 0.0
                          ELSE (e - ep) * (e - ep) END)
                 / sum(e * e), 6) AS durbin_watson
    FROM lagged
    """,
)
def durbin_watson_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson autocorrelation statistic of the 1996 daily-revenue
    OLS trend residuals: DW = Σ(e_t − e_{t−1})² / Σe_t² — near 2 means
    the trend line left white noise, near 0 says positive serial
    correlation (the trend is missing structure, e.g. weekly
    seasonality), the go/no-go check before trusting OLS standard
    errors (Durbin & Watson 1950).

    Determinism: coefficients from exact bigint moment sums (the
    conformal/cuped discipline); residuals are identical doubles on
    both engines, and DW's two quadratic sums run over the SAME
    bounded daily table in one lag window — ≤366 terms, both sums
    whole-double-ulp stable at this magnitude (the e² terms span <3
    decades, no catastrophic cancellation). Scale shape: one fact
    rollup, one O(1) moment pass, one ordered lag window."""
    o = load(spark, sf_dir).orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    daily = (
        o.groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1996-01-01").cast("date"),
            ).alias("d")
        )
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("y")
        )
        .localCheckpoint(eager=True)
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sxx"),
        F.sum(F.col("d") * F.col("y")).cast("long").alias("sxy"),
    )
    ndb = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    b = (ndb * F.col("sxy") - sxd * F.col("sy")) / (
        ndb * F.col("sxx") - sxd * F.col("sx")
    )
    coef = m.select(
        "n", b.alias("b"), ((F.col("sy") - b * F.col("sx")) / F.col("n")).alias("a")
    )
    resid = daily.crossJoin(F.broadcast(coef)).select(
        "d", "n", "b", (F.col("y") - (F.col("a") + F.col("b") * F.col("d"))).alias("e")
    )
    lagged = resid.withColumn("ep", F.lag("e").over(W.orderBy("d")))
    return (
        lagged.groupBy("n", "b")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("ep").isNull(), 0.0).otherwise(
                        (F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep"))
                    )
                )
                / F.sum(F.col("e") * F.col("e")),
                6,
            ).alias("durbin_watson")
        )
        .select(
            F.col("n").alias("n_days"),
            F.round(F.col("b") / 100.0, 6).alias("slope"),
            "durbin_watson",
        )
    )


@register(
    "lorenz_curve_deciles",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                             AS BIGINT) AS c
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT c,
             row_number() OVER (ORDER BY c, o_custkey) AS rn,
             count(*) OVER () AS n,
             CAST(sum(c) OVER (ORDER BY c, o_custkey) AS BIGINT) AS cum,
             CAST(sum(c) OVER () AS BIGINT) AS tot
      FROM per_cust
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(max(rn) AS BIGINT) AS n_customers,
           CAST(max(cum) AS BIGINT) AS cum_cents,
           round(max(cum) / CAST(max(tot) AS DOUBLE), 6) AS cum_share
    FROM (SELECT rn, cum, tot, (rn * 10 - 1) // n + 1 AS decile FROM ranked)
    GROUP BY decile
    ORDER BY decile
    """,
)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer spend at decile resolution — the
    curve behind gini_customer_spend: customers sorted poorest-first,
    each decile reporting its cumulative share of total spend (the
    "bottom 50% hold X%" numbers an inequality report quotes).

    Exactness: cumulative cents are exact BIGINT prefix sums with a
    full (spend, custkey) tie-break order; decile assignment is the
    integer identity (rn·10−1)//n + 1 (largest-remainder-free, exact);
    the only double is the final share. Scale shape: one fact rollup,
    then rank + prefix sum via ranking.global_order_stats' two-phase
    range-partitioned form — NO single-partition window — and a 10-row
    rollup."""
    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
    )

    o = load(spark, sf_dir).orders
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .cast("long")
        .alias("c")
    )
    ranked = global_order_stats(
        per_cust, "c", "o_custkey", measure_col="c", ascending=True
    ).select(
        F.col("global_rank").alias("rn"),
        F.col("global_cum").cast("long").alias("cum"),
    )
    tots = per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("tot"),
    )
    return (
        ranked.crossJoin(F.broadcast(tots))
        .select(
            F.expr("(rn * 10 - 1) div n + 1").cast("long").alias("decile"),
            "rn",
            "cum",
            "tot",
        )
        .groupBy("decile")
        .agg(
            F.max("rn").cast("long").alias("n_customers"),
            F.max("cum").cast("long").alias("cum_cents"),
            F.round(
                F.max("cum") / F.max("tot").cast("double"), 6
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


@register(
    "simpson_diversity_by_source",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    vc AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ),
    agg AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(c * (c - 1)) AS BIGINT) AS pairs_same
      FROM vc GROUP BY source
    )
    SELECT source, n AS n_tokens, n_types,
           round(pairs_same / (CAST(n AS DOUBLE) * (n - 1)), 6)
             AS simpson_lambda,
           round((CAST(n AS DOUBLE) * (n - 1)) / pairs_same, 6)
             AS inverse_simpson
    FROM agg
    ORDER BY source
    """,
)
def simpson_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity of each source's token distribution: λ = the
    probability two random tokens coincide, Σc(c−1)/(N(N−1)) — and its
    inverse, the "effective vocabulary size" — the ecology-standard
    concentration measure that, unlike entropy, is an exact RATIONAL of
    the counts (no logs anywhere), complementing column_entropy_profile
    and hapax_ratio_by_source in the corpus-diversity panel.

    One token pass to the (source, type) count table, one rollup; both
    outputs are one double division of exact BIGINTs. Degenerate
    single-token sources would zero the denominator — impossible here
    (every synthetic doc has tokens), and the oracle would fail loudly
    rather than silently diverge if that assumption broke."""
    d = load(spark, sf_dir).documents
    from data_warehouse_data_mining_spark.functions import texthash as th

    vc = (
        d.select("source", F.explode(th.words(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = vc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("pairs_same"),
    )
    ndb = F.col("n").cast("double")
    return agg.select(
        "source",
        F.col("n").alias("n_tokens"),
        "n_types",
        F.round(F.col("pairs_same") / (ndb * (F.col("n") - 1)), 6).alias(
            "simpson_lambda"
        ),
        F.round((ndb * (F.col("n") - 1)) / F.col("pairs_same"), 6).alias(
            "inverse_simpson"
        ),
    ).orderBy("source")


HURST_WINDOWS = [16, 32, 64]
_HURST_LNW = {16: 2.772588722239781, 32: 3.4657359027997265, 64: 4.1588830833596715}


def _hurst_oracle() -> str:
    lnw_case = " ".join(
        f"WHEN {w} THEN {_HURST_LNW[w]!r}" for w in HURST_WINDOWS
    )
    ws = ", ".join(str(w) for w in HURST_WINDOWS)
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT y, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      FROM daily
    ),
    blocks AS (
      SELECT w.w, (i - 1) // w.w AS blk, y,
             CAST(row_number() OVER (PARTITION BY w.w, (i - 1) // w.w
                                     ORDER BY i) AS BIGINT) AS k,
             CAST(sum(y) OVER (PARTITION BY w.w, (i - 1) // w.w
                               ORDER BY i) AS BIGINT) AS pk
      FROM idx CROSS JOIN (SELECT unnest([{ws}]) AS w) w
    ),
    blocks2 AS (
      SELECT w, blk, y,
             w * pk - k * (sum(y) OVER (PARTITION BY w, blk)) AS wz
      FROM blocks
    ),
    per_block AS (
      SELECT w, blk,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(y) AS BIGINT) AS s,
             CAST(sum(y * y) AS BIGINT) AS ss,
             CAST(max(wz) AS BIGINT) AS wz_max,
             CAST(min(wz) AS BIGINT) AS wz_min
      FROM blocks2 GROUP BY w, blk
    ),
    rs AS (
      SELECT w, blk,
             CAST(floor(ln((greatest(wz_max, 0) - least(wz_min, 0))
                           / sqrt(CAST(w * ss - s * s AS DOUBLE)))
                        * 1000000 + 1e-3) AS BIGINT) AS lrs_micro
      FROM per_block
      WHERE cnt = w AND w * ss - s * s > 0
            AND greatest(wz_max, 0) - least(wz_min, 0) > 0
    ),
    per_w AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(lrs_micro) AS BIGINT) AS sum_micro,
             CASE w {lnw_case} END AS lnw
      FROM rs GROUP BY w
    ),
    fit AS (
      SELECT count(*) AS k,
             sum(lnw) AS sx, sum(sum_micro / (1000000.0 * n_blocks)) AS sy,
             sum(lnw * lnw) AS sxx,
             sum(lnw * sum_micro / (1000000.0 * n_blocks)) AS sxy
      FROM per_w
    )
    SELECT p.w, p.n_blocks,
           round(p.sum_micro / (1000000.0 * p.n_blocks), 6) AS mean_log_rs,
           round((f.k * f.sxy - f.sx * f.sy)
                 / (f.k * f.sxx - f.sx * f.sx), 6) AS hurst_exponent
    FROM per_w p CROSS JOIN fit f
    ORDER BY p.w
    """


@register("hurst_rescaled_range", oracle=_hurst_oracle())
def hurst_rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the daily order-count series by classic
    rescaled-range (R/S) analysis (Hurst 1951, Mandelbrot-Wallis form):
    tumbling blocks of w=16/32/64 days, per block the range of
    mean-centered cumulative deviations over the population std, then H
    = the log-log OLS slope of mean ln(R/S) against ln(w) — H≈0.5 is a
    memoryless walk, H>0.5 long-range persistence (trending demand),
    H<0.5 mean reversion; the long-memory companion to acf/DW.

    Exactness discipline: inside each block the centered cumulative
    deviation is kept as the exact integer w·Z_k = w·P_k − k·S, the
    range and w²·variance are exact BIGINTs, each block contributes ONE
    ln() of a deterministic double (floored to 1e-6 micro units with
    the +1e-3 nudge), per-w means stay integer until one division, and
    the ln(w) regressors are baked literals — so the 3-point OLS slope
    is a single identical double expression. Degenerate blocks (zero
    variance or zero range) are excluded by exact integer guards on
    BOTH engines. Scale shape: one fact rollup, windows over the
    3×#days exploded table, O(1) fits."""
    o = load(spark, sf_dir).orders
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    idx = daily.select(
        "y", F.row_number().over(W.orderBy("day")).cast("long").alias("i")
    )
    ws = F.explode(F.array(*[F.lit(w) for w in HURST_WINDOWS])).alias("w")
    blocks = idx.select("y", "i", ws).select(
        "w",
        F.expr("(i - 1) div w").alias("blk"),
        "y",
        "i",
    )
    wb = W.partitionBy("w", "blk").orderBy("i")
    blocks = blocks.select(
        "w",
        "blk",
        "y",
        F.row_number().over(wb).cast("long").alias("k"),
        F.sum("y").over(wb.rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("pk"),
    )
    wball = W.partitionBy("w", "blk")
    wz = F.col("w") * F.col("pk") - F.col("k") * F.sum("y").over(wball)
    per_block = (
        blocks.select(
            "w", "blk", "y", wz.alias("wz")
        )
        .groupBy("w", "blk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("y").cast("long").alias("s"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
            F.max("wz").cast("long").alias("wz_max"),
            F.min("wz").cast("long").alias("wz_min"),
        )
    )
    rng = F.greatest(F.col("wz_max"), F.lit(0)) - F.least(
        F.col("wz_min"), F.lit(0)
    )
    varw = F.col("w") * F.col("ss") - F.col("s") * F.col("s")
    rs = (
        per_block.filter(
            (F.col("cnt") == F.col("w")) & (varw > 0) & (rng > 0)
        )
        .select(
            "w",
            F.floor(
                F.log(rng / F.sqrt(varw.cast("double"))) * 1_000_000 + 1e-3
            )
            .cast("bigint")
            .alias("lrs_micro"),
        )
    )
    lnw = F.create_map(
        *[x for w in HURST_WINDOWS for x in (F.lit(w), F.lit(_HURST_LNW[w]))]
    )[F.col("w")]
    per_w = (
        rs.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum("lrs_micro").cast("long").alias("sum_micro"),
        )
        .select("w", "n_blocks", "sum_micro", lnw.alias("lnw"))
        .localCheckpoint(eager=True)
    )
    ybar = F.col("sum_micro") / (1_000_000.0 * F.col("n_blocks"))
    fit = per_w.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("lnw").alias("sx"),
        F.sum(ybar).alias("sy"),
        F.sum(F.col("lnw") * F.col("lnw")).alias("sxx"),
        F.sum(F.col("lnw") * ybar).alias("sxy"),
    )
    return (
        per_w.crossJoin(F.broadcast(fit))
        .select(
            "w",
            "n_blocks",
            F.round(ybar, 6).alias("mean_log_rs"),
            F.round(
                (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")),
                6,
            ).alias("hurst_exponent"),
        )
        .orderBy("w")
    )


# Shapley MTA channels, alphabetical bit order (4 channels -> exact
# 24ths). s!(3-s)! marginal weights by |S| for C=4: 6, 2, 2, 6.
_MTA_CHANNELS = ["click", "error", "signup", "view"]
_MTA_W = {0: 6, 1: 2, 2: 2, 3: 6}


@register(
    "shapley_touch_attribution",
    oracle=f"""
    WITH first_p AS (
      SELECT user_id, min(ts) AS pts FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    masks AS (
      SELECT f.user_id,
             CAST(coalesce(sum(DISTINCT CASE e.event_type
                    WHEN 'click' THEN 1 WHEN 'error' THEN 2
                    WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END), 0)
                  AS BIGINT) AS m
      FROM first_p f
      LEFT JOIN events e ON e.user_id = f.user_id AND e.ts < f.pts
                        AND e.event_type <> 'purchase'
      GROUP BY f.user_id
    ),
    nm AS (SELECT m, CAST(count(*) AS BIGINT) AS n FROM masks GROUP BY m),
    subsets AS (SELECT unnest(range(0, 16)) AS s),
    v AS (
      SELECT s.s, CAST(coalesce(sum(CASE WHEN (nm.m & s.s) = nm.m
                                          THEN nm.n ELSE 0 END), 0)
                       AS BIGINT) AS v
      FROM subsets s CROSS JOIN nm GROUP BY s.s
    ),
    phis AS (
      {" UNION ALL ".join(f'''
      SELECT '{ch}' AS channel,
             CAST(sum(CASE bit_count(a.s) WHEN 0 THEN 6 WHEN 1 THEN 2
                           WHEN 2 THEN 2 ELSE 6 END * (b.v - a.v))
                  AS BIGINT) AS phi_24ths
      FROM v a JOIN v b ON b.s = a.s | {1 << i}
      WHERE (a.s & {1 << i}) = 0''' for i, ch in enumerate(_MTA_CHANNELS))}
    ),
    tot AS (
      SELECT (SELECT v FROM v WHERE s = 15) - (SELECT v FROM v WHERE s = 0)
               AS gain
    )
    SELECT channel, phi_24ths,
           round(phi_24ths / 24.0, 6) AS phi_users,
           round(phi_24ths * 100.0 / (24 * greatest(t.gain, 1)), 6)
             AS share_pct
    FROM phis CROSS JOIN tot t
    ORDER BY channel
    """,
)
def shapley_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value multi-touch attribution (the game-theoretic MTA of
    Zhao et al. 2018 / Google Ads' data-driven attribution): coalition
    value v(S) = converted users whose pre-purchase touch-set needs only
    channels in S, and each channel's credit is its exact Shapley value
    — the principled split that first/last/linear (multitouch_
    attribution) can't give when channels overlap.

    Exactness: with 4 channels every weight s!(3−s)! is an integer over
    4! = 24, so φ is an exact BIGINT in 24ths; touch-sets are 4-bit
    masks, the 16 coalition values come from one zeta transform
    (subset-sum join over the 16-row mask-count table), and the
    efficiency axiom Σφ = v(N) − v(∅) is test-pinned. Scale shape: one
    events pass builds per-user masks (first-purchase anti-window via a
    broadcast of the tiny converted-user table... the user-keyed join
    IS the fact shuffle), everything after is 16-row algebra."""
    e = load(spark, sf_dir).events
    first_p = e.filter(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(F.min("ts").alias("pts"))
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
    )
    touches = e.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("tu"), "ts", bit.alias("b")
    )
    masks = (
        first_p.join(
            touches,
            (F.col("tu") == F.col("user_id")) & (F.col("ts") < F.col("pts")),
            "left",
        )
        .groupBy("user_id")
        .agg(
            F.coalesce(F.sum_distinct(F.col("b")), F.lit(0))
            .cast("long")
            .alias("m")
        )
    )
    nm = masks.groupBy("m").agg(F.count(F.lit(1)).cast("long").alias("n"))
    subsets = spark.range(16).select(F.col("id").cast("long").alias("s"))
    v = (
        subsets.crossJoin(nm)
        .groupBy("s")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("m").bitwiseAND(F.col("s")) == F.col("m"),
                        F.col("n"),
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("v")
        )
        # 16 rows; self-joined once per channel + two scalar lookups
        .localCheckpoint(eager=True)
    )
    wcase = (
        F.when(F.bit_count(F.col("s")) == 0, 6)
        .when(F.bit_count(F.col("s")) == 1, 2)
        .when(F.bit_count(F.col("s")) == 2, 2)
        .otherwise(6)
    )
    vb = v.select(F.col("s").alias("s2"), F.col("v").alias("v2"))
    phis = []
    for i, ch in enumerate(_MTA_CHANNELS):
        bitv = 1 << i
        phi = (
            v.filter(F.col("s").bitwiseAND(F.lit(bitv)) == 0)
            .join(vb, F.col("s2") == F.col("s").bitwiseOR(F.lit(bitv)))
            .agg(
                F.sum(wcase * (F.col("v2") - F.col("v")))
                .cast("long")
                .alias("phi_24ths")
            )
            .select(F.lit(ch).alias("channel"), "phi_24ths")
        )
        phis.append(phi)
    allphi = phis[0]
    for ph in phis[1:]:
        allphi = allphi.unionByName(ph)
    vn = v.filter(F.col("s") == 15).select(F.col("v").alias("vn"))
    v0 = v.filter(F.col("s") == 0).select(F.col("v").alias("v0"))
    return (
        allphi.crossJoin(F.broadcast(vn))
        .crossJoin(F.broadcast(v0))
        .select(
            "channel",
            "phi_24ths",
            F.round(F.col("phi_24ths") / 24.0, 6).alias("phi_users"),
            F.round(
                F.col("phi_24ths")
                * 100.0
                / (24 * F.greatest(F.col("vn") - F.col("v0"), F.lit(1))),
                6,
            ).alias("share_pct"),
        )
        .orderBy("channel")
    )


# Markov MTA: absorption-probability iteration in exact integer micro
# units — v'(s) = (Σ_t c_st·v(t)) // n_s — so every engine computes the
# identical vector at every step (floor-div drift is mirrored).
MARKOV_ITERS = 16
_MARKOV_SCEN = ["base", "click", "error", "signup", "view"]


def _markov_oracle() -> str:
    scen = ", ".join(f"'{s}'" for s in _MARKOV_SCEN)
    steps = []
    for i in range(MARKOV_ITERS):
        steps.append(
            f"""v{i + 1} AS MATERIALIZED (
      SELECT s.scenario, s.state,
             CAST(CASE WHEN s.state = 'conv' THEN 1000000
                       WHEN s.state = 'null' THEN 0
                       ELSE coalesce(
                         (SELECT sum(t.c * pv.v) // any_value(t.n)
                          FROM trans t JOIN v{i} pv
                            ON pv.scenario = s.scenario AND pv.state = t.dst
                          WHERE t.scenario = s.scenario AND t.src = s.state),
                         0) END AS BIGINT) AS v
      FROM states s
    )"""
        )
    unrolled = ",\n    ".join(steps)
    return f"""
    WITH first_p AS (
      SELECT user_id, min(ts) AS pts FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touches AS (
      SELECT e.user_id, e.ts, e.event_id, e.event_type,
             f.user_id IS NOT NULL AS converts
      FROM events e LEFT JOIN first_p f ON f.user_id = e.user_id
      WHERE e.event_type <> 'purchase'
        AND (f.user_id IS NULL OR e.ts < f.pts)
    ),
    hops AS (
      SELECT user_id, converts, event_type AS dst,
             coalesce(lag(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id), 'start') AS src,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rev
      FROM touches
    ),
    raw_edges AS (
      SELECT src, dst FROM hops
      UNION ALL
      SELECT dst AS src, CASE WHEN converts THEN 'conv' ELSE 'null' END AS dst
      FROM hops WHERE rev = 1
      UNION ALL
      SELECT 'start' AS src, CASE WHEN f.n_touch THEN NULL
                                  ELSE 'conv' END AS dst
      FROM (SELECT u.user_id,
                   max(CASE WHEN t.user_id IS NOT NULL THEN TRUE
                            ELSE FALSE END) AS n_touch
            FROM first_p u LEFT JOIN touches t ON t.user_id = u.user_id
            GROUP BY u.user_id) f
      WHERE NOT f.n_touch
    ),
    edges AS (SELECT src, dst FROM raw_edges WHERE dst IS NOT NULL),
    scens AS (SELECT unnest([{scen}]) AS scenario),
    trans0 AS (
      SELECT s.scenario, e.src,
             CASE WHEN e.dst = s.scenario THEN 'null' ELSE e.dst END AS dst,
             CAST(count(*) AS BIGINT) AS c
      FROM edges e CROSS JOIN scens s
      WHERE e.src <> s.scenario
      GROUP BY 1, 2, 3
    ),
    trans AS MATERIALIZED (
      SELECT scenario, src, dst, c,
             CAST(sum(c) OVER (PARTITION BY scenario, src) AS BIGINT) AS n
      FROM trans0
    ),
    states AS MATERIALIZED (
      SELECT DISTINCT scenario, src AS state FROM trans
      UNION
      SELECT scenario, 'conv' FROM scens
      UNION
      SELECT scenario, 'null' FROM scens
    ),
    v0 AS MATERIALIZED (
      SELECT scenario, state,
             CAST(CASE WHEN state = 'conv' THEN 1000000 ELSE 0 END AS BIGINT)
               AS v
      FROM states
    ),
    {unrolled},
    pconv AS (
      SELECT scenario, v FROM v{MARKOV_ITERS} WHERE state = 'start'
    )
    SELECT r.scenario AS removed_channel,
           round(b.v / 1000000.0, 6) AS p_conv_base,
           round(r.v / 1000000.0, 6) AS p_conv_removed,
           round((b.v - r.v) / CAST(b.v AS DOUBLE), 6) AS removal_effect
    FROM pconv r CROSS JOIN (SELECT v FROM pconv WHERE scenario = 'base') b
    WHERE r.scenario <> 'base'
    ORDER BY removed_channel
    """


@register("markov_removal_attribution", oracle=_markov_oracle())
def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al. 2016 —
    the OTHER principled MTA next to shapley_touch_attribution): build
    the first-order channel transition graph from pre-purchase touch
    paths (start → touches → conv/null), then each channel's credit is
    how much the absorption probability P(start→conv) DROPS when that
    channel's inbound edges are redirected to null — captures sequence
    effects Shapley's set-based view ignores.

    Determinism: transition counts are exact BIGINTs; the absorption
    vector iterates in 1e-6 fixed point with v'(s) = (Σ c_st·v(t)) //
    n_s — integer products, integer floor-div — so all 16 supersteps
    are bit-identical cross-engine (the graph_pagerank discipline), and
    the ≤1-micro-per-step floor drift is mirrored exactly. Removal
    monotonicity (effect >= 0) is test-pinned. Scale shape: one events
    pass with per-user lag windows builds edges; everything after runs
    on the (scenario × states²) table — ≤ 5·7² rows — for 16 bounded
    joins."""
    e = load(spark, sf_dir).events
    first_p = e.filter(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(F.min("ts").alias("pts"))
    # first_p is user-proportional (one row per converted user) — NO
    # broadcast hint; a plain user_id equi-join lets AQE broadcast only
    # when the converted-user side is actually small at the given scale.
    touches = (
        e.filter(F.col("event_type") != "purchase")
        .join(first_p, "user_id", "left")
        .filter(F.col("pts").isNull() | (F.col("ts") < F.col("pts")))
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.col("pts").isNotNull().alias("converts"),
        )
    )
    wlag = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrev = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    hops = touches.select(
        "user_id",
        "converts",
        F.col("event_type").alias("dst"),
        F.coalesce(F.lag("event_type").over(wlag), F.lit("start")).alias("src"),
        F.row_number().over(wrev).alias("rev"),
    )
    tails = hops.filter(F.col("rev") == 1).select(
        F.col("dst").alias("src"),
        F.when(F.col("converts"), "conv").otherwise("null").alias("dst"),
    )
    # converted users with zero pre-purchase touches: start -> conv
    no_touch = (
        first_p.join(
            touches.select(F.col("user_id").alias("tu")).distinct(),
            F.col("tu") == F.col("user_id"),
            "left_anti",
        )
        .select(F.lit("start").alias("src"), F.lit("conv").alias("dst"))
    )
    edges = (
        hops.select("src", "dst").unionByName(tails).unionByName(no_touch)
    )
    scens = F.explode(F.array(*[F.lit(x) for x in _MARKOV_SCEN])).alias(
        "scenario"
    )
    trans0 = (
        edges.select("src", "dst", scens)
        .filter(F.col("src") != F.col("scenario"))
        .select(
            "scenario",
            "src",
            F.when(F.col("dst") == F.col("scenario"), "null")
            .otherwise(F.col("dst"))
            .alias("dst"),
        )
        .groupBy("scenario", "src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wn = W.partitionBy("scenario", "src")
    trans = trans0.withColumn(
        "n", F.sum("c").over(wn).cast("long")
    ).localCheckpoint(eager=True)
    states = (
        trans.select("scenario", F.col("src").alias("state"))
        .union(
            trans.select("scenario").distinct().select(
                "scenario", F.lit("conv").alias("state")
            )
        )
        .union(
            trans.select("scenario").distinct().select(
                "scenario", F.lit("null").alias("state")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    v = states.select(
        "scenario",
        "state",
        F.when(F.col("state") == "conv", 1_000_000)
        .otherwise(0)
        .cast("long")
        .alias("v"),
    )
    for i in range(MARKOV_ITERS):
        flow = (
            trans.join(
                v.select(
                    F.col("scenario").alias("ts2"),
                    F.col("state").alias("vdst"),
                    F.col("v").alias("pv"),
                ),
                (F.col("ts2") == F.col("scenario"))
                & (F.col("vdst") == F.col("dst")),
            )
            .groupBy("scenario", "src")
            .agg(
                F.expr("CAST(sum(c * pv) div any_value(n) AS BIGINT)").alias(
                    "nv"
                )
            )
            .select(
                F.col("scenario").alias("fs"),
                F.col("src").alias("fstate"),
                "nv",
            )
        )
        v = (
            states.join(
                flow,
                (F.col("fs") == F.col("scenario"))
                & (F.col("fstate") == F.col("state")),
                "left",
            )
            .select(
                "scenario",
                "state",
                F.when(F.col("state") == "conv", 1_000_000)
                .when(F.col("state") == "null", 0)
                .otherwise(F.coalesce(F.col("nv"), F.lit(0)))
                .cast("long")
                .alias("v"),
            )
        )
        if (i + 1) % 4 == 0:
            v = v.localCheckpoint(eager=True)
    pconv = v.filter(F.col("state") == "start").select("scenario", "v")
    base = pconv.filter(F.col("scenario") == "base").select(
        F.col("v").alias("bv")
    )
    return (
        pconv.filter(F.col("scenario") != "base")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("scenario").alias("removed_channel"),
            F.round(F.col("bv") / 1_000_000.0, 6).alias("p_conv_base"),
            F.round(F.col("v") / 1_000_000.0, 6).alias("p_conv_removed"),
            F.round(
                (F.col("bv") - F.col("v")) / F.col("bv").cast("double"), 6
            ).alias("removal_effect"),
        )
        .orderBy("removed_channel")
    )


@register(
    "qini_uplift_curve",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN md5(CAST(user_id AS VARCHAR)) < '8'
                  THEN 0 ELSE 1 END AS treated,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                           THEN {_EV_CENTS} ELSE 0 END) AS BIGINT) AS score,
             max(CASE WHEN event_type = 'purchase'
                      AND ts >= TIMESTAMP '{_CUPED_SPLIT}'
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT treated, conv,
             row_number() OVER (ORDER BY score DESC, user_id) AS rn,
             count(*) OVER () AS n
      FROM per_user
    ),
    deciled AS (
      SELECT (rn * 10 - 1) // n + 1 AS decile, treated, conv FROM ranked
    ),
    per_dec AS (
      SELECT decile,
             CAST(sum(treated) AS BIGINT) AS n_t,
             CAST(sum(1 - treated) AS BIGINT) AS n_c,
             CAST(sum(treated * conv) AS BIGINT) AS conv_t,
             CAST(sum((1 - treated) * conv) AS BIGINT) AS conv_c
      FROM deciled GROUP BY decile
    ),
    cum AS (
      SELECT decile,
             CAST(sum(n_t) OVER w AS BIGINT) AS ct_n,
             CAST(sum(n_c) OVER w AS BIGINT) AS cc_n,
             CAST(sum(conv_t) OVER w AS BIGINT) AS ct_conv,
             CAST(sum(conv_c) OVER w AS BIGINT) AS cc_conv
      FROM per_dec
      WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
    )
    SELECT CAST(decile AS BIGINT) AS decile, ct_n AS n_treated_cum,
           cc_n AS n_control_cum, ct_conv AS conv_treated_cum,
           cc_conv AS conv_control_cum,
           CASE WHEN cc_n = 0 THEN CAST(NULL AS DOUBLE)
                ELSE round(ct_conv - cc_conv * (ct_n / CAST(cc_n AS DOUBLE)), 6)
           END AS qini
    FROM cum ORDER BY decile
    """,
)
def qini_uplift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve for uplift targeting (Radcliffe 2007): users ranked
    by a targeting score (pre-period spend, descending — "contact the
    big spenders first"), and at each cumulative decile the incremental
    conversions Qini(k) = conv_T(k) − conv_C(k)·N_T(k)/N_C(k) — the
    uplift-model evaluation that shows whether targeting beats
    contacting everyone (the curve's endpoint is the overall
    treatment-control conversion gap, test-pinned).

    Exactness: treatment arm (md5 split), conversions, and the
    targeting score are exact integers from ONE per-user pass; decile
    assignment uses the integer identity (rn·10−1)//n + 1 over the
    two-phase distributed ranking (no single-partition window over the
    user table); cumulative counts are exact BIGINTs over the 10-row
    decile table and Qini is one double expression per row (NULL until
    the cumulative prefix contains a control user, mirrored on both
    engines)."""
    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
    )

    e = load(spark, sf_dir).events
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    cents = F.expr(_EV_CENTS)
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, cents).otherwise(0))
        .cast("long")
        .alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") >= split),
                1,
            ).otherwise(0)
        ).alias("conv"),
    ).select(
        "user_id",
        "score",
        "conv",
        F.when(F.md5(F.col("user_id").cast("string")) < "8", 0)
        .otherwise(1)
        .alias("treated"),
    )
    ranked = global_order_stats(
        per_user, "score", "user_id", ascending=False
    ).select("treated", "conv", F.col("global_rank").alias("rn"))
    n = per_user.agg(F.count(F.lit(1)).cast("long").alias("n"))
    per_dec = (
        ranked.crossJoin(F.broadcast(n))
        .select(
            F.expr("(rn * 10 - 1) div n + 1").cast("long").alias("decile"),
            "treated",
            "conv",
        )
        .groupBy("decile")
        .agg(
            F.sum("treated").cast("long").alias("n_t"),
            F.sum(1 - F.col("treated")).cast("long").alias("n_c"),
            F.sum(F.col("treated") * F.col("conv")).cast("long").alias("conv_t"),
            F.sum((1 - F.col("treated")) * F.col("conv"))
            .cast("long")
            .alias("conv_c"),
        )
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum = per_dec.select(
        "decile",
        F.sum("n_t").over(wc).cast("long").alias("n_treated_cum"),
        F.sum("n_c").over(wc).cast("long").alias("n_control_cum"),
        F.sum("conv_t").over(wc).cast("long").alias("conv_treated_cum"),
        F.sum("conv_c").over(wc).cast("long").alias("conv_control_cum"),
    )
    return cum.select(
        "decile",
        "n_treated_cum",
        "n_control_cum",
        "conv_treated_cum",
        "conv_control_cum",
        F.when(F.col("n_control_cum") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("conv_treated_cum")
                - F.col("conv_control_cum")
                * (
                    F.col("n_treated_cum")
                    / F.col("n_control_cum").cast("double")
                ),
                6,
            )
        )
        .alias("qini"),
    ).orderBy("decile")


@register(
    "nelson_aalen_hazard",
    oracle="""
    WITH spans AS (
      SELECT user_id,
             CAST(date_trunc('day', min(ts)) AS DATE) AS first_day,
             CAST(date_trunc('day', max(ts)) AS DATE) AS last_day
      FROM events GROUP BY user_id
    ),
    bounds AS (SELECT CAST(date_trunc('day', max(ts)) AS DATE) AS end_day
               FROM events),
    lives AS (
      SELECT CAST(date_diff('day', first_day, last_day) AS BIGINT) AS t_days,
             CASE WHEN date_diff('day', last_day, end_day) < 14 THEN 0 ELSE 1
             END AS churned
      FROM spans CROSS JOIN bounds
    ),
    per_t AS (
      SELECT t_days,
             CAST(sum(churned) AS BIGINT) AS n_churned,
             CAST(count(*) AS BIGINT) AS n_total
      FROM lives GROUP BY t_days
    ),
    risk AS (
      SELECT t_days, n_churned,
             CAST(sum(n_total) OVER (ORDER BY t_days ROWS BETWEEN CURRENT ROW
                    AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      FROM per_t
    )
    SELECT t_days, n_risk, n_churned,
           round(sum(n_churned * 1.0 / n_risk)
                 OVER (ORDER BY t_days ROWS UNBOUNDED PRECEDING), 6)
             AS cum_hazard,
           round(sum(n_churned * 1.0 / (CAST(n_risk AS DOUBLE) * n_risk))
                 OVER (ORDER BY t_days ROWS UNBOUNDED PRECEDING), 6)
             AS hazard_variance,
           round(exp(-sum(n_churned * 1.0 / n_risk)
                     OVER (ORDER BY t_days ROWS UNBOUNDED PRECEDING)), 6)
             AS na_survival
    FROM risk ORDER BY t_days
    """,
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over the same censored
    user lifetimes as survival_km_curve: H(t) = Σ_{s≤t} d_s/n_s with
    Aalen's variance Σ d_s/n_s², plus the Fleming-Harrington survival
    exp(−H) — the hazard-scale view KM's product-limit doesn't give
    (additive, so hazards of disjoint segments of the timeline sum).

    Same shape and determinism argument as the KM query: the stream
    collapses to one row per user then per distinct lifetime-day, both
    windows run over a bounded table in an ORDER-defined sequential
    accumulation, and the terms are exact integer ratios — any
    window-tree ulp noise sits far below 6-decimal rounding. The
    identity exp(−H(t)) >= KM(t) (term-wise e^{-x} >= 1−x) is
    test-pinned."""
    e = load(spark, sf_dir).events
    spans = e.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("first_day"),
        F.to_date(F.max("ts")).alias("last_day"),
    )
    bounds = e.agg(F.to_date(F.max("ts")).alias("end_day"))
    lives = spans.crossJoin(F.broadcast(bounds)).select(
        F.datediff("last_day", "first_day").cast("long").alias("t_days"),
        F.when(F.datediff("end_day", "last_day") < 14, 0)
        .otherwise(1)
        .alias("churned"),
    )
    per_t = (
        lives.groupBy("t_days")
        .agg(
            F.sum("churned").cast("long").alias("n_churned"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )
        .localCheckpoint(eager=True)
    )
    w_risk = W.orderBy("t_days").rowsBetween(W.currentRow, W.unboundedFollowing)
    w_cum = W.orderBy("t_days").rowsBetween(W.unboundedPreceding, 0)
    risk = per_t.select(
        "t_days",
        "n_churned",
        F.sum("n_total").over(w_risk).cast("long").alias("n_risk"),
    )
    h = F.sum(F.col("n_churned") * 1.0 / F.col("n_risk")).over(w_cum)
    hv = F.sum(
        F.col("n_churned") * 1.0 / (F.col("n_risk").cast("double") * F.col("n_risk"))
    ).over(w_cum)
    return risk.select(
        "t_days",
        "n_risk",
        "n_churned",
        F.round(h, 6).alias("cum_hazard"),
        F.round(hv, 6).alias("hazard_variance"),
        F.round(F.exp(-h), 6).alias("na_survival"),
    ).orderBy("t_days")


@register(
    "mcnemar_paired_conversion",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase'
                      AND ts < TIMESTAMP '{_CUPED_SPLIT}'
                      THEN 1 ELSE 0 END) AS pre,
             max(CASE WHEN event_type = 'purchase'
                      AND ts >= TIMESTAMP '{_CUPED_SPLIT}'
                      THEN 1 ELSE 0 END) AS post
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(sum(pre * post) AS BIGINT) AS both_c,
             CAST(sum(pre * (1 - post)) AS BIGINT) AS pre_only,
             CAST(sum((1 - pre) * post) AS BIGINT) AS post_only,
             CAST(sum((1 - pre) * (1 - post)) AS BIGINT) AS neither,
             CAST(count(*) AS BIGINT) AS n_users
      FROM per_user
    )
    SELECT n_users, both_c AS converted_both, pre_only, post_only, neither,
           round(CASE WHEN pre_only + post_only = 0 THEN 0.0
                      ELSE (CAST(pre_only AS DOUBLE) - post_only)
                           * (pre_only - post_only)
                           / (pre_only + post_only) END, 6)
             AS mcnemar_chi2,
           round(CASE WHEN pre_only + post_only = 0 THEN 0.0
                      ELSE (abs(CAST(pre_only AS DOUBLE) - post_only) - 1)
                           * (abs(CAST(pre_only AS DOUBLE) - post_only) - 1)
                           / (pre_only + post_only) END, 6)
             AS mcnemar_chi2_cc
    FROM m
    """,
)
def mcnemar_paired_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on the paired pre/post conversion panel: the same
    user observed in both periods, so only the DISCORDANT pairs carry
    information — χ² = (b−c)²/(b+c) over pre-only (b) vs post-only (c)
    converters, with Edwards' continuity-corrected variant — the paired
    counterpart to ab_test_conversion's independent-proportions z
    (McNemar 1947).

    All four contingency cells are exact integer sums from ONE per-user
    pass; both statistics are single double expressions of them, with
    the degenerate b+c=0 case guarded to 0 by an exact integer CASE on
    both engines."""
    e = load(spark, sf_dir).events
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    conv = lambda cond: F.max(
        F.when((F.col("event_type") == "purchase") & cond, 1).otherwise(0)
    )
    per_user = e.groupBy("user_id").agg(
        conv(F.col("ts") < split).alias("pre"),
        conv(F.col("ts") >= split).alias("post"),
    )
    m = per_user.agg(
        F.sum(F.col("pre") * F.col("post")).cast("long").alias("both_c"),
        F.sum(F.col("pre") * (1 - F.col("post"))).cast("long").alias("pre_only"),
        F.sum((1 - F.col("pre")) * F.col("post")).cast("long").alias("post_only"),
        F.sum((1 - F.col("pre")) * (1 - F.col("post")))
        .cast("long")
        .alias("neither"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    b, c = F.col("pre_only"), F.col("post_only")
    disc = b + c
    diff = b.cast("double") - c
    chi2 = F.when(disc == 0, 0.0).otherwise(diff * (b - c) / disc)
    adiff = F.abs(diff) - 1
    chi2cc = F.when(disc == 0, 0.0).otherwise(adiff * adiff / disc)
    return m.select(
        "n_users",
        F.col("both_c").alias("converted_both"),
        "pre_only",
        "post_only",
        "neither",
        F.round(chi2, 6).alias("mcnemar_chi2"),
        F.round(chi2cc, 6).alias("mcnemar_chi2_cc"),
    )


@register(
    "woe_information_value",
    oracle="""
    WITH tgt AS (
      SELECT c.c_custkey, c.c_mktsegment,
             CAST(CASE WHEN max(o.o_orderdate) >= TIMESTAMP '1997-01-01'
                  THEN 1 ELSE 0 END AS BIGINT) AS active
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment
    ),
    cells AS (
      SELECT c_mktsegment AS segment,
             CAST(sum(active) AS BIGINT) AS n_good,
             CAST(sum(1 - active) AS BIGINT) AS n_bad
      FROM tgt GROUP BY c_mktsegment
    ),
    tot AS (SELECT CAST(sum(n_good) AS BIGINT) AS g,
                   CAST(sum(n_bad) AS BIGINT) AS b FROM cells),
    woe AS (
      SELECT segment, n_good, n_bad,
             CAST(floor(ln(((2 * n_good + 1) / (2.0 * t.g + 1))
                           / ((2 * n_bad + 1) / (2.0 * t.b + 1)))
                        * 1000000 + 1e-3) AS BIGINT) AS woe_micro,
             (2 * n_good + 1) / (2.0 * t.g + 1)
               - (2 * n_bad + 1) / (2.0 * t.b + 1) AS dpct
      FROM cells CROSS JOIN tot t
    )
    SELECT segment, n_good AS n_active, n_bad AS n_inactive,
           round(woe_micro / 1000000.0, 6) AS woe,
           round(dpct * woe_micro / 1000000.0, 6) AS iv_contribution,
           round(sum(dpct * woe_micro / 1000000.0) OVER (), 6)
             AS iv_total
    FROM woe ORDER BY segment
    """,
)
def woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence and Information Value of the market segment
    against customer activity (any 1997+ order) — the credit-scoring
    feature screen (Siddiqi): WoE = ln(good%/bad%) per category with
    add-½ smoothing, IV = Σ (good% − bad%)·WoE; rule-of-thumb IV < 0.02
    means the feature is useless, > 0.3 strong.

    Fixed-point discipline: distribution ratios are deterministic
    doubles from exact integer counts, ONE ln per category floored to
    micro units; the IV sum runs over the bounded segment table (the
    ≤5-term double sum sits far below 6-decimal rounding — the KM
    argument). One customer⋈orders pass, bounded algebra after."""
    t = load(spark, sf_dir)
    tgt = (
        t.customer.join(
            t.orders, F.col("o_custkey") == F.col("c_custkey"), "left"
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.max(
                F.when(
                    F.col("o_orderdate")
                    >= F.lit("1997-01-01 00:00:00").cast("timestamp"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("active")
        )
    )
    cells = tgt.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.sum("active").cast("long").alias("n_good"),
        F.sum(1 - F.col("active")).cast("long").alias("n_bad"),
    )
    tot = cells.agg(
        F.sum("n_good").cast("long").alias("g"),
        F.sum("n_bad").cast("long").alias("b"),
    )
    gpct = (2 * F.col("n_good") + 1) / (2.0 * F.col("g") + 1)
    bpct = (2 * F.col("n_bad") + 1) / (2.0 * F.col("b") + 1)
    woe = cells.crossJoin(F.broadcast(tot)).select(
        "segment",
        "n_good",
        "n_bad",
        F.floor(F.log(gpct / bpct) * 1_000_000 + 1e-3)
        .cast("bigint")
        .alias("woe_micro"),
        (gpct - bpct).alias("dpct"),
    )
    wall = W.partitionBy()
    return woe.select(
        "segment",
        F.col("n_good").alias("n_active"),
        F.col("n_bad").alias("n_inactive"),
        F.round(F.col("woe_micro") / 1_000_000.0, 6).alias("woe"),
        F.round(F.col("dpct") * F.col("woe_micro") / 1_000_000.0, 6).alias(
            "iv_contribution"
        ),
        F.round(
            F.sum(F.col("dpct") * F.col("woe_micro") / 1_000_000.0).over(wall),
            6,
        ).alias("iv_total"),
    ).orderBy("segment")


@register(
    "mix_rate_decomposition",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS seg,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS s
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(sum(CASE WHEN yr = 1996 THEN n ELSE 0 END) AS BIGINT) AS n96,
             CAST(sum(CASE WHEN yr = 1997 THEN n ELSE 0 END) AS BIGINT) AS n97
      FROM cells
    ),
    wide AS (
      SELECT seg,
             CAST(sum(CASE WHEN yr = 1996 THEN n ELSE 0 END) AS BIGINT) AS a_n,
             CAST(sum(CASE WHEN yr = 1996 THEN s ELSE 0 END) AS BIGINT) AS a_s,
             CAST(sum(CASE WHEN yr = 1997 THEN n ELSE 0 END) AS BIGINT) AS b_n,
             CAST(sum(CASE WHEN yr = 1997 THEN s ELSE 0 END) AS BIGINT) AS b_s
      FROM cells GROUP BY seg
    ),
    eff AS (
      SELECT w.seg, w.a_n, w.b_n,
             w.a_s / (CAST(w.a_n AS DOUBLE) * 100) AS m_a,
             w.b_s / (CAST(w.b_n AS DOUBLE) * 100) AS m_b,
             (w.b_n / CAST(t.n97 AS DOUBLE) - w.a_n / CAST(t.n96 AS DOUBLE))
               * (w.a_s / (CAST(w.a_n AS DOUBLE) * 100)) AS mix_eff,
             (w.b_n / CAST(t.n97 AS DOUBLE))
               * (w.b_s / (CAST(w.b_n AS DOUBLE) * 100)
                  - w.a_s / (CAST(w.a_n AS DOUBLE) * 100)) AS rate_eff
      FROM wide w CROSS JOIN tot t
    )
    SELECT seg AS priority, a_n AS n_1996, b_n AS n_1997,
           round(m_a, 6) AS mean_1996, round(m_b, 6) AS mean_1997,
           round(mix_eff, 6) AS mix_effect,
           round(rate_eff, 6) AS rate_effect,
           round(sum(mix_eff + rate_eff) OVER (), 6) AS delta_total_mean
    FROM eff ORDER BY priority
    """,
)
def mix_rate_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix/rate (Oaxaca-Blinder-style) decomposition of the 1996→1997
    change in mean order value by order priority: Δmean splits EXACTLY
    into a MIX effect Σ(Δshare·mean₉₆) — the segments got re-weighted —
    and a RATE effect Σ(share₉₇·Δmean) — values moved within segments;
    the mix-shift analysis behind every "is revenue/order down because
    of WHAT we sell or HOW MUCH each sells for" BI question. The
    identity Σ(mix+rate) = Δmean is algebraic and test-pinned.

    One orders scan to the (priority, year) cell table; shares and
    means are deterministic doubles of exact integer counts/cent sums;
    the decomposition identity holds exactly in real arithmetic and to
    double rounding here. Window over the 5-row effect table only."""
    o = load(spark, sf_dir).orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cells = o.groupBy(
        F.col("o_orderpriority").alias("seg"),
        F.year("o_orderdate").cast("long").alias("yr"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .cast("long")
        .alias("s"),
    ).localCheckpoint(eager=True)
    yif = lambda y, c: F.sum(F.when(F.col("yr") == y, F.col(c)).otherwise(0)).cast("long")
    tot = cells.agg(
        yif(1996, "n").alias("n96"), yif(1997, "n").alias("n97")
    )
    wide = cells.groupBy("seg").agg(
        yif(1996, "n").alias("a_n"),
        yif(1996, "s").alias("a_s"),
        yif(1997, "n").alias("b_n"),
        yif(1997, "s").alias("b_s"),
    )
    m_a = F.col("a_s") / (F.col("a_n").cast("double") * 100)
    m_b = F.col("b_s") / (F.col("b_n").cast("double") * 100)
    w_a = F.col("a_n") / F.col("n96").cast("double")
    w_b = F.col("b_n") / F.col("n97").cast("double")
    eff = wide.crossJoin(F.broadcast(tot)).select(
        "seg",
        "a_n",
        "b_n",
        m_a.alias("m_a"),
        m_b.alias("m_b"),
        ((w_b - w_a) * m_a).alias("mix_eff"),
        (w_b * (m_b - m_a)).alias("rate_eff"),
    )
    wall = W.partitionBy()
    return eff.select(
        F.col("seg").alias("priority"),
        F.col("a_n").alias("n_1996"),
        F.col("b_n").alias("n_1997"),
        F.round("m_a", 6).alias("mean_1996"),
        F.round("m_b", 6).alias("mean_1997"),
        F.round("mix_eff", 6).alias("mix_effect"),
        F.round("rate_eff", 6).alias("rate_effect"),
        F.round(
            F.sum(F.col("mix_eff") + F.col("rate_eff")).over(wall), 6
        ).alias("delta_total_mean"),
    ).orderBy("priority")


@register(
    "brown_forsythe_variance",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN md5(CAST(user_id AS VARCHAR)) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(sum({_EV_CENTS}) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    med AS (
      SELECT arm,
             CAST(2 * percentile_cont(0.5) WITHIN GROUP (ORDER BY c)
                  AS BIGINT) AS med2
      FROM per_user GROUP BY arm
    ),
    z AS (
      SELECT p.arm, abs(2 * p.c - m.med2) AS z2
      FROM per_user p JOIN med m ON m.arm = p.arm
    ),
    m2 AS (
      SELECT CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN arm = 'A' THEN z2 ELSE 0 END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN arm = 'B' THEN z2 ELSE 0 END) AS BIGINT) AS sb,
             CAST(sum(CASE WHEN arm = 'A' THEN z2 * z2 ELSE 0 END) AS BIGINT)
               AS ssa,
             CAST(sum(CASE WHEN arm = 'B' THEN z2 * z2 ELSE 0 END) AS BIGINT)
               AS ssb
      FROM z
    ),
    f AS (
      SELECT na, nb,
             sa / (CAST(na AS DOUBLE) * 200) AS mz_a,
             sb / (CAST(nb AS DOUBLE) * 200) AS mz_b,
             (ssa - CAST(sa AS DOUBLE) * sa / na)
               + (ssb - CAST(sb AS DOUBLE) * sb / nb) AS ssw,
             CAST(na AS DOUBLE) * nb / (na + nb)
               * (sa / CAST(na AS DOUBLE) - sb / CAST(nb AS DOUBLE))
               * (sa / CAST(na AS DOUBLE) - sb / CAST(nb AS DOUBLE)) AS ssb_g
      FROM m2
    )
    SELECT na AS n_a, nb AS n_b,
           round(mz_a, 6) AS mean_absdev_a, round(mz_b, 6) AS mean_absdev_b,
           round(CASE WHEN ssw = 0 THEN 0.0
                      ELSE (na + nb - 2) * ssb_g / ssw END, 6)
             AS bf_f_statistic
    FROM f
    """,
)
def brown_forsythe_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test for equal variances between the hash-split
    arms: a one-way ANOVA F on the absolute deviations from each arm's
    MEDIAN (the robust Levene variant, Brown & Forsythe 1974) — the
    assumption check run before trusting a pooled-variance t, and the
    robust alternative to an F-ratio of raw variances.

    Exactness: medians come from percentile_cont over exact cents and
    are DOUBLED to stay integral (the .5-cent interpolation case), so
    every |2x − 2·med| deviation is an exact BIGINT; the F assembles
    from exact per-arm moment sums of those deviations in one identical
    double expression (between-group SS uses the two-group closed form
    n_a·n_b/(n_a+n_b)·(z̄_a−z̄_b)²); zero within-group variation guards
    to 0. One per-user pass, one bounded median per arm, one rollup."""
    e = load(spark, sf_dir).events
    cents = F.expr(_EV_CENTS)
    per_user = e.groupBy("user_id").agg(
        F.sum(cents).cast("long").alias("c")
    ).select(
        F.when(F.md5(F.col("user_id").cast("string")) < "8", "A")
        .otherwise("B")
        .alias("arm"),
        "c",
    ).localCheckpoint(eager=True)  # read by the median pass and the z pass
    from data_warehouse_data_mining_spark.operators.relational import (
        exact_group_percentiles,
    )

    med = exact_group_percentiles(per_user, "arm", "c", [0.5]).select(
        F.col("arm").alias("m_arm"),
        (2 * F.col("val")).cast("long").alias("med2"),
    )
    z = per_user.join(
        F.broadcast(med), F.col("m_arm") == F.col("arm")
    ).select("arm", F.abs(2 * F.col("c") - F.col("med2")).alias("z2"))
    s_if = lambda a, c: F.sum(
        F.when(F.col("arm") == a, c).otherwise(0)
    ).cast("long")
    m2 = z.agg(
        s_if("A", F.lit(1)).alias("na"),
        s_if("B", F.lit(1)).alias("nb"),
        s_if("A", F.col("z2")).alias("sa"),
        s_if("B", F.col("z2")).alias("sb"),
        s_if("A", F.col("z2") * F.col("z2")).alias("ssa"),
        s_if("B", F.col("z2") * F.col("z2")).alias("ssb"),
    )
    nad, nbd = F.col("na").cast("double"), F.col("nb").cast("double")
    ssw = (F.col("ssa") - F.col("sa").cast("double") * F.col("sa") / F.col("na")) + (
        F.col("ssb") - F.col("sb").cast("double") * F.col("sb") / F.col("nb")
    )
    dmean = F.col("sa") / nad - F.col("sb") / nbd
    ssb_g = nad * F.col("nb") / (F.col("na") + F.col("nb")) * dmean * dmean
    return m2.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(F.col("sa") / (nad * 200), 6).alias("mean_absdev_a"),
        F.round(F.col("sb") / (nbd * 200), 6).alias("mean_absdev_b"),
        F.round(
            F.when(ssw == 0, 0.0).otherwise(
                (F.col("na") + F.col("nb") - 2) * ssb_g / ssw
            ),
            6,
        ).alias("bf_f_statistic"),
    )


@register(
    "cooks_distance_trend",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE))
               AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS y
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(d) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(d * d) AS BIGINT) AS sxx,
             CAST(sum(d * y) AS BIGINT) AS sxy
      FROM daily
    ),
    coef AS (
      SELECT n, sx, sxx,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
             (sy - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   * sx) / n AS a,
             CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS sxx_c
      FROM m
    ),
    resid AS (
      SELECT dd.d, dd.y, c.n,
             dd.y - (c.a + c.b * dd.d) AS e,
             1.0 / c.n + (dd.d - CAST(c.sx AS DOUBLE) / c.n)
                         * (dd.d - CAST(c.sx AS DOUBLE) / c.n) / c.sxx_c AS h
      FROM daily dd CROSS JOIN coef c
    ),
    mse AS (
      SELECT CAST(any_value(n) AS BIGINT) AS n,
             sum(e * e) / (any_value(n) - 2) AS s2
      FROM resid
    )
    SELECT d AS day_index, round(e / 100.0, 2) AS residual,
           round(h, 6) AS leverage,
           round(e * e * h / (2 * s.s2 * (1 - h) * (1 - h)), 6)
             AS cooks_d
    FROM resid CROSS JOIN mse s
    ORDER BY e * e * h / (2 * s.s2 * (1 - h) * (1 - h)) DESC, d
    LIMIT 10
    """,
)
def cooks_distance_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's distance for the 1996 daily-revenue OLS trend: per day,
    leverage h = 1/n + (x−x̄)²/Sxx and D = e²·h / (p·s²·(1−h)²) with
    p = 2 — the influence diagnostic that names WHICH days are bending
    the fitted line (Cook 1977), completing the regression-diagnostics
    kit beside durbin_watson_residuals (serial correlation) and
    conformal_interval_calibration (uncertainty). Top-10 most
    influential days.

    Determinism: coefficients, leverages, and residuals are identical
    double expressions of exact bigint moment sums; s² is one
    order-stable bounded sum (the KM argument); the top-10 cut orders
    by the raw D with a day tie-break so both engines pick identical
    rows. One fact rollup, O(#days) algebra, TakeOrdered cut."""
    o = load(spark, sf_dir).orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    daily = (
        o.groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1996-01-01").cast("date"),
            ).alias("d")
        )
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("y")
        )
        .localCheckpoint(eager=True)
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sxx"),
        F.sum(F.col("d") * F.col("y")).cast("long").alias("sxy"),
    )
    ndb = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    b = (ndb * F.col("sxy") - sxd * F.col("sy")) / (
        ndb * F.col("sxx") - sxd * F.col("sx")
    )
    coef = m.select(
        "n",
        "sx",
        b.alias("b"),
        ((F.col("sy") - b * F.col("sx")) / F.col("n")).alias("a"),
        (F.col("sxx").cast("double") - sxd * F.col("sx") / F.col("n")).alias(
            "sxx_c"
        ),
    )
    resid = daily.crossJoin(F.broadcast(coef)).select(
        "d",
        "n",
        (F.col("y") - (F.col("a") + F.col("b") * F.col("d"))).alias("e"),
        (
            1.0 / F.col("n")
            + (F.col("d") - F.col("sx").cast("double") / F.col("n"))
            * (F.col("d") - F.col("sx").cast("double") / F.col("n"))
            / F.col("sxx_c")
        ).alias("h"),
    ).localCheckpoint(eager=True)
    mse = resid.agg(
        (F.sum(F.col("e") * F.col("e")) / (F.first("n") - 2)).alias("s2")
    )
    dcook = (
        F.col("e")
        * F.col("e")
        * F.col("h")
        / (2 * F.col("s2") * (1 - F.col("h")) * (1 - F.col("h")))
    )
    return (
        resid.crossJoin(F.broadcast(mse))
        .orderBy(dcook.desc(), "d")
        .limit(10)
        .select(
            F.col("d").alias("day_index"),
            F.round(F.col("e") / 100.0, 2).alias("residual"),
            F.round("h", 6).alias("leverage"),
            F.round(dcook, 6).alias("cooks_d"),
        )
    )


@register(
    "weekday_seasonality_strength",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
             CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
             CAST(sum(y * y) AS BIGINT) AS ss
      FROM daily
    ),
    grp AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS ng, CAST(sum(y) AS BIGINT) AS sg
      FROM daily GROUP BY dow
    ),
    parts AS (
      SELECT t.n, t.s, t.ss,
             sum(CAST(g.sg AS DOUBLE) * g.sg / g.ng) AS sum_gsq
      FROM grp g CROSS JOIN tot t
      GROUP BY t.n, t.s, t.ss
    )
    SELECT n AS n_days,
           round((sum_gsq - CAST(s AS DOUBLE) * s / n)
                 / (ss - CAST(s AS DOUBLE) * s / n), 6) AS seasonal_r2,
           round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1),
                 6) AS total_variance,
           CAST(7 AS BIGINT) AS n_groups
    FROM parts
    """,
)
def weekday_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strength of weekly seasonality in the daily order-count series:
    the one-way-ANOVA R² of day-of-week group means — SSB/SST, the
    fraction of daily variance a weekday profile explains — the
    cheap go/no-go before fitting a weekly seasonal component
    (seasonal_decompose_daily) or blaming the trend's Durbin-Watson.

    Everything assembles from exact integer sums (Σy, Σy², per-weekday
    Σ) in one identical double expression; the only ≥7-term double sum
    (Σ s_g²/n_g) runs over the seven weekday groups — far below
    rounding. One fact rollup to the calendar-bounded daily table, one
    7-row regroup."""
    o = load(spark, sf_dir).orders
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day"),
        F.dayofweek(F.col("o_orderdate").cast("date")).cast("long").alias("dow"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y")).localCheckpoint(
        eager=True
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
    )
    grp = daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("y").cast("long").alias("sg"),
    )
    parts = (
        grp.crossJoin(F.broadcast(tot))
        .groupBy("n", "s", "ss")
        .agg(
            F.sum(F.col("sg").cast("double") * F.col("sg") / F.col("ng")).alias(
                "sum_gsq"
            )
        )
    )
    sd = F.col("s").cast("double")
    sst = F.col("ss") - sd * F.col("s") / F.col("n")
    ssb = F.col("sum_gsq") - sd * F.col("s") / F.col("n")
    return parts.select(
        F.col("n").alias("n_days"),
        F.round(ssb / sst, 6).alias("seasonal_r2"),
        F.round(
            (F.col("ss").cast("double") - sd * F.col("s") / F.col("n"))
            / (F.col("n") - 1),
            6,
        ).alias("total_variance"),
        F.lit(7).cast("long").alias("n_groups"),
    )


@register(
    "mann_kendall_trend",
    oracle="""
    WITH daily AS (
      SELECT n.n_name,
             date_diff('day', DATE '1996-01-01', CAST(o.o_orderdate AS DATE))
               AS d,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    s AS (
      SELECT a.n_name,
             CAST(sum(CASE WHEN b.rev_c > a.rev_c THEN 1
                           WHEN b.rev_c < a.rev_c THEN -1 ELSE 0 END)
                  AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON b.n_name = a.n_name AND b.d > a.d
      GROUP BY 1
    ),
    ties AS (
      SELECT n_name,
             CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT n_name, CAST(count(*) AS BIGINT) AS t
            FROM daily GROUP BY n_name, rev_c)
      WHERE t > 1
      GROUP BY 1
    ),
    meta AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
    )
    SELECT m.n_name AS nation, m.n_days, s.s_stat,
           round((m.n_days * (m.n_days - 1) * (2 * m.n_days + 5)
                  - coalesce(t.tie_term, 0)) / 18.0, 6) AS var_s,
           round((s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
                                  WHEN s.s_stat < 0 THEN -1 ELSE 0 END)
                 / sqrt((m.n_days * (m.n_days - 1) * (2 * m.n_days + 5)
                         - coalesce(t.tie_term, 0)) / 18.0), 6) AS z_score,
           CAST(abs(s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
                                    WHEN s.s_stat < 0 THEN -1 ELSE 0 END)
                > 1.959964
                  * sqrt((m.n_days * (m.n_days - 1) * (2 * m.n_days + 5)
                          - coalesce(t.tie_term, 0)) / 18.0) AS INT)
             AS significant_5pct
    FROM meta m JOIN s ON s.n_name = m.n_name
    LEFT JOIN ties t ON t.n_name = m.n_name
    ORDER BY nation
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend TEST on 1996 daily revenue per nation — the
    significance companion to theil_sen_trend (the classic pairing:
    MK decides WHETHER a monotone trend exists, Theil-Sen estimates
    its slope; Mann 1945 / Kendall 1975): S = Σ_{i<j} sign(x_j − x_i)
    over day-ordered values, Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]
    / 18 with the tie correction over tied revenue values, and the
    continuity-corrected normal Z = (S ∓ 1)/√Var(S).

    Exactness: S and every tie term are exact BIGINT sums of sign
    tests; Var(S) is one integer expression divided by 18.0 and Z one
    fixed-order double expression — bit-identical cross-engine. The
    5% two-sided flag compares |S ∓ 1| against 1.959964·√Var with both
    sides exact-int-derived doubles and the same literal. Scale shape:
    one fact pass to the bounded (nation × ≤366-day) table (the
    theil_sen localCheckpoint discipline), then the pair join runs
    over that bounded table only — SF-independent pairwise work."""
    t = load(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    daily = (
        orders.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1996-01-01").cast("date"),
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("rev_c")
        )
        # bounded: <= nations x 366 rows; consumed by self-join + ties + meta
        .localCheckpoint(eager=True)
    )
    b = daily.select(
        F.col("n_name").alias("n2"),
        F.col("d").alias("d2"),
        F.col("rev_c").alias("r2"),
    )
    s = (
        daily.join(
            b, (F.col("n2") == F.col("n_name")) & (F.col("d2") > F.col("d"))
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                F.when(F.col("r2") > F.col("rev_c"), 1)
                .when(F.col("r2") < F.col("rev_c"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("n_name", "rev_c")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("n_name")
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    meta = daily.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    n = F.col("n_days")
    tie = F.coalesce(F.col("tie_term"), F.lit(0).cast("long"))
    var_s = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    s_adj = F.col("s_stat") - F.when(F.col("s_stat") > 0, 1).when(
        F.col("s_stat") < 0, -1
    ).otherwise(0)
    return (
        meta.join(s, "n_name")
        .join(ties, "n_name", "left")
        .select(
            F.col("n_name").alias("nation"),
            "n_days",
            "s_stat",
            F.round(var_s, 6).alias("var_s"),
            F.round(s_adj / F.sqrt(var_s), 6).alias("z_score"),
            (F.abs(s_adj) > 1.959964 * F.sqrt(var_s))
            .cast("int")
            .alias("significant_5pct"),
        )
        .orderBy("nation")
    )


PH_LAMBDA_MICRO = 50_000_000_000  # λ = 5e8 cents·100 (micro-cent units)


@register(
    "page_hinkley_drift",
    oracle=f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE))
               AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS x
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1
    ),
    terms AS (
      SELECT d, x,
             CAST(floor((x - sum(x) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                             / CAST(row_number() OVER (ORDER BY d) AS DOUBLE))
                        * 100) AS BIGINT) AS term_micro
      FROM daily
    ),
    walk AS (
      SELECT d, x, term_micro,
             CAST(sum(term_micro) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS m_micro
      FROM terms
    )
    SELECT d, x AS revenue_cents, m_micro,
           CAST(m_micro - min(m_micro) OVER (ORDER BY d ROWS UNBOUNDED
                PRECEDING) AS BIGINT) AS ph_micro,
           CAST(m_micro - min(m_micro) OVER (ORDER BY d ROWS UNBOUNDED
                PRECEDING) > {PH_LAMBDA_MICRO} AS INT) AS alarm
    FROM walk ORDER BY d
    """,
)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward mean-shift detection over 1996 daily revenue
    — the sequential drift test (Page 1954; the streaming-standard
    variant with the RUNNING mean, as in MOA/river): per day t,
    term_t = x_t − mean(x_1..x_t), m_t = Σ term, and the statistic
    PH_t = m_t − min_{s≤t} m_s alarms when it exceeds λ. Unlike
    cusum_changepoint's fixed reference mean, the running mean adapts
    — the detector is parameter-free except λ and usable online.

    Exactness: x and its prefix sums are exact BIGINT cents; the only
    division is S_t/t (one IEEE op of exact ints — identical both
    engines, no libm); terms are floored to exact micro-cent BIGINTs
    BEFORE any accumulation, so m_t, the running min, and PH_t are
    exact integers and the λ comparison is integer-exact. Scale shape:
    one fact pass to the ≤366-row day spine; every window runs over
    that bounded table (the cusum/moving_average discipline)."""
    t = load(spark, sf_dir)
    daily = (
        t.orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1996-01-01").cast("date"),
            ).alias("d")
        )
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("x")
        )
    )
    wseq = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    term_micro = F.floor(
        (
            F.col("x")
            - F.sum("x").over(wseq) / F.row_number().over(W.orderBy("d")).cast("double")
        )
        * 100
    ).cast("long")
    walk = daily.select("d", "x", term_micro.alias("term_micro")).select(
        "d",
        "x",
        F.sum("term_micro").over(wseq).cast("long").alias("m_micro"),
    )
    ph = (F.col("m_micro") - F.min("m_micro").over(wseq)).cast("long")
    return walk.select(
        "d",
        F.col("x").alias("revenue_cents"),
        "m_micro",
        ph.alias("ph_micro"),
        (ph > PH_LAMBDA_MICRO).cast("int").alias("alarm"),
    ).orderBy("d")

@register(
    "isotonic_calibration",
    oracle="""
    WITH buckets AS (
      SELECT CAST(round(l_discount * 100, 0) AS INT) AS b,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ret
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT b, cnt, ret,
             CAST(sum(cnt) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS w,
             CAST(sum(ret) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS c
      FROM buckets
    ),
    segs AS (
      SELECT j.b AS jb, k.b AS kb,
             (k.c - (j.c - j.ret)) * 1.0 / (k.w - (j.w - j.cnt)) AS seg_avg
      FROM cum j JOIN cum k ON j.b <= k.b
    )
    SELECT b AS discount_cents, cnt AS n,
           round(ret * 1.0 / cnt, 6) AS raw_rate,
           round(fitted, 6) AS fitted_rate
    FROM (
      SELECT i.b, any_value(i.cnt) AS cnt, any_value(i.ret) AS ret,
             max(m.mn) AS fitted
      FROM cum i JOIN (
        SELECT s.jb, i2.b AS ib, min(s.seg_avg) AS mn
        FROM segs s JOIN cum i2 ON s.jb <= i2.b AND i2.b <= s.kb
        GROUP BY s.jb, i2.b
      ) m ON m.ib = i.b AND m.jb <= i.b
      GROUP BY i.b
    )
    ORDER BY discount_cents
    """,
)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of the return
    rate against the discount level — pool-adjacent-violators computed
    in closed form via the lower-set/upper-set minimax identity
    (Ayer et al. 1955; Robertson-Wright-Dykstra 1988):
    fitted(i) = max_{j<=i} min_{k>=i} wavg(y, j..k) — the formula PAV
    converges to, expressed as joins so no sequential pooling loop is
    needed. This is the calibration step every score-to-probability
    pipeline (Platt-vs-isotonic) runs after model training.

    Exactness: segment averages are single divisions of exact integer
    cumulative sums (returned count / item count over [j..k]); the
    minimax over those identical doubles is engine-identical. Scale:
    one fact scan -> 11-bucket agg; the (j,i,k) triple join runs over
    the 11-row cumulative table (<=1331 combinations) — the
    theil_sen_trend bounded-quadratic discipline."""
    li = load(spark, sf_dir).lineitem
    buckets = (
        li.select(
            F.expr("CAST(round(l_discount * 100, 0) AS INT)").alias("b"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_r"),
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("is_r").cast("long").alias("ret"),
        )
    )
    wseq = W.orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    # stage the 11-row cumulative table: four downstream consumers
    # (j, k, i2, fitted) would otherwise EACH re-scan lineitem
    # (plan-audit r10 caught 4 scans)
    cum = buckets.select(
        "b",
        "cnt",
        "ret",
        F.sum("cnt").over(wseq).cast("long").alias("w"),
        F.sum("ret").over(wseq).cast("long").alias("c"),
    ).localCheckpoint(eager=True)
    j = cum.select(
        F.col("b").alias("jb"),
        (F.col("c") - F.col("ret")).alias("c_prev"),
        (F.col("w") - F.col("cnt")).alias("w_prev"),
    )
    k = cum.select(F.col("b").alias("kb"), "c", "w")
    segs = j.join(k, F.col("jb") <= F.col("kb")).select(
        "jb",
        "kb",
        (
            (F.col("c") - F.col("c_prev"))
            * 1.0
            / (F.col("w") - F.col("w_prev"))
        ).alias("seg_avg"),
    )
    i2 = cum.select(F.col("b").alias("ib"))
    lower_env = (
        segs.join(
            i2,
            (F.col("jb") <= F.col("ib")) & (F.col("ib") <= F.col("kb")),
        )
        .groupBy("jb", "ib")
        .agg(F.min("seg_avg").alias("mn"))
    )
    fitted = (
        cum.join(
            lower_env,
            (F.col("ib") == F.col("b")) & (F.col("jb") <= F.col("b")),
        )
        .groupBy("b")
        .agg(
            F.expr("any_value(cnt)").alias("cnt"),
            F.expr("any_value(ret)").alias("ret"),
            F.max("mn").alias("fitted"),
        )
    )
    return fitted.select(
        F.col("b").alias("discount_cents"),
        F.col("cnt").alias("n"),
        F.round(F.col("ret") * 1.0 / F.col("cnt"), 6).alias("raw_rate"),
        F.round("fitted", 6).alias("fitted_rate"),
    ).orderBy("discount_cents")


@register(
    "ips_offline_policy_eval",
    oracle="""
    WITH logged AS (
      SELECT EXTRACT(hour FROM ts) AS h, event_type AS a,
             CAST(round(value * 100, 0) AS BIGINT) AS r
      FROM events
    ),
    cells AS (
      SELECT h, a, CAST(count(*) AS BIGINT) AS n_ah,
             CAST(sum(r) AS BIGINT) AS sum_r
      FROM logged GROUP BY h, a
    ),
    ctx AS (
      SELECT h, CAST(sum(n_ah) AS BIGINT) AS n_h FROM cells GROUP BY h
    ),
    greedy AS (
      SELECT h, a AS pi_a FROM (
        SELECT h, a, row_number() OVER (
          PARTITION BY h ORDER BY sum_r * 1.0 / n_ah DESC, a) AS rn
        FROM cells
      ) WHERE rn = 1
    ),
    matched AS (
      SELECT c.h, c.n_ah, c.sum_r, x.n_h,
             (c.sum_r * 1000 * x.n_h) // c.n_ah AS term_micro
      FROM cells c
      JOIN greedy g ON g.h = c.h AND g.pi_a = c.a
      JOIN ctx x ON x.h = c.h
    ),
    tot AS (
      SELECT CAST(sum(n_ah) AS BIGINT) AS n_rounds,
             CAST(sum(sum_r) AS BIGINT) AS sum_r_all,
             CAST(count(DISTINCT h) AS BIGINT) AS n_contexts
      FROM cells
    ),
    est AS (
      SELECT CAST(sum(term_micro) AS BIGINT) AS ips_micro,
             CAST(sum(n_h) AS BIGINT) AS snips_denom,
             CAST(sum(n_ah) AS BIGINT) AS n_matched
      FROM matched
    )
    SELECT n_rounds, n_contexts,
           round(sum_r_all * 1.0 / (100 * n_rounds), 6) AS direct_avg_dollars,
           round(ips_micro * 1.0 / (100000.0 * n_rounds), 6)
             AS ips_value_dollars,
           round(ips_micro * 1.0 / (100000.0 * snips_denom), 6)
             AS snips_value_dollars,
           round(n_matched * 1.0 / n_rounds, 6) AS match_rate
    FROM tot CROSS JOIN est
    """,
)
def ips_offline_policy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline (counterfactual) policy evaluation on the logged event
    stream — inverse-propensity scoring (Horvitz-Thompson 1952; Li et
    al. 2011 'Unbiased Offline Evaluation of Contextual-Bandit
    Algorithms') plus the self-normalized SNIPS variant (Swaminathan &
    Joachims 2015): treat every event as one logged bandit round with
    context h = hour-of-day, action a = event_type, reward r = value;
    estimate what the GREEDY target policy pi(h) = argmax_a
    avg-reward(a|h) would earn, without ever deploying it:
    V_IPS = (1/N) sum_i 1{a_i = pi(h_i)} * r_i / p(a_i|h_i) with
    empirical logging propensities p(a|h) = n_ah/n_h.

    Every accumulation is integer-exact: events sharing a (h, a) cell
    share one weight n_h/n_ah, so the IPS sum collapses to per-cell
    terms floor(sum_r*1000*n_h / n_ah) summed as BIGINT micro-cents
    (order-insensitive — no double accumulation; at extreme scale the
    product term moves to DECIMAL, the formula is unchanged), and the
    SNIPS denominator sum_i w_i telescopes to sum over matched cells
    of n_h — exactly integer. The greedy argmax tie-breaks
    (avg DESC, action ASC) on identical-double averages of exact ints.

    Scale shape: one fact scan -> 24x5-cell hash agg; everything
    downstream runs on that bounded table. The estimator itself is the
    point: training-data pipelines for interaction models gate on
    exactly this counterfactual check before a policy ships."""
    e = load(spark, sf_dir).events
    logged = e.select(
        F.hour("ts").alias("h"),
        F.col("event_type").alias("a"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("r"),
    )
    # stage the <=24x5-cell table: ctx/greedy/matched/tot would each
    # re-scan events otherwise (plan-audit r10: 4 scans -> 1)
    cells = logged.groupBy("h", "a").agg(
        F.count(F.lit(1)).cast("long").alias("n_ah"),
        F.sum("r").cast("long").alias("sum_r"),
    ).localCheckpoint(eager=True)
    ctx = cells.groupBy("h").agg(F.sum("n_ah").cast("long").alias("n_h"))
    wg = W.partitionBy("h").orderBy(
        (F.col("sum_r") * 1.0 / F.col("n_ah")).desc(), "a"
    )
    greedy = (
        cells.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") == 1)
        .select("h", F.col("a").alias("pi_a"))
    )
    matched = (
        cells.join(greedy, (cells.h == greedy.h) & (cells.a == greedy.pi_a))
        .drop(greedy.h)
        .join(ctx, "h")
        .select(
            "n_ah",
            "n_h",
            F.expr("(sum_r * 1000 * n_h) div n_ah").alias("term_micro"),
        )
    )
    tot = cells.agg(
        F.sum("n_ah").cast("long").alias("n_rounds"),
        F.sum("sum_r").cast("long").alias("sum_r_all"),
        F.countDistinct("h").cast("long").alias("n_contexts"),
    )
    est = matched.agg(
        F.sum("term_micro").cast("long").alias("ips_micro"),
        F.sum("n_h").cast("long").alias("snips_denom"),
        F.sum("n_ah").cast("long").alias("n_matched"),
    )
    return tot.crossJoin(F.broadcast(est)).select(
        "n_rounds",
        "n_contexts",
        F.round(F.col("sum_r_all") * 1.0 / (100 * F.col("n_rounds")), 6).alias(
            "direct_avg_dollars"
        ),
        F.round(
            F.col("ips_micro") * 1.0 / (100000.0 * F.col("n_rounds")), 6
        ).alias("ips_value_dollars"),
        F.round(
            F.col("ips_micro") * 1.0 / (100000.0 * F.col("snips_denom")), 6
        ).alias("snips_value_dollars"),
        F.round(F.col("n_matched") * 1.0 / F.col("n_rounds"), 6).alias(
            "match_rate"
        ),
    )


_BRIER_FP = 1_000_000_000  # 1e-9 fixed point for cross-cell sums


@register(
    "brier_decomposition",
    oracle=f"""
    WITH items AS (
      SELECT CAST(round(l_discount * 100, 0) AS INT) AS b,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    buckets AS (
      SELECT b, CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(y) AS BIGINT) AS ret_b
      FROM items GROUP BY b
    ),
    tot AS (
      SELECT CAST(sum(n_b) AS BIGINT) AS n,
             CAST(sum(ret_b) AS BIGINT) AS r
      FROM buckets
    ),
    scored AS (
      SELECT b, n_b, ret_b, n, r,
             ((20 * ret_b + n_b) // (2 * n_b)) / 10.0 AS f_b,
             ret_b * 1.0 / n_b AS ybar_b
      FROM buckets CROSS JOIN tot
    ),
    terms AS (
      SELECT n, r,
             CAST(floor(n_b * (f_b - ybar_b) * (f_b - ybar_b)
                        * {_BRIER_FP}) AS BIGINT) AS rel_fp,
             CAST(floor(n_b * (ybar_b - r * 1.0 / n) * (ybar_b - r * 1.0 / n)
                        * {_BRIER_FP}) AS BIGINT) AS res_fp,
             -- per-bucket Brier sum: sum_i (f_b - y_i)^2 expands to
             -- n_b*f^2 - 2*f*ret_b + ret_b (y is 0/1 so y^2 = y)
             CAST(floor((n_b * f_b * f_b - 2 * f_b * ret_b + ret_b)
                        * {_BRIER_FP}) AS BIGINT) AS brier_fp
      FROM scored
    )
    SELECT CAST(any_value(n) AS BIGINT) AS n,
           round(any_value(r) * 1.0 / any_value(n), 6) AS base_rate,
           round(sum(brier_fp) * 1.0 / {_BRIER_FP} / any_value(n), 6)
             AS brier_score,
           round(sum(rel_fp) * 1.0 / {_BRIER_FP} / any_value(n), 6)
             AS reliability,
           round(sum(res_fp) * 1.0 / {_BRIER_FP} / any_value(n), 6)
             AS resolution,
           round((any_value(r) * 1.0 / any_value(n))
                 * (1 - any_value(r) * 1.0 / any_value(n)), 6)
             AS uncertainty
    FROM terms
    """,
)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score for the quantized
    discount-bucket return-probability forecaster:
    Brier = REL - RES + UNC, where reliability penalizes calibration
    error (forecast vs conditional outcome rate), resolution rewards
    discrimination (conditional rates vs base rate), and uncertainty
    is the irreducible base-rate variance — the standard eval that
    tells you whether a probability model needs recalibration
    (pair with isotonic_calibration) or simply can't discriminate.
    The forecaster is the bucket rate QUANTIZED to one decimal
    (f_b = round-half-up(10*ybar_b)/10, the exact integer
    (20*ret+n) div (2n) over 10) — a coarse probability model whose
    quantization error makes reliability non-trivially positive; an
    unquantized in-sample forecaster is perfectly calibrated by
    construction, and the Murphy identity holds for ANY partition on
    which the forecast is constant, so per-bucket conditioning is
    exact.

    Exactness: per-bucket terms are identical-double expressions of
    exact integer counts, floored to 1e-9 fixed point BEFORE the
    cross-bucket sum (the mutual_information discipline) so
    accumulation is BIGINT and order-insensitive; the per-bucket
    Brier sum uses the y^2=y expansion n*f^2 - 2*f*ret + ret, never
    touching per-row doubles. Scale: one fact scan -> 11-bucket agg;
    everything downstream is bounded. The Murphy identity
    Brier ~= REL - RES + UNC (to fixed-point truncation) is pinned in
    tests."""
    li = load(spark, sf_dir).lineitem
    items = li.select(
        F.expr("CAST(round(l_discount * 100, 0) AS INT)").alias("b"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    buckets = items.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("y").cast("long").alias("ret_b"),
    )
    tot = buckets.agg(
        F.sum("n_b").cast("long").alias("n"),
        F.sum("ret_b").cast("long").alias("r"),
    )
    fp = _BRIER_FP
    scored = buckets.crossJoin(F.broadcast(tot)).select(
        "n_b",
        "ret_b",
        "n",
        "r",
        (F.expr("(20 * ret_b + n_b) div (2 * n_b)") / 10.0).alias("f_b"),
        (F.col("ret_b") * 1.0 / F.col("n_b")).alias("ybar_b"),
    )
    base = F.col("r") * 1.0 / F.col("n")
    terms = scored.select(
        "n",
        "r",
        F.floor(
            F.col("n_b")
            * (F.col("f_b") - F.col("ybar_b"))
            * (F.col("f_b") - F.col("ybar_b"))
            * fp
        ).cast("long").alias("rel_fp"),
        F.floor(
            F.col("n_b") * (F.col("ybar_b") - base) * (F.col("ybar_b") - base) * fp
        ).cast("long").alias("res_fp"),
        F.floor(
            (
                F.col("n_b") * F.col("f_b") * F.col("f_b")
                - 2 * F.col("f_b") * F.col("ret_b")
                + F.col("ret_b")
            )
            * fp
        ).cast("long").alias("brier_fp"),
    )
    anyn = F.expr("any_value(n)")
    anyr = F.expr("any_value(r)")
    rate = anyr * 1.0 / anyn
    return terms.agg(
        anyn.cast("long").alias("n"),
        F.round(rate, 6).alias("base_rate"),
        F.round(F.sum("brier_fp") * 1.0 / fp / anyn, 6).alias("brier_score"),
        F.round(F.sum("rel_fp") * 1.0 / fp / anyn, 6).alias("reliability"),
        F.round(F.sum("res_fp") * 1.0 / fp / anyn, 6).alias("resolution"),
        F.round(rate * (1 - rate), 6).alias("uncertainty"),
    )


@register(
    "stratified_att_adjustment",
    oracle="""
    WITH pre AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n95,
             max(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS treated
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY 1
    ),
    outcome AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS y96
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1
    ),
    panel AS (
      SELECT CASE WHEN n95 = 1 THEN '1' WHEN n95 = 2 THEN '2'
                  ELSE '3+' END AS stratum,
             treated, coalesce(y96, 0) AS y
      FROM pre LEFT JOIN outcome USING (o_custkey)
    ),
    cells AS (
      SELECT stratum,
             CAST(sum(treated) AS BIGINT) AS n_t,
             CAST(sum(1 - treated) AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN treated = 1 THEN y ELSE 0 END)
                  AS BIGINT) AS sy_t,
             CAST(sum(CASE WHEN treated = 0 THEN y ELSE 0 END)
                  AS BIGINT) AS sy_c
      FROM panel GROUP BY stratum
    ),
    tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS nt_all FROM cells)
    SELECT stratum,
           n_t AS n_treated, n_c AS n_control,
           round(sy_t * 1.0 / (100 * n_t), 4) AS mean_treated_dollars,
           round(sy_c * 1.0 / (100 * n_c), 4) AS mean_control_dollars,
           round(sy_t * 1.0 / (100 * n_t)
                 - sy_c * 1.0 / (100 * n_c), 4) AS diff_dollars,
           round(n_t * 1.0 / nt_all, 6) AS att_weight,
           round((sy_t * 1.0 / (100 * n_t) - sy_c * 1.0 / (100 * n_c))
                 * n_t / nt_all, 4) AS att_contrib_dollars
    FROM cells CROSS JOIN tot
    ORDER BY stratum
    """,
)
def stratified_att_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified treatment-effect adjustment (Cochran 1968 subclass-
    ification — the ancestor of propensity-score stratification): the
    ATT of 'placed a high-priority 1995 order' on 1996 spend, adjusted
    for the pre-treatment confounder (1995 order count) that drives
    BOTH treatment propensity (40%->63%->85% across strata at sf0.01)
    and the outcome. Per stratum: arm sizes, arm means, the stratum
    effect, and its ATT contribution weighted by the treated
    distribution n_t/N_t — their sum is the adjusted ATT the naive
    treated-minus-control difference over-states under confounding
    (the identity the property test pins).

    Exactness: arm totals are exact BIGINT cents; every mean/diff/
    weight is an identical-double division of exact integers, rounded
    at the edge. Scale shape: two date-pruned fact scans -> per-
    customer aggs co-partitioned on o_custkey (one shuffle each) ->
    3-row stratum rollup; everything after is bounded."""
    o = load(spark, sf_dir).orders
    pre = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n95"),
            F.max(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int")
            ).alias("treated"),
        )
    )
    outcome = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("y96")
        )
    )
    panel = pre.join(outcome, "o_custkey", "left").select(
        F.when(F.col("n95") == 1, "1")
        .when(F.col("n95") == 2, "2")
        .otherwise("3+")
        .alias("stratum"),
        "treated",
        F.coalesce(F.col("y96"), F.lit(0)).alias("y"),
    )
    # 3-row stratum table staged: the grand-total rollup would rerun
    # the two fact scans + customer join otherwise
    cells = panel.groupBy("stratum").agg(
        F.sum("treated").cast("long").alias("n_t"),
        F.sum(1 - F.col("treated")).cast("long").alias("n_c"),
        F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sy_t"),
        F.sum(F.when(F.col("treated") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sy_c"),
    ).localCheckpoint(eager=True)
    tot = cells.agg(F.sum("n_t").cast("long").alias("nt_all"))
    mt = F.col("sy_t") * 1.0 / (100 * F.col("n_t"))
    mc = F.col("sy_c") * 1.0 / (100 * F.col("n_c"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            F.col("n_t").alias("n_treated"),
            F.col("n_c").alias("n_control"),
            F.round(mt, 4).alias("mean_treated_dollars"),
            F.round(mc, 4).alias("mean_control_dollars"),
            F.round(mt - mc, 4).alias("diff_dollars"),
            F.round(F.col("n_t") * 1.0 / F.col("nt_all"), 6).alias("att_weight"),
            F.round((mt - mc) * F.col("n_t") / F.col("nt_all"), 4).alias(
                "att_contrib_dollars"
            ),
        )
        .orderBy("stratum")
    )


@register(
    "dr_policy_eval_crossfit",
    oracle="""
    WITH logged AS (
      SELECT EXTRACT(hour FROM ts) AS h, event_type AS a,
             CAST(round(value * 100, 0) AS BIGINT) AS r,
             CAST(event_id % 2 AS INT) AS fold
      FROM events
    ),
    a_cells AS (
      SELECT h, a, CAST(count(*) AS BIGINT) AS n_a,
             CAST(sum(r) AS BIGINT) AS s_a
      FROM logged WHERE fold = 0 GROUP BY h, a
    ),
    greedy AS (
      SELECT h, a AS pi_a, n_a AS n_pi, s_a AS s_pi FROM (
        SELECT h, a, n_a, s_a, row_number() OVER (
          PARTITION BY h ORDER BY s_a * 1.0 / n_a DESC, a) AS rn
        FROM a_cells
      ) WHERE rn = 1
    ),
    b_cells AS (
      SELECT h, a, CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(r) AS BIGINT) AS s_b
      FROM logged WHERE fold = 1 GROUP BY h, a
    ),
    b_ctx AS (
      SELECT h, CAST(sum(n_b) AS BIGINT) AS n_h FROM b_cells GROUP BY h
    ),
    dm AS (
      SELECT CAST(sum((x.n_h * g.s_pi * 1000) // g.n_pi) AS BIGINT)
               AS dm_micro
      FROM b_ctx x JOIN greedy g ON g.h = x.h
    ),
    corr AS (
      SELECT CAST(sum(((b.s_b * g.n_pi - b.n_b * g.s_pi) * 1000 * x.n_h)
                      // (g.n_pi * b.n_b)) AS BIGINT) AS corr_micro,
             CAST(sum(b.n_b) AS BIGINT) AS n_matched
      FROM b_cells b
      JOIN greedy g ON g.h = b.h AND g.pi_a = b.a
      JOIN b_ctx x ON x.h = b.h
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_eval FROM logged WHERE fold = 1
    )
    SELECT n_eval AS n_eval_rounds,
           round(dm_micro * 1.0 / (100000.0 * n_eval), 6) AS dm_value_dollars,
           round(corr_micro * 1.0 / (100000.0 * n_eval), 6)
             AS ips_correction_dollars,
           round((dm_micro + corr_micro) * 1.0 / (100000.0 * n_eval), 6)
             AS dr_value_dollars,
           round(n_matched * 1.0 / n_eval, 6) AS match_rate
    FROM tot CROSS JOIN dm CROSS JOIN corr
    """,
)
def dr_policy_eval_crossfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust off-policy evaluation with cross-fitting (Dudík,
    Langford & Li 2011; Chernozhukov et al. 2018 cross-fitting): fit
    the reward model Q(h,a) = cell mean on fold A (even event_ids),
    pick the greedy policy pi(h) from fold A, then evaluate on the
    DISJOINT fold B:
    V_DR = (1/N_B) sum_i [Q(h_i, pi(h_i))
           + 1{a_i = pi(h_i)} (r_i - Q(h_i, a_i)) / p(a_i|h_i)].
    The direct-model term is unbiased when Q is right, the IPS
    correction repairs it when Q is wrong — consistent if EITHER is
    correct. In-sample (no cross-fit) the correction telescopes to
    exactly zero and DR degenerates to DM — the reason ips_offline_
    policy_eval's sibling needs the fold split to be an honest demo.

    Exactness: both folds' cells are exact BIGINT (count, cents-sum)
    pairs; Q is carried as the rational s/n, never a rounded double —
    each per-context/per-cell term is ONE integer floor-division at
    1e-3-cent fixed point (micro = (n_h*s*1000) div n etc.), so all
    accumulation is BIGINT and order-insensitive (at extreme SF the
    products move to DECIMAL; the formula is unchanged). Scale: one
    fact scan fans into two fold-filtered 24x5-cell aggs; everything
    downstream is bounded by contexts x actions."""
    e = load(spark, sf_dir).events
    logged = e.select(
        F.hour("ts").alias("h"),
        F.col("event_type").alias("a"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("r"),
        (F.col("event_id") % 2).cast("int").alias("fold"),
    )
    # both fold-cell tables are <=24x5 rows — staged so the policy,
    # DM, correction, and totals don't each re-scan events
    a_cells = (
        logged.filter(F.col("fold") == 0)
        .groupBy("h", "a")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_a"),
            F.sum("r").cast("long").alias("s_a"),
        )
        .localCheckpoint(eager=True)
    )
    wg = W.partitionBy("h").orderBy(
        (F.col("s_a") * 1.0 / F.col("n_a")).desc(), "a"
    )
    greedy = (
        a_cells.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") == 1)
        .select(
            "h",
            F.col("a").alias("pi_a"),
            F.col("n_a").alias("n_pi"),
            F.col("s_a").alias("s_pi"),
        )
    )
    b_cells = (
        logged.filter(F.col("fold") == 1)
        .groupBy("h", "a")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_b"),
            F.sum("r").cast("long").alias("s_b"),
        )
        .localCheckpoint(eager=True)
    )
    b_ctx = b_cells.groupBy("h").agg(F.sum("n_b").cast("long").alias("n_h"))
    dm = (
        b_ctx.join(greedy, "h")
        .select(F.expr("(n_h * s_pi * 1000) div n_pi").alias("t"))
        .agg(F.sum("t").cast("long").alias("dm_micro"))
    )
    corr = (
        b_cells.join(
            greedy,
            (b_cells.h == greedy.h) & (b_cells.a == greedy.pi_a),
        )
        .drop(greedy.h)
        .join(b_ctx, "h")
        .select(
            "n_b",
            F.expr(
                "((s_b * n_pi - n_b * s_pi) * 1000 * n_h) div (n_pi * n_b)"
            ).alias("t"),
        )
        .agg(
            F.sum("t").cast("long").alias("corr_micro"),
            F.sum("n_b").cast("long").alias("n_matched"),
        )
    )
    tot = logged.filter(F.col("fold") == 1).agg(
        F.count(F.lit(1)).cast("long").alias("n_eval")
    )
    return (
        tot.crossJoin(F.broadcast(dm))
        .crossJoin(F.broadcast(corr))
        .select(
            F.col("n_eval").alias("n_eval_rounds"),
            F.round(F.col("dm_micro") * 1.0 / (100000.0 * F.col("n_eval")), 6)
            .alias("dm_value_dollars"),
            F.round(
                F.col("corr_micro") * 1.0 / (100000.0 * F.col("n_eval")), 6
            ).alias("ips_correction_dollars"),
            F.round(
                (F.col("dm_micro") + F.col("corr_micro"))
                * 1.0
                / (100000.0 * F.col("n_eval")),
                6,
            ).alias("dr_value_dollars"),
            F.round(F.col("n_matched") * 1.0 / F.col("n_eval"), 6).alias(
                "match_rate"
            ),
        )
    )


# Benjamini-Hochberg step-up ladder: two-sided |z| thresholds for
# p_(i) <= i*q/m at q = 0.10, m = 25 nations — inverse-normal values
# baked as shared literals (the engines have no erf^-1; the Benford/
# critical-value discipline), computed once with
# statistics.NormalDist().inv_cdf(1 - (i*q/m)/2).
BH_Q_PCT = 10
BH_M = 25
BH_Z_LADDER = (
    2.878162, 2.65207, 2.512144, 2.408916, 2.326348, 2.257129,
    2.197286, 2.144411, 2.096927, 2.053749, 2.014091, 1.977368,
    1.943134, 1.911036, 1.880794, 1.85218, 1.825007, 1.799118,
    1.774382, 1.750686, 1.727934, 1.706043, 1.684941, 1.664563,
    1.644854,
)
_BH_VALUES = ", ".join(f"({i + 1}, {z})" for i, z in enumerate(BH_Z_LADDER))


@register(
    "bh_fdr_nation_tests",
    oracle=f"""
    WITH moments AS (
      SELECT n.n_name AS nation,
             CASE WHEN o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                  THEN 1 ELSE 0 END AS era,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS s,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)
                      * CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS ss
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    z AS (
      SELECT a.nation,
             abs(a.s * 1.0 / a.n - b.s * 1.0 / b.n)
               / sqrt((a.ss * 1.0 / a.n - (a.s * 1.0 / a.n) * (a.s * 1.0 / a.n))
                        / a.n
                      + (b.ss * 1.0 / b.n - (b.s * 1.0 / b.n) * (b.s * 1.0 / b.n))
                        / b.n) AS abs_z
      FROM moments a JOIN moments b ON a.nation = b.nation
      WHERE a.era = 1 AND b.era = 0
    ),
    ladder(rk, z_thr) AS (VALUES {_BH_VALUES}),
    ranked AS (
      SELECT nation, abs_z,
             CAST(row_number() OVER (ORDER BY abs_z DESC, nation)
                  AS BIGINT) AS rk
      FROM z
    ),
    cut AS (
      SELECT coalesce(max(r.rk), 0) AS k_max
      FROM ranked r JOIN ladder l ON l.rk = r.rk
      WHERE r.abs_z >= CAST(l.z_thr AS DOUBLE)
    )
    SELECT r.nation, round(r.abs_z, 6) AS abs_z, r.rk AS rank,
           CAST(l.z_thr AS DOUBLE) AS z_threshold,
           CAST(r.rk <= (SELECT k_max FROM cut) AS INT) AS rejected
    FROM ranked r JOIN ladder l ON l.rk = r.rk
    ORDER BY r.rk
    """,
)
def bh_fdr_nation_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg (1995) false-discovery-rate control over the
    25 per-nation 'did mean order value shift 1995->1996' two-sample
    z tests — the multiple-testing discipline every per-segment
    screening query needs: testing 25 segments at alpha=5% expects a
    false positive; BH's step-up rule (reject all tests ranked at or
    below the LARGEST i with p_(i) <= i*q/m) bounds the expected
    false-discovery share at q=10% instead.

    The engines have no inverse normal CDF, so the p-value comparison
    runs in z space against a 25-literal threshold ladder baked from
    statistics.NormalDist (the Benford shared-literal discipline) —
    p_(i) <= i*q/m  <=>  |z|_(i) >= z_thr(i) exactly, and the step-up
    cut k_max = max qualifying rank is an integer comparison. Welch z
    per nation assembles from exact BIGINT cents moment sums; sqrt is
    IEEE-correctly-rounded so both engines produce identical doubles.

    Scale shape: one date-pruned fact scan (broadcast dim joins) ->
    25x2 moment cells; ranking, ladder join, and the step-up cut all
    run on <=25-row tables."""
    t = load(spark, sf_dir)
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    moments = (
        t.orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(t.customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            (
                F.col("o_orderdate")
                >= F.lit("1996-01-01 00:00:00").cast("timestamp")
            ).cast("int").alias("era"),
            cents.alias("r"),
        )
        .groupBy("nation", "era")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("r").cast("long").alias("s"),
            F.sum(F.col("r") * F.col("r")).cast("long").alias("ss"),
        )
        # 25x2-row moment table staged: the era branches, ladder join,
        # and step-up cut drove 12 re-scans of the three-table join
        # (plan-audit r10)
        .localCheckpoint(eager=True)
    )
    a = moments.filter(F.col("era") == 1).select(
        "nation", F.col("n").alias("n1"), F.col("s").alias("s1"),
        F.col("ss").alias("ss1"),
    )
    b = moments.filter(F.col("era") == 0).select(
        F.col("nation").alias("nation_b"), F.col("n").alias("n0"),
        F.col("s").alias("s0"), F.col("ss").alias("ss0"),
    )
    m1 = F.col("s1") * 1.0 / F.col("n1")
    m0 = F.col("s0") * 1.0 / F.col("n0")
    v1 = F.col("ss1") * 1.0 / F.col("n1") - m1 * m1
    v0 = F.col("ss0") * 1.0 / F.col("n0") - m0 * m0
    z = a.join(b, F.col("nation") == F.col("nation_b")).select(
        "nation",
        (F.abs(m1 - m0) / F.sqrt(v1 / F.col("n1") + v0 / F.col("n0"))).alias(
            "abs_z"
        ),
    )
    ranked = z.withColumn(
        "rank", F.row_number().over(W.orderBy(F.col("abs_z").desc(), "nation")).cast("long")
    )
    ladder = (
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i + 1).cast("long").alias("rank"),
                            F.lit(zt).alias("z_threshold"),
                        )
                        for i, zt in enumerate(BH_Z_LADDER)
                    ]
                )
            ).alias("l")
        )
        .select("l.rank", "l.z_threshold")
    )
    joined = ranked.join(F.broadcast(ladder), "rank")
    cut = joined.filter(F.col("abs_z") >= F.col("z_threshold")).agg(
        F.coalesce(F.max("rank"), F.lit(0)).cast("long").alias("k_max")
    )
    return (
        joined.crossJoin(F.broadcast(cut))
        .select(
            "nation",
            F.round("abs_z", 6).alias("abs_z"),
            "rank",
            "z_threshold",
            (F.col("rank") <= F.col("k_max")).cast("int").alias("rejected"),
        )
        .orderBy("rank")
    )


MSPRT_TAU_SQ = 100.0  # mixture prior variance, dollars^2 (tuning const)
MSPRT_LN_INV_ALPHA_MICRO = 2995732  # floor(ln(1/0.05)*1e6): alpha = 5%


@register(
    "msprt_always_valid_monitor",
    oracle=f"""
    WITH panel AS (
      SELECT EXTRACT(month FROM o_orderdate) AS m,
             CASE WHEN md5(CAST(o_custkey AS VARCHAR)) < '8'
                  THEN 0 ELSE 1 END AS arm,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS r
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    ),
    monthly AS (
      SELECT m, arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS s,
             CAST(sum(r * r) AS BIGINT) AS ss
      FROM panel GROUP BY m, arm
    ),
    looks AS (
      SELECT m, arm,
             CAST(sum(n) OVER w AS BIGINT) AS cn,
             CAST(sum(s) OVER w AS BIGINT) AS cs,
             CAST(sum(ss) OVER w AS BIGINT) AS css
      FROM monthly
      WINDOW w AS (PARTITION BY arm ORDER BY m ROWS UNBOUNDED PRECEDING)
    ),
    wide AS (
      SELECT a.m, a.cn AS n_a, b.cn AS n_b,
             a.cs * 1.0 / (100 * a.cn) AS mean_a,
             b.cs * 1.0 / (100 * b.cn) AS mean_b,
             ((a.css + b.css) * 1.0 / (a.cn + b.cn)
              - ((a.cs + b.cs) * 1.0 / (a.cn + b.cn))
                * ((a.cs + b.cs) * 1.0 / (a.cn + b.cn))) / 10000.0 AS var_pool
      FROM looks a JOIN looks b ON a.m = b.m AND a.arm = 0 AND b.arm = 1
    ),
    lam AS (
      SELECT m, n_a, n_b, mean_b - mean_a AS diff,
             var_pool * (1.0 / n_a + 1.0 / n_b) AS v_n
      FROM wide
    ),
    scored AS (
      SELECT m, n_a, n_b, diff,
             CAST(floor((0.5 * ln(v_n / (v_n + {MSPRT_TAU_SQ}))
                         + diff * diff * {MSPRT_TAU_SQ}
                           / (2 * v_n * (v_n + {MSPRT_TAU_SQ})))
                        * 1000000 + 1e-3) AS BIGINT) AS ln_lambda_micro
      FROM lam
    ),
    walked AS (
      SELECT m, n_a, n_b, diff, ln_lambda_micro,
             CAST(max(ln_lambda_micro) OVER (ORDER BY m ROWS UNBOUNDED
                  PRECEDING) AS BIGINT) AS ln_lambda_max_micro
      FROM scored
    )
    SELECT m AS month, n_a, n_b, round(diff, 4) AS diff_dollars,
           ln_lambda_micro, ln_lambda_max_micro,
           CAST(floor(least(1000000.0,
                exp(-ln_lambda_max_micro / 1000000.0) * 1000000) + 1e-3)
                AS BIGINT) AS always_valid_p_micro,
           CAST(ln_lambda_max_micro >= {MSPRT_LN_INV_ALPHA_MICRO} AS INT)
             AS reject_5pct
    FROM walked ORDER BY m
    """,
)
def msprt_always_valid_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential A/B monitoring via the mixture SPRT
    (Robbins 1970; Johari, Koomen, Pekelis & Walsh 2017/2022 — the
    'peeking problem' solution deployed industry-wide): at every
    monthly look over 1996, the two-sample normal-mixture likelihood
    ratio Lambda_n = sqrt(V_n/(V_n+tau^2)) * exp(d^2 tau^2 /
    (2 V_n (V_n+tau^2))) with V_n = var_pool*(1/n_A+1/n_B); the
    always-valid p-value min(1, 1/max_looks Lambda) is monotone
    non-increasing, so ANY stopping rule keeps the 5% guarantee —
    unlike the fixed-horizon z test ab_interim_monitoring protects
    with pre-committed O'Brien-Fleming looks.

    Determinism: cumulative moments are exact BIGINT cents windows per
    arm; V_n and d are identical-double expressions of those integers;
    the single ln/exp per look lands behind the floor(x*1e6 + 1e-3)
    micro-unit guard (the woe/hurst fixed-point discipline) so a
    last-ulp libm difference cannot move any output; the rejection
    rule compares BIGINT micro-units to the baked ln(1/alpha) literal.
    Scale: one date-pruned fact scan -> 12x2 monthly cells; all
    windows run over that bounded table."""
    o = load(spark, sf_dir).orders
    panel = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select(
        F.month("o_orderdate").alias("m"),
        F.when(
            F.md5(F.col("o_custkey").cast("string")) < "8", 0
        ).otherwise(1).alias("arm"),
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("r"),
    )
    # 12x2-row monthly moments staged: the a/b arm branches would
    # each re-scan orders otherwise
    monthly = panel.groupBy("m", "arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("s"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("ss"),
    ).localCheckpoint(eager=True)
    wc = W.partitionBy("arm").orderBy("m").rowsBetween(W.unboundedPreceding, 0)
    looks = monthly.select(
        "m",
        "arm",
        F.sum("n").over(wc).cast("long").alias("cn"),
        F.sum("s").over(wc).cast("long").alias("cs"),
        F.sum("ss").over(wc).cast("long").alias("css"),
    )
    a = looks.filter(F.col("arm") == 0).select(
        "m", F.col("cn").alias("n_a"), F.col("cs").alias("cs_a"),
        F.col("css").alias("css_a"),
    )
    b = looks.filter(F.col("arm") == 1).select(
        F.col("m").alias("m_b"), F.col("cn").alias("n_b"),
        F.col("cs").alias("cs_b"), F.col("css").alias("css_b"),
    )
    tau = MSPRT_TAU_SQ
    pooled_mean = (F.col("cs_a") + F.col("cs_b")) * 1.0 / (
        F.col("n_a") + F.col("n_b")
    )
    var_pool = (
        (F.col("css_a") + F.col("css_b")) * 1.0 / (F.col("n_a") + F.col("n_b"))
        - pooled_mean * pooled_mean
    ) / 10000.0
    diff = (
        F.col("cs_b") * 1.0 / (100 * F.col("n_b"))
        - F.col("cs_a") * 1.0 / (100 * F.col("n_a"))
    )
    v_n = var_pool * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    lam = a.join(b, F.col("m") == F.col("m_b")).select(
        "m", "n_a", "n_b", diff.alias("diff"), v_n.alias("v_n")
    )
    scored = lam.select(
        "m",
        "n_a",
        "n_b",
        "diff",
        F.floor(
            (
                0.5 * F.log(F.col("v_n") / (F.col("v_n") + tau))
                + F.col("diff")
                * F.col("diff")
                * tau
                / (2 * F.col("v_n") * (F.col("v_n") + tau))
            )
            * 1_000_000
            + 1e-3
        ).cast("long").alias("ln_lambda_micro"),
    )
    wm = W.orderBy("m").rowsBetween(W.unboundedPreceding, 0)
    walked = scored.withColumn(
        "ln_lambda_max_micro",
        F.max("ln_lambda_micro").over(wm).cast("long"),
    )
    return walked.select(
        F.col("m").alias("month"),
        "n_a",
        "n_b",
        F.round("diff", 4).alias("diff_dollars"),
        "ln_lambda_micro",
        "ln_lambda_max_micro",
        F.floor(
            F.least(
                F.lit(1000000.0),
                F.exp(-F.col("ln_lambda_max_micro") / 1000000.0) * 1000000,
            )
            + 1e-3
        ).cast("long").alias("always_valid_p_micro"),
        (F.col("ln_lambda_max_micro") >= MSPRT_LN_INV_ALPHA_MICRO)
        .cast("int")
        .alias("reject_5pct"),
    ).orderBy("month")


# (z_{alpha/2} + z_beta)^2 for alpha=5% two-sided, power=80% — the
# standard 7.849 design constant, baked from statistics.NormalDist
# literals 1.959964 + 0.841621 (the engines have no inverse CDF)
PWR_Z_SUM = 1.959964 + 0.841621
PWR_MDE_PCTS = (1, 2, 5)


@register(
    "sample_size_power_analysis",
    oracle=f"""
    WITH pilot AS (
      SELECT n.n_name AS nation,
             CAST(count(*) AS BIGINT) AS n_pilot,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS s,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)
                      * CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS ss
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY 1
    ),
    mdes(mde_pct) AS (VALUES {", ".join(f"({p})" for p in PWR_MDE_PCTS)}),
    scored AS (
      SELECT nation, mde_pct, n_pilot,
             s * 1.0 / (100 * n_pilot) AS mean_dollars,
             (ss * 1.0 / n_pilot - (s * 1.0 / n_pilot) * (s * 1.0 / n_pilot))
               / 10000.0 AS var_dollars,
             (s * 1.0 / (100 * n_pilot)) * mde_pct / 100.0 AS delta
      FROM pilot CROSS JOIN mdes
    )
    SELECT nation, mde_pct, n_pilot,
           round(mean_dollars, 4) AS baseline_mean_dollars,
           round(sqrt(var_dollars), 4) AS sigma_dollars,
           CAST(ceil(2 * var_dollars * {PWR_Z_SUM} * {PWR_Z_SUM}
                     / (delta * delta)) AS BIGINT) AS n_per_arm
    FROM scored
    ORDER BY nation, mde_pct
    """,
)
def sample_size_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment design: required per-arm sample size
    n = 2 sigma^2 (z_a/2 + z_b)^2 / Delta^2 (the classic two-sample
    normal power formula at 5%/80%) for each nation and each relative
    MDE in {1%, 2%, 5%} of that nation's baseline mean order value,
    with variance estimated from the 1995 pilot year — the step that
    comes BEFORE ab_test_conversion / msprt_always_valid_monitor /
    ab_interim_monitoring in the experimentation toolkit (design ->
    monitor -> analyze -> bh_fdr correct).

    Determinism: pilot moments are exact BIGINT cents; mean, variance,
    Delta, and the n formula are identical-double expressions of those
    integers with the (z_a/2+z_b)^2 design constant baked as shared
    literals (no inverse CDF in either engine); sqrt is correctly
    rounded and ceil acts on identical doubles. Scale: one date-pruned
    fact scan with broadcast dims -> 25-row pilot table x 3 literals."""
    t = load(spark, sf_dir)
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    pilot = (
        t.orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        )
        .join(
            t.customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("n_name").alias("nation"), cents.alias("r"))
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pilot"),
            F.sum("r").cast("long").alias("s"),
            F.sum(F.col("r") * F.col("r")).cast("long").alias("ss"),
        )
    )
    mdes = F.explode(F.array(*[F.lit(p) for p in PWR_MDE_PCTS])).alias("mde_pct")
    mean_d = F.col("s") * 1.0 / (100 * F.col("n_pilot"))
    var_d = (
        F.col("ss") * 1.0 / F.col("n_pilot")
        - (F.col("s") * 1.0 / F.col("n_pilot"))
        * (F.col("s") * 1.0 / F.col("n_pilot"))
    ) / 10000.0
    delta = mean_d * F.col("mde_pct") / 100.0
    k = PWR_Z_SUM
    return (
        pilot.select("nation", "n_pilot", "s", "ss", mdes)
        .select(
            "nation",
            "mde_pct",
            "n_pilot",
            F.round(mean_d, 4).alias("baseline_mean_dollars"),
            F.round(F.sqrt(var_d), 4).alias("sigma_dollars"),
            F.ceil(2 * var_d * k * k / (delta * delta))
            .cast("long")
            .alias("n_per_arm"),
        )
        .orderBy("nation", "mde_pct")
    )




UCB_ARMS = ("click", "error", "purchase", "signup", "view")
UCB_MONTHS = 12
# ln(t) baked to 9 dp — neither engine's libm ln is trusted at the ulp
_UCB_LN = (
    0.0, 0.693147181, 1.098612289, 1.386294361, 1.609437912,
    1.791759469, 1.945910149, 2.079441542, 2.197224577, 2.302585093,
    2.397895273, 2.48490665,
)


def _ucb_stage_exprs(t: int) -> tuple[str, list[str]]:
    """Stage t of the unrolled UCB1 replay: the chosen-arm CASE (refers
    only to stage t-1 state columns) and the update expressions (refer
    only to stage t-1 state plus ch{t}). Keeping each stage a SEPARATE
    projection layer is load-bearing: expressed as lateral aliases in
    one projection, every stage inlines the full expression of every
    prior stage and the tree grows exponentially (the first draft hung
    both engines)."""
    arms = UCB_ARMS
    prev = t - 1
    if t <= len(arms):
        chosen = f"'{arms[t - 1]}' AS ch{t}"
    else:
        ln_t = _UCB_LN[t - 1]
        idx = {
            a: (
                # the mean is an exact-in-double ratio floored to a
                # BIGINT (shared text: DuckDB's // and Spark's div
                # spell differently, floor(x/y) is engine-common)
                f"(CAST(floor(s{prev}_{a} * 1.0 / n{prev}_{a}) AS BIGINT)"
                f" + CAST(floor(sqrt(2 * {ln_t} / n{prev}_{a}) * 1000000)"
                f" AS BIGINT))"
            )
            for a in arms
        }
        cases = []
        for a in arms:  # ties: first arm in name order wins
            cond = " AND ".join(f"{idx[a]} >= {idx[b]}" for b in arms if b != a)
            cases.append(f"WHEN {cond} THEN '{a}'")
        chosen = "CASE " + " ".join(cases) + f" END AS ch{t}"
    updates = [
        "CASE "
        + " ".join(f"WHEN ch{t} = '{a}' THEN r{t}_{a}" for a in arms)
        + f" END AS rw{t}"
    ]
    for a in arms:
        base_n = "0" if t == 1 else f"n{prev}_{a}"
        base_s = "0" if t == 1 else f"s{prev}_{a}"
        updates.append(
            f"{base_n} + CASE WHEN ch{t} = '{a}' THEN 1 ELSE 0 END AS n{t}_{a}"
        )
        updates.append(
            f"{base_s} + CASE WHEN ch{t} = '{a}' THEN r{t}_{a} ELSE 0 END"
            f" AS s{t}_{a}"
        )
    return chosen, updates


def _ucb_best_case(t: int) -> str:
    return (
        "CASE "
        + " ".join(f"WHEN best_arm = '{a}' THEN r{t}_{a}" for a in UCB_ARMS)
        + " END"
    )


def _ucb_best_arm_sql() -> str:
    tot = {
        a: " + ".join(f"r{t}_{a}" for t in range(1, UCB_MONTHS + 1))
        for a in UCB_ARMS
    }
    cases = []
    for a in UCB_ARMS:
        cond = " AND ".join(f"({tot[a]}) >= ({tot[b]})" for b in UCB_ARMS if b != a)
        cases.append(f"WHEN {cond} THEN '{a}'")
    return "CASE " + " ".join(cases) + " END AS best_arm"


def _ucb_oracle() -> str:
    """12x2 MATERIALIZED CTE stages — DuckDB must not inline them or
    the same exponential blow-up returns."""
    # coalesce(., 0): an empty (day, arm) cell reads as 0-ppm reward
    # instead of a NULL that would silently propagate through every
    # later stage of the replay (ADVICE r10) — populated at sf0.01,
    # load-bearing on sparser slices
    pivot_cols = ",\n".join(
        f"        coalesce(max(CASE WHEN m = {t} AND a = '{a}'"
        f" THEN r_ppm END), 0) AS r{t}_{a}"
        for t in range(1, UCB_MONTHS + 1)
        for a in UCB_ARMS
    )
    stages = []
    prev = "pivoted"
    for t in range(1, UCB_MONTHS + 1):
        chosen, updates = _ucb_stage_exprs(t)
        stages.append(
            f"c{t} AS MATERIALIZED (SELECT *, {chosen} FROM {prev})"
        )
        stages.append(
            f"u{t} AS MATERIALIZED (SELECT *, "
            + ", ".join(updates)
            + f" FROM c{t})"
        )
        prev = f"u{t}"
    trace = ", ".join(
        f"{{'month': {t}, 'chosen_arm': ch{t}, 'reward_ppm': rw{t}, "
        f"'best_reward_ppm': " + _ucb_best_case(t) + "}"
        for t in range(1, UCB_MONTHS + 1)
    )
    stages_sql = ",\n    ".join(stages)
    return f"""
    WITH cells AS (
      SELECT EXTRACT(day FROM ts) AS m, event_type AS a,
             (CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
              * 20) // CAST(count(*) AS BIGINT) AS r_ppm
      FROM events WHERE EXTRACT(day FROM ts) <= {UCB_MONTHS}
      GROUP BY 1, 2
    ),
    pivoted AS MATERIALIZED (
      SELECT
{pivot_cols}
      FROM cells
    ),
    {stages_sql},
    walk AS (SELECT *, {_ucb_best_arm_sql()} FROM {prev}),
    trace AS (
      SELECT unnest([{trace}], recursive := true) FROM walk
    )
    SELECT month AS day, chosen_arm,
           CAST(reward_ppm AS BIGINT) AS reward_ppm,
           CAST(sum(reward_ppm) OVER (ORDER BY month ROWS UNBOUNDED
                PRECEDING) AS BIGINT) AS cum_reward_ppm,
           CAST(sum(best_reward_ppm - reward_ppm) OVER (ORDER BY month
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_regret_ppm
    FROM trace ORDER BY month
    """


@register("ucb1_bandit_replay", oracle=_ucb_oracle())
def ucb1_bandit_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 bandit replay (Auer, Cesa-Bianchi & Fischer 2002) over the
    logged event stream aggregated to 12 daily rounds x 5 action arms:
    play each arm once, then at every round choose
    argmax(mean + sqrt(2 ln t / n)) on [0,1]-normalized rewards
    (value/500 in exact ppm integers) and earn that day's observed
    cell mean; cumulative regret is reported against the hindsight-
    best fixed arm. The ONLINE-learning complement to the offline
    counterfactual trio (ips/dr/qini): those evaluate a FIXED policy
    from logs, this replays an adaptive one.

    Both engines evaluate the SAME generated stage expressions
    (_ucb_stage_exprs) over the same pivoted 60-column row — state
    stays in exact ppm BIGINTs, ln(t) is baked as 9-dp literals, and
    the one sqrt per (arm, step) is correctly rounded then floored to
    ppm before entering the integer index, so the walk's choice
    sequence is bit-identical including ties (first arm in name order
    wins). Each stage is a SEPARATE materialized layer — Spark
    localCheckpoints the 1-row state every stage and DuckDB marks the
    stage CTEs MATERIALIZED; inlined as lateral aliases the expression
    tree grows exponentially (the first draft hung both engines).

    Scale shape: one fact scan -> 60-cell hash agg -> one-row pivot;
    the replay is O(arms x months) scalar work on that row."""
    e = load(spark, sf_dir).events
    cells = (
        e.filter(F.dayofmonth("ts") <= UCB_MONTHS)
        .select(
            F.dayofmonth("ts").alias("m"),
            F.col("event_type").alias("a"),
            F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("r"),
        )
        .groupBy("m", "a")
        .agg(F.expr("(sum(r) * 20) div count(*)").cast("long").alias("r_ppm"))
    )
    # empty (day, arm) cells coalesce to 0 ppm, mirroring the oracle
    # (ADVICE r10: a NULL here nulls the entire replay downstream)
    state = cells.agg(
        *[
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("m") == t) & (F.col("a") == a), F.col("r_ppm")
                    )
                ),
                F.lit(0).cast("long"),
            ).alias(f"r{t}_{a}")
            for t in range(1, UCB_MONTHS + 1)
            for a in UCB_ARMS
        ]
    ).localCheckpoint(eager=True)
    for t in range(1, UCB_MONTHS + 1):
        chosen, updates = _ucb_stage_exprs(t)
        state = state.selectExpr("*", chosen).localCheckpoint(eager=True)
        state = state.selectExpr("*", *updates).localCheckpoint(eager=True)
    walk = state.selectExpr("*", _ucb_best_arm_sql())
    trace_structs = ", ".join(
        f"STRUCT({t} AS month, ch{t} AS chosen_arm, rw{t} AS reward_ppm, "
        + _ucb_best_case(t)
        + " AS best_reward_ppm)"
        for t in range(1, UCB_MONTHS + 1)
    )
    trace = walk.select(
        F.explode(F.expr(f"array({trace_structs})")).alias("s")
    ).select("s.month", "s.chosen_arm", "s.reward_ppm", "s.best_reward_ppm")
    wseq = W.orderBy("month").rowsBetween(W.unboundedPreceding, 0)
    return trace.select(
        F.col("month").alias("day"),
        "chosen_arm",
        F.col("reward_ppm").cast("long").alias("reward_ppm"),
        F.sum("reward_ppm").over(wseq).cast("long").alias("cum_reward_ppm"),
        F.sum(F.col("best_reward_ppm") - F.col("reward_ppm"))
        .over(wseq)
        .cast("long")
        .alias("cum_regret_ppm"),
    ).orderBy("month")


def _lmom_c(m: str, k: int, cast: str, div: str = "/") -> str:
    """C(m, k) as exact big-integer SQL; `cast` wraps m into the
    engine's wide type (DECIMAL(38,0) / HUGEINT) BEFORE the products
    so nothing overflows BIGINT at large n. `div` is the engine's
    EXACT division operator for that wide type: DuckDB's `/` on
    HUGEINT returns DOUBLE (ADVICE r10 — order-dependent rounding at
    term magnitudes ~1e23), so the DuckDB path passes `//`, which
    stays HUGEINT; the k consecutive-integer factors make the product
    exactly divisible by k!, so integer division is lossless. Spark's
    `/` on DECIMAL is exact decimal arithmetic and stays as-is."""
    mm = cast.format(x=m)
    if k == 1:
        return mm
    num = " * ".join(f"({mm} - {j})" for j in range(k))
    den = {2: 2, 3: 6, 4: 24}[k]
    return f"(({num}) {div} {den})"


def _lmom_terms(cast: str, div: str = "/") -> str:
    """Per-value hockey-stick weights: the ranks of a value-block
    (B+1..B+c) contribute sum_{i} C(i-1, r) = C(B+c, r+1) - C(B, r+1)
    exactly, so L-moment numerators need only the distinct-value
    cumulative table — no per-row ranks."""
    parts = []
    for r in range(4):
        hi = _lmom_c("(b + c)", r + 1, cast, div)
        lo = _lmom_c("b", r + 1, cast, div)
        v = cast.format(x="v")
        parts.append(f"sum({v} * ({hi} - {lo})) AS n{r}")
    return ", ".join(parts)


_LMOM_DUCK_CAST = "CAST({x} AS HUGEINT)"
_LMOM_SPARK_CAST = "CAST({x} AS DECIMAL(38,0))"


@register(
    "l_moments_order_values",
    oracle=f"""
    WITH vals AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT v, c,
             CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c
                  AS BIGINT) AS b,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM vals
    ),
    sums AS (
      SELECT any_value(n) AS n, {_lmom_terms(_LMOM_DUCK_CAST, "//")}
      FROM cum
    ),
    bs AS (
      SELECT n,
             CAST(n0 AS DOUBLE) / n AS b0,
             CAST(n1 AS DOUBLE) / (n * (CAST(n AS DOUBLE) - 1)) AS b1,
             CAST(n2 AS DOUBLE)
               / (n * ((CAST(n AS DOUBLE) - 1) * (n - 2) / 2)) AS b2,
             CAST(n3 AS DOUBLE)
               / (n * ((CAST(n AS DOUBLE) - 1) * (n - 2) * (n - 3) / 6))
               AS b3
      FROM sums
    )
    SELECT n,
           round(b0 / 100, 4) AS lambda1_dollars,
           round((2 * b1 - b0) / 100, 4) AS lambda2_dollars,
           round((2 * b1 - b0) / b0, 6) AS l_cv,
           round((6 * b2 - 6 * b1 + b0) / (2 * b1 - b0), 6) AS l_skew,
           round((20 * b3 - 30 * b2 + 12 * b1 - b0) / (2 * b1 - b0), 6)
             AS l_kurt
    FROM bs
    """,
)
def l_moments_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-moments of the order-value distribution (Hosking 1990) —
    the order-statistic alternative to classical moments whose ratios
    (L-CV, L-skewness, L-kurtosis) are bounded, outlier-robust, and
    the standard distribution fingerprint in hydrology/risk — next to
    the classical summary_stats and the quantile views.

    The scale trick: a sorted sample's weights C(i-1, r) summed over a
    tied-value block of ranks B+1..B+c telescope by the hockey-stick
    identity to C(B+c, r+1) - C(B, r+1), so the numerators assemble
    EXACTLY from the distinct-value cumulative table — no per-row
    global ranking ever exists. Products run in DECIMAL(38,0)/HUGEINT
    (C(n,4)*cents overflows BIGINT past sf0.01) and every division
    happens once, in double, on exactly-representable big integers via
    the engines' correctly-rounded wide->double casts; b_r denominators
    are written as one shared expression order. Scale: one fact scan ->
    value-cardinality-bounded table; windows only over that table."""
    o = load(spark, sf_dir).orders
    vals = (
        o.select(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wseq = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    wall = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    cum = vals.select(
        "v",
        "c",
        (F.sum("c").over(wseq) - F.col("c")).cast("long").alias("b"),
        F.sum("c").over(wall).cast("long").alias("n"),
    )
    def _term(r: int) -> str:
        hi = _lmom_c("(b + c)", r + 1, _LMOM_SPARK_CAST)
        lo = _lmom_c("b", r + 1, _LMOM_SPARK_CAST)
        v = _LMOM_SPARK_CAST.format(x="v")
        return f"sum({v} * ({hi} - {lo}))"

    sums = cum.agg(
        F.expr("any_value(n)").alias("n"),
        *[F.expr(_term(r)).alias(f"n{r}") for r in range(4)],
    )
    b0 = F.expr("CAST(n0 AS DOUBLE) / n")
    b1 = F.expr("CAST(n1 AS DOUBLE) / (n * (CAST(n AS DOUBLE) - 1))")
    b2 = F.expr(
        "CAST(n2 AS DOUBLE) / (n * ((CAST(n AS DOUBLE) - 1) * (n - 2) / 2))"
    )
    b3 = F.expr(
        "CAST(n3 AS DOUBLE)"
        " / (n * ((CAST(n AS DOUBLE) - 1) * (n - 2) * (n - 3) / 6))"
    )
    bs = sums.select(
        "n",
        b0.alias("b0"),
        b1.alias("b1"),
        b2.alias("b2"),
        b3.alias("b3"),
    )
    lam2 = 2 * F.col("b1") - F.col("b0")
    return bs.select(
        "n",
        F.round(F.col("b0") / 100, 4).alias("lambda1_dollars"),
        F.round(lam2 / 100, 4).alias("lambda2_dollars"),
        F.round(lam2 / F.col("b0"), 6).alias("l_cv"),
        F.round(
            (6 * F.col("b2") - 6 * F.col("b1") + F.col("b0")) / lam2, 6
        ).alias("l_skew"),
        F.round(
            (20 * F.col("b3") - 30 * F.col("b2") + 12 * F.col("b1") - F.col("b0"))
            / lam2,
            6,
        ).alias("l_kurt"),
    )


HAAR_N = 256  # 2^8 days from 1995-01-01
HAAR_LEVELS = 8


@register(
    "haar_wavelet_energy",
    oracle=f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS x
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
                          + INTERVAL {HAAR_N} DAY
      GROUP BY 1
    ),
    spine AS (
      SELECT g.d, coalesce(daily.x, 0) AS x
      FROM (SELECT unnest(range(0, {HAAR_N})) AS d) g
      LEFT JOIN daily ON daily.d = g.d
    ),
    pref AS (  -- P[i] = sum of x over d < i, for i = 0..N
      SELECT i,
             CAST(coalesce(sum(x) FILTER (WHERE d < i), 0) AS HUGEINT) AS p
      FROM (SELECT unnest(range(0, {HAAR_N} + 1)) AS i) CROSS JOIN spine
      GROUP BY i
    ),
    coeffs AS (
      SELECT k.k, j.j,
             (pe.p - pm.p) - (pm.p - ps.p) AS dcoef
      FROM (SELECT unnest(range(1, {HAAR_LEVELS} + 1)) AS k) k
      JOIN (SELECT unnest(range(0, {HAAR_N})) AS j) j
        ON j.j < {HAAR_N} / (1 << k.k)
      JOIN pref ps ON ps.i = (2 * j.j) * (1 << (k.k - 1))
      JOIN pref pm ON pm.i = (2 * j.j + 1) * (1 << (k.k - 1))
      JOIN pref pe ON pe.i = (2 * j.j + 2) * (1 << (k.k - 1))
    ),
    lev AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_coeffs,
             sum(dcoef * dcoef) * (1 << ({HAAR_LEVELS} - k)) AS e_scaled
      FROM coeffs GROUP BY k
    ),
    tot AS (
      SELECT CAST({HAAR_N} AS HUGEINT) * sum(CAST(x AS HUGEINT)
                 * CAST(x AS HUGEINT))
               - CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT)
                 * CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS denom
      FROM spine
    ),
    pars AS (SELECT CAST(sum(e_scaled) AS HUGEINT) AS e_all FROM lev)
    SELECT k AS level, n_coeffs,
           round(CAST(e_scaled AS DOUBLE) / CAST(denom AS DOUBLE), 6)
             AS energy_share,
           CAST((SELECT e_all FROM pars) = (SELECT denom FROM tot) AS INT)
             AS parseval_ok
    FROM lev CROSS JOIN tot
    ORDER BY level
    """,
)
def haar_wavelet_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet energy decomposition of the first 256
    days of 1995 daily revenue (Haar 1910; the multiresolution view of
    a series): detail coefficient d_k,j = (right-half sum) - (left-
    half sum) of each 2^k-day block, energy share per level — which
    TIME SCALE carries the variance; the multiresolution complement
    to seasonal_decompose_daily (fixed weekly period) and
    hurst_rescaled_range (one global exponent).

    Exactness is total: coefficients are integer differences of three
    prefix-sum lookups (the 257-row prefix table built once), level
    energies are HUGEINT/DECIMAL sums of d^2 scaled by 2^(8-k), and
    the PARSEVAL IDENTITY holds as an exact big-integer equation
    256*sum(x^2) - (sum x)^2 = sum_k 2^(8-k)*sum_j d_k,j^2
    — emitted as the parseval_ok flag (an exact integer comparison,
    not a tolerance). The only doubles are the final share ratios of
    correctly-rounded wide->double casts. Scale: one date-pruned fact
    scan -> <=256-row spine; every join is against the 257-row prefix
    table."""
    t = load(spark, sf_dir)
    daily = (
        t.orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (
                F.col("o_orderdate")
                < F.expr(f"TIMESTAMP '1995-01-01 00:00:00' + INTERVAL {HAAR_N} DAY")
            )
        )
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("d")
        )
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("x")
        )
    )
    spark_sess = spark
    spine = (
        spark_sess.range(HAAR_N)
        .select(F.col("id").cast("int").alias("d"))
        .join(daily, "d", "left")
        .select("d", F.coalesce(F.col("x"), F.lit(0)).alias("x"))
        .localCheckpoint(eager=True)  # 256 rows; five consumers below
    )
    pref = (
        spark_sess.range(HAAR_N + 1)
        .select(F.col("id").cast("int").alias("i"))
        .join(spine, F.col("d") < F.col("i"), "left")
        .groupBy("i")
        .agg(
            F.coalesce(F.sum("x"), F.lit(0))
            .cast("decimal(38,0)")
            .alias("p")
        )
        .localCheckpoint(eager=True)  # 257 rows; three joins below
    )
    levels = (
        spark_sess.range(1, HAAR_LEVELS + 1)
        .select(F.col("id").cast("int").alias("k"))
        .join(
            spark_sess.range(HAAR_N).select(F.col("id").cast("int").alias("j")),
            F.col("j") < HAAR_N / F.pow(F.lit(2.0), F.col("k")),
        )
    )
    ps = pref.select(F.col("i").alias("i_s"), F.col("p").alias("p_s"))
    pm = pref.select(F.col("i").alias("i_m"), F.col("p").alias("p_m"))
    pe = pref.select(F.col("i").alias("i_e"), F.col("p").alias("p_e"))
    half = F.expr("CAST(pow(2, k - 1) AS INT)")
    coeffs = (
        levels.withColumn("half", half)
        .join(ps, F.col("i_s") == (2 * F.col("j")) * F.col("half"))
        .join(pm, F.col("i_m") == (2 * F.col("j") + 1) * F.col("half"))
        .join(pe, F.col("i_e") == (2 * F.col("j") + 2) * F.col("half"))
        .select(
            "k",
            ((F.col("p_e") - F.col("p_m")) - (F.col("p_m") - F.col("p_s"))).alias(
                "dcoef"
            ),
        )
    )
    lev = coeffs.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_coeffs"),
        (
            F.sum(F.col("dcoef") * F.col("dcoef"))
            * F.expr(f"CAST(pow(2, {HAAR_LEVELS} - k) AS DECIMAL(38,0))")
        ).alias("e_scaled"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    tot = spine.agg(
        (
            F.lit(HAAR_N).cast("decimal(38,0)") * F.sum(xd * xd)
            - F.sum(xd) * F.sum(xd)
        ).alias("denom")
    )
    pars = lev.agg(F.sum("e_scaled").alias("e_all"))
    return (
        lev.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(pars))
        .select(
            F.col("k").alias("level"),
            "n_coeffs",
            F.round(
                F.col("e_scaled").cast("double") / F.col("denom").cast("double"),
                6,
            ).alias("energy_share"),
            (F.col("e_all") == F.col("denom")).cast("int").alias("parseval_ok"),
        )
        .orderBy("level")
    )


RERAND_REPS = 32


@register(
    "rerandomization_test_ab",
    oracle=f"""
    WITH per_user AS (
      SELECT o_custkey AS uid,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS y,
             CASE WHEN md5(CAST(o_custkey AS VARCHAR)) < '8'
                  THEN 0 ELSE 1 END AS arm
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1
    ),
    obs AS (
      SELECT sum(CASE WHEN arm = 1 THEN y ELSE 0 END) * 1.0
               / sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
             - sum(CASE WHEN arm = 0 THEN y ELSE 0 END) * 1.0
               / sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS d_obs,
             CAST(count(*) AS BIGINT) AS n_users
      FROM per_user
    ),
    reps AS (
      SELECT r.r, u.y,
             CASE WHEN md5(CAST(u.uid AS VARCHAR) || ':' ||
                           CAST(r.r AS VARCHAR)) < '8'
                  THEN 0 ELSE 1 END AS arm
      FROM per_user u
      CROSS JOIN (SELECT unnest(range(1, {RERAND_REPS} + 1)) AS r) r
    ),
    rep_diffs AS (
      SELECT r,
             sum(CASE WHEN arm = 1 THEN y ELSE 0 END) * 1.0
               / sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
             - sum(CASE WHEN arm = 0 THEN y ELSE 0 END) * 1.0
               / sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS d_r
      FROM reps GROUP BY r
    )
    SELECT o.n_users,
           round(o.d_obs / 100, 4) AS diff_obs_dollars,
           {RERAND_REPS} AS n_reps,
           CAST(sum(CASE WHEN abs(rd.d_r) >= abs(o.d_obs)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           round((1.0 + sum(CASE WHEN abs(rd.d_r) >= abs(o.d_obs)
                                 THEN 1 ELSE 0 END))
                 / (1 + {RERAND_REPS}), 6) AS p_value
    FROM rep_diffs rd CROSS JOIN obs o
    GROUP BY o.n_users, o.d_obs
    """,
)
def rerandomization_test_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-randomization (Monte-Carlo permutation-style) test for the
    hash-split A/B arms (Fisher 1935 randomization inference; the
    add-one p of Davison & Hinkley 1997): under the sharp null the arm
    labels are exchangeable, so re-drawing {RERAND_REPS} independent
    deterministic assignments (md5(user:rep) — each its own fair coin)
    and recomputing the mean-spend difference samples the null
    distribution; p = (1 + #extreme)/(1 + B). No normality, variance
    pooling, or CLT assumption — the nonparametric companion to
    ab_welch_ttest, whose own z relies on moments.

    Determinism: per-(user, rep) assignments are pure md5 predicates;
    rep sums are exact BIGINT cents accumulated per rep; each rep's
    diff is the same two-division expression of exact integers in both
    engines, so the extreme-count and the exact rational p agree
    bit-for-bit. Scale: one date-pruned scan -> per-user agg -> x32
    rep fan-out of the per-user table (the poisson_bootstrap shape:
    dimension-sized, never the fact table) -> 32-row rollup."""
    o = load(spark, sf_dir).orders
    per_user = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("o_custkey").alias("uid"))
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("y")
        )
        .withColumn(
            "arm",
            F.when(F.md5(F.col("uid").cast("string")) < "8", 0).otherwise(1),
        )
        # dimension-sized (one row per 1996 customer) — staged: the
        # observed diff and the 32-rep fan-out share it
        .localCheckpoint(eager=True)
    )
    d_expr = (
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0)) * 1.0
        / F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        - F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0)) * 1.0
        / F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
    )
    obs = per_user.agg(
        d_expr.alias("d_obs"), F.count(F.lit(1)).cast("long").alias("n_users")
    )
    reps = per_user.select(
        "uid",
        "y",
        F.explode(F.array(*[F.lit(r) for r in range(1, RERAND_REPS + 1)])).alias(
            "r"
        ),
    ).withColumn(
        "arm",
        F.when(
            F.md5(
                F.concat(
                    F.col("uid").cast("string"),
                    F.lit(":"),
                    F.col("r").cast("string"),
                )
            )
            < "8",
            0,
        ).otherwise(1),
    )
    rep_diffs = reps.groupBy("r").agg(d_expr.alias("d_r"))
    extreme = (F.abs(F.col("d_r")) >= F.abs(F.col("d_obs"))).cast("int")
    return (
        rep_diffs.crossJoin(F.broadcast(obs))
        .agg(
            F.expr("any_value(n_users)").cast("long").alias("n_users"),
            F.round(F.expr("any_value(d_obs)") / 100, 4).alias(
                "diff_obs_dollars"
            ),
            F.lit(RERAND_REPS).alias("n_reps"),
            F.sum(extreme).cast("long").alias("n_extreme"),
            F.round(
                (1.0 + F.sum(extreme)) / (1 + RERAND_REPS), 6
            ).alias("p_value"),
        )
    )


@register(
    "theil_index_decomposition",
    oracle="""
    WITH cust AS (
      SELECT c.c_nationkey AS nk,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS x
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY o.o_custkey, c.c_nationkey
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx
      FROM cust
    ),
    terms AS (
      -- per-customer Theil term (x/mu)*ln(x/mu) floored to 1e-6: with
      -- mu = sx/n, term = (x*n/sx) * ln(x*n/sx)
      SELECT nk,
             CAST(floor((x * 1.0 * n / sx) * ln(x * 1.0 * n / sx)
                        * 1000000 + 1e-3) AS BIGINT) AS t_micro,
             x
      FROM cust CROSS JOIN tot
    ),
    groups AS (
      SELECT nk,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(x) AS BIGINT) AS sx_g,
             CAST(sum(t_micro) AS BIGINT) AS sum_t_micro
      FROM terms GROUP BY nk
    ),
    scored AS (
      SELECT n.n_name AS nation, g.n_g, g.sx_g, g.sum_t_micro,
             t.n, t.sx,
             -- between-group term: s_g * ln(mean_g/mu) in 1e-6 units,
             -- s_g = sx_g/sx, mean_g/mu = (sx_g*n)/(sx*n_g)
             CAST(floor((g.sx_g * 1.0 / t.sx)
                        * ln((g.sx_g * 1.0 * t.n) / (t.sx * 1.0 * g.n_g))
                        * 1000000 + 1e-3) AS BIGINT) AS between_micro
      FROM groups g
      JOIN nation n ON n.n_nationkey = g.nk
      CROSS JOIN tot t
    )
    SELECT nation, n_g AS n_customers,
           round(sx_g * 1.0 / sx, 6) AS spend_share,
           round(sum_t_micro * 1.0 / (1000000.0 * n), 6) AS theil_contrib,
           round(between_micro / 1000000.0, 6) AS between_term,
           round((SELECT sum(sum_t_micro) FROM scored)
                 * 1.0 / (1000000.0 * n), 6) AS theil_total
    FROM scored
    ORDER BY nation
    """,
)
def theil_index_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of per-customer spend with its
    between-nation decomposition (Theil 1967): T = (1/n) sum
    (x/mu) ln(x/mu), and unlike Gini (gini_customer_spend) T splits
    EXACTLY into T_between + sum_g s_g T_within_g — the property that
    makes it the inequality measure you can attribute to segments.
    Per-nation rows carry the group's customer count, spend share,
    its contribution to total T, and the between-group term; the
    additive identity is pinned in tests to cumulative-floor
    tolerance.

    Determinism: the one engine-divergent ln per customer (and per
    group) sits behind the floor(x*1e6 + 1e-3) micro guard (the
    woe/hurst discipline), so every cross-row accumulation is a BIGINT
    sum of identical integers. Scale: one fact scan -> per-customer
    agg (one o_custkey shuffle) -> 25-group rollup; the ln is map-side
    codegen compute, never state."""
    t = load(spark, sf_dir)
    cust = (
        t.orders.join(
            # customer is SF-proportional: no forced broadcast — AQE/static
            # stats pick BHJ when it fits, SMJ when it doesn't.
            t.customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_custkey", "c_nationkey")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("x")
        )
        .select(F.col("c_nationkey").alias("nk"), "x")
    )
    tot = cust.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    ratio = F.col("x") * 1.0 * F.col("n") / F.col("sx")
    terms = cust.crossJoin(F.broadcast(tot)).select(
        "nk",
        "x",
        "n",
        "sx",
        F.floor(ratio * F.log(ratio) * 1_000_000 + 1e-3)
        .cast("long")
        .alias("t_micro"),
    )
    groups = terms.groupBy("nk").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("x").cast("long").alias("sx_g"),
        F.sum("t_micro").cast("long").alias("sum_t_micro"),
    )
    gratio = (
        F.col("sx_g") * 1.0 * F.col("n") / (F.col("sx") * 1.0 * F.col("n_g"))
    )
    scored = (
        groups.join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("nk") == F.col("n_nationkey"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n_name").alias("nation"),
            "n_g",
            "sx_g",
            "sum_t_micro",
            "n",
            "sx",
            F.floor(
                (F.col("sx_g") * 1.0 / F.col("sx"))
                * F.log(gratio)
                * 1_000_000
                + 1e-3
            )
            .cast("long")
            .alias("between_micro"),
        )
        .localCheckpoint(eager=True)  # 25 rows; total re-used below
    )
    total_t = scored.agg(
        F.sum("sum_t_micro").cast("long").alias("all_t_micro")
    )
    return (
        scored.crossJoin(F.broadcast(total_t))
        .select(
            "nation",
            F.col("n_g").alias("n_customers"),
            F.round(F.col("sx_g") * 1.0 / F.col("sx"), 6).alias("spend_share"),
            F.round(
                F.col("sum_t_micro") * 1.0 / (1_000_000.0 * F.col("n")), 6
            ).alias("theil_contrib"),
            F.round(F.col("between_micro") / 1_000_000.0, 6).alias(
                "between_term"
            ),
            F.round(
                F.col("all_t_micro") * 1.0 / (1_000_000.0 * F.col("n")), 6
            ).alias("theil_total"),
        )
        .orderBy("nation")
    )
