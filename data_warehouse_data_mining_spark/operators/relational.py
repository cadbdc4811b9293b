"""Core relational operators, each with a DuckDB oracle mirror.

Covers the reference's relational surface (SURVEY.md §2.1: scans,
projections, filters, casts, conditional rewrite/imputation, group-by
counts, global aggregates, distinct, union, null profiling, summary
stats — reference sites cited per query) plus the §2.2 capability-gap
set (joins of every flavor, rollup/cube/grouping sets, set ops, scalar
string/date/math/json functions, pivot, subqueries, top-k).

Scale design notes (applies to all queries here):
* Dimension joins (region/nation/part/supplier) are explicitly
  broadcast — at 100 TB the fact side never shuffles for those.
* Fact-fact joins (lineitem ⋈ orders) shuffle on the join key; AQE
  handles skew.  No query collects to the driver.
* All filters are plain column predicates on scan columns so Catalyst
  pushes them into the parquet reader (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.functions import texthash as th
from data_warehouse_data_mining_spark.registry import register


def money_sum(expr: F.Column, scale: int = 4, round_to: int = 2) -> F.Column:
    """Exact money aggregation: route the sum through DECIMAL.

    Revenue expressions like price*(1-discount) are exact 4-decimal
    rationals; summing them as doubles then round(·, 2) hits exact .xx5
    ties ~1% of the time, where double tie-breaking diverges between
    engines. Casting each term to DECIMAL(28,scale) recovers the exact
    rational (double error ≪ half-tick), the decimal sum is exact, and
    both Spark and DuckDB round decimal ties half-away-from-zero — so
    the rounded result is bit-identical. Final cast back to DOUBLE for a
    stable output schema. Oracle twin:
    ``CAST(round(sum(CAST(expr AS DECIMAL(28,s))), 2) AS DOUBLE)``.
    """
    return (
        F.round(F.sum(expr.cast(f"decimal(28,{scale})")), round_to)
        .cast("double")
    )


def money_sum_fast(expr: F.Column, scale: int = 4, round_to: int = 2) -> F.Column:
    """Exact money aggregation on the FAST path: fixed-point longs.

    Same correctness contract as money_sum (exact sum of k-decimal
    rationals, engine-identical half-away rounding) but ~2× faster:
    each term becomes an exact integer of 10^scale units (the double is
    within 1e-9 of the true integer, so round() recovers it identically
    in both engines), the sum is a plain long aggregate, and the final
    rounding is pure integer arithmetic — (x - x % shift)/shift is an
    exact integer-valued double in both engines.

    Bounds: the long accumulator holds sums up to ~9e18 fixed-point
    units; beyond that (full 100 TB money columns) use money_sum's
    decimal path, which Spark spills correctly. Oracle twin:
    ``((x - x % SHIFT)/SHIFT)/10^round_to`` with
    ``x = CAST(sum(CAST(round(expr*10^scale, 0) AS BIGINT)) AS BIGINT) + HALF``.
    """
    mult = 10**scale
    shift = 10 ** (scale - round_to)
    half = shift // 2
    x = F.sum(F.round(expr * mult, 0).cast("bigint")) + F.lit(half)
    return (x - x % shift) / shift / F.lit(10**round_to)


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    headline=True,
    oracle="""
    SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
           ((x4 - x4 % 100) / 100) / 100.0     AS sum_disc_price,
           ((x6 - x6 % 10000) / 10000) / 100.0 AS sum_charge,
           avg_qty, avg_price, avg_disc, count_order
    FROM (
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)      AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0)
                           AS BIGINT)) AS BIGINT) + 50   AS x4,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000, 0)
                           AS BIGINT)) AS BIGINT) + 5000 AS x6,
             round(avg(l_quantity), 6)      AS avg_qty,
             round(avg(l_extendedprice), 6) AS avg_price,
             round(avg(l_discount), 6)      AS avg_disc,
             count(*)                       AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    ) t
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: scan→filter→hash-agg.

    The flagship query (SURVEY.md §7 phase 0): exercises predicate
    pushdown, column pruning, partial+final hash aggregation.
    """
    li = load(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            money_sum_fast(disc_price, 4).alias("sum_disc_price"),
            money_sum_fast(disc_price * (1 + F.col("l_tax")), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "revenue_forecast",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
)
def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style single-row conjunctive-filter aggregate."""
    li = load(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.04, 0.08))
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


@register(
    "global_mean",
    oracle="""
    SELECT round(avg(l_quantity), 6) AS mean_qty,
           round(avg(l_extendedprice), 6) AS mean_price
    FROM lineitem
    """,
)
def global_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate (reference: mean(bmi), stroke_predict.py:46-47)."""
    li = load(spark, sf_dir).lineitem
    return li.agg(
        F.round(F.avg("l_quantity"), 6).alias("mean_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("mean_price"),
    )


@register(
    "value_counts",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency table (reference: df.groupby('stroke').count(),
    stroke_predict.py:29-30)."""
    return load(spark, sf_dir).orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "batched_frequency_tables",
    oracle="""
    SELECT CASE WHEN grouping(o_orderstatus) = 0 THEN 'o_orderstatus'
                ELSE 'o_orderpriority' END AS col_name,
           coalesce(o_orderstatus, o_orderpriority) AS col_value,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def batched_frequency_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column frequency tables in ONE scan via GROUPING SETS.

    The reference loops one groupBy job per nominal column
    (stroke_prediction.ipynb cell 4) — a per-column-scan anti-pattern
    (SURVEY.md §4.3). Grouping sets computes all of them in a single
    pass, which is what survives at 100 TB.
    """
    cat = load(spark, sf_dir)
    cat.register_views()
    return spark.sql(
        """
        SELECT CASE WHEN grouping(o_orderstatus) = 0 THEN 'o_orderstatus'
                    ELSE 'o_orderpriority' END AS col_name,
               coalesce(o_orderstatus, o_orderpriority) AS col_value,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "summary_stats",
    oracle="""
    SELECT count(l_quantity)              AS n,
           round(avg(l_quantity), 6)      AS mean,
           round(stddev(l_quantity), 6)   AS std,
           round(min(l_quantity), 2)      AS min,
           round(max(l_quantity), 2)      AS max,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 6) AS median
    FROM lineitem
    """,
)
def summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()-style profile, plus exact median
    (reference: df.describe().show(2), stroke_predict.py:26)."""
    li = load(spark, sf_dir).lineitem
    return li.agg(
        F.count("l_quantity").alias("n"),
        F.round(F.avg("l_quantity"), 6).alias("mean"),
        F.round(F.stddev("l_quantity"), 6).alias("std"),
        F.round(F.min("l_quantity"), 2).alias("min"),
        F.round(F.max("l_quantity"), 2).alias("max"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median"),
    )


@register(
    "distinct_count_by_group",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def distinct_count_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (reference distinct: smote_sampling.py:9)."""
    li = load(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a column pair (reference:
    encoded.select(c, idx).distinct(), stroke_predict.py:81)."""
    return load(spark, sf_dir).lineitem.select("l_returnflag", "l_linestatus").distinct()


@register(
    "approx_distinct_parts",
    oracle="""
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT)  AS exact_parts,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           1 AS parts_within_5pct,
           1 AS orders_within_5pct
    FROM lineitem
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct, exact-oracle-checked as a
    PROPERTY: Spark's HLL and DuckDB's differ by design, so instead of
    comparing estimates the query emits the exact distinct counts plus
    a flag that the HLL estimate (rsd 1%) landed within 5% of exact —
    the oracle pins the exact counts and expects the flags true. The
    estimate itself stays one aggregation pass; the exact twin rides
    the same scan."""
    li = load(spark, sf_dir).lineitem
    within = lambda est, exact: (  # noqa: E731
        (F.abs(est - exact) / exact <= 0.05).cast("int")
    )
    # exact distincts and HLL sketches aggregate in SEPARATE passes:
    # combining two countDistinct columns with two HLL buffers in one
    # aggregate makes Catalyst expand every row into one branch per
    # distinct group while threading rsd-0.01 HLL buffers through the
    # sort-based fallback — at sf0.1 that OOMs a default-sized (1g)
    # driver heap. Split, each pass is a plain partial-merge aggregate;
    # the 1-row results broadcast-join for free.
    exact = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    approx = li.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("ap"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("ao"),
    )
    agg = exact.crossJoin(F.broadcast(approx))
    return agg.select(
        "exact_parts",
        "exact_orders",
        within(F.col("ap"), F.col("exact_parts")).alias("parts_within_5pct"),
        within(F.col("ao"), F.col("exact_orders")).alias("orders_within_5pct"),
    )


def exact_group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[float],
    eps: float = 0.01,
    acc: int = 10_000,
    small_n: int = 1_000,
) -> DataFrame:
    """Exact interpolated (percentile_cont) per-group percentiles via
    sketch-bracketed selection — no per-group whole-column agg buffer.

    ``F.percentile`` holds every group value in one agg buffer (a
    driver-style bottleneck at large SF). Instead: (1) one sketch pass
    gets per-group counts plus approx brackets [p-eps, p+eps] around
    each target percentile; (2) one counting pass finds how many values
    fall strictly below each bracket; (3) only the ~2·eps fraction of
    rows inside a bracket is ranked with a per-(group, percentile)
    window, from which the exact percentile_cont interpolation is read
    off. Every pass is a map-side-partial aggregate or a window over a
    bracket whose size eps dials; groups under small_n rows skip the
    bracket (they are ranked whole, which is exact and tiny).

    Returns long format: (group_col, pid, val) where val is the exact
    UNROUNDED percentile ps[pid] — identical IEEE doubles to DuckDB's
    percentile_cont over the same values.

    NULL values are dropped up front, matching percentile_cont /
    percentile_approx semantics — without the filter, n = count(1)
    would count null rows and inflate the target rank rk = (n-1)*p
    (and in the small-group path NULLs sort first and shift every
    rank).
    """
    o = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v")).filter(
        F.col("v").isNotNull()
    )
    k = len(ps)
    stats = o.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(
            "v", [max(p - eps, 0.0) for p in ps], acc
        ).alias("blo"),
        F.percentile_approx(
            "v", [min(p + eps, 1.0) for p in ps], acc
        ).alias("bhi"),
    )
    # stats is one row per group — AQE broadcasts this join at any SF
    j = o.join(stats, "g")
    small = F.col("n") < small_n

    below = j.groupBy("g").agg(
        *[
            F.sum(
                F.when(~small & (F.col("v") < F.col("blo")[i]), 1).otherwise(0)
            ).alias(f"c_below_{i}")
            for i in range(k)
        ]
    )
    below_long = below.select(
        "g",
        F.posexplode(
            F.array(*[F.col(f"c_below_{i}") for i in range(k)])
        ).alias("pid", "c_below"),
    )
    # tag each row with every percentile whose bracket contains it
    tagged = j.select(
        "g",
        "v",
        "n",
        F.explode(
            F.array(
                *[
                    F.when(
                        small
                        | (
                            (F.col("v") >= F.col("blo")[i])
                            & (F.col("v") <= F.col("bhi")[i])
                        ),
                        F.lit(i),
                    )
                    for i in range(k)
                ]
            )
        ).alias("pid"),
    ).filter(F.col("pid").isNotNull())

    w = W.partitionBy("g", "pid").orderBy("v")
    p_col = F.element_at(
        F.array(*[F.lit(float(p)) for p in ps]), F.col("pid") + 1
    )
    rk = (F.col("n") - 1) * p_col  # 0-based fractional target rank
    r1 = F.floor(rk) + 1  # 1-based rank of the lower bracket value
    ranked = (
        tagged.withColumn("rn", F.row_number().over(w))
        .join(below_long, ["g", "pid"])
        .withColumn(
            "rank",
            F.when(small, F.lit(0)).otherwise(F.col("c_below")) + F.col("rn"),
        )
        .filter((F.col("rank") == r1) | (F.col("rank") == r1 + 1))
    )
    # interpolate: v1 + frac * (v2 - v1), percentile_cont semantics
    frac = rk - F.floor(rk)
    v1 = F.min(F.when(F.col("rank") == r1, F.col("v")))
    v2 = F.coalesce(F.min(F.when(F.col("rank") == r1 + 1, F.col("v"))), v1)
    per_p = ranked.groupBy("g", "pid").agg(
        (v1 + F.first(frac) * (v2 - v1)).alias("val")
    )
    return per_p.select(F.col("g").alias(group_col), "pid", "val")


@register(
    "median_exact",
    oracle="""
    SELECT o_orderstatus,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 6) AS median_price,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 6) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — the scale-safe
    sketch-bracketed selection, via ``exact_group_percentiles``."""
    o = load(spark, sf_dir).orders
    per_p = exact_group_percentiles(o, "o_orderstatus", "o_totalprice", [0.5, 0.9])
    return (
        per_p.groupBy("o_orderstatus")
        .pivot("pid", [0, 1])
        .agg(F.first("val"))
        .select(
            "o_orderstatus",
            F.round("0", 6).alias("median_price"),
            F.round("1", 6).alias("p90_price"),
        )
    )


@register(
    "histogram_fixed_bins",
    oracle="""
    SELECT CAST(floor((l_quantity - 1.0) / 5.0) AS INT) AS bucket,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS bucket_price
    FROM lineitem
    GROUP BY 1
    """,
)
def histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed histogram binning — replaces the reference's
    collect-whole-column-then-plt.hist (nb:cell5, SURVEY.md §4.2)."""
    li = load(spark, sf_dir).lineitem
    bucket = F.floor((F.col("l_quantity") - 1.0) / 5.0).cast("int").alias("bucket")
    return li.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("bucket_price"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "revenue_by_nation",
    headline=True,
    oracle="""
    SELECT n_name,
           ((x4 - x4 % 100) / 100) / 100.0 AS revenue,
           n_lines
    FROM (
      SELECT n_name,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0)
                           AS BIGINT)) AS BIGINT) + 50 AS x4,
             count(*) AS n_lines
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name IN ('ASIA', 'EUROPE')
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name
    ) t
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style multi-join: fact-fact shuffle join + broadcast
    dimension joins (nation/region always broadcast; customer is small
    here but would shuffle at 100 TB — left to AQE).

    Plan-shape note (r5 audit): four shapes were timed back-to-back on
    the same machine at sf0.1 (min-of-5): this shape 0.903 s;
    dims-first (orders⋈dim before the fact join) 1.164 s un-hinted
    (the static planner broadcast the pruned FACT scan) and 1.065 s
    with orders_dim hinted; fully-broadcast dims-first 0.939 s. At toy
    scale AQE already collapses this shape's custkey join to a
    broadcast, so dims-first only adds stage-serialization latency —
    the r4-vs-r3 min delta (0.892 vs 0.850) was environmental, not a
    plan change. At 100 TB the dims-first order (one orders-sized
    custkey shuffle + one fact orderkey shuffle) beats this shape's two
    fact-sized shuffles — that is a data-size-dependent rewrite AQE
    cannot do; revisit if the bench SF ever grows past broadcast
    thresholds."""
    t = load(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    dim = (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(t.region.filter(F.col("r_name").isin("ASIA", "EUROPE"))),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name")
    )
    return (
        t.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            money_sum_fast(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "broadcast_dim_join",
    oracle="""
    SELECT p_brand,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 25
    GROUP BY p_brand
    """,
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension join of part onto lineitem with NO forced hint: AQE
    broadcasts the dim at runtime whenever it actually fits (so the
    fact table never shuffles at test scale) and falls back to a
    shuffled join when it doesn't — the plan that survives at 100 TB,
    where part itself is ~20 B rows and a mandatory broadcast OOMs."""
    t = load(spark, sf_dir)
    part = t.part.filter(F.col("p_size") <= 25).select("p_partkey", "p_brand")
    return (
        t.lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@register(
    "semi_join_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with a >400k order."""
    t = load(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 400000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "anti_join_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders."""
    t = load(spark, sf_dir)
    return t.customer.join(
        t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "outer_join_order_counts",
    oracle="""
    SELECT c_custkey,
           count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders."""
    t = load(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "full_outer_nation_presence",
    oracle="""
    SELECT coalesce(c.nk, s.nk) AS nationkey,
           coalesce(c.n_cust, 0) AS n_cust,
           coalesce(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s
    ON c.nk = s.nk
    """,
)
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (nations having customers
    and/or suppliers)."""
    t = load(spark, sf_dir)
    c = t.customer.groupBy(F.col("c_nationkey").alias("c_nk")).agg(
        F.count(F.lit(1)).alias("n_cust_raw")
    )
    s = t.supplier.groupBy(F.col("s_nationkey").alias("s_nk")).agg(
        F.count(F.lit(1)).alias("n_supp_raw")
    )
    return (
        c.join(s, F.col("c_nk") == F.col("s_nk"), "full_outer")
        .select(
            F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nationkey"),
            F.coalesce(F.col("n_cust_raw"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("n_supp_raw"), F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "theta_join_late_shipments",
    oracle="""
    SELECT l_returnflag, count(*) AS n_late,
           round(avg(date_diff('day', o_orderdate, l_shipdate)), 6) AS avg_lag_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
     AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_returnflag
    """,
)
def theta_join_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a residual range predicate (theta join): lines
    shipped >90 days after the order date."""
    t = load(spark, sf_dir)
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        t.lineitem.join(t.orders, cond)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_late"),
            F.round(F.avg(F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))), 6).alias(
                "avg_lag_days"
            ),
        )
    )


@register(
    "exists_subquery_sql",
    oracle="""
    SELECT p_brand, count(*) AS n
    FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey AND l_quantity >= 49)
    GROUP BY p_brand
    """,
)
def exists_subquery_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery via the SQL surface (Catalyst rewrites
    it to a left-semi join)."""
    cat = load(spark, sf_dir)
    cat.register_views()
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n
        FROM part
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_quantity >= 49)
        GROUP BY p_brand
        """
    )


@register(
    "in_subquery_sql",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    GROUP BY o_orderpriority
    """,
)
def in_subquery_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (orders of customers in debt)."""
    cat = load(spark, sf_dir)
    cat.register_views()
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube / pivot
# ---------------------------------------------------------------------------


@register(
    "rollup_sales",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid,
           round(sum(l_extendedprice), 2) AS total_price,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping indicators (subtotals + grand total)."""
    li = load(spark, sf_dir).lineitem
    return li.rollup("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")).alias("gid"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "gid", "total_price", "n")


@register(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus) + 2 * grouping(o_orderpriority) AS gid,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping combinations in one pass)."""
    o = load(spark, sf_dir).orders
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        (F.grouping("o_orderstatus") + 2 * F.grouping("o_orderpriority")).alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    ).select("o_orderstatus", "o_orderpriority", "gid", "n", "total")


@register(
    "grouping_sets_mixed",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid,
           round(sum(l_extendedprice), 2) AS total_price,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
    """,
)
def grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with a non-hierarchical mix — the
    (l_linestatus)-only subtotal is reachable by neither ROLLUP nor
    CUBE of this column order, which is exactly what the explicit form
    is for. Uses the native DataFrame ``groupingSets`` API (Spark 4.0+)
    — one Expand + one hash aggregate, same single-shuffle plan shape
    as rollup/cube."""
    li = load(spark, sf_dir).lineitem
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            (F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")).alias(
                "gid"
            ),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "total_price", "n")
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide). Implemented with conditional aggregation so
    missing combinations are 0 (Spark's .pivot() yields NULL there);
    single-pass, no per-pivot-value jobs."""
    o = load(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_partial"),
    )


@register(
    "unpivot_stack",
    oracle="""
    SELECT p_partkey, metric, round(val, 2) AS val
    FROM (
      SELECT p_partkey, 'retail' AS metric, p_retailprice AS val FROM part
      UNION ALL
      SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    ) t
    WHERE p_partkey <= 200
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via stack()."""
    p = load(spark, sf_dir).part.filter(F.col("p_partkey") <= 200)
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'retail', p_retailprice, 'size', CAST(p_size AS DOUBLE)) AS (metric, raw)",
    ).select("p_partkey", "metric", F.round(F.col("raw"), 2).alias("val"))


# ---------------------------------------------------------------------------
# Set operations / union / sampling
# ---------------------------------------------------------------------------


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers ordering in both H1-1996 and H1-1997."""
    o = load(spark, sf_dir).orders
    h1_96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    h1_97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    return h1_96.intersect(h1_97)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: BUILDING-segment customers minus big spenders."""
    t = load(spark, sf_dir)
    b = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = t.orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return b.exceptAll(big.distinct()).distinct()


@register(
    "union_all_tiers",
    oracle="""
    SELECT 'high' AS tier, o_orderkey, round(o_totalprice, 2) AS price
    FROM orders WHERE o_totalprice > 400000
    UNION ALL
    SELECT 'low' AS tier, o_orderkey, round(o_totalprice, 2) AS price
    FROM orders WHERE o_totalprice < 2000
    """,
)
def union_all_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics — reference: unionAll,
    smote_sampling.py:52-54)."""
    o = load(spark, sf_dir).orders
    high = o.filter(F.col("o_totalprice") > 400000).select(
        F.lit("high").alias("tier"),
        "o_orderkey",
        F.round(F.col("o_totalprice"), 2).alias("price"),
    )
    low = o.filter(F.col("o_totalprice") < 2000).select(
        F.lit("low").alias("tier"),
        "o_orderkey",
        F.round(F.col("o_totalprice"), 2).alias("price"),
    )
    return high.unionByName(low)


@register(
    "bernoulli_sample",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS total_rows,
           1 AS within_binomial_6sigma
    FROM orders
    """,
)
def bernoulli_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (reference: dataInput_maj.sample(...),
    smote_sampling.py:53), exact-oracle-checked as a PROPERTY: sampling
    RNGs differ per engine, so the query emits the exact input count
    plus a flag that the sampled count landed within 6σ binomial bounds
    of fraction·n — a property every correct Bernoulli sampler holds
    with overwhelming probability (6σ two-sided miss ≈ 2e-9).
    deterministic_hash_sample remains the row-level, engine-portable
    twin."""
    frac = 0.1
    o = load(spark, sf_dir).orders
    agg = o.agg(F.count(F.lit(1)).alias("total_rows"))
    sampled_n = (
        o.sample(withReplacement=False, fraction=frac, seed=42)
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    sd = F.sqrt(F.col("total_rows") * frac * (1 - frac))
    return agg.crossJoin(F.broadcast(sampled_n)).select(
        "total_rows",
        (
            F.abs(F.col("n_sampled") - F.col("total_rows") * frac) <= 6 * sd
        ).cast("int").alias("within_binomial_6sigma"),
    )


@register(
    "deterministic_hash_sample",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < '1999'
    """,
)
def deterministic_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash Bernoulli sample: keep a row iff the md5 of its key
    falls under a hex threshold (0x1999/0x10000 ≈ 10%).

    This is the reproducible-sampling shape a 100 TB pipeline actually
    needs: membership depends only on the key, not on an RNG stream, so
    the sample is stable across engines, re-runs, partitionings, and
    incremental loads — and therefore exactly oracle-checkable (hex
    digits compare lexicographically as numbers). Pure map-side filter,
    no shuffle."""
    o = load(spark, sf_dir).orders
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4) < "1999"
    ).select("o_orderkey", "o_custkey")


@register(
    "deterministic_hash_split",
    oracle="""
    SELECT CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < 'cccc'
                THEN 'train' ELSE 'test' END AS split,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,4))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY 1
    ORDER BY split
    """,
)
def deterministic_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash 80/20 train/test assignment (0xcccc/0x10000 = 80%):
    the engine-portable twin of randomSplit (random_split_sizes). Split
    membership is a pure function of the key, so the assignment survives
    re-runs and data growth — rows never migrate between splits when new
    data arrives, which RNG-based splits cannot guarantee."""
    o = load(spark, sf_dir).orders
    split = F.when(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4) < "cccc",
        "train",
    ).otherwise("test")
    return (
        o.groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("split")
    )


@register(
    "weighted_sample_per_lang",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             ln(CAST(list_reduce(list_transform(range(1, 9),
                  i -> CAST(strpos('0123456789abcdef',
                         substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1))
                       - 1 AS BIGINT)), (a, b) -> a * 16 + b) + 1 AS DOUBLE)
                / 4294967296.0) / n_chars AS wkey
      FROM documents
    )
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY wkey DESC, doc_id)
               AS rn
      FROM keyed
    ) WHERE rn <= 20 ORDER BY lang, doc_id
    """,
)
def weighted_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted reservoir sample (Efraimidis-Spirtsis
    A-Res): per language, the 20 documents drawn with probability
    proportional to length — the quality/size-weighted subsample step
    of training-data selection, reproducible across engines and re-runs.

    Each doc's sort key is ln(u)/w with u a 32-bit md5-derived uniform
    and w = n_chars; top-k by key IS a weighted sample without
    replacement. The md5→uniform fold is bit-identical across engines
    (texthash canon); ln() may differ in the last ulp, but membership
    only flips if two keys collide within ~1e-15 relative — vanishing
    for continuous weights — and the OUTPUT carries no float, so the
    hash compare is ulp-robust. One map pass + one top-k-per-group
    window on the lang shuffle; at 100 TB use the partial-top-k
    pre-aggregation (topk_per_group's note) before the final window."""
    d = load(spark, sf_dir).documents
    u = (th.md5_word(F.col("doc_id").cast("string"), 1) + 1) / F.lit(4294967296.0)
    wkey = F.log(u) / F.col("n_chars")
    w = W.partitionBy("lang").orderBy(F.col("wkey").desc(), "doc_id")
    return (
        d.select("doc_id", "lang", "n_chars", wkey.alias("wkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang", "n_chars")
        .orderBy("lang", "doc_id")
    )


@register(
    "null_safe_join",
    oracle="""
    WITH l AS (SELECT NULLIF(o_orderstatus, 'P') AS k, o_totalprice FROM orders),
         r AS (SELECT NULLIF(o_orderstatus, 'P') AS k,
                      count(*) AS n_status
               FROM orders GROUP BY 1)
    SELECT l.k, CAST(count(*) AS BIGINT) AS n_rows, min(r.n_status) AS n_status
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY l.k ORDER BY l.k NULLS FIRST
    """,
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``eqNullSafe`` / SQL ``<=>``): NULL keys
    match NULL keys instead of silently dropping — the semantics data
    reconciliation needs when the join key is itself nullable. Still
    plans as a hash join (null-safe equality is an equi-key), not a
    nested loop."""
    o = load(spark, sf_dir).orders
    k = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    left = o.select(k.alias("k"), "o_totalprice")
    right = (
        o.select(k.alias("rk"))
        .groupBy("rk")
        .agg(F.count(F.lit(1)).alias("n_status"))
    )
    return (
        left.join(F.broadcast(right), F.col("k").eqNullSafe(F.col("rk")))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("n_status").alias("n_status"),
        )
        .orderBy(F.col("k").asc_nulls_first())
    )


@register(
    "stratified_sample_counts",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_total,
           1 AS within_binomial_6sigma
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sampling (``sampleBy``): different keep-rates
    per market segment — the per-stratum generalization of the
    reference's majority-class undersampling. Exact-oracle-checked as a
    PROPERTY (sampling RNGs differ per engine): per stratum, the exact
    population count plus a flag that the sampled count landed within
    6σ binomial bounds of rate·n (rate-1.0 strata have σ=0, so the
    flag also pins that sampleBy keeps them whole)."""
    c = load(spark, sf_dir).customer
    fractions = {"AUTOMOBILE": 0.5, "BUILDING": 0.2, "FURNITURE": 0.1,
                 "HOUSEHOLD": 0.05, "MACHINERY": 1.0}
    rate = F.coalesce(
        *[
            F.when(F.col("c_mktsegment") == seg, F.lit(fr))
            for seg, fr in fractions.items()
        ],
        F.lit(0.0),
    )
    totals = (
        c.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_total"))
        .withColumn("rate", rate)
    )
    sampled = (
        c.sampleBy("c_mktsegment", fractions=fractions, seed=42)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    sd = F.sqrt(F.col("n_total") * F.col("rate") * (1 - F.col("rate")))
    return (
        totals.join(sampled, "c_mktsegment", "left")
        .select(
            "c_mktsegment",
            "n_total",
            (
                F.abs(
                    F.coalesce(F.col("n_sampled"), F.lit(0))
                    - F.col("n_total") * F.col("rate")
                )
                <= 6 * sd
            ).cast("int").alias("within_binomial_6sigma"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "random_split_sizes",
    oracle="""
    SELECT 'test' AS split, CAST(count(*) AS BIGINT) AS n_total,
           1 AS within_binomial_6sigma, 1 AS splits_partition_input
    FROM orders
    UNION ALL
    SELECT 'train', CAST(count(*) AS BIGINT), 1, 1 FROM orders
    ORDER BY split
    """,
)
def random_split_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded 70:30 randomSplit (reference: stroke_predict.py:152),
    exact-oracle-checked as a PROPERTY: per split, the exact input
    count, a flag that the split size landed within 6σ binomial bounds
    of its weight, and a flag that the two splits exactly partition the
    input (no dropped/duplicated rows — the invariant randomSplit
    guarantees and an RNG-seed oracle cannot)."""
    o = load(spark, sf_dir).orders
    train, test = o.randomSplit([0.7, 0.3], seed=42)
    n_total = o.agg(F.count(F.lit(1)).alias("n_total"))
    sizes = (
        train.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("train").alias("split"), "n", F.lit(0.7).alias("w")
        )
        .unionByName(
            test.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("test").alias("split"), "n", F.lit(0.3).alias("w")
            )
        )
    )
    both = sizes.crossJoin(F.broadcast(n_total))
    sd = F.sqrt(F.col("n_total") * F.col("w") * (1 - F.col("w")))
    total_of_splits = F.sum("n").over(W.partitionBy())
    return both.select(
        "split",
        "n_total",
        (
            F.abs(F.col("n") - F.col("n_total") * F.col("w")) <= 6 * sd
        ).cast("int").alias("within_binomial_6sigma"),
        (total_of_splits == F.col("n_total")).cast("int").alias(
            "splits_partition_input"
        ),
    ).orderBy("split")


# ---------------------------------------------------------------------------
# Scalar functions: string / date / math / json / case-when / casts
# ---------------------------------------------------------------------------


@register(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                                   AS brand_upper,
           substr(p_name, 1, 8)                             AS name_prefix,
           length(p_name)                                   AS name_len,
           replace(p_type, ' ', '_')                        AS type_slug,
           p_brand || ':' || CAST(p_size AS VARCHAR)        AS brand_size,
           strpos(p_name, 'a')                              AS first_a
    FROM part WHERE p_partkey <= 500
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions (upper/substr/length/replace/concat/locate)."""
    p = load(spark, sf_dir).part.filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.locate("a", F.col("p_name")).alias("first_a"),
    )


@register(
    "date_functions",
    oracle="""
    SELECT year(o_orderdate)    AS yr,
           month(o_orderdate)   AS mo,
           quarter(o_orderdate) AS qtr,
           count(*)             AS n,
           round(sum(o_totalprice), 2) AS total,
           strftime(min(date_trunc('month', o_orderdate)), '%Y-%m-%d %H:%M:%S') AS month_start
    FROM orders
    WHERE date_diff('day', o_orderdate, TIMESTAMP '2001-01-01 00:00:00') BETWEEN 0 AND 730
    GROUP BY 1, 2, 3
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions (year/month/quarter/date_trunc/datediff);
    timestamps emitted as formatted strings for oracle parity."""
    o = load(spark, sf_dir).orders
    return (
        o.filter(
            F.datediff(F.lit("2001-01-01").cast("timestamp"), F.col("o_orderdate")).between(
                0, 730
            )
        )
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.date_format(
                F.min(F.date_trunc("month", F.col("o_orderdate"))), "yyyy-MM-dd HH:mm:ss"
            ).alias("month_start"),
        )
    )


@register(
    "math_functions",
    oracle="""
    SELECT l_linenumber,
           round(sum(round(l_extendedprice, 0)), 2)      AS sum_rounded,
           round(sum(floor(l_quantity)), 2)              AS sum_floor,
           round(sum(ceil(l_discount * 100)), 2)         AS sum_ceil_disc,
           round(sum(abs(l_quantity - 25.0)), 2)         AS sum_abs_dev,
           round(sum(sqrt(l_quantity)), 4)               AS sum_sqrt,
           round(sum(ln(l_extendedprice)), 4)            AS sum_ln,
           round(sum(pow(l_discount, 2)), 6)             AS sum_disc_sq
    FROM lineitem
    GROUP BY l_linenumber
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions (round/floor/ceil/abs/sqrt/ln/pow)."""
    li = load(spark, sf_dir).lineitem
    return li.groupBy("l_linenumber").agg(
        F.round(F.sum(F.round(F.col("l_extendedprice"), 0)), 2).alias("sum_rounded"),
        # Spark floor/ceil return LONG while DuckDB's return DOUBLE —
        # cast so the compared value spaces match
        F.round(F.sum(F.floor(F.col("l_quantity"))), 2).cast("double").alias("sum_floor"),
        F.round(F.sum(F.ceil(F.col("l_discount") * 100)), 2).cast("double").alias("sum_ceil_disc"),
        F.round(F.sum(F.abs(F.col("l_quantity") - 25.0)), 2).alias("sum_abs_dev"),
        F.round(F.sum(F.sqrt(F.col("l_quantity"))), 4).alias("sum_sqrt"),
        F.round(F.sum(F.log(F.col("l_extendedprice"))), 4).alias("sum_ln"),
        F.round(F.sum(F.pow(F.col("l_discount"), 2)), 6).alias("sum_disc_sq"),
    )


@register(
    "json_extraction",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(CAST(props->>'$.k' AS INT)), 2) AS sum_k,
           round(avg(CAST(props->>'$.k' AS INT)), 6) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the events.props payload column."""
    e = load(spark, sf_dir).events
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        # Spark sum(int) is LONG, DuckDB round(sum(INT),2) is DOUBLE
        F.round(F.sum(k), 2).cast("double").alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
    )


@register(
    "case_when_tiers",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS tier,
           count(*) AS n,
           round(avg(o_totalprice), 6) AS avg_price
    FROM orders
    GROUP BY 1
    """,
)
def case_when_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing (reference's when/otherwise conditional
    rewrite, stroke_predict.py:49-50)."""
    o = load(spark, sf_dir).orders
    tier = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("tier")
    )
    return o.groupBy(tier).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
    )


@register(
    "conditional_imputation",
    oracle="""
    WITH m AS (SELECT avg(value) AS mean_val FROM events WHERE event_type <> 'error')
    SELECT event_type,
           round(sum(CASE WHEN event_type = 'error' THEN m.mean_val ELSE value END), 2)
             AS sum_imputed,
           count(*) AS n
    FROM events, m
    GROUP BY event_type
    """,
)
def conditional_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean imputation via when/otherwise — the reference's bmi repair
    (stroke_predict.py:46-53) re-expressed distributed: the mean comes
    from a broadcast 1-row aggregate, not a driver .first() round-trip."""
    e = load(spark, sf_dir).events
    mean_df = e.filter(F.col("event_type") != "error").agg(
        F.avg("value").alias("mean_val")
    )
    imputed = F.when(F.col("event_type") == "error", F.col("mean_val")).otherwise(
        F.col("value")
    )
    return (
        e.crossJoin(F.broadcast(mean_df))
        .groupBy("event_type")
        .agg(
            F.round(F.sum(imputed), 2).alias("sum_imputed"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "null_profile",
    oracle="""
    SELECT count(*) - count(doc_id)  AS doc_id_nulls,
           count(*) - count(text)    AS text_nulls,
           count(*) - count(lang)    AS lang_nulls,
           count(*) - count(source)  AS source_nulls,
           count(*) - count(n_chars) AS n_chars_nulls
    FROM documents
    """,
)
def null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched per-column null-count profile in one aggregate job
    (reference nb:cell2 idiom: sum(isNull.cast(int)) per column)."""
    d = load(spark, sf_dir).documents
    return d.agg(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls")
            for c in ["doc_id", "text", "lang", "source", "n_chars"]
        ]
    )


@register(
    "type_casts",
    oracle="""
    SELECT CAST(floor(l_quantity) AS INT)                  AS qty_int,
           count(*)                                        AS n,
           round(CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS DOUBLE), 2)
                                                           AS sum_price_int,
           CAST(CAST(min(l_shipdate) AS DATE) AS VARCHAR)  AS first_ship_day
    FROM lineitem
    GROUP BY 1
    """,
)
def type_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type casting surface (reference: bmi string→double, int casts,
    stroke_predict.py:52-53, nb-bal:cell1). double→int goes through
    floor() because bare CAST truncates in Spark but rounds in DuckDB."""
    li = load(spark, sf_dir).lineitem
    return li.groupBy(F.floor("l_quantity").cast("int").alias("qty_int")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.floor("l_extendedprice").cast("bigint")).cast("double"), 2).alias(
            "sum_price_int"
        ),
        F.min(F.col("l_shipdate")).cast("date").cast("string").alias("first_ship_day"),
    )


@register(
    "top_orders_global",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — no full sort materialized);
    unique tiebreak key makes LIMIT deterministic across engines."""
    o = load(spark, sf_dir).orders
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
        .limit(25)
    )


@register(
    "boolean_aggregates",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0)      AS all_positive_qty,
           bool_or(l_discount > 0.09)    AS any_high_discount,
           CAST(count_if(l_tax = 0) AS BIGINT) AS n_tax_free
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregates: bool_and / bool_or / count_if."""
    li = load(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_high_discount"),
        F.count_if(F.col("l_tax") == 0).alias("n_tax_free"),
    )


@register(
    "argmax_per_group",
    oracle="""
    SELECT n_nationkey, n_name,
           arg_max(c_name, CAST(round(c_acctbal * 100, 0) AS BIGINT) * 1000000000
                            + c_custkey) AS richest_customer,
           arg_min(c_name, CAST(round(c_acctbal * 100, 0) AS BIGINT) * 1000000000
                            + c_custkey) AS poorest_customer,
           round(max(c_acctbal), 2) AS max_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name
    ORDER BY n_nationkey
    """,
)
def argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin aggregates (max_by / min_by): the row-valued
    companion to max() that otherwise costs a window + filter pass.

    One hash aggregate — no sort, no window, no self-join. The ordering
    value packs (acctbal-in-cents, custkey) into one BIGINT so
    exact-balance ties break deterministically by key with a scalar
    comparator both engines support (DuckDB's arg_max takes no struct
    ordering value)."""
    t = load(spark, sf_dir)
    tie_key = (
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint") * F.lit(1_000_000_000)
        + F.col("c_custkey")
    )
    return (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.max_by(F.col("c_name"), tie_key).alias("richest_customer"),
            F.min_by(F.col("c_name"), tie_key).alias("poorest_customer"),
            F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "string_agg_per_group",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses_csv,
           count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def string_agg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): deterministic via sorted
    distinct collection."""
    o = load(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
            "statuses_csv"
        ),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@register(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))), 2)
                AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style shipping priority: top unshipped-revenue orders for
    one segment — join + agg + deterministic top-k (unique tiebreak)."""
    t = load(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t.orders.filter(
        F.col("o_orderdate") < F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    li = t.lineitem.filter(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "promo_revenue_pct",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
)
def promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style promo revenue share: LIKE predicate inside a
    conditional aggregate over a broadcast dimension join."""
    t = load(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return (
        li.join(t.part.select("p_partkey", "p_type"),
                F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct"))
    )


@register(
    "large_volume_customers",
    oracle="""
    SELECT c_custkey, count(DISTINCT o_orderkey) AS n_big_orders,
           round(sum(big.qty), 2) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN (SELECT l_orderkey, sum(l_quantity) AS qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 180) big
      ON big.l_orderkey = o_orderkey
    GROUP BY c_custkey
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style large-volume customers: HAVING-filtered aggregate
    subquery joined back to the customer axis."""
    t = load(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 180)
    )
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(big, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey")
        .agg(
            F.countDistinct("o_orderkey").alias("n_big_orders"),
            F.round(F.sum("qty"), 2).alias("total_qty"),
        )
    )


@register(
    "returned_item_revenue",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))), 2)
                AS DOUBLE) AS lost_revenue,
           count(*) AS n_returned_lines
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_mktsegment
    HAVING sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) > 100000
    """,
)
def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style returned-item report: revenue lost to returns per
    customer, HAVING-thresholded."""
    t = load(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = t.lineitem.filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.sum(rev.cast("decimal(28,4)")).alias("raw_rev"),
            F.count(F.lit(1)).alias("n_returned_lines"),
        )
        .filter(F.col("raw_rev") > 100000)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round("raw_rev", 2).cast("double").alias("lost_revenue"),
            "n_returned_lines",
        )
    )


@register(
    "correlation_matrix",
    oracle="""
    SELECT 'quantity_vs_price' AS pair,
           round(corr(l_quantity, l_extendedprice), 6) AS r
    FROM lineitem
    UNION ALL
    SELECT 'discount_vs_tax', round(corr(l_discount, l_tax), 6) FROM lineitem
    UNION ALL
    SELECT 'quantity_vs_discount', round(corr(l_quantity, l_discount), 6) FROM lineitem
    ORDER BY pair
    """,
)
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations across lineitem numerics — the
    profiling statistic describe() lacks. All three pairs compute in ONE
    aggregation pass (Spark evaluates the corr aggregates side by side;
    the unpivot to rows is free) — not one scan per pair."""
    li = load(spark, sf_dir).lineitem
    wide = li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("quantity_vs_price"),
        F.round(F.corr("l_discount", "l_tax"), 6).alias("discount_vs_tax"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("quantity_vs_discount"),
    )
    pairs = ["discount_vs_tax", "quantity_vs_discount", "quantity_vs_price"]
    return wide.select(
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(p) for p in pairs]),
                F.array(*[F.col(p) for p in pairs]),
            )
        ).alias("pair", "r")
    )


@register(
    "histogram_equidepth",
    oracle="""
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM (SELECT o_totalprice,
                 ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
          FROM orders)
    GROUP BY bucket ORDER BY bucket
    """,
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (10 equal-count buckets) — the optimizer's
    histogram shape, complementing histogram_fixed_bins' equal-width
    twin. ntile orders by (value, key) so ties split deterministically
    and both engines bucket identically.

    Distributed since r3: the single-partition ``ntile(10) OVER
    (ORDER BY …)`` is replaced by the two-phase bucketed global rank
    (operators/ranking.py) + the exact integer ntile-split formula
    (ntile_from_rank); the oracle still runs real ntile, pinning
    bucket-for-bucket equality. Rows bucket by their monotone cents
    image but rank by the raw double, matching the oracle's ordering
    at full precision."""
    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
        ntile_from_rank,
    )

    o = load(spark, sf_dir).orders
    src = o.select(
        "o_totalprice",
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("price_c"),
    ).localCheckpoint(eager=True)
    n = src.agg(F.count(F.lit(1)).alias("n_pop"))
    ranked = global_order_stats(
        src,
        "price_c",
        "o_orderkey",
        ascending=True,
        order_value_col="o_totalprice",
    )
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "o_totalprice",
            ntile_from_rank(F.col("global_rank"), F.col("n_pop"), 10).alias(
                "bucket"
            ),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "mode_listagg_aggregates",
    oracle="""
    SELECT l_linestatus,
           mode(l_returnflag) AS modal_flag,
           string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag)
             AS all_flags,
           count(*) AS n
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def mode_listagg_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregate surface (Spark 4): mode() for the most
    frequent value and listagg(DISTINCT … ) WITHIN GROUP for an ordered
    concatenation — both engine-native (vs the collect_list/sort_array
    composition in string_agg_per_group).

    mode() is tie-UNDEFINED in both engines, so the query groups where
    the modal value is strictly unique (verified at every testdata SF);
    listagg's WITHIN GROUP ordering makes the concatenation
    deterministic. Both are ordinary partial/final hash aggregates — no
    whole-group buffers beyond the distinct set.
    """
    li = load(spark, sf_dir).lineitem
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.mode("l_returnflag").alias("modal_flag"),
            F.expr(
                "listagg(DISTINCT l_returnflag, ',') "
                "WITHIN GROUP (ORDER BY l_returnflag)"
            ).alias("all_flags"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "higher_order_array_ops",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
      WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(len(list_filter(words, w -> length(w) > 4)) AS INT) AS n_long,
           CAST(list_aggregate(list_transform(words, w -> length(w)), 'sum')
                AS BIGINT) AS total_chars,
           CAST(length(words[1]) = 3 AS BOOLEAN) AS first_is_3,
           round(list_aggregate(list_transform(words, w -> CAST(length(w)
                 AS DOUBLE)), 'avg'), 6) AS avg_len
    FROM t
    """,
)
def higher_order_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — transform / filter / aggregate /
    element access — the lambda surface that keeps array logic inside
    codegen instead of exploding to rows or dropping to Python.

    One row in, one row out, no shuffle: at 100 TB this whole query is
    a single map stage over the scan. The oracle mirrors each lambda
    with DuckDB's list_* equivalents.
    """
    d = load(spark, sf_dir).documents.filter(F.col("doc_id") < 200)
    words = F.split("text", " ")
    lens = F.transform(words, lambda w: F.length(w))
    return d.select(
        "doc_id",
        F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long"),
        F.aggregate(
            lens, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("total_chars"),
        (F.length(F.element_at(words, 1)) == 3).alias("first_is_3"),
        F.round(
            F.aggregate(
                lens, F.lit(0.0), lambda acc, x: acc + x.cast("double")
            )
            / F.size(words),
            6,
        ).alias("avg_len"),
    )


@register(
    "generator_functions",
    oracle="""
    WITH seq AS (
      SELECT o_orderkey, unnest(range(1, (o_orderkey % 4) + 2)) AS step
      FROM orders WHERE o_orderkey <= 500
    )
    SELECT o_orderkey, CAST(step AS INT) AS step,
           CAST(o_orderkey * step AS BIGINT) AS scaled
    FROM seq
    ORDER BY o_orderkey, step
    """,
)
def generator_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator surface: sequence() + explode fans each row out to a
    computed number of rows (1 + orderkey mod 4) — the row-multiplying
    primitive behind date spines, retry schedules, and unnest-style
    modeling. Pure map-side fanout: no shuffle until the final
    presentation sort; DuckDB mirrors with range()+unnest."""
    o = load(spark, sf_dir).orders.filter(F.col("o_orderkey") <= 500)
    return (
        o.select(
            "o_orderkey",
            F.explode(
                F.sequence(F.lit(1), (F.col("o_orderkey") % 4 + 1).cast("int"))
            ).alias("step"),
        )
        .select(
            "o_orderkey",
            F.col("step").cast("int").alias("step"),
            (F.col("o_orderkey") * F.col("step")).alias("scaled"),
        )
        .orderBy("o_orderkey", "step")
    )


@register(
    "winsorized_stats",
    oracle="""
    WITH bounds AS (
      SELECT o_orderstatus,
             round(percentile_cont(0.05) WITHIN GROUP (ORDER BY o_totalprice), 6) AS lo,
             round(percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice), 6) AS hi
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderstatus,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN o.o_totalprice < b.lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_low,
           CAST(sum(CASE WHEN o.o_totalprice > b.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_high,
           CAST(round(sum(CAST(least(greatest(o.o_totalprice, b.lo), b.hi)
                AS DECIMAL(28,6))), 2) AS DOUBLE) AS winsorized_total
    FROM orders o JOIN bounds b ON o.o_orderstatus = b.o_orderstatus
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized aggregation: clip each group's values to its
    [p05, p95] band before summing — the robust-total counterpart of
    dq_outlier_mad's flagging (extreme rows are bounded, not dropped).

    Bounds come from exact_group_percentiles (no whole-group buffers),
    land as a 1-row-per-group broadcast join, and the clipped sum routes
    through DECIMAL: values are exact 2-decimal rationals and bounds
    exact 6-decimal ones, so the total is accumulation-order-independent
    and engine-identical.
    """
    o = load(spark, sf_dir).orders.select("o_orderstatus", "o_totalprice")
    bounds = (
        exact_group_percentiles(o, "o_orderstatus", "o_totalprice", [0.05, 0.95])
        .groupBy("o_orderstatus")
        .pivot("pid", [0, 1])
        .agg(F.first("val"))
        .select(
            "o_orderstatus",
            F.round("0", 6).alias("lo"),
            F.round("1", 6).alias("hi"),
        )
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    return (
        o.join(bounds, "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("o_totalprice") < F.col("lo"), 1).otherwise(0)
            ).alias("n_clipped_low"),
            F.sum(
                F.when(F.col("o_totalprice") > F.col("hi"), 1).otherwise(0)
            ).alias("n_clipped_high"),
            F.round(F.sum(clipped.cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("winsorized_total"),
        )
        .orderBy("o_orderstatus")
    )


PAGE_SIZE = 50
# deterministic "previous page ended here" cursor: the 100th row of the
# (o_orderdate, o_orderkey) total order at any SF is a stable anchor
_CURSOR_ROW = 100


@register(
    "keyset_pagination_page",
    oracle=f"""
    WITH cursor_row AS (
      SELECT o_orderdate AS c_date, o_orderkey AS c_key
      FROM orders ORDER BY o_orderdate, o_orderkey
      LIMIT 1 OFFSET {_CURSOR_ROW - 1}
    )
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_date,
           o_custkey,
           CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE)
             AS total_price
    FROM orders, cursor_row
    WHERE (o_orderdate, o_orderkey) > (c_date, c_key)
    ORDER BY o_orderdate, o_orderkey
    LIMIT {PAGE_SIZE}
    """,
)
def keyset_pagination_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) pagination: fetch the next {PAGE_SIZE} rows
    AFTER a (o_orderdate, o_orderkey) cursor instead of OFFSET-skipping.
    OFFSET n forces the engine to materialize and discard n rows — cost
    grows with page depth, and page 10⁶ of a 100 TB log is a full sort;
    the keyset predicate is an ordinary filter (pushed to the scan,
    min/max-stat prunable) plus a top-{PAGE_SIZE}, so every page costs
    the same. The row-value comparison decomposes to
    date > c OR (date = c AND key > k) — sargable in both engines."""
    o = load(spark, sf_dir).orders
    cursor = (
        o.select("o_orderdate", "o_orderkey")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(_CURSOR_ROW)
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .limit(1)
        .select(
            F.col("o_orderdate").alias("c_date"),
            F.col("o_orderkey").alias("c_key"),
        )
    )
    return (
        o.crossJoin(F.broadcast(cursor))
        .filter(
            (F.col("o_orderdate") > F.col("c_date"))
            | (
                (F.col("o_orderdate") == F.col("c_date"))
                & (F.col("o_orderkey") > F.col("c_key"))
            )
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
                "order_date"
            ),
            "o_custkey",
            F.round(F.col("o_totalprice").cast("decimal(18,2)"), 2)
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("order_date", "o_orderkey")
        .limit(PAGE_SIZE)
    )


@register(
    "grouped_holdout_split",
    oracle="""
    WITH assigned AS (
      SELECT o_custkey, o_orderkey,
             CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 4) < 'cccc'
                  THEN 'train' ELSE 'test' END AS split,
             CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < 'cccc'
                  THEN 'train' ELSE 'test' END AS row_split
      FROM orders
    ),
    group_leak AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT o_custkey FROM assigned
        GROUP BY o_custkey HAVING count(DISTINCT split) > 1
      )
    ),
    row_leak AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT o_custkey FROM assigned
        GROUP BY o_custkey HAVING count(DISTINCT row_split) > 1
      )
    )
    SELECT split,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT) AS n_orders,
           (SELECT n FROM group_leak) AS group_leak_customers,
           (SELECT n FROM row_leak) AS rowlevel_leak_customers
    FROM assigned
    GROUP BY split
    ORDER BY split
    """,
)
def grouped_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware (entity-level) holdout split — the feature-store /
    training-pipeline discipline that row-level splitting violates:
    hashing the CUSTOMER key assigns every order of a customer to the
    same side, so no entity straddles train and test (group-K-fold,
    Kohavi 1995 practice; the leakage class split_leakage_audit hunts
    for near-duplicate DOCUMENTS, this one kills by construction for
    entities). The output contrasts the two disciplines on identical
    data: group_leak_customers is structurally ZERO, while the same
    80/20 hash applied at ROW level leaves rowlevel_leak_customers
    straddling the boundary — every one a potential
    memorize-the-entity leak.

    Determinism: both assignments are pure md5-prefix functions of
    keys (the deterministic_hash_split recipe), so the split is
    reproducible across engines, runs, and backfills. Scale: one fact
    scan fans into one per-customer agg (straddle census) and one
    2-row rollup; no joins touch row-proportional tables."""
    o = load(spark, sf_dir).orders
    gsplit = F.when(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 4) < "cccc",
        "train",
    ).otherwise("test")
    rsplit = F.when(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4) < "cccc",
        "train",
    ).otherwise("test")
    assigned = o.select(
        "o_custkey", "o_orderkey", gsplit.alias("split"), rsplit.alias("row_split")
    )
    gleak = (
        assigned.groupBy("o_custkey")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("group_leak_customers"))
    )
    rleak = (
        assigned.groupBy("o_custkey")
        .agg(F.countDistinct("row_split").alias("k"))
        .filter(F.col("k") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("rowlevel_leak_customers"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .crossJoin(F.broadcast(gleak))
        .crossJoin(F.broadcast(rleak))
        .orderBy("split")
    )
