"""Global order statistics WITHOUT a single-partition window.

Pareto/ABC classification, RFM scoring, and any "rank every row of a
big table by a measure" query naively wants
``row_number() OVER (ORDER BY measure)`` — a window with no PARTITION
BY, which Spark executes on ONE partition: the scale-killer this repo
bans (VERDICT r1; no registered query uses one).

The distributed alternative implemented here is the classic two-phase
range-partitioned prefix sum:

1. bucket every row by a *monotonic* function of the order key
   (``floor(log2(v + 1))`` — ≤ 64 buckets for a BIGINT, equal values
   can never straddle a bucket boundary);
2. rank / prefix-sum WITHIN each bucket with an ordinary partitioned
   window (parallel, spillable);
3. aggregate one tiny row per bucket, prefix-sum THAT (≤ 64 rows — a
   single-partition window bounded by construction, by the key's bit
   width, not by data volume), and broadcast the offsets back.

global_rank = bucket_offset + local_rank, exactly equal to the naive
global window's answer for any monotone bucketing — which is why the
DuckDB oracles here can stay the textbook one-window formulation while
the Spark plan scales to 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.registry import register

_FP = "CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)"


def global_order_stats(
    df: DataFrame,
    value_col: str,
    key_col: str,
    measure_col: str | None = None,
    ascending: bool = False,
) -> DataFrame:
    """Add ``global_rank`` (and ``global_cum`` of ``measure_col``) as if
    computed by ``OVER (ORDER BY value [DESC], key)`` — but distributed.

    ``value_col`` must be a non-negative integral column. Ordering is
    (value asc|desc, key asc); ``measure_col`` must be integral so the
    prefix sum is exact. See module docstring for the three-phase shape.
    """
    # Monotone bucketing: log2 is computed in floating point, which may
    # round at exact powers of two — harmless, because ANY deterministic
    # monotone non-decreasing bucketing yields the exact global answer;
    # equal values always share a bucket.
    b = F.floor(F.log2(F.col(value_col).cast("double") + F.lit(1.0)))
    df = df.withColumn("__b", b.cast("long"))

    order = [
        F.col(value_col).asc() if ascending else F.col(value_col).desc(),
        F.col(key_col).asc(),
    ]
    w_local = W.partitionBy("__b").orderBy(*order)
    df = df.withColumn("__lr", F.row_number().over(w_local))
    aggs = [F.count(F.lit(1)).alias("__bn")]
    if measure_col is not None:
        df = df.withColumn(
            "__lc",
            F.sum(measure_col).over(
                w_local.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        aggs.append(F.sum(measure_col).alias("__bm"))

    stats = df.groupBy("__b").agg(*aggs)
    # Prefix-sum the ≤64 bucket rows with a triangular self-join instead
    # of an unpartitioned window — same O(64²) work, no WindowExec-on-
    # one-partition operator anywhere in the plan.
    prior = F.col("b.__b") < F.col("a.__b") if ascending else F.col("b.__b") > F.col("a.__b")
    offsets = (
        stats.alias("a")
        .join(F.broadcast(stats.alias("b")), prior, "left")
        .groupBy(F.col("a.__b").alias("__b"))
        .agg(
            F.coalesce(F.sum("b.__bn"), F.lit(0)).alias("__on"),
            *(
                [F.coalesce(F.sum("b.__bm"), F.lit(0)).alias("__om")]
                if measure_col is not None
                else []
            ),
        )
    )
    out = df.join(F.broadcast(offsets), "__b")
    out = out.withColumn("global_rank", (F.col("__on") + F.col("__lr")).cast("long"))
    if measure_col is not None:
        out = out.withColumn("global_cum", (F.col("__om") + F.col("__lc")).cast("long"))
    return out.drop("__b", "__lr", "__lc", "__on", "__om")


@register(
    "abc_pareto_classification",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum({_FP}) AS BIGINT) AS rev_fp
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, rev_fp,
             CAST(sum(rev_fp) OVER (ORDER BY rev_fp DESC, l_partkey
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_fp,
             CAST(sum(rev_fp) OVER () AS BIGINT) AS total_fp
      FROM rev
    ),
    classed AS (
      SELECT CASE WHEN cum_fp * 100 <= total_fp * 80 THEN 'A'
                  WHEN cum_fp * 100 <= total_fp * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev_fp, total_fp
      FROM ranked
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           ((x - x % 100) / 100) / 100.0 AS class_revenue,
           round(CAST(sum(rev_fp) AS BIGINT) * 1.0 / any_value(total_fp), 6)
             AS revenue_share
    FROM (SELECT abc_class, rev_fp, total_fp,
                 CAST(sum(rev_fp) OVER (PARTITION BY abc_class) AS BIGINT) + 50 AS x
          FROM classed)
    GROUP BY abc_class, x
    ORDER BY abc_class
    """,
)
def abc_pareto_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto 80/15/5) inventory classification of parts by revenue:
    class A = parts whose running revenue share (ranked by revenue desc)
    stays within 80% of total, B to 95%, C the tail.

    The running share is a GLOBAL cumulative sum over every part — the
    textbook single-partition window — computed here with the
    range-partitioned two-phase prefix sum (module docstring), so the
    part table never collapses to one task. Revenue is exact 1e-4
    fixed-point (pricing_summary's convention): the 80/95 boundary
    tests are pure integer comparisons, immune to double ties. The
    oracle keeps the naive one-window SQL — both produce identical
    classes because the bucketing is monotone."""
    li = load(spark, sf_dir).lineitem
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.expr(_FP)).cast("long").alias("rev_fp")
    )
    ranked = global_order_stats(
        rev, "rev_fp", "l_partkey", measure_col="rev_fp", ascending=False
    )
    total = rev.agg(F.sum("rev_fp").cast("long").alias("total_fp"))
    classed = ranked.crossJoin(F.broadcast(total)).select(
        F.when(F.col("global_cum") * 100 <= F.col("total_fp") * 80, "A")
        .when(F.col("global_cum") * 100 <= F.col("total_fp") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_fp",
        "total_fp",
    )
    x = F.sum("rev_fp").cast("long") + F.lit(50)
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            ((x - x % 100) / 100 / 100.0).alias("class_revenue"),
            F.round(
                F.sum("rev_fp").cast("long") / F.first("total_fp"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


@register(
    "rfm_segmentation",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS ck,
             CAST(date_diff('day', max(o_orderdate),
                            (SELECT max(o_orderdate) FROM orders)) AS BIGINT)
               AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS monetary_fp
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT ck, monetary_fp,
             4 - ((row_number() OVER (ORDER BY recency_days ASC, ck ASC) - 1) * 4)
                 // (SELECT count(*) FROM base) AS r_score,
             4 - ((row_number() OVER (ORDER BY frequency DESC, ck ASC) - 1) * 4)
                 // (SELECT count(*) FROM base) AS f_score,
             4 - ((row_number() OVER (ORDER BY monetary_fp DESC, ck ASC) - 1) * 4)
                 // (SELECT count(*) FROM base) AS m_score
      FROM base
    )
    SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS rfm_segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           ((CAST(sum(monetary_fp) AS BIGINT) * 200 + count(*) * 100)
              // (2 * count(*) * 100)) / 100.0 AS avg_monetary
    FROM scored
    GROUP BY 1
    ORDER BY rfm_segment
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile scores (4 = best) for
    Recency (days since last order), Frequency (order count), Monetary
    (lifetime spend, exact cents), concatenated into segments like
    '444' / '121', with customer counts and average spend per segment.

    Each quartile score needs a rank of EVERY customer by one metric —
    three global orderings, each computed with the distributed two-phase
    prefix sum instead of ntile()'s single-partition window. Scores are
    pure integer arithmetic from the rank: 4 - ((rank-1)*4 div n).
    Population = customers with ≥1 order; at 100 TB the customer
    aggregate is itself large, which is exactly why the ranking must not
    serialize."""
    o = load(spark, sf_dir).orders
    maxd = o.agg(F.max("o_orderdate").alias("gmax"))
    base = (
        o.crossJoin(F.broadcast(maxd))
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.datediff(F.first("gmax"), F.max("o_orderdate"))
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("monetary_fp"),
        )
        # three ranking passes consume this aggregate; materialize once
        .localCheckpoint(eager=True)
    )
    n = base.agg(F.count(F.lit(1)).alias("n_pop"))

    def score(df: DataFrame, col: str, asc: bool, out: str) -> DataFrame:
        ranked = global_order_stats(df, col, "ck", ascending=asc)
        return ranked.select(
            "ck",
            *( ["monetary_fp"] if out == "m_score" else [] ),
            F.expr(f"4 - ((global_rank - 1) * 4) div n_pop").alias(out),
        )

    r = score(base.select("ck", "recency_days").crossJoin(F.broadcast(n)),
              "recency_days", True, "r_score")
    f_ = score(base.select("ck", "frequency").crossJoin(F.broadcast(n)),
               "frequency", False, "f_score")
    m = score(base.select("ck", "monetary_fp").crossJoin(F.broadcast(n)),
              "monetary_fp", False, "m_score")
    scored = r.join(f_, "ck").join(m, "ck")
    return (
        scored.groupBy(
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ).alias("rfm_segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_fp").cast("long").alias("__sum_fp"),
        )
        # .xx5 rounding ties on sum/n doubles diverge between engines —
        # round half-away in exact integer space instead (playbook rule)
        .select(
            "rfm_segment",
            "n_customers",
            F.expr(
                "((__sum_fp * 200 + n_customers * 100)"
                " div (2 * n_customers * 100)) / 100.0"
            ).alias("avg_monetary"),
        )
        .orderBy("rfm_segment")
    )
