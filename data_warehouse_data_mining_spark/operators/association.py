"""Association-rule & sequential-pattern mining — the market-basket
side of a data-mining course (the reference covers classification; a
complete DM engine also ships itemsets/rules/sequences — SURVEY.md §0
course context).

Two tiers per family:
* SQL-expressible support counting (single items + pairs via a
  within-basket self-join) — oracle-checked, and exactly the shape that
  scales: the basket self-join is an equi-join on the basket key,
  bounded by basket size, never a global cross join.
* MLlib miners (FPGrowth for itemsets/rules, PrefixSpan for sequential
  patterns) — rows-only (tree/projection algorithms, not ANSI SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.registry import register

MIN_ITEM_SUPPORT = 40  # orders containing the item
MIN_PAIR_SUPPORT = 3   # orders containing both items


def baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, l_partkey) distinct — the order→items basket table."""
    return (
        load(spark, sf_dir)
        .lineitem.select("l_orderkey", "l_partkey")
        .distinct()
    )


@register(
    "frequent_itemsets_sql",
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    items AS (
      SELECT CAST(l_partkey AS VARCHAR) AS itemset, 1 AS set_size,
             count(*) AS support
      FROM b GROUP BY l_partkey HAVING count(*) >= {MIN_ITEM_SUPPORT}
    ),
    pairs AS (
      SELECT CAST(a.l_partkey AS VARCHAR) || ',' || CAST(c.l_partkey AS VARCHAR)
               AS itemset,
             2 AS set_size, count(*) AS support
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY a.l_partkey, c.l_partkey
      HAVING count(*) >= {MIN_PAIR_SUPPORT}
    )
    SELECT * FROM items UNION ALL SELECT * FROM pairs
    """,
)
def frequent_itemsets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori's first two levels in pure relational form: frequent
    single items, and frequent pairs via the within-basket self-join
    (shuffle on the basket key; pairwise work bounded by basket size)."""
    b = baskets(spark, sf_dir)
    items = (
        b.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MIN_ITEM_SUPPORT)
        .select(
            F.col("l_partkey").cast("string").alias("itemset"),
            F.lit(1).alias("set_size"),
            "support",
        )
    )
    a = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    c = b.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(c, (F.col("ok") == F.col("ok2")) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MIN_PAIR_SUPPORT)
        .select(
            F.concat(F.col("pa").cast("string"), F.lit(","), F.col("pb").cast("string"))
            .alias("itemset"),
            F.lit(2).alias("set_size"),
            "support",
        )
    )
    return items.unionByName(pairs)


@register("ml_fpgrowth_rules")
def ml_fpgrowth_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib FPGrowth over order baskets: frequent-itemset counts by
    size plus the association-rule count — the full pattern-growth miner
    behind the SQL-checkable first levels (rows-only: FP-tree projection
    is not SQL). Deterministic: supports are exact counts."""
    from pyspark.ml.fpm import FPGrowth

    tx = baskets(spark, sf_dir).groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("items")
    )
    n_tx = tx.count()
    model = FPGrowth(
        itemsCol="items",
        minSupport=float(MIN_PAIR_SUPPORT) / n_tx,
        minConfidence=0.2,
    ).fit(tx)
    sets_by_size = (
        model.freqItemsets.groupBy(F.size("items").alias("set_size"))
        .agg(F.count(F.lit(1)).alias("n_itemsets"), F.max("freq").alias("max_support"))
    )
    n_rules = model.associationRules.count()
    return sets_by_size.withColumn("n_rules_total", F.lit(n_rules)).orderBy("set_size")


@register("ml_prefixspan_patterns")
def ml_prefixspan_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib PrefixSpan over per-user event-type sequences: frequent
    sequential patterns up to length 3 (the sequence-mining sibling of
    event_sequence_bigrams' fixed-depth transitions). Rows-only."""
    from pyspark.ml.fpm import PrefixSpan

    e = load(spark, sf_dir).events
    seqs = (
        e.orderBy("user_id", "ts", "event_id")
        .groupBy("user_id")
        .agg(F.collect_list("event_type").alias("flat"))
        .select(F.transform(F.col("flat"), lambda x: F.array(x)).alias("sequence"))
    )
    ps = PrefixSpan(
        minSupport=0.5, maxPatternLength=3, maxLocalProjDBSize=32000000
    )
    patterns = ps.findFrequentSequentialPatterns(seqs)
    return patterns.select(
        F.concat_ws(">", F.transform(F.col("sequence"), lambda s: F.array_join(s, "+")))
        .alias("pattern"),
        F.col("freq").alias("support"),
    ).orderBy(F.col("support").desc(), F.col("pattern"))
