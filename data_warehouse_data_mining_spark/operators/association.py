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


@register(
    "item_cooccurrence_cosine",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    item_n AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM baskets GROUP BY item),
    pair_n AS (
      SELECT a.item AS item_a, b.item AS item_b, CAST(count(*) AS BIGINT) AS n_ab
      FROM baskets a JOIN baskets b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT item_a, item_b, n_ab, na.n AS n_a, nb.n AS n_b,
           round(n_ab / sqrt(na.n * nb.n), 6) AS cosine
    FROM pair_n
    JOIN item_n na ON na.item = item_a
    JOIN item_n nb ON nb.item = item_b
    ORDER BY round(n_ab / sqrt(na.n * nb.n), 6) DESC, item_a, item_b
    LIMIT 20
    """,
)
def item_cooccurrence_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence cosine — the exact, oracle-checkable
    core of a neighborhood recommender (the deterministic sibling of
    the rows-only `ml_als_recommendations`): for part pairs bought in
    the same order ≥2 times, cosine = n_ab / √(n_a·n_b), top-20.

    The pair counts come from the within-basket self-join on the
    basket key — cost bounded by basket_size² per order, co-partitioned
    on the join key, never a global cross join (same scale argument as
    frequent_itemsets_sql). Item marginals join back on the
    item-pair table, which the ≥2-support filter keeps small. cosine
    is one sqrt per row over exact integers."""
    li = load(spark, sf_dir).lineitem
    baskets = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    item_n = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pair_n = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    cos = F.round(F.col("n_ab") / F.sqrt(F.col("n_a") * F.col("n_b")), 6)
    return (
        pair_n.join(item_n.select(F.col("item").alias("item_a"), F.col("n").alias("n_a")), "item_a")
        .join(item_n.select(F.col("item").alias("item_b"), F.col("n").alias("n_b")), "item_b")
        .select("item_a", "item_b", "n_ab", "n_a", "n_b", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "item_a", "item_b")
        .limit(20)
    )


@register(
    "association_rule_metrics",
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nb FROM b),
    isup AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS sup FROM b GROUP BY 1
    ),
    psup AS (
      SELECT a.l_partkey AS pa, c.l_partkey AS pb,
             CAST(count(*) AS BIGINT) AS sup_ab
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {{MIN_PAIR_SUPPORT}}
    ),
    directed AS (
      SELECT pa AS ante, pb AS cons, sup_ab FROM psup
      UNION ALL
      SELECT pb, pa, sup_ab FROM psup
    )
    SELECT d.ante AS antecedent, d.cons AS consequent,
           d.sup_ab AS support_ab,
           sa.sup AS support_ante, sc.sup AS support_cons,
           round(d.sup_ab * 1.0 / sa.sup, 6) AS confidence,
           round(CAST(d.sup_ab AS DOUBLE) * n.nb
                 / (CAST(sa.sup AS DOUBLE) * sc.sup), 6) AS lift,
           round(CAST(d.sup_ab AS DOUBLE) / n.nb
                 - (CAST(sa.sup AS DOUBLE) / n.nb)
                   * (CAST(sc.sup AS DOUBLE) / n.nb), 6) AS leverage,
           CASE WHEN d.sup_ab = sa.sup THEN NULL
                ELSE round((1.0 - CAST(sc.sup AS DOUBLE) / n.nb)
                           / (1.0 - CAST(d.sup_ab AS DOUBLE) / sa.sup), 6)
           END AS conviction
    FROM directed d
    JOIN isup sa ON sa.l_partkey = d.ante
    JOIN isup sc ON sc.l_partkey = d.cons
    CROSS JOIN n
    ORDER BY antecedent, consequent
    """.replace("{MIN_PAIR_SUPPORT}", str(MIN_PAIR_SUPPORT)),
)
def association_rule_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules with the full metric set — confidence,
    lift, leverage, conviction — from exact basket counts: the
    DETERMINISTIC twin of ml_fpgrowth_rules (MLlib's rule miner is
    rows-only checkable; this one is hash-exact), and the metrics
    beyond confidence are what separate real signal from popularity
    (lift > 1) and quantify rule strength without RNG.

    One within-basket self-join produces pair supports (bounded by
    basket size); item supports and the basket count are tiny
    broadcastable aggregates; every metric is one double expression
    over exact integers, with conviction's division-by-zero guarded by
    the exact integer test sup_ab = sup_a."""
    # basket-sized and consumed by four derivations (count, item
    # supports, both self-join sides) — materialize once instead of
    # seven lineitem scans (plan audit)
    b = baskets(spark, sf_dir).localCheckpoint(eager=True)
    n = b.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("nb")
    )
    isup = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("sup"))
    a = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    c = b.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb"))
    psup = (
        a.join(c, (F.col("ok") == F.col("ok2")) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("sup_ab"))
        .filter(F.col("sup_ab") >= MIN_PAIR_SUPPORT)
    )
    directed = psup.select(
        F.col("pa").alias("ante"), F.col("pb").alias("cons"), "sup_ab"
    ).unionAll(
        psup.select(
            F.col("pb").alias("ante"), F.col("pa").alias("cons"), "sup_ab"
        )
    )
    sa = isup.select(F.col("l_partkey").alias("ante"), F.col("sup").alias("sup_a"))
    sc = isup.select(F.col("l_partkey").alias("cons"), F.col("sup").alias("sup_c"))
    nb = F.col("nb").cast("double")
    conf = F.col("sup_ab") * 1.0 / F.col("sup_a")
    return (
        directed.join(sa, "ante")
        .join(sc, "cons")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("ante").alias("antecedent"),
            F.col("cons").alias("consequent"),
            F.col("sup_ab").alias("support_ab"),
            F.col("sup_a").alias("support_ante"),
            F.col("sup_c").alias("support_cons"),
            F.round(conf, 6).alias("confidence"),
            F.round(
                F.col("sup_ab").cast("double")
                * F.col("nb")
                / (F.col("sup_a").cast("double") * F.col("sup_c")),
                6,
            ).alias("lift"),
            F.round(
                F.col("sup_ab").cast("double") / nb
                - (F.col("sup_a").cast("double") / nb)
                * (F.col("sup_c").cast("double") / nb),
                6,
            ).alias("leverage"),
            F.when(F.col("sup_ab") == F.col("sup_a"), F.lit(None)).otherwise(
                F.round(
                    (1.0 - F.col("sup_c").cast("double") / nb)
                    / (1.0 - F.col("sup_ab").cast("double") / F.col("sup_a")),
                    6,
                )
            ).alias("conviction"),
        )
        .orderBy("antecedent", "consequent")
    )
