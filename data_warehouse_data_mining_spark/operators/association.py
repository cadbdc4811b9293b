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

from pyspark.sql import DataFrame, SparkSession, Window as W
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


@register(
    "ml_fpgrowth_rules",
    oracle=f"""
    WITH RECURSIVE b AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
    ),
    grow(ok, iset, last_item) AS (
      SELECT ok, [item], item FROM b
      UNION ALL
      SELECT g.ok, list_append(g.iset, x.item), x.item
      FROM grow g JOIN b x ON x.ok = g.ok AND x.item > g.last_item
    ),
    freq AS (
      SELECT iset, count(*) AS support
      FROM grow GROUP BY iset HAVING count(*) >= {MIN_PAIR_SUPPORT}
    ),
    rules AS (
      SELECT f.support::DOUBLE /
             (SELECT fa.support FROM freq fa
              WHERE fa.iset = list_filter(f.iset, x -> x <> u.item))
               AS confidence
      FROM freq f, unnest(f.iset) AS u(item)
      WHERE len(f.iset) >= 2
    ),
    nr AS (SELECT count(*) AS n_rules FROM rules WHERE confidence >= 0.2)
    SELECT CAST(len(iset) AS INT) AS set_size,
           CAST(count(*) AS BIGINT) AS n_itemsets,
           CAST(max(support) AS BIGINT) AS max_support,
           (SELECT CAST(n_rules AS BIGINT) FROM nr) AS n_rules_total
    FROM freq GROUP BY 1 ORDER BY 1
    """,
)
def ml_fpgrowth_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib FPGrowth over order baskets: frequent-itemset counts by
    size plus the association-rule count — the full pattern-growth
    miner behind the SQL-checkable first levels. EXACT-oracle-checked
    (converted from rows-only in r5): FP-tree *projection* is not SQL,
    but its OUTPUT is — every frequent itemset is a subset of some
    basket, so a recursive CTE that grows item-sorted subsets within
    each basket enumerates the identical candidate space (bounded by
    2^basket_size ≈ 2^7 per order, linear in orders), and MLlib's
    single-consequent rules are each freq itemset joined to its
    size-(k−1) antecedent subsets with the same long/long double
    confidence division.

    minSupport is passed as (minCount − 0.5)/n_tx so MLlib's
    ``ceil(minSupport · n_tx)`` lands robustly on {MIN_PAIR_SUPPORT}
    at every SF (a bare 3/n_tx can float-round to 3.0000…004 whose
    ceil is 4)."""
    from pyspark.ml.fpm import FPGrowth

    tx = baskets(spark, sf_dir).groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("items")
    )
    n_tx = tx.count()
    model = FPGrowth(
        itemsCol="items",
        minSupport=(MIN_PAIR_SUPPORT - 0.5) / n_tx,
        minConfidence=0.2,
    ).fit(tx)
    sets_by_size = (
        model.freqItemsets.groupBy(F.size("items").alias("set_size"))
        .agg(F.count(F.lit(1)).alias("n_itemsets"), F.max("freq").alias("max_support"))
    )
    n_rules = model.associationRules.count()
    return sets_by_size.withColumn("n_rules_total", F.lit(n_rules)).orderBy("set_size")


@register(
    "ml_prefixspan_patterns",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    n AS (SELECT CAST(ceil(0.5 * count(DISTINCT user_id)) AS BIGINT)
            AS min_count FROM events),
    f AS (  -- earliest occurrence of each type per user
      SELECT user_id, event_type AS a, min(rn) AS f_rn
      FROM r GROUP BY 1, 2
    ),
    g AS (  -- earliest b strictly after the earliest a
      SELECT f.user_id, f.a, r.event_type AS b, min(r.rn) AS g_rn
      FROM f JOIN r ON r.user_id = f.user_id AND r.rn > f.f_rn
      GROUP BY 1, 2, 3
    ),
    p3 AS (  -- (a,b,c) present iff any c strictly after that earliest b
      SELECT DISTINCT g.user_id, g.a, g.b, r.event_type AS c
      FROM g JOIN r ON r.user_id = g.user_id AND r.rn > g.g_rn
    ),
    pat AS (
      SELECT a AS pattern, count(*) AS support FROM f GROUP BY 1
      UNION ALL
      SELECT a || '>' || b, count(*) FROM g GROUP BY a, b
      UNION ALL
      SELECT a || '>' || b || '>' || c, count(*) FROM p3 GROUP BY a, b, c
    )
    SELECT pattern, CAST(support AS BIGINT) AS support
    FROM pat, n WHERE support >= n.min_count
    ORDER BY support DESC, pattern
    """,
)
def ml_prefixspan_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib PrefixSpan over per-user event-type sequences: frequent
    sequential patterns up to length 3 (the sequence-mining sibling of
    event_sequence_bigrams' fixed-depth transitions). EXACT-oracle-
    checked (converted from rows-only in r5): projection-database
    mining isn't SQL, but subsequence SUPPORT is — a pattern (a,b,c) is
    contained in a sequence iff matching greedily succeeds (earliest a,
    then earliest b after it, then any c), so per-user presence reduces
    to three first-occurrence joins and support to a count, with
    minCount = ceil(0.5·n_seq) exact in binary on both engines.

    r5 also fixed a latent ordering hazard here: the old builder relied
    on orderBy-before-groupBy to order collect_list — unguaranteed
    after a shuffle; sequences are now array_sort(collect_list(struct))
    which is order-correct by construction."""
    from pyspark.ml.fpm import PrefixSpan

    e = load(spark, sf_dir).events
    seqs = (
        e.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.transform(
                F.col("evs"), lambda s: F.array(s["event_type"])
            ).alias("sequence")
        )
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


@register(
    "recsys_coverage_novelty",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    item_n AS (
      SELECT item, CAST(count(*) AS BIGINT) AS n FROM baskets GROUP BY item
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM item_n),
    pair_n AS (
      SELECT a.item AS item_a, b.item AS item_b, CAST(count(*) AS BIGINT) AS n_ab
      FROM baskets a JOIN baskets b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ),
    sym AS (
      SELECT item_a AS src, item_b AS rec, n_ab FROM pair_n
      UNION ALL
      SELECT item_b, item_a, n_ab FROM pair_n
    ),
    scored AS (
      SELECT s.src, s.rec,
             s.n_ab / sqrt(na.n * nb.n) AS score
      FROM sym s
      JOIN item_n na ON na.item = s.src
      JOIN item_n nb ON nb.item = s.rec
    ),
    top3 AS (
      SELECT src, rec FROM (
        SELECT src, rec,
               row_number() OVER (PARTITION BY src
                                  ORDER BY score DESC, rec) AS rn
        FROM scored
      ) t WHERE rn <= 3
    ),
    pop AS (
      SELECT item, row_number() OVER (ORDER BY n DESC, item) AS pop_rank
      FROM item_n
    )
    SELECT t.n_items,
           CAST(count(DISTINCT r.rec) AS BIGINT) AS n_items_recommended,
           round(count(DISTINCT r.rec) * 1.0 / t.n_items, 6) AS coverage,
           CAST(count(*) AS BIGINT) AS n_recommendations,
           round(sum(p.pop_rank) * 1.0 / count(*), 6) AS mean_pop_rank,
           round(sum(CASE WHEN p.pop_rank * 2 > t.n_items THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS tail_share
    FROM top3 r
    JOIN pop p ON p.item = r.rec
    CROSS JOIN tot t
    GROUP BY t.n_items
    """,
)
def recsys_coverage_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-accuracy recommender evaluation — catalog COVERAGE (what
    share of items ever appear in a top-3 list), NOVELTY (mean
    popularity rank of recommendations — a recommender stuck at rank
    ~1 only resells bestsellers), and long-tail share (recs from the
    unpopular half) for the deterministic co-occurrence recommender.
    These are the metrics that expose popularity bias, which accuracy
    metrics reward rather than catch.

    The popularity ranking of every item uses the distributed two-phase
    prefix sum; top-3 lists come from per-item partitioned windows over
    the symmetric ≥2-support pair set; all three metrics are single
    divisions of exact counts (pop ranks are exact integers)."""
    from pyspark.sql import Window as W

    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
    )

    b = baskets(spark, sf_dir).select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    item_n = (
        b.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = item_n.agg(F.count(F.lit(1)).alias("n_items"))
    a = b.select(F.col("basket").alias("bk"), F.col("item").alias("ia"))
    c = b.select(F.col("basket").alias("bk2"), F.col("item").alias("ib"))
    pair_n = (
        a.join(c, (F.col("bk") == F.col("bk2")) & (F.col("ia") < F.col("ib")))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    sym = pair_n.select(
        F.col("ia").alias("src"), F.col("ib").alias("rec"), "n_ab"
    ).unionAll(
        pair_n.select(
            F.col("ib").alias("src"), F.col("ia").alias("rec"), "n_ab"
        )
    )
    scored = (
        sym.join(item_n.select(F.col("item").alias("src"), F.col("n").alias("n_s")), "src")
        .join(item_n.select(F.col("item").alias("rec"), F.col("n").alias("n_r")), "rec")
        .select(
            "src",
            "rec",
            (F.col("n_ab") / F.sqrt(F.col("n_s") * F.col("n_r"))).alias(
                "score"
            ),
        )
    )
    w = W.partitionBy("src").orderBy(F.col("score").desc(), F.col("rec"))
    top3 = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("src", "rec")
    )
    pop = global_order_stats(item_n, "n", "item", ascending=False).select(
        F.col("item").alias("rec"), F.col("global_rank").alias("pop_rank")
    )
    joined = top3.join(pop, "rec")
    return (
        joined.crossJoin(F.broadcast(tot))
        .groupBy("n_items")
        .agg(
            F.countDistinct("rec").alias("n_items_recommended"),
            F.round(F.countDistinct("rec") * 1.0 / F.first("n_items"), 6).alias(
                "coverage"
            ),
            F.count(F.lit(1)).alias("n_recommendations"),
            F.round(F.sum("pop_rank") * 1.0 / F.count(F.lit(1)), 6).alias(
                "mean_pop_rank"
            ),
            F.round(
                F.sum(
                    F.when(F.col("pop_rank") * 2 > F.col("n_items"), 1).otherwise(0)
                )
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("tail_share"),
        )
        .select(
            "n_items",
            "n_items_recommended",
            "coverage",
            "n_recommendations",
            "mean_pop_rank",
            "tail_share",
        )
    )


NEG_CANDIDATES = 12  # hash-derived candidates per user
NEG_K = 5            # negatives kept per user


@register(
    "negative_sampling_training_pairs",
    oracle=f"""
    WITH users AS (SELECT DISTINCT o_custkey AS user_id FROM orders),
    ni AS (SELECT count(*) AS n FROM part),
    cand AS (
      SELECT user_id, j,
             list_reduce(list_transform(range(1, 9),
               i -> CAST(strpos('0123456789abcdef',
                     substr(md5(CAST(user_id AS VARCHAR) || '#'
                                || CAST(j AS VARCHAR)),
                            CAST(i AS INT), 1)) - 1 AS BIGINT)),
               (a, b) -> a * 16 + b) % n AS item_id
      FROM users, (SELECT unnest(range(1, {NEG_CANDIDATES + 1})) AS j),
           ni
    ),
    pos AS (
      SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    neg AS (
      SELECT c.user_id, c.item_id, min(c.j) AS first_j
      FROM cand c
      LEFT JOIN pos p ON p.user_id = c.user_id AND p.item_id = c.item_id
      WHERE p.user_id IS NULL
      GROUP BY c.user_id, c.item_id
    ),
    ranked AS (
      SELECT user_id, item_id,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY first_j, item_id) AS BIGINT)
               AS neg_rank
      FROM neg
    )
    SELECT user_id, CAST(item_id AS BIGINT) AS item_id, neg_rank
    FROM ranked WHERE neg_rank <= {NEG_K}
    ORDER BY user_id, neg_rank
    """,
)
def negative_sampling_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for recommender / contrastive
    training: {NEG_K} non-purchased items per customer, drawn by hashing
    (user, j) into the item-id space and anti-joining the positives —
    the industry-standard implicit-feedback negative generator, made
    re-run-stable (hash, not RNG) so the training set is reproducible
    and incrementally extensible.

    Scale shape: candidates are generated ARITHMETICALLY per user
    (explode of {NEG_CANDIDATES} hash slots — linear in users, never a
    user × catalog cross join, and never an all-pairs hash evaluation);
    the anti-join against positives is the only fact-sized shuffle; the
    per-user top-k ranks ≤{NEG_CANDIDATES} rows per key. Assumes a
    dense item-id space (ids 0..n-1, true of the part table); a sparse
    catalog adds one ordinal→id rank join."""
    t = load(spark, sf_dir)
    users = t.orders.select(F.col("o_custkey").alias("user_id")).distinct()
    ni = t.part.agg(F.count(F.lit(1)).alias("n"))
    cand = (
        users.crossJoin(F.broadcast(ni))
        .select(
            "user_id",
            "n",
            F.explode(
                F.array(*[F.lit(j) for j in range(1, NEG_CANDIDATES + 1)])
            ).alias("j"),
        )
        .select(
            "user_id",
            "j",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "#",
                                F.col("user_id").cast("string"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("n")
            ).alias("item_id"),
        )
    )
    pos = (
        t.orders.join(
            t.lineitem, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
        )
        .distinct()
    )
    neg = (
        cand.join(pos, ["user_id", "item_id"], "left_anti")
        .groupBy("user_id", "item_id")
        .agg(F.min("j").alias("first_j"))
    )
    w = W.partitionBy("user_id").orderBy("first_j", "item_id")
    return (
        neg.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= NEG_K)
        .select("user_id", F.col("item_id").cast("long").alias("item_id"), "neg_rank")
        .orderBy("user_id", "neg_rank")
    )
