"""Mergeable streaming sketches: Misra-Gries heavy hitters.

Spark ships approx_count_distinct (HLL++) and approx_percentile
(KLL-ish) natively — both already registered (approx_distinct_parts,
approx_quantiles_profile). The missing family is frequent items with
bounded memory: exact groupBy-count state grows with key cardinality,
which a 100 TB stream of e.g. URL or token keys cannot afford.

Misra-Gries fits Spark's execution model exactly: each partition keeps
at most ``capacity`` counters in one pandas pass (``mapInPandas`` —
Arrow-batched, no shuffle), each surviving counter undercounts a key's
partition-local frequency by at most n_part/capacity, and summaries
merge by plain addition — so a single ordinary aggregation over
<= capacity x n_partitions rows finishes the job. Total error is
bounded by n_total/capacity regardless of how many distinct keys the
full data has; every true heavy hitter with frequency above that bound
is guaranteed to survive (tested against the exact counts).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.registry import register


def misra_gries(df: DataFrame, key_col: str, capacity: int = 64) -> DataFrame:
    """Per-partition Misra-Gries summaries merged into global candidate
    counts: (key, est_count) with est_count <= true count and
    true - est <= n_total / capacity. One narrow pass + one tiny agg."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Weighted Misra-Gries: each Arrow batch is pre-counted with
        # value_counts (bounded by batch size, not vocabulary) and the
        # sketch consumes (key, weight) items. A weighted decrement step
        # removes d=min(w, min_counter) from every counter AND from the
        # incoming weight, which preserves the classic bound: total
        # decremented weight <= total_weight / capacity, so any key with
        # true weight above that bound survives. ~10x fewer Python-loop
        # iterations than per-token updates.
        counters: dict = {}
        for pdf in batches:
            for k, w in pdf[key_col].value_counts().items():
                w = int(w)
                if k in counters:
                    counters[k] += w
                    continue
                while w > 0 and len(counters) >= capacity:
                    d = min(min(counters.values()), w)
                    dead = []
                    for kk in counters:
                        counters[kk] -= d
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
                    w -= d
                if w > 0:
                    counters[k] = w
        if counters:
            yield pd.DataFrame(
                {"key": list(counters), "partial": list(counters.values())}
            )

    key_type = dict(df.dtypes)[key_col]
    summaries = df.select(F.col(key_col)).mapInPandas(
        summarize, schema=f"key {key_type}, partial long"
    )
    return summaries.groupBy("key").agg(F.sum("partial").alias("est_count"))


@register(
    "heavy_hitters_sketch",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         tot AS (SELECT count(*) AS n FROM tok)
    SELECT w AS key, count(*) AS exact_count
    FROM tok, tot
    GROUP BY w, tot.n
    HAVING count(*) > n / 256.0
    ORDER BY exact_count DESC, key
    LIMIT 20
    """,
)
def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass heavy hitters: Misra-Gries sketch (capacity 256) finds
    candidates, then ONLY candidate keys are recounted exactly and
    filtered by the n/capacity threshold.

    MG guarantees every key with true count > n/capacity survives the
    sketch, so the output is EXACTLY the set of true heavy hitters with
    exact counts — deterministic, hence DuckDB-checkable — while
    per-executor state stays bounded by the sketch capacity: the exact
    recount semi-joins tokens to the <=capacity×partitions candidates
    first, so no vocabulary-sized groupBy state ever exists. This is the
    'which tokens dominate this corpus' shape for data whose vocabulary
    would not fit an exact groupBy."""
    from data_warehouse_data_mining_spark.operators.text import token_table

    capacity = 256
    # the token table feeds the MG pass, the total count, and the
    # recount join — deliberately NOT pinned: it is token-proportional
    # and lineage-truncated blocks are unevictable (the r6 64× probe
    # OOMed containment_pairs on exactly this pattern); its upstream is
    # a pure map (explode), so recomputing is linear scan work
    tokens = token_table(load(spark, sf_dir).documents, "doc_id", "text")
    candidates = misra_gries(tokens, "w", capacity=capacity).select("key")
    total = tokens.agg(F.count(F.lit(1)).alias("n_tokens"))
    return (
        tokens.join(
            F.broadcast(candidates), tokens["w"] == candidates["key"], "left_semi"
        )
        .groupBy(F.col("w").alias("key"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("exact_count") > F.col("n_tokens") / capacity)
        .orderBy(F.col("exact_count").desc(), F.col("key"))
        .limit(20)
        .select("key", "exact_count")
    )


@register(
    "hll_mergeable_counts",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
           1 AS within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def hll_mergeable_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL,
    Spark 3.5+): per-day user sketches built ONCE, then unioned per
    event type — the pre-aggregation pattern that makes "distinct users
    last N days" a sketch merge instead of a re-scan of N days of raw
    events. At 100 TB the daily sketch table is megabytes; any window
    of days is answerable from it with hll_union_agg.

    Exact-oracle-checked as a PROPERTY: the estimate depends on the
    sketch algorithm, which the DuckDB oracle doesn't share, so the
    query emits the exact distinct count and day count (oracle-pinned)
    plus a flag that the lgK=12 estimate landed within 5% of exact
    (worst-case rse ≈ 1.6%; 3σ within the band)."""
    e = load(spark, sf_dir).events
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 12).alias("sketch"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            "n_days",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).cast("int").alias("within_5pct"),
        )
        .orderBy("event_type")
    )


@register(
    "bitmap_distinct_counts",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def bitmap_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting through bitmap aggregates
    (bitmap_bit_position → bitmap_construct_agg → bitmap_count): the
    EXACT mergeable sibling of hll_mergeable_counts — bitmaps from
    different partitions/days OR together losslessly, so rollups never
    re-scan raw data, while HLL trades exactness for fixed size.

    The oracle is plain COUNT(DISTINCT): the bitmap path must reproduce
    it exactly. Each 32k-id bucket's bitmap is built map-side and OR-
    merged in the reduce — same partial/final shape as any aggregate.
    """
    e = load(spark, sf_dir).events
    # bitmap covers one 32k-position bucket; group by (type, bucket)
    # then sum bucket counts — the layout real bitmap rollups use
    per_bucket = (
        e.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("n_users_b"),
            F.count(F.lit(1)).alias("n_events_b"),
        )
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(
            F.sum("n_users_b").alias("n_users"),
            F.sum("n_events_b").alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "count_min_sketch_counts",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    seeds AS (SELECT unnest([1, 2, 3]) AS s),
    cms AS (
      SELECT s, substr(md5(w || ':' || CAST(s AS VARCHAR)), 1, 2) AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM tok CROSS JOIN seeds
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT w, CAST(count(*) AS BIGINT) AS true_n
      FROM tok GROUP BY w ORDER BY true_n DESC, w LIMIT 10
    )
    SELECT e.w AS word, e.true_n, CAST(min(c.n) AS BIGINT) AS est_n,
           CAST(min(c.n) - e.true_n AS BIGINT) AS overcount
    FROM exact e
    CROSS JOIN seeds sd
    JOIN cms c ON c.s = sd.s
      AND c.bucket = substr(md5(e.w || ':' || CAST(sd.s AS VARCHAR)), 1, 2)
    GROUP BY e.w, e.true_n
    ORDER BY e.true_n DESC, e.w
    """,
)
def count_min_sketch_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005), depth 3 ×
    width 256, with its one-sided error made visible: estimated vs
    true counts for the top-10 tokens, plus the non-negative overcount
    min_s(cms[s][h_s(w)]) − true(w).

    The sketch state is FIXED at 3×256 counters however large the
    vocabulary — the mergeable-summary alternative when even
    Misra-Gries candidate lists are too big (heavy_hitters_sketch) —
    and builds in one map-side pass: each token fans out to its 3
    (seed, md5-prefix bucket) cells and one 768-group hash-agg with
    partial aggregation does the rest; summaries from different
    shards/days merge by plain cell-wise addition. Buckets are 2-hex
    md5 prefixes so both engines hash identically with NO integer
    hex-parsing, and every output value is an integer count. The
    exact top-10 recount exists only to exhibit the guarantee (the
    tiny-vocab testdata makes it cheap); production consumers query
    the 768-row sketch alone."""
    d = load(spark, sf_dir).documents
    # token-proportional — never pinned (unevictable once
    # lineage-truncated); the explode is map-only, recompute is cheap
    tok = d.select(F.explode(F.split("text", " ")).alias("w"))
    seeds = F.array([F.lit(s) for s in (1, 2, 3)])
    bucket = F.substring(
        F.md5(F.concat(F.col("w"), F.lit(":"), F.col("s").cast("string"))), 1, 2
    )
    cms = (
        tok.select("w", F.explode(seeds).alias("s"))
        .groupBy("s", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exact = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("true_n"))
        .orderBy(F.col("true_n").desc(), "w")
        .limit(10)
    )
    probes = exact.select(
        "w", "true_n", F.explode(seeds).alias("s")
    ).withColumn(
        "bucket",
        F.substring(
            F.md5(F.concat(F.col("w"), F.lit(":"), F.col("s").cast("string"))), 1, 2
        ),
    )
    return (
        probes.join(cms, ["s", "bucket"])
        .groupBy(F.col("w").alias("word"), "true_n")
        .agg(F.min("n").alias("est_n"))
        .select(
            "word",
            "true_n",
            "est_n",
            (F.col("est_n") - F.col("true_n")).alias("overcount"),
        )
        .orderBy(F.col("true_n").desc(), "word")
    )


KMV_K = 256
_KMV_M = 1 << 60  # 16^15: the hash-prefix domain the estimate rescales


@register(
    "kmv_distinct_sketch",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT l_returnflag AS flag, l_partkey AS pk FROM lineitem
    ),
    r AS (
      SELECT flag, md5(CAST(pk AS VARCHAR)) AS h,
             row_number() OVER (PARTITION BY flag ORDER BY md5(CAST(pk AS VARCHAR)))
               AS rn
      FROM d
    ),
    agg AS (
      SELECT flag,
             CAST(count(*) AS BIGINT) AS exact_distinct,
             CAST(sum(CASE WHEN rn <= {KMV_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS k_used,
             max(CASE WHEN rn <= {KMV_K} THEN h END) AS kth
      FROM r GROUP BY flag
    ),
    est AS (
      SELECT flag, k_used, exact_distinct,
             round((k_used - 1) * {float(_KMV_M)}
                   / CAST('0x' || substr(kth, 1, 15) AS BIGINT), 2)
               AS kmv_estimate
      FROM agg
    )
    SELECT flag, k_used, kmv_estimate, exact_distinct,
           round(abs(kmv_estimate - exact_distinct) / exact_distinct, 4)
             AS rel_err
    FROM est
    ORDER BY flag
    """,
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002)
    per group: keep the k=256 smallest md5 hashes of each key, estimate
    distinct = (k-1) / R_k where R_k is the kth-smallest normalized
    hash. Unlike HLL (hll_mergeable_counts, rows-only), KMV built on a
    cross-engine hash is EXACTLY oracle-checkable: md5 gives both
    engines the same hash order, so estimate, k, and error all match
    bit-for-bit — the sketch's accuracy contract (rel_err column)
    becomes a hard-verified output instead of a test-only assertion.

    Scale shape: one distinct shuffle on (group, key), then the k
    smallest hashes per group come from the SALTED two-phase top-k
    (operators/ranking.py::bounded_group_topk): with only 3 return-flag
    groups, a plain per-group window would sort the whole distinct part
    domain on 3 tasks — instead phase 1 ranks inside (group, salt)
    partitions in parallel and phase 2 re-ranks only n_salts·k
    survivors, so per-task state really is k hashes (the sketch's
    mergeability, realized in the plan). Exact distinct counts fall out
    of the same pass (per-salt partition counts summed — no second
    scan). The 15-hex-char prefix folds to an integer < 2^60, so the
    rescale stays in exact long arithmetic until the final division."""
    from data_warehouse_data_mining_spark.operators.ranking import (
        bounded_group_topk,
    )

    li = load(spark, sf_dir).lineitem
    d = li.select(
        F.col("l_returnflag").alias("flag"), F.col("l_partkey").alias("pk")
    ).distinct()
    h = d.select("flag", "pk", F.md5(F.col("pk").cast("string")).alias("h"))
    top = bounded_group_topk(h, ["flag"], "h", KMV_K, salt_src="pk")
    agg = top.groupBy("flag").agg(
        F.first("group_total").alias("exact_distinct"),
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("h").alias("kth"),
    )
    est = agg.select(
        "flag",
        "k_used",
        F.round(
            (F.col("k_used") - 1)
            * F.lit(float(_KMV_M))
            / F.conv(F.substring("kth", 1, 15), 16, 10).cast("long"),
            2,
        ).alias("kmv_estimate"),
        "exact_distinct",
    )
    return est.select(
        "flag",
        "k_used",
        "kmv_estimate",
        "exact_distinct",
        F.round(
            F.abs(F.col("kmv_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    ).orderBy("flag")


@register(
    "kmv_set_operations",
    oracle=f"""
    WITH a AS (
      SELECT DISTINCT o_custkey AS pk FROM orders
      WHERE year(o_orderdate) = 1995
    ),
    b AS (
      SELECT DISTINCT o_custkey AS pk FROM orders
      WHERE year(o_orderdate) = 1996
    ),
    ha AS (SELECT md5(CAST(pk AS VARCHAR)) AS h FROM a
           ORDER BY 1 LIMIT {KMV_K}),
    hb AS (SELECT md5(CAST(pk AS VARCHAR)) AS h FROM b
           ORDER BY 1 LIMIT {KMV_K}),
    m AS (SELECT DISTINCT h
          FROM (SELECT h FROM ha UNION ALL SELECT h FROM hb)
          ORDER BY h LIMIT {KMV_K}),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS k_union, max(h) AS kth
              FROM m),
    rho AS (SELECT CAST(count(*) AS BIGINT) AS n_both FROM m
            WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)),
    ex AS (SELECT CAST(count(DISTINCT pk) AS BIGINT) AS exact_union
           FROM (SELECT pk FROM a UNION ALL SELECT pk FROM b)),
    ei AS (SELECT CAST(count(*) AS BIGINT) AS exact_intersect
           FROM a WHERE pk IN (SELECT pk FROM b))
    SELECT k_union, n_both,
           round((k_union - 1) * {float(_KMV_M)}
                 / CAST('0x' || substr(kth, 1, 15) AS BIGINT), 2)
             AS union_est,
           round(n_both * 1.0 / k_union, 6) AS jaccard_est,
           round((n_both * 1.0 / k_union)
                 * ((k_union - 1) * {float(_KMV_M)}
                    / CAST('0x' || substr(kth, 1, 15) AS BIGINT)), 2)
             AS intersect_est,
           exact_union, exact_intersect
    FROM stats, rho, ex, ei
    """,
)
def kmv_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra ON SKETCHES — the reason mergeable sketches exist at
    100 TB: estimate |A∪B| and |A∩B| for two customer cohorts (1995 vs
    1996 orderers, ~64% Jaccard) from their k=256-minimum-values
    summaries alone,
    without ever co-shuffling the underlying sets. The merged sketch is
    just the k smallest of the two sketches' union (KMV's closure under
    union); the intersection comes from ρ = |both| / k over the merged
    sketch (Beyer et al. 2007), intersect ≈ ρ·|A∪B|. Exact counts ride
    along, so the accuracy contract is oracle-verified bit-for-bit —
    possible because md5 gives both engines the same hash order.

    Scale shape: each sketch is a distributed TakeOrdered (k per
    partition, k merged on the driver-sized tail); everything after
    operates on ≤3k rows. The exact side pays the real distinct
    shuffles — precisely the cost the sketches avoid."""
    o = load(spark, sf_dir).orders
    # cohort-sized sets, each feeding three consumers (sketch, exact
    # union, exact intersection) — checkpointed so the fact table is
    # scanned twice, not ten times
    a = (
        o.filter(F.year("o_orderdate") == 1995)
        .select(F.col("o_custkey").alias("pk"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    b = (
        o.filter(F.year("o_orderdate") == 1996)
        .select(F.col("o_custkey").alias("pk"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ha = a.select(F.md5(F.col("pk").cast("string")).alias("h")).orderBy("h").limit(KMV_K)
    hb = b.select(F.md5(F.col("pk").cast("string")).alias("h")).orderBy("h").limit(KMV_K)
    m = ha.unionAll(hb).distinct().orderBy("h").limit(KMV_K)
    stats = m.agg(
        F.count(F.lit(1)).cast("long").alias("k_union"), F.max("h").alias("kth")
    )
    n_both = (
        m.join(ha, "h", "left_semi")
        .join(hb, "h", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    exact_union = (
        a.unionAll(b).distinct().agg(F.count(F.lit(1)).cast("long").alias("exact_union"))
    )
    exact_intersect = a.join(b, "pk", "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("exact_intersect")
    )
    union_est = (
        (F.col("k_union") - 1)
        * F.lit(float(_KMV_M))
        / F.conv(F.substring("kth", 1, 15), 16, 10).cast("long")
    )
    return (
        stats.crossJoin(F.broadcast(n_both))
        .crossJoin(F.broadcast(exact_union))
        .crossJoin(F.broadcast(exact_intersect))
        .select(
            "k_union",
            "n_both",
            F.round(union_est, 2).alias("union_est"),
            F.round(F.col("n_both") / F.col("k_union"), 6).alias("jaccard_est"),
            F.round((F.col("n_both") / F.col("k_union")) * union_est, 2).alias(
                "intersect_est"
            ),
            "exact_union",
            "exact_intersect",
        )
    )


QD_WIDTH = 8192  # dyadic bucket width in cents (2^13): the rank->value error bound
_QD_QS = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
_QD_VALUES = ", ".join(f"('{l}', {n}, {d})" for l, n, d in _QD_QS)


@register(
    "dyadic_quantile_sketch",
    oracle=f"""
    WITH vals AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v FROM orders
    ),
    sk AS (
      SELECT v // {QD_WIDTH} AS b, CAST(count(*) AS BIGINT) AS n
      FROM vals GROUP BY 1
    ),
    cum AS (
      SELECT b, n,
             CAST(sum(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum,
             CAST(sum(n) OVER () AS BIGINT) AS n_total
      FROM sk
    ),
    qs(q_label, qn, qd) AS (VALUES {_QD_VALUES}),
    est AS (
      SELECT q_label, n_total,
             (qn * n_total + qd - 1) // qd AS target_rank,
             min(b) AS b,
             min_by(cum - n, b) AS c_below
      FROM cum CROSS JOIN qs
      WHERE cum >= (qn * n_total + qd - 1) // qd
      GROUP BY 1, 2, 3
    ),
    inbucket AS (
      SELECT e.q_label, e.n_total, e.target_rank, e.b, e.c_below,
             v.v, CAST(count(*) AS BIGINT) AS cnt
      FROM vals v JOIN est e ON v.v // {QD_WIDTH} = e.b
      GROUP BY 1, 2, 3, 4, 5, 6
    ),
    ranked AS (
      SELECT q_label, n_total, target_rank, b,
             c_below + CAST(sum(cnt) OVER (PARTITION BY q_label ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2,
             v
      FROM inbucket
    )
    SELECT q_label, n_total, target_rank, est_lo_cents, est_hi_cents,
           exact_cents,
           CAST(exact_cents BETWEEN est_lo_cents AND est_hi_cents AS INT)
             AS within_bound
    FROM (
      SELECT q_label, n_total, target_rank,
             CAST(b * {QD_WIDTH} AS BIGINT) AS est_lo_cents,
             CAST(b * {QD_WIDTH} + {QD_WIDTH} - 1 AS BIGINT) AS est_hi_cents,
             CAST(min(v) AS BIGINT) AS exact_cents
      FROM ranked
      WHERE cum2 >= target_rank
      GROUP BY 1, 2, 3, 4, 5
    )
    ORDER BY q_label
    """,
)
def dyadic_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-universe quantile sketch (a one-level Q-digest,
    Shrivastava et al. 2004): bucket every order price into a dyadic
    cell of width 2^13 cents, so the summary is <= 8192 counters
    however many rows feed it and summaries from different shards/days
    merge by plain cell-wise addition — the property approx_percentile
    (KLL) shares but with a DETERMINISTIC, engine-portable state whose
    rank->value error is a hard bound (bucket width, $81.92), not a
    probabilistic one.

    The query answers p50/p90/p99 from the sketch (smallest bucket
    whose cumulative count reaches the type-1 target rank
    ceil(q*N) — all integer arithmetic) and then EXHIBITS the
    guarantee: a second pass touches ONLY the rows of each answer
    bucket (the dyadic drill-down — at scale this is a partition-
    prunable range predicate, not a global sort), pre-aggregates them
    per distinct value (<= 8192 groups per q), and reads the exact
    rank value from that bounded table; within_bound pins
    est_lo <= exact <= est_hi.

    Scale shape: one fact scan -> <=8192-row hash agg; windows run
    only over the bounded sketch / in-bucket-value tables; the exact
    side never globally sorts. Contrast median_exact (exact
    interpolated percentiles via sketch-bracketed selection) — this is
    the mergeable-state building block a streaming rollup would keep."""
    o = load(spark, sf_dir).orders
    vals = o.select(
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias("v")
    )
    sk = (
        vals.select(F.expr(f"v div {QD_WIDTH}").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wcum = W.orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    cum = sk.select(
        "b",
        "n",
        F.sum("n").over(wcum).cast("long").alias("cum"),
        F.sum("n").over(W.orderBy("b").rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )).cast("long").alias("n_total"),
    )
    qs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(l).alias("q_label"),
                    F.lit(n).alias("qn"),
                    F.lit(d).alias("qd"),
                )
                for l, n, d in _QD_QS
            ]
        )
    ).alias("q")
    rank_expr = F.expr("(q.qn * n_total + q.qd - 1) div q.qd")
    est = (
        cum.select("b", "n", "cum", "n_total", qs)
        .withColumn("target_rank", rank_expr)
        .filter(F.col("cum") >= F.col("target_rank"))
        .groupBy("q.q_label", "n_total", "target_rank")
        .agg(
            F.min("b").alias("b"),
            F.expr("min_by(cum - n, b)").alias("c_below"),
        )
    )
    inbucket = (
        vals.join(
            F.broadcast(est),
            F.expr(f"v div {QD_WIDTH}") == F.col("b"),
        )
        .groupBy("q_label", "n_total", "target_rank", "b", "c_below", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    win = W.partitionBy("q_label").orderBy("v").rowsBetween(
        W.unboundedPreceding, 0
    )
    ranked = inbucket.select(
        "q_label",
        "n_total",
        "target_rank",
        "b",
        (F.col("c_below") + F.sum("cnt").over(win)).cast("long").alias("cum2"),
        "v",
    )
    lo = (F.col("b") * QD_WIDTH).cast("long")
    hi = (F.col("b") * QD_WIDTH + QD_WIDTH - 1).cast("long")
    return (
        ranked.filter(F.col("cum2") >= F.col("target_rank"))
        .groupBy(
            "q_label",
            "n_total",
            "target_rank",
            lo.alias("est_lo_cents"),
            hi.alias("est_hi_cents"),
        )
        .agg(F.min("v").cast("long").alias("exact_cents"))
        .select(
            "q_label",
            "n_total",
            "target_rank",
            "est_lo_cents",
            "est_hi_cents",
            "exact_cents",
            F.col("exact_cents")
            .between(F.col("est_lo_cents"), F.col("est_hi_cents"))
            .cast("int")
            .alias("within_bound"),
        )
        .orderBy("q_label")
    )


AMS_SEEDS = (1, 2, 3, 4, 5, 6, 7, 8)
# +1 when the first md5 hex nibble is even — identical strings, and
# therefore identical signs, in both engines (the count_min recipe)
_AMS_PLUS = "('0','2','4','6','8','a','c','e')"


@register(
    "ams_f2_sketch",
    oracle=f"""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    counts AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w
    ),
    seeds AS (SELECT unnest([{", ".join(str(s) for s in AMS_SEEDS)}]) AS s),
    sums AS (
      SELECT s,
             CAST(sum(CASE WHEN substr(md5(w || ':' || CAST(s AS VARCHAR)), 1, 1)
                           IN {_AMS_PLUS} THEN c ELSE -c END) AS BIGINT) AS sgn_sum
      FROM counts CROSS JOIN seeds
      GROUP BY s
    ),
    est AS (
      SELECT sum(CAST(sgn_sum AS DOUBLE) * sgn_sum) / {len(AMS_SEEDS)} AS f2_est
      FROM sums
    ),
    exact AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(c * c) AS BIGINT) AS f2_exact
      FROM counts
    )
    SELECT n_tokens, vocab, f2_exact,
           round(f2_est, 2) AS f2_est,
           round(abs(f2_est - f2_exact) / f2_exact, 6) AS rel_err
    FROM exact CROSS JOIN est
    """,
)
def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy 1996)
    over the document token stream: F2 = sum_w count(w)^2 — the
    self-join size / collision mass that drives skew diagnostics and
    repetitiveness scoring — estimated from 8 counters however large
    the vocabulary. Each estimator keeps one signed sum
    S_s = sum_w sign_s(w)*count(w) with 4-universal-style signs
    (md5 nibble parity — identical in both engines, the count_min
    recipe); E[S^2] = F2, and the query reports the 8-estimator mean
    against the exact F2 with its relative error.

    Everything is exact integer arithmetic until the final squares:
    the signed sums are BIGINTs, their squares are computed in DOUBLE
    (exactly representable here — |S| < 2^26 at this SF; at the 100 TB
    design point the double square is the honest estimator output, the
    exact BIGINT F2 being the thing you can no longer afford), and the
    8-term mean is order-insensitive because every partial is an
    exact-in-double integer.

    Scale shape: token explode -> vocab-bounded (w) hash agg -> x8
    seed fan-out -> 8-row agg; the sketch state is 8 numbers and
    merges across shards by per-seed addition of signed sums."""
    d = load(spark, sf_dir).documents
    # token-proportional — never pinned; map-only explode, cheap recompute
    tok = d.select(F.explode(F.split("text", " ")).alias("w"))
    # counts is VOCAB-sized — never pinned (the sketch exists precisely
    # because vocabulary state is unbounded at scale); both consumers
    # re-derive it from the map-only explode, which is cheap linear work
    counts = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    seeds = F.explode(F.array(*[F.lit(s) for s in AMS_SEEDS])).alias("s")
    sign = F.when(
        F.substring(
            F.md5(F.concat(F.col("w"), F.lit(":"), F.col("s").cast("string"))),
            1,
            1,
        ).isin(*"02468ace"),
        F.col("c"),
    ).otherwise(-F.col("c"))
    sums = (
        counts.select("w", "c", seeds)
        .groupBy("s")
        .agg(F.sum(sign).cast("long").alias("sgn_sum"))
    )
    est = sums.agg(
        (
            F.sum(F.col("sgn_sum").cast("double") * F.col("sgn_sum"))
            / len(AMS_SEEDS)
        ).alias("f2_est")
    )
    exact = counts.agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"),
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_tokens",
        "vocab",
        "f2_exact",
        F.round("f2_est", 2).alias("f2_est"),
        F.round(
            F.abs(F.col("f2_est") - F.col("f2_exact")) / F.col("f2_exact"), 6
        ).alias("rel_err"),
    )


@register(
    "hll_rolling_distinct",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM daily)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT daily.user_id) AS BIGINT) AS exact_users_7d,
           CAST(count(DISTINCT daily.d) AS BIGINT) AS n_days_merged,
           1 AS within_5pct
    FROM days
    JOIN daily ON daily.d <= days.d
              AND daily.d >  days.d - INTERVAL 7 DAY
    GROUP BY days.d
    ORDER BY day
    """,
)
def hll_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day answered from MERGED
    per-day HLL sketches — the window form of hll_mergeable_counts'
    promise: build the daily sketch table ONCE (at 100 TB it is
    megabytes), then ANY trailing window is an hll_union_agg over <=7
    sketch rows instead of a re-scan of 7 days of raw events —
    contrast rolling_distinct_users, which recounts exactly from the
    (day, user) pairs and pays the 7x pair fan-out at every day.

    Oracle-checked as a PROPERTY (the hll_mergeable_counts recipe):
    the exact rolling count and window width are hash-pinned and the
    lgK=12 estimate must land within 5% (worst-case rse ~1.6%, 3
    sigma inside the band). Scale: one events scan -> ~30-row daily
    sketch table; the spine join fans out <=7 sketch rows per day."""
    e = load(spark, sf_dir).events
    # ~30-row daily sketch table staged: the spine and merge join
    # would each re-scan events otherwise
    daily_sk = e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", 12).alias("sketch")
    ).localCheckpoint(eager=True)
    days = daily_sk.select(F.col("d").alias("spine_d"))
    merged = (
        days.join(
            daily_sk,
            (F.col("d") <= F.col("spine_d"))
            & (F.col("d") > F.date_sub(F.col("spine_d"), 7)),
        )
        .groupBy("spine_d")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx"),
            F.count(F.lit(1)).cast("long").alias("n_days_merged"),
        )
    )
    daily_pairs = e.select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct()
    exact = (
        daily_pairs.select(F.col("d").alias("spine_d")).distinct()
        .join(
            daily_pairs,
            (F.col("d") <= F.col("spine_d"))
            & (F.col("d") > F.date_sub(F.col("spine_d"), 7)),
        )
        .groupBy("spine_d")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_users_7d"))
    )
    return (
        merged.join(exact, "spine_d")
        .select(
            F.date_format("spine_d", "yyyy-MM-dd").alias("day"),
            "exact_users_7d",
            "n_days_merged",
            (
                F.abs(F.col("approx") - F.col("exact_users_7d"))
                / F.col("exact_users_7d")
                <= 0.05
            ).cast("int").alias("within_5pct"),
        )
        .orderBy("day")
    )
