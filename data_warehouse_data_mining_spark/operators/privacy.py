"""Privacy / PII operators for training-data pipelines: pattern-based
redaction and key pseudonymization.

The reference has no privacy surface (it scores a medical CSV with the
raw identifiers left in, stroke_predict.py:22-27); these are the
standard pre-training corpus hygiene steps layered on top of the same
data model. Everything is built-in expression work — ``regexp_replace``
/ ``regexp_count`` / ``sha2`` run inside whole-stage codegen, so
redaction is a pure map stage: zero shuffles for the rewrite itself and
one partial/final hash aggregation for the scan profile. At 100 TB the
rewrite is scan-bound and embarrassingly parallel.

Regex dialect note: patterns here are restricted to the syntax subset
(character classes, bounded repetition, alternation — no backrefs, no
lookaround) that Java regex (Spark) and RE2 (DuckDB) evaluate
identically, so the oracles mirror byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.registry import register

# Classic PII patterns, portable across Java regex and RE2.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
    "digit_run": r"[0-9]+",
}


def redact(col: Column, patterns: dict[str, str] | None = None,
           token: str = "[PII:{name}]") -> Column:
    """Chain ``regexp_replace`` once per pattern (all-occurrence
    replacement in both engines). Order is dict order: more specific
    patterns should precede ``digit_run``."""
    out = col
    for name, pat in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(out, pat, token.format(name=name))
    return out


@register(
    "pii_redaction_scan",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(*) FILTER (WHERE regexp_matches(props, '[0-9]+')) AS n_with_digits,
           CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS total_digit_runs,
           min(regexp_replace(props, '[0-9]+', '[PII:digit_run]', 'g')) AS sample_redacted
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def pii_redaction_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan profile over the events payload column: how many rows
    carry digit runs per event type, total matches, and a deterministic
    redacted sample. The redaction itself is a map-only rewrite
    (regexp_replace in codegen); the profile is one hash aggregation
    with map-side partials — the whole thing is a single scan at any SF.
    """
    e = load(spark, sf_dir).events
    pat = PII_PATTERNS["digit_run"]
    return (
        e.select(
            "event_type",
            F.regexp_count("props", F.lit(pat)).alias("n_runs"),
            redact(F.col("props"), {"digit_run": pat}).alias("redacted"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("n_runs") > 0, 1)).alias("n_with_digits"),
            F.sum("n_runs").alias("total_digit_runs"),
            F.min("redacted").alias("sample_redacted"),
        )
        .orderBy("event_type")
    )


@register(
    "pseudonymize_customers",
    oracle="""
    SELECT sha256(CAST(c_custkey AS VARCHAR)) AS key_hash,
           regexp_replace(c_name, '[0-9]+', '[ID]', 'g') AS name_masked,
           CAST(floor(c_acctbal / 500) * 500 AS BIGINT) AS acctbal_bucket,
           c_mktsegment
    FROM customer
    ORDER BY key_hash
    """,
)
def pseudonymize_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key pseudonymization + quasi-identifier generalization: the join
    key is replaced by its SHA-256 (stable across tables, so referential
    integrity survives anonymization), digit runs in names are masked,
    and the continuous balance is generalized to 500-unit buckets
    (k-anonymity-style coarsening). Pure projection — no shuffle; the
    ORDER BY is presentation-only and the driver hash is
    order-insensitive anyway.
    """
    c = load(spark, sf_dir).customer
    return c.select(
        F.sha2(F.col("c_custkey").cast("string"), 256).alias("key_hash"),
        F.regexp_replace("c_name", "[0-9]+", "[ID]").alias("name_masked"),
        (F.floor(F.col("c_acctbal") / 500) * 500).cast("bigint").alias(
            "acctbal_bucket"
        ),
        "c_mktsegment",
    ).orderBy("key_hash")


@register(
    "gdpr_erasure_audit",
    oracle="""
    WITH targets AS (SELECT c_custkey FROM customer WHERE c_custkey % 1000 = 7)
    SELECT 'customer' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE c_custkey % 1000 = 7) AS BIGINT)
             AS n_target_rows,
           CAST(count(*) - count(*) FILTER (WHERE c_custkey % 1000 = 7)
                AS BIGINT) AS n_after_erasure
    FROM customer
    UNION ALL
    SELECT 'orders', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE o_custkey IN (SELECT c_custkey FROM targets))
                AS BIGINT),
           CAST(count(*) - count(*) FILTER
                  (WHERE o_custkey IN (SELECT c_custkey FROM targets))
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'events', CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE user_id IN (SELECT c_custkey FROM targets))
                AS BIGINT),
           CAST(count(*) - count(*) FILTER
                  (WHERE user_id IN (SELECT c_custkey FROM targets))
                AS BIGINT)
    FROM events
    ORDER BY table_name
    """,
)
def gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten audit: given a deletion-request cohort
    (here: a deterministic key predicate standing in for the request
    table), count each table's total rows, rows belonging to the
    cohort, and rows that survive the erasure — the before/after
    evidence a privacy office files with every deletion batch. The
    erasure itself is the same plan with the anti-join kept and the
    counts replaced by a write.

    Scale shape: each fact table is scanned once with a cohort
    membership join; the hint-free equi-join lets AQE broadcast the
    cohort when it fits (the usual case) and shuffle when a mass
    deletion batch doesn't — either way one pass per table."""
    t = load(spark, sf_dir)
    targets = (
        t.customer.filter(F.col("c_custkey") % 1000 == 7)
        .select(F.col("c_custkey").alias("target_key"))
        .withColumn("hit", F.lit(1))
    )
    checks = [
        ("customer", t.customer, "c_custkey"),
        ("orders", t.orders, "o_custkey"),
        ("events", t.events, "user_id"),
    ]
    out = None
    for name, table, key in checks:
        # ONE scan per table: the cohort left join marks cohort rows,
        # then total + membership come out of the same aggregate
        row = (
            table.select(F.col(key).alias("k"))
            .join(targets, F.col("k") == F.col("target_key"), "left")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum("hit"), F.lit(0)).alias("n_target_rows"),
            )
            .select(
                F.lit(name).alias("table_name"),
                "n_rows",
                "n_target_rows",
                (F.col("n_rows") - F.col("n_target_rows")).alias("n_after_erasure"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name")


@register(
    "k_anonymity_audit",
    oracle="""
    WITH quasi AS (
      SELECT c_nationkey AS nation,
             c_mktsegment AS segment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS balance_band,
             c_custkey
      FROM customer
    ),
    classes AS (
      SELECT nation, segment, balance_band,
             CAST(count(*) AS BIGINT) AS class_size
      FROM quasi GROUP BY nation, segment, balance_band
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(class_size) AS BIGINT) AS k_anonymity,
           CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_classes_below_5,
           CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
                AS BIGINT) AS n_customers_at_risk,
           round(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
                 * 1.0 / sum(class_size), 6) AS at_risk_share
    FROM classes
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the quasi-
    identifier set (nation, market segment, $1000 balance band): the
    dataset's k is the SMALLEST equivalence class — any class below the
    k=5 release threshold marks customers re-identifiable by joining
    those three attributes against external data, which is precisely
    what pseudonymize_customers' generalization step must defeat
    BEFORE a release. One hash-agg to class sizes (bounded by the
    quasi-identifier domain) + a 5-column rollup; the audit, not the
    redaction, is what makes a privacy pipeline measurable."""
    c = load(spark, sf_dir).customer
    classes = (
        c.select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias(
                "balance_band"
            ),
        )
        .groupBy("nation", "segment", "balance_band")
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    at_risk = F.sum(
        F.when(F.col("class_size") < 5, F.col("class_size")).otherwise(0)
    ).cast("long")
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("class_size").cast("long").alias("k_anonymity"),
        F.sum(F.when(F.col("class_size") < 5, 1).otherwise(0))
        .cast("long")
        .alias("n_classes_below_5"),
        at_risk.alias("n_customers_at_risk"),
        F.round(
            at_risk * 1.0 / F.sum("class_size").cast("long"), 6
        ).alias("at_risk_share"),
    )


@register(
    "l_diversity_audit",
    oracle="""
    WITH quasi AS (
      SELECT c_nationkey AS nation,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS balance_band,
             c_mktsegment AS sensitive,
             c_custkey
      FROM customer
    ),
    classes AS (
      SELECT nation, balance_band,
             CAST(count(DISTINCT sensitive) AS BIGINT) AS l_distinct,
             CAST(count(*) AS BIGINT) AS class_size
      FROM quasi GROUP BY nation, balance_band
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(l_distinct) AS BIGINT) AS l_diversity,
           CAST(sum(CASE WHEN l_distinct < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_classes_below_3,
           CAST(sum(CASE WHEN l_distinct < 3 THEN class_size ELSE 0 END)
                AS BIGINT) AS n_customers_exposed,
           round(sum(CASE WHEN l_distinct < 3 THEN class_size ELSE 0 END)
                 * 1.0 / sum(class_size), 6) AS exposed_share
    FROM classes
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's necessary complement: a class
    can be large (k-safe) yet have every member share ONE sensitive
    value, so membership alone discloses it (the homogeneity attack).
    Quasi-identifiers (nation, $1000 balance band) index the classes;
    the market segment plays the sensitive attribute; a class with
    fewer than l=3 distinct sensitive values is exposed. Same
    one-hash-agg shape as ``k_anonymity_audit`` (class table bounded by
    the quasi-identifier domain) with a count-distinct per class."""
    c = load(spark, sf_dir).customer
    classes = (
        c.select(
            F.col("c_nationkey").alias("nation"),
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("balance_band"),
            F.col("c_mktsegment").alias("sensitive"),
        )
        .groupBy("nation", "balance_band")
        .agg(
            F.countDistinct("sensitive").alias("l_distinct"),
            F.count(F.lit(1)).alias("class_size"),
        )
    )
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("l_distinct").cast("long").alias("l_diversity"),
        F.sum(F.when(F.col("l_distinct") < 3, 1).otherwise(0))
        .cast("long")
        .alias("n_classes_below_3"),
        F.sum(F.when(F.col("l_distinct") < 3, F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("n_customers_exposed"),
        F.round(
            F.sum(
                F.when(F.col("l_distinct") < 3, F.col("class_size")).otherwise(0)
            )
            / F.sum("class_size"),
            6,
        ).alias("exposed_share"),
    )


@register(
    "t_closeness_audit",
    oracle="""
    WITH quasi AS (
      SELECT c_nationkey AS nation,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS balance_band,
             c_mktsegment AS sensitive
      FROM customer
    ),
    counts AS (
      SELECT nation, balance_band, sensitive, CAST(count(*) AS BIGINT) AS cnt
      FROM quasi GROUP BY 1, 2, 3
    ),
    classes AS (
      SELECT nation, balance_band, CAST(sum(cnt) AS BIGINT) AS class_size
      FROM counts GROUP BY 1, 2
    ),
    globals AS (
      SELECT sensitive, CAST(sum(cnt) AS BIGINT) AS g FROM counts GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(g) AS BIGINT) AS n FROM globals),
    grid AS (
      SELECT c.nation, c.balance_band, c.class_size, s.sensitive, s.g,
             COALESCE(k.cnt, 0) AS cnt
      FROM classes c
      CROSS JOIN globals s
      LEFT JOIN counts k
        ON k.nation = c.nation AND k.balance_band = c.balance_band
       AND k.sensitive = s.sensitive
    ),
    per_class AS (
      SELECT nation, balance_band, class_size,
             CAST(sum(abs(cnt * n - g * class_size)) AS BIGINT) AS numer
      FROM grid CROSS JOIN tot
      GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           round(max(numer * 1.0 / (2 * class_size * n)), 6) AS max_t,
           CAST(sum(CASE WHEN 5 * numer > 2 * class_size * n THEN 1 ELSE 0 END)
                AS BIGINT) AS n_classes_above_t02,
           CAST(sum(CASE WHEN 5 * numer > 2 * class_size * n
                         THEN class_size ELSE 0 END) AS BIGINT)
             AS n_customers_exposed,
           round(sum(CASE WHEN 5 * numer > 2 * class_size * n
                          THEN class_size ELSE 0 END) * 1.0 / sum(class_size), 6)
             AS exposed_share
    FROM per_class CROSS JOIN tot
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third release gate after k-anonymity and
    l-diversity: a class can be k-large AND l-diverse yet still leak if
    its sensitive-value DISTRIBUTION differs sharply from the table's
    (the skewness attack — e.g. a class where 90% share the rarest
    segment). t per class is the variational distance
    ½·Σ|p_class − p_global| over the categorical sensitive attribute
    (the EMD form for unordered domains); the audit reports the worst
    class and how many customers sit in classes past t = 0.2.

    Exactness: the distance numerator Σ|cnt·N − g·n_c| stays in BIGINT
    (one |a−b| per grid cell, summed exactly); each reported t is a
    single double division of exact integers, and the t > 0.2 gate is
    the exact integer inequality 5·numer > 2·n_c·N — no float ever
    decides a count. Scale shape: ONE customer scan into the
    (class, sensitive) hash agg; everything after operates on the
    bounded counts table (quasi-identifier domain × 5 segments):
    class sizes and global marginals re-fold from it, the dense grid is
    a bounded-×-5 crossJoin, and the 1-row total rides a broadcast."""
    c = load(spark, sf_dir).customer
    counts = (
        c.select(
            F.col("c_nationkey").alias("nation"),
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("balance_band"),
            F.col("c_mktsegment").alias("sensitive"),
        )
        .groupBy("nation", "balance_band", "sensitive")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)  # bounded: |QI domain| x 5 segments
    )
    classes = counts.groupBy("nation", "balance_band").agg(
        F.sum("cnt").alias("class_size")
    )
    globals_ = counts.groupBy("sensitive").agg(F.sum("cnt").alias("g"))
    tot = globals_.agg(F.sum("g").alias("n"))
    grid = (
        classes.crossJoin(F.broadcast(globals_))
        .join(counts, ["nation", "balance_band", "sensitive"], "left")
        .select(
            "nation",
            "balance_band",
            "class_size",
            "g",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )
    per_class = (
        grid.crossJoin(F.broadcast(tot))
        .groupBy("nation", "balance_band", "class_size", "n")
        .agg(
            F.sum(F.abs(F.col("cnt") * F.col("n") - F.col("g") * F.col("class_size")))
            .cast("long")
            .alias("numer")
        )
    )
    above = 5 * F.col("numer") > 2 * F.col("class_size") * F.col("n")
    return per_class.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.round(
            F.max(F.col("numer") / (2.0 * F.col("class_size") * F.col("n"))), 6
        ).alias("max_t"),
        F.sum(above.cast("int")).cast("long").alias("n_classes_above_t02"),
        F.sum(F.when(above, F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("n_customers_exposed"),
        F.round(
            F.sum(F.when(above, F.col("class_size")).otherwise(0))
            / F.sum("class_size"),
            6,
        ).alias("exposed_share"),
    )


DP_EPSILON = 0.5          # per-release privacy budget
DP_SENSITIVITY = 1        # one order contributes 1 to exactly one group
DP_SCALE = DP_SENSITIVITY / DP_EPSILON  # Laplace scale b = Δ/ε = 2.0

_DP_HEXWORD_SQL = (
    "list_reduce(list_transform(range(1, 9), "
    "i -> CAST(strpos('0123456789abcdef', substr(m, CAST(i AS INT), 1)) - 1"
    " AS BIGINT)), (a, b) -> a * 16 + b)"
)


@register(
    "dp_noisy_group_counts",
    oracle=f"""
    WITH g AS (
      SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1
    ),
    h AS (
      SELECT o_orderpriority, n, md5('dp1|' || o_orderpriority) AS m FROM g
    ),
    v AS (
      SELECT o_orderpriority, n,
             ({_DP_HEXWORD_SQL} + 0.5) / 4294967296.0 - 0.5 AS c
      FROM h
    ),
    z AS (
      SELECT o_orderpriority, n,
             CAST(floor(
               (-{DP_SCALE} * sign(c) * ln(1 - 2 * abs(c))) * 1000000 + 1e-3
             ) AS BIGINT) AS noise_micro
      FROM v
    )
    SELECT o_orderpriority,
           CAST({DP_EPSILON} AS DOUBLE) AS epsilon,
           {DP_SENSITIVITY} AS sensitivity,
           CAST(n * 1000000 + noise_micro AS BIGINT) AS released_count_micro,
           round((n * 1000000 + noise_micro) / 1000000.0, 6) AS released_count
    FROM z ORDER BY o_orderpriority
    """,
)
def dp_noisy_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private group-count release via the Laplace
    mechanism — the release gate that completes the privacy trio
    (k-anonymity / l-diversity / t-closeness audit the table;
    this NOISES what actually leaves): each o_orderpriority count is
    published as count + Laplace(Δ/ε) with ε={DP_EPSILON}, Δ=1 (one
    order touches one group, so the groups compose in PARALLEL — the
    whole release costs ε={DP_EPSILON}, not 5ε).

    The noise is SEEDED-DETERMINISTIC and engine-portable, which is
    what makes a DP release auditable/oracle-checkable here: u comes
    from 8 md5 hex digits of the group key ((b1 + 0.5)/2^32 — exact
    dyadic on both engines, never 0 or 1/2), the Laplace inverse CDF
    −b·sgn(u−½)·ln(1−2|u−½|) has exactly ONE engine-divergent op (the
    ln), and the 1e-6 fixed-point floor carries the same +1e-3 nudge
    as dsir so both engines quantize identically. Production would
    swap the md5 seed for a per-release secret nonce: the MECHANISM
    and its ε-accounting are what this operator pins (a seeded release
    is still ε-DP against any adversary who does not hold the seed).

    Scale shape: ONE map-side-combined count aggregate over the fact
    table into a |groups|-row release table; the noise arithmetic is
    per-group scalar expressions on that bounded table. Safe at any
    corpus size by construction."""
    g = load(spark, sf_dir).orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = F.md5(F.concat(F.lit("dp1|"), F.col("o_orderpriority")))
    b1 = F.conv(F.substring(m, 1, 8), 16, 10).cast("bigint")
    c = (b1.cast("double") + 0.5) / 4294967296.0 - 0.5
    noise = -F.lit(float(DP_SCALE)) * F.signum(c) * F.log(1.0 - 2.0 * F.abs(c))
    noise_micro = F.floor(noise * 1_000_000 + 1e-3).cast("bigint")
    released = F.col("n") * 1_000_000 + noise_micro
    return (
        g.select(
            "o_orderpriority",
            F.lit(float(DP_EPSILON)).alias("epsilon"),
            F.lit(DP_SENSITIVITY).alias("sensitivity"),
            released.cast("bigint").alias("released_count_micro"),
            F.round(released / 1_000_000.0, 6).alias("released_count"),
        )
        .orderBy("o_orderpriority")
    )


# Warner randomized response: answer truthfully with probability RR_P,
# else report the flipped bit. epsilon = ln(RR_P / (1-RR_P)) = ln 3.
RR_P = 0.75
_RR_HEXWORD_SQL = _DP_HEXWORD_SQL


@register(
    "randomized_response_freq",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b
      FROM events GROUP BY user_id
    ),
    u AS (
      SELECT b,
             ({_RR_HEXWORD_SQL} + 0.5) / 4294967296.0 AS u
      FROM (SELECT b, md5('rr1|' || CAST(user_id AS VARCHAR)) AS m
            FROM per_user)
    ),
    rep AS (
      SELECT b,
             CASE WHEN u < {RR_P!r} THEN b ELSE 1 - b END AS r
      FROM u
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(b) AS BIGINT) AS n_true,
             CAST(sum(r) AS BIGINT) AS n_reported
      FROM rep
    )
    SELECT n_users, n_true, n_reported,
           round(n_true / CAST(n_users AS DOUBLE), 6) AS pi_true,
           round((n_reported / CAST(n_users AS DOUBLE) - (1 - {RR_P!r}))
                 / (2 * {RR_P!r} - 1), 6) AS pi_hat,
           round(abs((n_reported / CAST(n_users AS DOUBLE) - (1 - {RR_P!r}))
                     / (2 * {RR_P!r} - 1)
                     - n_true / CAST(n_users AS DOUBLE)), 6) AS abs_error,
           round(ln({RR_P!r} / (1 - {RR_P!r})), 6) AS epsilon
    FROM agg
    """,
)
def randomized_response_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner randomized response (the LOCAL-DP mechanism, Warner 1965
    / RAPPOR's core): each user reports their sensitive bit ("ever
    purchased") truthfully with probability p=0.75, flipped otherwise,
    and the aggregator debiases the reported frequency with
    pî = (r̂ − (1−p)) / (2p − 1) — per-record ε = ln(p/(1−p)) = ln 3
    local DP, completing the privacy surface next to the CENTRAL-DP
    Laplace release (dp_noisy_group_counts).

    Determinism: each user's coin is the md5-dyadic uniform (exactly
    representable, the dp recipe) compared against the literal 0.75 —
    no transcendentals at runtime except the constant ε report; counts
    are exact BIGINTs and the debias is one identical double
    expression. Scale shape: one per-user aggregate, map-side flip
    bits, one global count rollup — a streaming-safe one-pass
    mechanism by construction (per-record noise, no shared state)."""
    e = load(spark, sf_dir).events
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("b")
    )
    m = F.md5(F.concat(F.lit("rr1|"), F.col("user_id").cast("string")))
    u = (
        F.conv(F.substring(m, 1, 8), 16, 10).cast("bigint").cast("double")
        + 0.5
    ) / 4294967296.0
    r = F.when(u < F.lit(RR_P), F.col("b")).otherwise(1 - F.col("b"))
    agg = per_user.select(F.col("b"), r.alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("b").cast("long").alias("n_true"),
        F.sum("r").cast("long").alias("n_reported"),
    )
    nu = F.col("n_users").cast("double")
    pi_hat = (F.col("n_reported") / nu - (1 - RR_P)) / (2 * RR_P - 1)
    pi_true = F.col("n_true") / nu
    return agg.select(
        "n_users",
        "n_true",
        "n_reported",
        F.round(pi_true, 6).alias("pi_true"),
        F.round(pi_hat, 6).alias("pi_hat"),
        F.round(F.abs(pi_hat - pi_true), 6).alias("abs_error"),
        F.round(F.log(F.lit(RR_P / (1 - RR_P))), 6).alias("epsilon"),
    )


DPU_CAP = 3               # per-user contribution bound C
DPU_EPSILON = 0.5         # whole-release budget
DPU_SCALE = DPU_CAP / DPU_EPSILON  # Laplace b = C/eps: L1 sensitivity is C


@register(
    "dp_user_bounded_event_counts",
    oracle=f"""
    WITH capped AS (
      SELECT event_type FROM (
        SELECT event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn <= {DPU_CAP}
    ),
    raw AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS raw_n
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS capped_n
      FROM capped GROUP BY 1
    ),
    h AS (
      SELECT r.event_type, r.raw_n, g.capped_n,
             md5('dpu|' || r.event_type) AS m
      FROM raw r JOIN g ON g.event_type = r.event_type
    ),
    v AS (
      SELECT event_type, raw_n, capped_n,
             ({_DP_HEXWORD_SQL} + 0.5) / 4294967296.0 - 0.5 AS c
      FROM h
    )
    SELECT event_type, raw_n, capped_n,
           CAST({DPU_EPSILON} AS DOUBLE) AS epsilon,
           {DPU_CAP} AS sensitivity,
           CAST(capped_n * 1000000 + CAST(floor(
               (-{DPU_SCALE} * sign(c) * ln(1 - 2 * abs(c))) * 1000000 + 1e-3
             ) AS BIGINT) AS BIGINT) AS released_count_micro
    FROM v ORDER BY event_type
    """,
)
def dp_user_bounded_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USER-level differentially-private event-type histogram with
    contribution bounding — the accounting detail event-level DP
    (dp_noisy_group_counts' adjacency: one ROW) silently skips: one
    user emits many events, so removing a user changes raw counts by
    an unbounded amount and no finite Laplace scale is private. The
    standard fix (Wilson et al. 2020, 'Differentially Private SQL with
    Bounded User Contribution') clips each user to their first
    C={DPU_CAP} events (event-time order, event_id tie-break — a
    deterministic per-user window), which bounds the L1 sensitivity of
    the whole 5-type count vector at C, so ONE Laplace mechanism at
    scale C/eps would make a release of the noised counts ALONE eps-DP
    under user-level adjacency.

    What this query MODELS vs what it RELEASES (ADVICE r10): only
    `released_count_micro` models the DP release; `raw_n` and
    `capped_n` are debug/bias-inspection outputs (they make the
    clipping bias visible and the mechanism oracle-checkable) that a
    real release must DROP — publishing the exact counts alongside
    voids the guarantee, and the event_type-seeded deterministic
    Laplace here is a reproducibility device, not private noise (real
    deployments draw from a secure RNG). The query demonstrates the
    contribution-bounding accounting, not an end-to-end private
    pipeline.

    Noise is the house seeded-deterministic Laplace (md5-dyadic
    uniform through the inverse CDF, floored to micro units) so the
    release is oracle-checkable; the single data-dependent ln sits
    behind the fixed-point guard. Scale: the clip is one user_id
    shuffle + bounded window; everything after runs on 5-row tables."""
    e = load(spark, sf_dir).events
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (
        e.select("event_type", "user_id", "ts", "event_id")
        .withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= DPU_CAP)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("capped_n"))
    )
    raw = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("raw_n")
    )
    m = F.md5(F.concat(F.lit("dpu|"), F.col("event_type")))
    b1 = F.conv(F.substring(m, 1, 8), 16, 10).cast("bigint")
    c = (b1.cast("double") + 0.5) / 4294967296.0 - 0.5
    noise = -F.lit(float(DPU_SCALE)) * F.signum(c) * F.log(1.0 - 2.0 * F.abs(c))
    noise_micro = F.floor(noise * 1_000_000 + 1e-3).cast("bigint")
    return (
        raw.join(capped, "event_type")
        .select(
            "event_type",
            "raw_n",
            "capped_n",
            F.lit(float(DPU_EPSILON)).alias("epsilon"),
            F.lit(DPU_CAP).alias("sensitivity"),
            (F.col("capped_n") * 1_000_000 + noise_micro)
            .cast("bigint")
            .alias("released_count_micro"),
        )
        .orderBy("event_type")
    )
