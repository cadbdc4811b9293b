"""Training-corpus curation operators beyond filtering/dedup removal:
rule-based quality gates (Gopher), importance resampling (DSIR), and
duplication-aware soft weighting (SoftDeDup) — the selection/weighting
stage that sits between raw-crawl cleaning and tokenization in an LLM
data pipeline.

All three are pure DataFrame programs (zero Python UDFs): token
explodes, hash-bucket equi-joins, and integer fixed-point arithmetic so
every output value is bit-identical to the DuckDB oracle regardless of
accumulation order. Scale notes per operator; none carries an all-pairs
stage or a driver-side loop.

Reference parity: the reference corpus (stroke_predict.py /
smote_sampling.py) has no text pipeline; these extend the mandated
LLM-data-pipeline surface (BASELINE.json north star) alongside
operators/text.py and operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.operators.text import token_table
from data_warehouse_data_mining_spark.registry import register

# Gopher-style rule thresholds (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", §A1.1 quality heuristics), adapted to the
# synthetic corpus scale. All boundary tests are exact integer
# inequalities (sum_len vs k*n_words, 5*n_distinct vs n_words) so the
# pass/fail bits are engine-portable.
GOPHER_MIN_WORDS = 40
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3  # mean word length in [3, 10]
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_MIN_STOPWORD_HITS = 2  # >=2 occurrences of common stopwords
GOPHER_MAX_WORD_LEN = 20  # longest token <= 20 chars (symbol-run proxy)
GOPHER_MIN_TTR_PCT = 20  # type/token ratio >= 0.20 (repetition proxy)
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in")

_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + ")"


def gopher_rule_flags(
    df: DataFrame, id_col: str, text_col: str, extra_cols: list[str] | None = None
) -> DataFrame:
    """Per-document Gopher rule bits from ONE token pass: (id,
    [extra...], n_words, fail_word_count, fail_mean_word_len,
    fail_stopwords, fail_max_word_len, fail_ttr, pass_all).

    This is the exploded/codegen form, kept as the parity yardstick for
    the shuffle-free expression twin (gopher_rule_flags_expr) that the
    registered census actually runs on — the twin measured 2.8× faster
    at sf0.1 because it has no (doc, token) shuffle at all. Shape here:
    explode -> groupBy(id) is one shuffle on the doc key with full
    map-side partial aggregation; countDistinct(w) per doc is the only
    non-distributive term (standard two-phase expand)."""
    toks = token_table(df, id_col, text_col, extra_cols)
    per_doc = toks.groupBy("id", *(extra_cols or [])).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("w")).alias("sum_len"),
        F.max(F.length("w")).alias("max_len"),
        F.countDistinct("w").alias("n_distinct"),
        F.sum(F.when(F.col("w").isin(*GOPHER_STOPWORDS), 1).otherwise(0)).alias(
            "n_stop"
        ),
    )
    n, sl = F.col("n_words"), F.col("sum_len")
    return per_doc.select(
        "id",
        *(extra_cols or []),
        "n_words",
        (~n.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)).alias("fail_word_count"),
        (
            (sl < GOPHER_MIN_MEAN_WORD_LEN * n) | (sl > GOPHER_MAX_MEAN_WORD_LEN * n)
        ).alias("fail_mean_word_len"),
        (F.col("n_stop") < GOPHER_MIN_STOPWORD_HITS).alias("fail_stopwords"),
        (F.col("max_len") > GOPHER_MAX_WORD_LEN).alias("fail_max_word_len"),
        (F.col("n_distinct") * 100 < GOPHER_MIN_TTR_PCT * n).alias("fail_ttr"),
    ).withColumn(
        "pass_all",
        ~(
            F.col("fail_word_count")
            | F.col("fail_mean_word_len")
            | F.col("fail_stopwords")
            | F.col("fail_max_word_len")
            | F.col("fail_ttr")
        ),
    )


def gopher_rule_flags_expr(
    df: DataFrame, id_col: str, text_col: str, extra_cols: list[str] | None = None
) -> DataFrame:
    """Shuffle-FREE twin of gopher_rule_flags: the same five rule bits
    computed as per-row array expressions (split → size / aggregate /
    array_max / array_distinct / filter), so the whole gate is a
    map-only projection — no token explode, no groupBy(id) shuffle, and
    therefore directly usable as a STATELESS Structured Streaming
    filter (a crawl stream can drop failing docs before they ever land).
    Equality with the exploded form is test-pinned. Measured 2.8×
    faster than the exploded form at sf0.1 (0.228 s vs 0.633 s census,
    min-of-5) — killing the (doc,token) shuffle beats staying in
    codegen here — so the REGISTERED census runs on this form; the
    exploded twin remains as the parity yardstick."""
    ws = F.split(F.col(text_col), " ")
    n = F.size(ws)
    sl = F.aggregate(ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    max_len = F.array_max(F.transform(ws, F.length))
    n_distinct = F.size(F.array_distinct(ws))
    n_stop = F.size(F.filter(ws, lambda w: w.isin(*GOPHER_STOPWORDS)))
    out = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in (extra_cols or [])],
        n.cast("long").alias("n_words"),
        (~n.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)).alias("fail_word_count"),
        (
            (sl < GOPHER_MIN_MEAN_WORD_LEN * n) | (sl > GOPHER_MAX_MEAN_WORD_LEN * n)
        ).alias("fail_mean_word_len"),
        (n_stop < GOPHER_MIN_STOPWORD_HITS).alias("fail_stopwords"),
        (max_len > GOPHER_MAX_WORD_LEN).alias("fail_max_word_len"),
        (n_distinct * 100 < GOPHER_MIN_TTR_PCT * n).alias("fail_ttr"),
    )
    return out.withColumn(
        "pass_all",
        ~(
            F.col("fail_word_count")
            | F.col("fail_mean_word_len")
            | F.col("fail_stopwords")
            | F.col("fail_max_word_len")
            | F.col("fail_ttr")
        ),
    )


@register(
    "gopher_quality_rules",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, source,
             count(*) AS n_words,
             sum(length(w)) AS sum_len,
             max(length(w)) AS max_len,
             count(DISTINCT w) AS n_distinct,
             sum(CASE WHEN w IN {_STOP_SQL} THEN 1 ELSE 0 END) AS n_stop
      FROM tok GROUP BY 1, 2
    ),
    flags AS (
      SELECT source,
             (n_words NOT BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
               AS f_wc,
             (sum_len < {GOPHER_MIN_MEAN_WORD_LEN} * n_words
              OR sum_len > {GOPHER_MAX_MEAN_WORD_LEN} * n_words) AS f_mwl,
             (n_stop < {GOPHER_MIN_STOPWORD_HITS}) AS f_stop,
             (max_len > {GOPHER_MAX_WORD_LEN}) AS f_maxw,
             (n_distinct * 100 < {GOPHER_MIN_TTR_PCT} * n_words) AS f_ttr
      FROM per_doc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN f_wc THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_word_count,
           CAST(sum(CASE WHEN f_mwl THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_mean_word_len,
           CAST(sum(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_stopwords,
           CAST(sum(CASE WHEN f_maxw THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_max_word_len,
           CAST(sum(CASE WHEN f_ttr THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_ttr,
           CAST(sum(CASE WHEN NOT (f_wc OR f_mwl OR f_stop OR f_maxw OR f_ttr)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
    FROM flags GROUP BY source ORDER BY source
    """,
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality census per source: how many documents
    each of the five heuristic gates (word-count bounds, mean-word-length
    bounds, stopword presence, max-word-length, type-token ratio) would
    remove, and how many pass all five — the per-dump report a corpus
    owner reads before committing a filter config.

    Every rule boundary is an exact integer inequality (mean word length
    as sum_len vs k*n_words, TTR as 100*n_distinct vs 20*n_words), so
    the counts hash-match the oracle bit-for-bit with no float
    accumulation anywhere. ONE shuffle total: the rule bits come from
    the shuffle-free expression twin (gopher_rule_flags_expr — measured
    2.8× faster than the exploded form at sf0.1), leaving only the
    map-side-combinable doc->source census agg."""
    d = load(spark, sf_dir).documents
    flags = gopher_rule_flags_expr(d, "doc_id", "text", ["source"])
    cnt = lambda c: F.sum(F.col(c).cast("int")).cast("bigint").alias(c)  # noqa: E731
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cnt("fail_word_count"),
            cnt("fail_mean_word_len"),
            cnt("fail_stopwords"),
            cnt("fail_max_word_len"),
            cnt("fail_ttr"),
            F.sum(F.col("pass_all").cast("int")).cast("bigint").alias("n_pass_all"),
        )
        .orderBy("source")
    )


# DSIR hashed-n-gram importance resampling (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling"): score each
# raw document by how much more likely its hashed-unigram profile is
# under a target-domain distribution than under the raw pool. Bucket
# count and smoothing are fixed so both engines derive identical
# per-bucket log-ratios.
DSIR_BUCKETS = 64
DSIR_ALPHA_NUM = 1  # add-1/2 smoothing as exact rational: alpha = 1/2
DSIR_TARGET_SOURCE = "src0"  # stand-in target domain in the test corpus

# portable token -> bucket hash: first 8 md5 hex digits as an integer,
# mod DSIR_BUCKETS (same value in Spark and DuckDB)
_BUCKET_SPARK = (
    lambda col: F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
    % DSIR_BUCKETS
)
_BUCKET_SQL = f"CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % {DSIR_BUCKETS}"


def dsir_doc_buckets(tokens: DataFrame, extra_cols: list[str]) -> DataFrame:
    """(id, [extra...], bucket, cnt): per-document hashed-bucket token
    counts — the scoring-side aggregate the importance weights fold
    from."""
    return (
        tokens.select(
            "id", *extra_cols, _BUCKET_SPARK(F.col("w")).alias("bucket")
        )
        .groupBy("id", *extra_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_bucket_logratios(tokens: DataFrame, target_filter) -> DataFrame:
    """(bucket, ratio_micro): per-bucket floor(1e6 * ln(p_target/p_raw))
    with add-1/2 smoothing, from ONE token pass (conditional sums give
    target and raw counts together; the shuffle carries only
    DSIR_BUCKETS keys with full map-side combine). The DSIR_BUCKETS-row
    result is localCheckpoint-ed — a bounded pin, never
    token-proportional — so its two consumers (the totals fold and the
    ratio select) never re-scan the corpus."""
    per_bucket = (
        tokens.select(
            _BUCKET_SPARK(F.col("w")).alias("bucket"),
            F.when(target_filter, 1).otherwise(0).alias("is_t"),
        )
        .groupBy("bucket")
        .agg(F.sum("is_t").alias("ct"), F.count(F.lit(1)).alias("cr"))
        .localCheckpoint(eager=True)
    )
    return _dsir_ratios_from_per_bucket(per_bucket)


def _dsir_ratios_from_per_bucket(per_bucket: DataFrame) -> DataFrame:
    """(bucket, ratio_micro) from a (bucket, ct, cr) count table — the
    one place the DSIR log-ratio float arithmetic (and its oracle-
    mirrored pre-floor nudge) lives, shared by the token-pass builder
    above and the doc_buckets-derived single-pass path in
    dsir_importance_weights.

    The corpus totals (nt, nr) come from an UNPARTITIONED window over
    the per-bucket table rather than a separate agg + crossJoin branch:
    the table is DSIR_BUCKETS rows by construction (a bounded global
    window, never corpus-sized), and keeping per_bucket to a SINGLE
    consumer is what lets AQE exchange reuse collapse the whole
    importance-weight query to one token pass — a second consumer
    re-ran the explode+md5 map stage (measured r13; the runtime reuse
    cache caught the exchanges but not the totals branch)."""
    from pyspark.sql import Window

    w = Window.partitionBy()
    with_totals = per_bucket.select(
        "bucket",
        "ct",
        "cr",
        F.sum("ct").over(w).alias("nt"),
        F.sum("cr").over(w).alias("nr"),
    )
    # p = (c + 1/2) / (n + B/2)  ->  ln p = ln(2c+1) - ln(2n+B)
    # (kept in integers until the single ln per side)
    lr = (
        F.log(2 * F.col("ct") + 1)
        - F.log(2 * F.col("nt") + DSIR_BUCKETS)
        - F.log(2 * F.col("cr") + 1)
        + F.log(2 * F.col("nr") + DSIR_BUCKETS)
    )
    return (
        with_totals
        .select(
            "bucket",
            # +1e-3 pre-floor nudge (mirrored in the oracle SQL): the
            # four ln() terms come from different libm implementations
            # (JVM java.lang.Math.log vs DuckDB libm); a last-ulp
            # divergence per term puts the engines up to ~1e-8 apart in
            # micro units, so the nudge must EXCEED that bound (1e-3 is
            # 10^5 x the divergence yet 10^-3 of the 1-unit quantum —
            # a 1e-9 log-ratio bias, far below any consumer's
            # resolution) for both engines to floor identically
            # (ADVICE r8; magnitude fixed in r9 review)
            F.floor(lr * 1_000_000 + 1e-3).cast("bigint").alias("ratio_micro"),
        )
    )


@register(
    "dsir_importance_weights",
    headline=True,
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    bt AS (
      SELECT doc_id, source, {_BUCKET_SQL} AS bucket FROM tok
    ),
    per_bucket AS (
      SELECT bucket,
             sum(CASE WHEN source = '{DSIR_TARGET_SOURCE}' THEN 1 ELSE 0 END)
               AS ct,
             count(*) AS cr
      FROM bt GROUP BY bucket
    ),
    tots AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM per_bucket),
    ratios AS (
      SELECT bucket,
             CAST(floor((ln(2*ct + 1) - ln(2*nt + {DSIR_BUCKETS})
                   - ln(2*cr + 1) + ln(2*nr + {DSIR_BUCKETS})) * 1000000
                   + 1e-3)
                  AS BIGINT) AS ratio_micro
      FROM per_bucket CROSS JOIN tots
    ),
    doc_buckets AS (
      SELECT doc_id, source, bucket, count(*) AS cnt
      FROM bt GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT d.doc_id, d.source,
             CAST(sum(d.cnt) AS BIGINT) AS n_tokens,
             CAST(sum(d.cnt * r.ratio_micro) AS BIGINT) AS weight_micro
      FROM doc_buckets d JOIN ratios r ON r.bucket = d.bucket
      GROUP BY 1, 2
    )
    SELECT doc_id, source, n_tokens, weight_micro,
           round(weight_micro / 1000000.0 / n_tokens, 6) AS per_token_logratio
    FROM scored
    ORDER BY weight_micro DESC, doc_id
    LIMIT 50
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores: rank raw documents by the hashed-unigram
    log-likelihood ratio between a target domain (the DSIR_TARGET_SOURCE
    source, 'src0') and the raw pool — the data-selection step that
    picks pretraining documents "closest to" a trusted domain without
    training a classifier.

    Engine-portable by construction: the 64 bucket log-ratios are each
    ONE ln() of exact integer counts (no accumulation), floored to
    1e-6 fixed point with a +1e-3 pre-floor nudge mirrored on both
    engines (JVM Math.log and libm ln can differ in the last ulp,
    which is ~1e-8 in micro units across the four terms; the nudge is
    10^5 x that divergence but only 10^-3 of the quantum, so both
    engines floor identically at a negligible 1e-9 log-ratio bias); per-doc scores are then
    integer dot products
    cnt x ratio_micro, summed exactly. 100 TB shape (r13): ONE token
    pass total — the per-bucket target/raw counts are re-aggregated
    FROM doc_buckets (sum(cnt) over (id, source, bucket) rows equals
    the per-token conditional count exactly, integer arithmetic both
    ways), so the expensive scan+split+explode+md5 map work and the
    (id, source, bucket) exchange behind it appear once in the plan
    and every other consumer hangs off ReusedExchange (plan-pinned in
    tests/test_plans.py). The 64-row ratio table still reaches the
    scoring join as a force-broadcast; the top-50 cut is a distributed
    TakeOrdered, not a global sort. (Pinning doc_buckets itself would
    pin a corpus-proportional table — the r6 rule says stage that to
    parquet instead when the corpus is reused; the two-token-pass
    dsir_bucket_logratios helper remains for callers with no
    doc-grained aggregate to reuse.)"""
    d = load(spark, sf_dir).documents
    toks = token_table(d, "doc_id", "text", ["source"])
    doc_buckets = dsir_doc_buckets(toks, ["source"])
    per_bucket = doc_buckets.groupBy("bucket").agg(
        F.sum(
            F.when(
                F.col("source") == DSIR_TARGET_SOURCE, F.col("cnt")
            ).otherwise(F.lit(0))
        ).alias("ct"),
        F.sum("cnt").alias("cr"),
    )
    ratios = _dsir_ratios_from_per_bucket(per_bucket)
    return (
        doc_buckets.join(F.broadcast(ratios), "bucket")
        .groupBy("id", "source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("ratio_micro"))
            .cast("bigint")
            .alias("weight_micro"),
        )
        .select(
            F.col("id").alias("doc_id"),
            "source",
            "n_tokens",
            "weight_micro",
            F.round(
                F.col("weight_micro") / 1_000_000.0 / F.col("n_tokens"), 6
            ).alias("per_token_logratio"),
        )
        .orderBy(F.col("weight_micro").desc(), "doc_id")
        .limit(50)
    )


@register(
    "softdedup_weights",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source, md5(text) AS f FROM documents
    ),
    grp AS (SELECT f, count(*) AS c FROM fp GROUP BY f)
    SELECT fp.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN g.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_in_dup_groups,
           CAST(sum(CAST(floor(1000000 / g.c) AS BIGINT)) AS BIGINT)
             AS effective_micro,
           round(sum(CAST(floor(1000000 / g.c) AS BIGINT)) / 1000000.0, 6)
             AS effective_docs
    FROM fp JOIN grp g ON g.f = fp.f
    GROUP BY fp.source ORDER BY fp.source
    """,
)
def softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-aware soft weighting (SoftDeDup): instead of DROPPING
    exact duplicates, weight every copy by 1/(global copy count) so the
    corpus keeps its coverage while repeated content stops dominating
    the loss — reported per source as the effective (weight-summed)
    dataset size next to the raw doc count.

    Weights are floor(1e6/c) integer micro-units, so the per-source sums
    are exact and hash-identical to the oracle. 100 TB shape: fingerprint
    -> groupBy(fingerprint) count (one shuffle on the hash key, uniform
    by construction), join back on the same key (co-partitioned, AQE
    turns the count side into a broadcast when the dup-group table is
    small), then one source-keyed agg. No collect, no skew risk beyond
    pathological single-document floods, which the dup-count cap in
    operators/dedup.py::clean_corpus already documents."""
    d = load(spark, sf_dir).documents
    fp = d.select("doc_id", "source", F.md5("text").alias("f"))
    grp = fp.groupBy("f").agg(F.count(F.lit(1)).alias("c"))
    w = F.floor(1_000_000 / F.col("c")).cast("bigint")
    return (
        fp.join(grp, "f")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_in_dup_groups"),
            F.sum(w).cast("bigint").alias("effective_micro"),
            F.round(F.sum(w) / 1_000_000.0, 6).alias("effective_docs"),
        )
        .orderBy("source")
    )


NOVELTY_SHINGLE_N = 3


@register(
    "ngram_novelty_by_source",
    oracle=f"""
    WITH words AS (
      SELECT source, string_split(text, ' ') AS ws FROM documents
    ),
    pairs AS (
      SELECT DISTINCT source,
             ws[pos] || ' ' || ws[pos + 1] || ' ' || ws[pos + 2] AS shingle
      FROM (SELECT source, ws,
                   unnest(range(1, len(ws) - {NOVELTY_SHINGLE_N - 2})) AS pos
            FROM words WHERE len(ws) >= {NOVELTY_SHINGLE_N})
    ),
    per_shingle AS (
      SELECT shingle, min(source) AS first_source FROM pairs GROUP BY shingle
    ),
    novel AS (
      SELECT first_source AS source, CAST(count(*) AS BIGINT) AS novel_ngrams
      FROM per_shingle GROUP BY first_source
    ),
    dist AS (
      SELECT source, CAST(count(*) AS BIGINT) AS distinct_ngrams
      FROM pairs GROUP BY source
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM per_shingle)
    SELECT d.source, d.distinct_ngrams,
           CAST(coalesce(n.novel_ngrams, 0) AS BIGINT) AS novel_ngrams,
           CAST(sum(coalesce(n.novel_ngrams, 0))
                OVER (ORDER BY d.source) AS BIGINT) AS cum_novel,
           round(sum(coalesce(n.novel_ngrams, 0)) OVER (ORDER BY d.source)
                 * 100.0 / t.total, 6) AS cum_coverage_pct
    FROM dist d LEFT JOIN novel n ON n.source = d.source
    CROSS JOIN tot t
    ORDER BY d.source
    """,
)
def ngram_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diminishing-returns curve for corpus growth: process sources in
    a deterministic order (lexicographic) and attribute each distinct
    word-3-gram to the FIRST source containing it; per source report
    its distinct-shingle count, its novel-shingle contribution, and the
    cumulative fraction of the corpus shingle vocabulary covered — the
    standard diagnostic for "does adding this source buy new content
    or re-buy what we have" when composing a training mixture.

    Scale shape: one shingle explode (map-side array_distinct per doc
    first), one (source, shingle) dedup shuffle, then a shingle-keyed
    min-agg — the same inverted-index shuffles as dedup's n-gram
    Jaccard, nothing all-pairs; the per-source rollup and the
    cumulative window run on a #sources-sized table (bounded, here
    20). First-occurrence attribution via min(source) is exact and
    engine-portable (plain string order, no floats anywhere except
    the final rounded percentage)."""
    d = load(spark, sf_dir).documents
    from data_warehouse_data_mining_spark.functions import texthash as th

    ws = th.words(F.col("text"))
    pairs = (
        d.select(
            "source",
            F.explode(
                F.array_distinct(th.word_shingles(ws, NOVELTY_SHINGLE_N))
            ).alias("shingle"),
        )
        .distinct()
    )
    per_shingle = pairs.groupBy("shingle").agg(
        F.min("source").alias("first_source")
    )
    novel = per_shingle.groupBy(F.col("first_source").alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("novel_ngrams")
    )
    dist = pairs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("distinct_ngrams")
    )
    tot = per_shingle.agg(F.count(F.lit(1)).cast("long").alias("total"))
    from pyspark.sql import Window as W

    wcum = W.orderBy("source").rowsBetween(W.unboundedPreceding, 0)
    nn = F.coalesce(F.col("novel_ngrams"), F.lit(0))
    return (
        dist.join(novel, "source", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "distinct_ngrams",
            nn.cast("long").alias("novel_ngrams"),
            F.sum(nn).over(wcum).cast("long").alias("cum_novel"),
            F.round(
                F.sum(nn).over(wcum) * 100.0 / F.col("total"), 6
            ).alias("cum_coverage_pct"),
        )
        .orderBy("source")
    )


NB_BUCKETS = 64


@register(
    "naive_bayes_langid",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % {NB_BUCKETS}
               AS bucket
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
            FROM documents)
    ),
    train AS (SELECT * FROM tok WHERE doc_id % 5 <> 0),
    langs AS (
      SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_tok
      FROM train GROUP BY lang
    ),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS d FROM langs),
    cells AS (
      SELECT lang, bucket, CAST(count(*) AS BIGINT) AS c
      FROM train GROUP BY lang, bucket
    ),
    dense AS (
      SELECT l.lang, b.b AS bucket, l.n_tok, coalesce(c.c, 0) AS c
      FROM langs l
      CROSS JOIN (SELECT unnest(range(0, {NB_BUCKETS})) AS b) b
      LEFT JOIN cells c ON c.lang = l.lang AND c.bucket = b.b
    ),
    llh AS (
      SELECT lang, bucket,
             CAST(floor(ln((c + 1) / (CAST(n_tok AS DOUBLE) + {NB_BUCKETS}))
                        * 1000000 + 1e-3) AS BIGINT) AS llh_micro
      FROM dense
    ),
    prior AS (
      SELECT l.lang,
             CAST(floor(ln(l.n_docs / CAST(t.d AS DOUBLE)) * 1000000 + 1e-3)
                  AS BIGINT) AS prior_micro
      FROM langs l CROSS JOIN tot t
    ),
    test_b AS (
      SELECT doc_id, lang AS true_lang, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM tok WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT t.doc_id, t.true_lang, p.lang AS cand,
             p.prior_micro + CAST(sum(t.cnt * h.llh_micro) AS BIGINT) AS score
      FROM test_b t
      JOIN llh h ON h.bucket = t.bucket
      JOIN prior p ON p.lang = h.lang
      GROUP BY t.doc_id, t.true_lang, p.lang, p.prior_micro
    ),
    pred AS (
      SELECT doc_id, true_lang, cand AS pred_lang FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, cand) AS rn
        FROM scored) WHERE rn = 1
    )
    SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language identifier trained AND scored
    entirely in-engine with exact integer arithmetic: hashed-bucket
    token features (the dsir md5-bucket trick, 64 buckets), add-1
    smoothed per-(lang, bucket) log likelihoods and doc-count priors in
    1e-6 fixed point (one ln each, the nudge-floored dsir discipline),
    per-document scores as exact BIGINT dot products, argmax with a
    lang tie-break. Train = doc_id%5≠0, test = doc_id%5=0; the output
    is the full confusion matrix — a hash-CHECKABLE classifier, unlike
    the MLlib families whose pins are property bands. (On this
    synthetic corpus the language column is independent of the shared
    vocabulary, so accuracy sits at the class prior — the registered
    value is the exact MECHANISM, which transfers unchanged to a real
    multilingual corpus.)

    Scale shape: one token pass; the model is a bounded (langs×64 + 
    langs) broadcast table; scoring is one (doc, bucket) aggregate
    joined to the model — the dsir scoring shape, linear in corpus
    size with no pairwise or iterative stage."""
    d = load(spark, sf_dir).documents
    words = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).select(
        "doc_id",
        "lang",
        (F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("bigint")
         % NB_BUCKETS).alias("bucket"),
    )
    train = words.filter(F.col("doc_id") % 5 != 0)
    langs = train.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_tok"),
    ).localCheckpoint(eager=True)
    tot = langs.agg(F.sum("n_docs").cast("long").alias("d"))
    cells = train.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    buckets = F.explode(F.array(*[F.lit(b) for b in range(NB_BUCKETS)]))
    dense = (
        langs.select("lang", "n_tok", buckets.alias("bucket"))
        .join(cells, ["lang", "bucket"], "left")
        .select(
            "lang",
            "bucket",
            F.floor(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("n_tok").cast("double") + NB_BUCKETS)
                )
                * 1_000_000
                + 1e-3
            )
            .cast("bigint")
            .alias("llh_micro"),
        )
    )
    prior = langs.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.floor(
            F.log(F.col("n_docs") / F.col("d").cast("double")) * 1_000_000
            + 1e-3
        )
        .cast("bigint")
        .alias("prior_micro"),
    )
    test_b = (
        words.filter(F.col("doc_id") % 5 == 0)
        .groupBy("doc_id", F.col("lang").alias("true_lang"), "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    model = dense.join(prior, "lang").select(
        F.col("lang").alias("cand"), "bucket", "llh_micro", "prior_micro"
    )
    scored = (
        test_b.join(F.broadcast(model), "bucket")
        .groupBy("doc_id", "true_lang", "cand", "prior_micro")
        .agg(F.sum(F.col("cnt") * F.col("llh_micro")).cast("long").alias("s"))
        .select(
            "doc_id",
            "true_lang",
            "cand",
            (F.col("prior_micro") + F.col("s")).alias("score"),
        )
    )
    wp = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand")
    pred = (
        scored.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select("true_lang", F.col("cand").alias("pred_lang"))
    )
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


JSD_BUCKETS = 64


@register(
    "token_js_divergence_matrix",
    oracle=f"""
    WITH tok AS (
      SELECT source,
             CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % {JSD_BUCKETS}
               AS bucket
      FROM (SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents)
    ),
    cells AS (
      SELECT source, bucket, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ),
    totals AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY source
    ),
    dense AS (
      SELECT t.source, b.b AS bucket, t.n, coalesce(c.c, 0) AS c
      FROM totals t
      CROSS JOIN (SELECT unnest(range(0, {JSD_BUCKETS})) AS b) b
      LEFT JOIN cells c ON c.source = t.source AND c.bucket = b.b
    ),
    pairs AS (
      SELECT a.source AS src_a, x.source AS src_b, a.bucket,
             (2 * a.c + 1) / (2.0 * a.n + {JSD_BUCKETS}) AS p,
             (2 * x.c + 1) / (2.0 * x.n + {JSD_BUCKETS}) AS q
      FROM dense a JOIN dense x
        ON x.bucket = a.bucket AND a.source < x.source
    ),
    terms AS (
      SELECT src_a, src_b,
             CAST(floor((0.5 * p * ln(p / ((p + q) / 2))
                         + 0.5 * q * ln(q / ((p + q) / 2)))
                        * 1000000 + 1e-3) AS BIGINT) AS term_micro
      FROM pairs
    ),
    js AS (
      SELECT src_a, src_b, CAST(sum(term_micro) AS BIGINT) AS js_micro
      FROM terms GROUP BY 1, 2
    )
    SELECT src_a, src_b, round(js_micro / 1000000.0, 6) AS js_nats
    FROM (SELECT *, row_number() OVER (ORDER BY js_micro DESC, src_a, src_b)
                 AS rn
          FROM js) t
    WHERE rn <= 20
    ORDER BY js_nats DESC, src_a, src_b
    """,
)
def token_js_divergence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between sources' TOKEN
    distributions (hashed to 64 buckets, add-1/2 smoothed) — the
    token-level companion to js_divergence_sources' language-mix view:
    which source PAIRS write most differently, the distance matrix a
    mixture designer clusters before assigning sampling temperatures.
    Top-20 most divergent pairs.

    Fixed-point discipline: smoothed p/q are deterministic doubles from
    exact integers, each (pair, bucket) term has two ln() calls floored
    TOGETHER to 1e-6 micro units (one nudge per term), and the per-pair
    sum over 64 buckets is an exact BIGINT add — order-free. Scale
    shape: one token pass to a |sources|×64 cell table; the pair
    explosion is (|sources| choose 2)×64 — bounded by the CATALOG of
    sources, never the corpus; top-20 via one bounded window."""
    d = load(spark, sf_dir).documents
    cells = (
        d.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .select("source", _BUCKET_SPARK(F.col("w")).alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    totals = cells.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    buckets = F.explode(F.array(*[F.lit(b) for b in range(JSD_BUCKETS)]))
    dense = (
        totals.select("source", "n", buckets.alias("bucket"))
        .join(cells, ["source", "bucket"], "left")
        .select(
            "source",
            "bucket",
            "n",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
        # |sources| x 64 rows; self-joined below
        .localCheckpoint(eager=True)
    )
    a = dense.select(
        F.col("source").alias("src_a"),
        "bucket",
        ((2 * F.col("c") + 1) / (2.0 * F.col("n") + JSD_BUCKETS)).alias("p"),
    )
    b = dense.select(
        F.col("source").alias("src_b"),
        F.col("bucket").alias("bucket_b"),
        ((2 * F.col("c") + 1) / (2.0 * F.col("n") + JSD_BUCKETS)).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    term = F.floor(
        (
            0.5 * F.col("p") * F.log(F.col("p") / m)
            + 0.5 * F.col("q") * F.log(F.col("q") / m)
        )
        * 1_000_000
        + 1e-3
    ).cast("bigint")
    js = (
        a.join(
            b,
            (F.col("bucket_b") == F.col("bucket"))
            & (F.col("src_a") < F.col("src_b")),
        )
        .select("src_a", "src_b", term.alias("term_micro"))
        .groupBy("src_a", "src_b")
        .agg(F.sum("term_micro").cast("long").alias("js_micro"))
    )
    wtop = W.orderBy(F.col("js_micro").desc(), "src_a", "src_b")
    return (
        js.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= 20)
        .select(
            "src_a",
            "src_b",
            F.round(F.col("js_micro") / 1_000_000.0, 6).alias("js_nats"),
        )
        .orderBy(F.col("js_nats").desc(), "src_a", "src_b")
    )


IPF_ROUNDS = 3  # full row+column scaling rounds (6 scalings)
_IPF_PPM = 1_000_000


def _ipf_oracle() -> str:
    """Unrolled integer IPF CTE chain (the Spark builder's exact
    mirror): alternate lang-marginal and source-marginal scalings in
    parts-per-million BIGINT arithmetic."""
    stages = []
    prev = "w0"
    for i in range(IPF_ROUNDS):
        stages.append(
            f"""l{i} AS (
      SELECT lang, source, n,
             (w * t_lang) // (sum(w) OVER (PARTITION BY lang)) AS w,
             t_lang, t_source
      FROM {prev}
    )"""
        )
        stages.append(
            f"""s{i} AS (
      SELECT lang, source, n,
             (w * t_source) // (sum(w) OVER (PARTITION BY source)) AS w,
             t_lang, t_source
      FROM l{i}
    )"""
        )
        prev = f"s{i}"
    return (
        f"""
    WITH cells AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS total,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      FROM cells
    ),
    w0 AS (
      SELECT lang, source, n,
             (n * {_IPF_PPM}) // total AS w,
             {_IPF_PPM} // n_langs AS t_lang,
             {_IPF_PPM} // n_sources AS t_source
      FROM cells CROSS JOIN tot
    ),
    """
        + ",\n    ".join(stages)
        + f"""
    SELECT lang, source, n AS n_docs, CAST(w AS BIGINT) AS weight_ppm,
           CAST(sum(w) OVER (PARTITION BY lang) AS BIGINT)
             AS lang_total_ppm,
           CAST(sum(w) OVER (PARTITION BY source) AS BIGINT)
             AS source_total_ppm
    FROM {prev}
    ORDER BY lang, source
    """
    )


@register("ipf_raking_weights", oracle=_ipf_oracle())
def ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting / raking (Deming & Stephan 1940;
    the survey post-stratification standard) of the corpus mixture:
    reweight the (lang, source) cell table so BOTH marginals match
    uniform targets — the dataset-remixing step a training pipeline
    runs when the crawl's language x source mix must hit a prescribed
    recipe but per-cell ratios should move as little as possible (IPF
    converges to the minimum-KL reweighting with matched marginals).
    mixture_temperature_weights flattens ONE marginal; this calibrates
    two jointly.

    Entirely integer: weights live in parts-per-million BIGINTs and
    each of the 6 unrolled scalings is one (w * target) div marginal_sum
    per cell — no doubles anywhere, so both engines walk bit-identical
    weight trajectories (floor-rounding included). After the final
    source scaling the source marginals equal the target up to
    cumulative floor loss (< #cells ppm) and lang marginals are within
    IPF's round-3 convergence gap — both emitted for inspection.

    Scale shape: one fact scan -> langs x sources cell table
    (bounded); all six scalings are window sums over that table."""
    d = load(spark, sf_dir).documents
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("total"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    w = cells.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n",
        F.expr(f"(n * {_IPF_PPM}) div total").alias("w"),
        F.expr(f"{_IPF_PPM} div n_langs").alias("t_lang"),
        F.expr(f"{_IPF_PPM} div n_sources").alias("t_source"),
    )
    for _ in range(IPF_ROUNDS):
        w = (
            w.withColumn("msum", F.sum("w").over(W.partitionBy("lang")))
            .withColumn("w", F.expr("(w * t_lang) div msum").cast("long"))
            .drop("msum")
        )
        w = (
            w.withColumn("msum", F.sum("w").over(W.partitionBy("source")))
            .withColumn("w", F.expr("(w * t_source) div msum").cast("long"))
            .drop("msum")
        )
    return (
        w.withColumn(
            "lang_total_ppm", F.sum("w").over(W.partitionBy("lang")).cast("long")
        )
        .withColumn(
            "source_total_ppm",
            F.sum("w").over(W.partitionBy("source")).cast("long"),
        )
        .select(
            "lang",
            "source",
            F.col("n").alias("n_docs"),
            F.col("w").cast("long").alias("weight_ppm"),
            "lang_total_ppm",
            "source_total_ppm",
        )
        .orderBy("lang", "source")
    )


KNAP_BUDGET_SHARE = 5  # budget = total tokens div 5 (20%)


@register(
    "knapsack_doc_selection",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS cost,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS val
      FROM documents
    ),
    tot AS (SELECT CAST(sum(cost) AS BIGINT) // 5 AS budget FROM docs),
    ranked AS (
      SELECT doc_id, cost, val,
             (val * 1000000) // cost AS density_micro,
             CAST(sum(cost) OVER (ORDER BY (val * 1000000) // cost DESC,
                  doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cost,
             CAST(sum(val) OVER (ORDER BY (val * 1000000) // cost DESC,
                  doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_val
      FROM docs
    ),
    greedy AS (
      SELECT CAST(count(*) AS BIGINT) AS n_selected,
             CAST(max(cum_cost) AS BIGINT) AS tokens_used,
             CAST(max(cum_val) AS BIGINT) AS value_selected
      FROM ranked CROSS JOIN tot WHERE cum_cost <= budget
    ),
    frontier AS (
      -- first item past the budget: its fractional share closes the
      -- LP relaxation; LP* (scaled by its cost) bounds OPT from above
      SELECT r.val AS f_val, r.cost AS f_cost,
             r.cum_cost - r.cost AS before_cost,
             r.cum_val - r.val AS before_val
      FROM ranked r CROSS JOIN tot
      WHERE r.cum_cost > budget AND r.cum_cost - r.cost <= budget
    )
    SELECT g.n_selected, g.tokens_used, t.budget, g.value_selected,
           CAST(f.before_val * f.f_cost
                + (t.budget - f.before_cost) * f.f_val AS BIGINT)
             AS lp_bound_scaled,
           CAST(f.f_cost AS BIGINT) AS lp_scale,
           CAST(g.value_selected * f.f_cost >=
                f.before_val * f.f_cost
                + (t.budget - f.before_cost) * f.f_val - f.f_val * f.f_cost
                AS INT) AS within_one_item_of_opt
    FROM greedy g CROSS JOIN tot t CROSS JOIN frontier f
    """,
)
def knapsack_doc_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained document selection as a knapsack: pick docs
    maximizing total lexical value (distinct-word count) under a token
    budget of 1/5 of the corpus — the data-selection shape every
    "best data under a compute budget" pipeline runs (quality-weighted
    sampling is its soft sibling, this is the hard-budget form). The
    greedy density order (value/cost) is the classic 1/2-approximation
    whose LP-relaxation certificate ships WITH the answer: the
    fractional optimum before_val + remaining*density(frontier) bounds
    OPT from above, and greedy is within ONE frontier item of it —
    emitted as an exact integer flag (within_one_item_of_opt), scaled
    by the frontier cost so no division ever happens.

    Exactness: values/costs are integer token counts; the density sort
    key is the exact integer (val*1e6) div cost with doc_id tie-break;
    the global ordered prefix sums are windows over the doc table (at
    the 100 TB design point this ordering routes through
    ranking.global_order_stats' two-phase distributed cumsum — the
    abc_pareto discipline; the semantics here are identical); the LP
    bound comparison is cross-multiplied into pure integers.

    Scale: one scan -> per-doc (cost, val) -> ordered prefix -> 1-row
    certificate."""
    d = load(spark, sf_dir).documents
    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
    )

    # narrow per-doc table (4 longs/row — the grid_lof staged-fit
    # precedent): the two two-phase cumsum calls otherwise re-derive
    # the tokenizing projection 15x (plan-audit r10)
    docs = (
        d.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("cost"),
            F.size(F.array_distinct(F.split("text", " ")))
            .cast("long")
            .alias("val"),
        )
        .withColumn("dens", F.expr("(val * 1000000) div cost"))
        .localCheckpoint(eager=True)
    )
    # integer `div` like the oracle's `//` (ADVICE r10): the double
    # quotient could round across an integer boundary past ~2^52*5
    # total tokens and shift the greedy cut by one doc
    tot = docs.agg(
        F.expr(f"sum(cost) div {KNAP_BUDGET_SHARE}")
        .cast("long")
        .alias("budget")
    )
    # the global density-ordered prefix sums route through the
    # two-phase distributed cumsum (one call per measure) — never an
    # unpartitioned window over the doc-proportional table
    r_cost = global_order_stats(
        docs, "dens", "doc_id", measure_col="cost", ascending=False
    ).select("doc_id", "cost", "val", F.col("global_cum").alias("cum_cost"))
    r_val = global_order_stats(
        docs, "dens", "doc_id", measure_col="val", ascending=False
    ).select(F.col("doc_id").alias("doc_id2"), F.col("global_cum").alias("cum_val"))
    ranked = (
        r_cost.join(r_val, F.col("doc_id") == F.col("doc_id2"))
        .drop("doc_id2")
        .crossJoin(F.broadcast(tot))
    )
    greedy = ranked.filter(F.col("cum_cost") <= F.col("budget")).agg(
        F.count(F.lit(1)).cast("long").alias("n_selected"),
        F.max("cum_cost").cast("long").alias("tokens_used"),
        F.max("cum_val").cast("long").alias("value_selected"),
    )
    frontier = ranked.filter(
        (F.col("cum_cost") > F.col("budget"))
        & (F.col("cum_cost") - F.col("cost") <= F.col("budget"))
    ).select(
        F.col("val").alias("f_val"),
        F.col("cost").alias("f_cost"),
        (F.col("cum_cost") - F.col("cost")).alias("before_cost"),
        (F.col("cum_val") - F.col("val")).alias("before_val"),
    )
    return (
        greedy.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(frontier))
        .select(
            "n_selected",
            "tokens_used",
            "budget",
            "value_selected",
            (
                F.col("before_val") * F.col("f_cost")
                + (F.col("budget") - F.col("before_cost")) * F.col("f_val")
            ).cast("long").alias("lp_bound_scaled"),
            F.col("f_cost").cast("long").alias("lp_scale"),
            (
                F.col("value_selected") * F.col("f_cost")
                >= F.col("before_val") * F.col("f_cost")
                + (F.col("budget") - F.col("before_cost")) * F.col("f_val")
                - F.col("f_val") * F.col("f_cost")
            ).cast("int").alias("within_one_item_of_opt"),
        )
    )


# KNN-Shapley data valuation: K neighbors, T held-out test points
# (vec_id < KSH_T is the test set; the rest of the corpus is the
# "training data" being valued). 1e12 fixed point: the recursion's
# smallest term is 1/(K*N) ~ 4e-4 at this SF, so micro12 keeps ~8
# significant digits of headroom under BIGINT suffix sums.
KSH_K = 5
KSH_T = 20
# candidate bound per test point (r12, VERDICT r11 #1): the valuation
# runs over each test point's EXACT top-M nearest training points
# instead of the full corpus, so per-test-point work is O(M log M)
# after one linear candidate scan — the truncation that makes the
# operator finish at 100 TB (values beyond rank M decay as 1/i).
KSH_M = 256
_KSH_SALT = 16  # stage-1 top-M salt buckets (T*SALT-way parallelism)
_KSH_SCALE = "1000000000000.0"


def _ksh_cos(qv: str, v: str) -> str:
    """Engine-common cosine text (the knn_brute_force discipline):
    Spark spells dot products via aggregate/zip_with lambdas, DuckDB
    via list_inner_product; both are sequential in-order folds over
    the same 64 doubles, proven hash-identical by every ANN oracle."""
    return (
        f"list_inner_product({qv}, {v}) / "
        f"(sqrt(list_inner_product({qv}, {qv})) * "
        f"sqrt(list_inner_product({v}, {v})))"
    )


@register(
    "knn_shapley_data_values",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings
               WHERE list_inner_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[]) > 0),
    q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv FROM e
          WHERE vec_id < {KSH_T}),
    tr AS (SELECT vec_id, label, v FROM e WHERE vec_id >= {KSH_T}),
    ranked AS (
      SELECT * FROM (
        SELECT q.q_id, tr.vec_id, tr.label,
               CASE WHEN tr.label = q.q_label THEN 1 ELSE 0 END AS eq,
               row_number() OVER (
                 PARTITION BY q.q_id
                 ORDER BY {_ksh_cos('q.qv', 'tr.v')} DESC, tr.vec_id) AS rn
        FROM q JOIN tr ON true
      ) WHERE rn <= {KSH_M}
    ),
    w AS (
      SELECT q_id, vec_id, label, rn, eq,
             lead(eq) OVER (PARTITION BY q_id ORDER BY rn) AS eqn,
             CAST(count(*) OVER (PARTITION BY q_id) AS BIGINT) AS n,
             max(CASE WHEN rn = cnt THEN eq END)
               OVER (PARTITION BY q_id) AS eq_last
      FROM (SELECT *, count(*) OVER (PARTITION BY q_id) AS cnt
            FROM ranked)
    ),
    d AS (
      SELECT q_id, vec_id, label, rn, n, eq_last,
             CASE WHEN eqn IS NULL THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor(((eq - eqn) * least({KSH_K}, rn)
                                   * {_KSH_SCALE})
                                  / ({KSH_K} * rn)) AS BIGINT)
             END AS d_micro
      FROM w
    ),
    s AS (
      SELECT q_id, vec_id, label,
             CAST(sum(d_micro) OVER (
               PARTITION BY q_id ORDER BY rn
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS BIGINT)
             + CAST(floor(eq_last * {_KSH_SCALE} / n) AS BIGINT)
             AS s_micro
      FROM d
    ),
    v AS (
      SELECT vec_id, label,
             CAST(sum(s_micro) AS BIGINT) AS shap_micro_sum
      FROM s GROUP BY vec_id, label
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(label AS INT) AS label,
           shap_micro_sum,
           round(shap_micro_sum / ({KSH_T} * {_KSH_SCALE}), 6) AS shap_value
    FROM v ORDER BY shap_micro_sum DESC, vec_id LIMIT 20
    """,
)
def knn_shapley_data_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-example data valuation for a K-NN surrogate classifier
    — KNN-Shapley (Jia et al., VLDB 2019, "Efficient Task-Specific
    Data Valuation for Nearest Neighbor Algorithms"): the Shapley
    value of every training point for a K-NN utility has the CLOSED
    FORM s_(N) = 1[y_(N)=y_t]/N, s_(i) = s_(i+1) +
    (1[y_(i)=y_t] - 1[y_(i+1)=y_t])/K * min(K,i)/i over the
    distance-sorted training points — which is a per-test-point SUFFIX
    SUM, so the "combinatorial" Shapley computation is two window
    functions, no sampling, no iteration. This is the data-selection
    complement to the heuristic curation tier (gopher rules, DSIR,
    SoftDeDup): it scores each example by its marginal contribution to
    held-out accuracy, the quantity the others approximate.

    Determinism: ranks tie-break on vec_id; each recursion term is a
    ratio of small exact integers evaluated in one correctly-rounded
    double division, floored to 1e-12 fixed point (the woe/hurst
    discipline), so every cross-row accumulation — the suffix sum and
    the per-point sum over test points — is an exact BIGINT sum of
    identical integers. Top-20 by exact integer total, vec_id
    tie-break.

    Scale shape (r12, VERDICT r11 #1): the valuation is BOUNDED — each
    test point values its exact top-M=256 nearest training points (the
    truncated KNN-Shapley; tail values decay as 1/i). T is bounded
    (T=20 broadcast), so candidate scoring is one linear map-side pass
    over the corpus; the top-M cut runs as salted two-stage row_number
    (T*16-way parallel local sorts of N/16, then one bounded <=16*M
    re-rank per test point), and every window after operates on <=M
    rows per test point. Per-test-point cost is O(M log M) after the
    linear scan — at 100 TB swap the stage-1 candidate generator for
    the IVF probe join (_ivf_neighbors); the suffix-sum algebra is
    agnostic to how candidates arrive. Property test pins the
    efficiency identity sum_j s_tj = (#label-matching top-K)/K per
    test point (K <= M, so truncation preserves it)."""
    from data_warehouse_data_mining_spark.functions import vectors as V

    e = load(spark, sf_dir).embeddings.select(
        "vec_id", "label", V.as_double(F.col("embedding")).alias("v")
    ).filter(V.dot(F.col("v"), F.col("v")) > 0)
    # zero-norm rows excluded (cosine undefined; Spark ANSI would
    # throw DIVIDE_BY_ZERO) — mirrored in the oracle's e CTE
    q = e.filter(F.col("vec_id") < KSH_T).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
    )
    tr = e.filter(F.col("vec_id") >= KSH_T)
    cos = V.dot(F.col("qv"), F.col("v")) / (
        F.sqrt(V.dot(F.col("qv"), F.col("qv")))
        * F.sqrt(V.dot(F.col("v"), F.col("v")))
    )
    wq = W.partitionBy("q_id")
    scored = (
        # broadcast-ok: q is bounded by KSH_T (literal id filter)
        tr.crossJoin(F.broadcast(q))
        .select(
            "q_id",
            "vec_id",
            "label",
            F.when(F.col("label") == F.col("q_label"), 1)
            .otherwise(0)
            .alias("eq"),
            cos.alias("cos"),
        )
    )
    # exact top-M per test point in two stages (the scalable top-k
    # shape): stage 1 ranks within (q_id, salt) — T*SALT-way parallel
    # sorts of N/SALT rows — stage 2 re-ranks the <= SALT*M survivors
    # per q_id. The final top-M by (cos desc, vec_id) is invariant to
    # the salting, so the oracle mirrors it with one rn <= M filter.
    w1 = W.partitionBy("q_id", "salt").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    ranked = (
        scored.withColumn(
            "salt", F.pmod(F.xxhash64("vec_id"), F.lit(_KSH_SALT))
        )
        .withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= KSH_M)
        .withColumn(
            "rn",
            F.row_number().over(
                wq.orderBy(F.col("cos").desc(), F.col("vec_id"))
            ),
        )
        .filter(F.col("rn") <= KSH_M)
        .drop("cos", "salt", "rn1")
    )
    w = ranked.select(
        "q_id",
        "vec_id",
        "label",
        "rn",
        "eq",
        F.lead("eq").over(wq.orderBy("rn")).alias("eqn"),
        F.count(F.lit(1)).over(wq).cast("long").alias("n"),
    ).withColumn(
        "eq_last",
        F.max(F.when(F.col("rn") == F.col("n"), F.col("eq"))).over(wq),
    )
    d = w.select(
        "q_id",
        "vec_id",
        "label",
        "rn",
        "n",
        "eq_last",
        F.when(F.col("eqn").isNull(), F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                f"CAST(floor(((eq - eqn) * least({KSH_K}, rn)"
                f" * {_KSH_SCALE}) / ({KSH_K} * rn)) AS BIGINT)"
            )
        )
        .alias("d_micro"),
    )
    s = d.select(
        "q_id",
        "vec_id",
        "label",
        (
            F.sum("d_micro")
            .over(
                wq.orderBy("rn").rowsBetween(0, W.unboundedFollowing)
            )
            .cast("long")
            + F.expr(
                f"CAST(floor(eq_last * {_KSH_SCALE} / n) AS BIGINT)"
            )
        ).alias("s_micro"),
    )
    return (
        s.groupBy("vec_id", "label")
        .agg(F.sum("s_micro").cast("long").alias("shap_micro_sum"))
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("label").cast("int").alias("label"),
            "shap_micro_sum",
            F.round(
                F.col("shap_micro_sum") / (KSH_T * 1_000_000_000_000.0), 6
            ).alias("shap_value"),
        )
        .orderBy(F.col("shap_micro_sum").desc(), "vec_id")
        .limit(20)
    )


WRS_K = 20  # weighted sample size
# 8-hex-char md5 word -> BIGINT (DuckDB has no conv(); house idiom)
_HEX8_DUCK = (
    "list_reduce(list_transform(range(1, 9), "
    "i -> CAST(strpos('0123456789abcdef', substr(m, CAST(i AS INT), 1)) - 1"
    " AS BIGINT)), (a, b) -> a * 16 + b)"
)


@register(
    "weighted_reservoir_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
             md5('wrs|' || CAST(doc_id AS VARCHAR)) AS m
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, w,
             CAST(floor(ln(({_HEX8_DUCK} + 0.5) / 4294967296.0) / w
                        * 1000000000 + 0.001) AS BIGINT) AS key_nano
      FROM d
    )
    SELECT doc_id, w AS weight_tokens, key_nano,
           CAST(row_number() OVER (ORDER BY key_nano DESC, doc_id)
                AS BIGINT) AS rn
    FROM keyed
    ORDER BY key_nano DESC, doc_id LIMIT {WRS_K}
    """,
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling (Efraimidis & Spirakis 2006,
    algorithm A-ES): each document draws key = u^(1/w) — here in the
    equivalent log form ln(u)/w — and the top-{WRS_K} keys are a
    without-replacement sample with inclusion probability proportional
    to token-count weight. The WEIGHTED member of the deterministic
    sampling tier (bernoulli / stratified / hash-split are unweighted;
    horvitz_thompson_total estimates FROM a weighted design — this
    DRAWS one): the standard single-pass way to sample a training
    corpus by length without a global shuffle.

    Determinism: u is the house md5 32-bit word; the one ln per row is
    ORDER-ONLY state and still floored to 1e-9 fixed point so both
    engines rank identical integers (cross-engine libm ulp differences
    cannot reorder near-ties), with doc_id as the total tie-break.

    Scale: one corpus scan -> per-row key -> distributed top-k
    (TakeOrdered); nothing shuffles the corpus and no state grows with
    it."""
    d = load(spark, sf_dir).documents
    keyed = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("w"),
        F.expr(
            "CAST(floor(ln((CAST(conv(substring(md5(concat('wrs|',"
            " CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) + 0.5)"
            " / 4294967296.0)"
            " / CAST(size(split(text, ' ')) AS BIGINT)"
            " * 1000000000 + 0.001) AS BIGINT)"
        ).alias("key_nano"),
    )
    wk = W.orderBy(F.col("key_nano").desc(), F.col("doc_id"))
    return (
        keyed.select(
            "doc_id",
            F.col("w").alias("weight_tokens"),
            "key_nano",
            F.row_number().over(wk).cast("long").alias("rn"),
        )
        .orderBy(F.col("key_nano").desc(), "doc_id")
        .limit(WRS_K)
    )
