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

from pyspark.sql import Column, DataFrame, SparkSession
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
