"""Raw text-line ingestion with regex field extraction — the log-file
half of the ingest surface (access logs, syslog, crawler manifests).

``spark.read.text`` is the narrowest possible scan: one ``value``
string column, line-splittable at any file size, no parse work until a
projection asks for it. Field extraction happens in ``regexp_extract``
inside whole-stage codegen — no Python in the loop — and lines that
don't match the pattern are quarantined by a null-key filter in the
SAME scan, mirroring the JSONL corrupt-record contract
(sources/jsonl.py).

At 100 TB: text files split on line boundaries, so parallelism comes
free; the regex runs map-side; nothing shuffles until a downstream
aggregate. Compressed logs should be zstd/bzip2 (splittable) rather
than gzip (one task per file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Combined/common log format:  host - user [ts] "METHOD path proto" status bytes
COMBINED_LOG_PATTERN = (
    r'^(\S+) \S+ (\S+) \[([^\]]+)\] "(\S+) (\S+) [^"]*" (\d{3}) (\d+|-)$'
)


def read_text_log(
    spark: SparkSession, path: str, pattern: str = COMBINED_LOG_PATTERN
) -> DataFrame:
    """Parse a directory/file of log lines into typed columns.

    Returns every input line: matched lines carry extracted fields,
    unmatched lines carry nulls plus the raw line in ``raw`` — callers
    split them with ``parsed.filter(col("host").isNull())`` exactly like
    the JSONL quarantine path. One scan, zero UDFs.
    """
    lines = spark.read.text(path)
    ex = lambda g: F.regexp_extract(F.col("value"), pattern, g)  # noqa: E731
    return lines.select(
        F.nullif(ex(1), F.lit("")).alias("host"),
        F.nullif(ex(2), F.lit("")).alias("user"),
        F.to_timestamp(
            F.nullif(ex(3), F.lit("")), "dd/MMM/yyyy:HH:mm:ss Z"
        ).alias("ts"),
        F.nullif(ex(4), F.lit("")).alias("method"),
        F.nullif(ex(5), F.lit("")).alias("path"),
        F.nullif(ex(6), F.lit("")).cast("int").alias("status"),
        F.when(ex(7).rlike(r"^\d+$"), ex(7).cast("long")).alias("n_bytes"),
        F.col("value").alias("raw"),
    )


def status_rollup(parsed: DataFrame) -> DataFrame:
    """Per-status traffic rollup over parsed lines (unparsed excluded):
    the canonical first aggregation of any access-log pipeline."""
    return (
        parsed.filter(F.col("host").isNotNull())
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum(F.coalesce(F.col("n_bytes"), F.lit(0))).alias("total_bytes"),
            F.countDistinct("host").alias("n_hosts"),
        )
        .orderBy("status")
    )
