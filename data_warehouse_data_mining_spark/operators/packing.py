"""Sequence packing for LLM pre-training data layout.

Pre-training consumes fixed-length token blocks: documents are
concatenated in a deterministic stream order and the stream is cut
every ``block_tokens`` tokens (documents straddle cuts). These
operators compute, entirely with window cumsums — no Python, no
collect — which block each document starts in and how full each
shard's stream is.

Scale shape: the only ordering is a window PARTITIONED by the shard
columns (here lang × source), so each task sorts one shard locally —
there is no global sort or single-partition window. At 100 TB the
caller passes finer shard keys (e.g. date × source × bucket) so every
shard fits a task; the assignment is then one shuffle by shard key.
The reference has no packing surface; semantics follow the standard
GPT-style concat-and-cut layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.registry import register

BLOCK_TOKENS = 256


def pack_assignments(
    docs: DataFrame,
    shard_cols: list[str],
    order_col: str,
    text_col: str = "text",
    block_tokens: int = BLOCK_TOKENS,
) -> DataFrame:
    """Per-document packing coordinates: tokens are whitespace pieces
    (matching text.token_table), ``stream_offset`` is the exclusive
    cumsum of tokens within the shard stream, ``block_id`` the
    fixed-size block the document starts in."""
    w = W.partitionBy(*shard_cols).orderBy(order_col)
    n = F.size(F.split(F.col(text_col), " "))
    return (
        docs.select(*shard_cols, order_col, n.alias("n_tokens"))
        .withColumn(
            "stream_offset",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("block_id", F.floor(F.col("stream_offset") / block_tokens))
        .withColumn(
            "offset_in_block", F.col("stream_offset") % block_tokens
        )
    )


@register(
    "pack_training_sequences",
    oracle=f"""
    SELECT lang, source, doc_id, n_tokens, stream_offset,
           CAST(floor(stream_offset / {BLOCK_TOKENS}) AS BIGINT) AS block_id,
           CAST(stream_offset % {BLOCK_TOKENS} AS BIGINT) AS offset_in_block
    FROM (
      SELECT lang, source, doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(coalesce(sum(len(string_split(text, ' '))) OVER (
               PARTITION BY lang, source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS stream_offset
      FROM documents
    )
    ORDER BY lang, source, doc_id
    """,
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut packing of the documents corpus into
    256-token training blocks, sharded by lang × source with doc_id as
    the deterministic stream order. Returns each document's block id
    and offset — the metadata a downstream tokenizer-writer needs to
    emit fixed-length sequences without materializing the concatenated
    text."""
    d = load(spark, sf_dir).documents
    out = pack_assignments(d, ["lang", "source"], "doc_id")
    return out.select(
        "lang", "source", "doc_id", "n_tokens", "stream_offset",
        "block_id", "offset_in_block",
    ).orderBy("lang", "source", "doc_id")


TOKEN_BUDGET = 1_000_000


@register(
    "token_budget_allocation",
    oracle=f"""
    WITH shard AS (
      SELECT lang, source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
      FROM documents GROUP BY lang, source
    ),
    tot AS (SELECT CAST(sum(avail) AS BIGINT) AS t FROM shard),
    base AS (
      SELECT lang, source, avail,
             CAST(({TOKEN_BUDGET} * avail) // t AS BIGINT) AS alloc0,
             CAST(({TOKEN_BUDGET} * avail) % t AS BIGINT) AS rem
      FROM shard, tot
    ),
    leftover AS (
      SELECT CAST({TOKEN_BUDGET} - sum(alloc0) AS BIGINT) AS r FROM base
    ),
    ranked AS (
      SELECT lang, source, avail, alloc0,
             row_number() OVER (ORDER BY rem DESC, lang, source) AS rk
      FROM base
    )
    SELECT lang, source, avail AS available_tokens,
           CAST(alloc0 + CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_tokens
    FROM ranked, leftover
    ORDER BY lang, source
    """,
)
def token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate a global training-token budget across lang × source
    shards proportionally to available tokens, using the
    largest-remainder method so the integer allocations sum EXACTLY to
    the budget — the sampling-plan step between corpus stats and the
    tokenize/pack stage, and deterministic (pure integer arithmetic, no
    RNG) so every engine and re-run produces the same plan.

    Scale shape: one corpus scan aggregates to |lang × source| rows;
    everything after (total, floor allocations, remainder ranking) runs
    on that bounded shard table — the only window ranks ~dozens of
    rows, never the corpus."""
    d = load(spark, sf_dir).documents
    n = F.size(F.split("text", " "))
    shard = (
        d.select("lang", "source", n.alias("n"))
        .groupBy("lang", "source")
        .agg(F.sum("n").alias("avail"))
    )
    tot = shard.agg(F.sum("avail").alias("t"))
    base = shard.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "avail",
        F.expr(f"({TOKEN_BUDGET} * avail) div t").alias("alloc0"),
        (F.lit(TOKEN_BUDGET) * F.col("avail") % F.col("t")).alias("rem"),
    )
    leftover = base.agg((F.lit(TOKEN_BUDGET) - F.sum("alloc0")).alias("r"))
    ranked = base.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy().orderBy(F.col("rem").desc(), "lang", "source")
        ),
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "lang",
            "source",
            F.col("avail").alias("available_tokens"),
            (
                F.col("alloc0")
                + F.when(F.col("rk") <= F.col("r"), 1).otherwise(0)
            ).alias("alloc_tokens"),
        )
        .orderBy("lang", "source")
    )


@register(
    "pack_shard_summary",
    oracle=f"""
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(ceil(sum(n_tokens) / {BLOCK_TOKENS}.0) AS BIGINT) AS n_blocks,
           CAST(ceil(sum(n_tokens) / {BLOCK_TOKENS}.0) * {BLOCK_TOKENS}
                - sum(n_tokens) AS BIGINT) AS tail_padding
    FROM (SELECT lang, source, len(string_split(text, ' ')) AS n_tokens
          FROM documents)
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def pack_shard_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-level packing plan: token totals, full 256-token block
    count, and tail padding per lang × source shard — the numbers a
    scheduler uses to balance shards before the (heavier) tokenize
    stage. One scan, one hash aggregation; no window needed."""
    d = load(spark, sf_dir).documents
    n = F.size(F.split("text", " "))
    return (
        d.select("lang", "source", n.alias("n_tokens"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.ceil(F.sum("n_tokens") / float(BLOCK_TOKENS)).alias("n_blocks"),
            (
                F.ceil(F.sum("n_tokens") / float(BLOCK_TOKENS)) * BLOCK_TOKENS
                - F.sum("n_tokens")
            ).alias("tail_padding"),
        )
        .orderBy("lang", "source")
    )


@register(
    "curriculum_order_manifest",
    oracle="""
    WITH shard AS (
      SELECT source, lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
               AS shard_tokens
      FROM documents GROUP BY source, lang
    ),
    ranked AS (
      SELECT source, lang, n_docs, shard_tokens,
             CAST((shard_tokens * 1000) // n_docs AS BIGINT) AS difficulty_fp,
             row_number() OVER (
               ORDER BY (shard_tokens * 1000) // n_docs ASC,
                        source || '|' || lang ASC) AS position,
             CAST(sum(shard_tokens) OVER (
               ORDER BY (shard_tokens * 1000) // n_docs ASC,
                        source || '|' || lang ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM shard
    )
    SELECT CAST(position AS BIGINT) AS position, source, lang, n_docs,
           shard_tokens, difficulty_fp, cum_tokens
    FROM ranked
    ORDER BY position
    """,
)
def curriculum_order_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning shard order: (source, lang) training shards
    sorted easiest-first by mean document length (integer fixed-point
    tokens/doc), with the cumulative token count that tells the trainer
    where each curriculum phase boundary lands.

    The ordering is a GLOBAL rank + running total over every shard —
    at 100 TB shard manifests reach millions of rows (per-day × per-
    source × per-lang), so the rank comes from the distributed
    two-phase prefix sum (operators/ranking.py), not a single-partition
    window; the oracle keeps the textbook one-window SQL. Difficulty
    ties break on the shard key so both engines emit one canonical
    order."""
    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
    )

    docs = load(spark, sf_dir).documents
    shard = (
        docs.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " ")).cast("long"))
            .cast("long")
            .alias("shard_tokens"),
        )
        .select(
            "*",
            F.expr("CAST((shard_tokens * 1000) div n_docs AS BIGINT)").alias(
                "difficulty_fp"
            ),
            F.concat_ws("|", "source", "lang").alias("__key"),
        )
        # manifest-sized; ranking branches share it
        .localCheckpoint(eager=True)
    )
    ranked = global_order_stats(
        shard,
        "difficulty_fp",
        "__key",
        measure_col="shard_tokens",
        ascending=True,
    )
    return (
        ranked.select(
            F.col("global_rank").alias("position"),
            "source",
            "lang",
            "n_docs",
            "shard_tokens",
            "difficulty_fp",
            F.col("global_cum").alias("cum_tokens"),
        )
        .orderBy("position")
    )
