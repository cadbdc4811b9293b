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
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.registry import register


def misra_gries(df: DataFrame, key_col: str, capacity: int = 64) -> DataFrame:
    """Per-partition Misra-Gries summaries merged into global candidate
    counts: (key, est_count) with est_count <= true count and
    true - est <= n_total / capacity. One narrow pass + one tiny agg."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for k in pdf[key_col]:
                if k in counters:
                    counters[k] += 1
                elif len(counters) < capacity:
                    counters[k] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for kk in counters:
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        if counters:
            yield pd.DataFrame(
                {"key": list(counters), "partial": list(counters.values())}
            )

    key_type = dict(df.dtypes)[key_col]
    summaries = df.select(F.col(key_col)).mapInPandas(
        summarize, schema=f"key {key_type}, partial long"
    )
    return summaries.groupBy("key").agg(F.sum("partial").alias("est_count"))


@register("heavy_hitters_sketch")
def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent corpus tokens by Misra-Gries sketch (capacity 256)
    with the exact count joined on for the accuracy dial — token
    frequencies are the Zipf-skewed case the sketch exists for, and the
    LLM-pipeline question it answers ("which tokens dominate this
    corpus") over data whose vocabulary would not fit a groupBy state.
    Rows-only: the estimate depends on partition order; the containment
    guarantee is pinned by tests/test_generic_api.py instead."""
    from data_warehouse_data_mining_spark.operators.text import token_table

    tokens = token_table(load(spark, sf_dir).documents, "doc_id", "text")
    sketch = misra_gries(tokens, "w", capacity=256)
    exact = tokens.groupBy(F.col("w").alias("key")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return (
        sketch.join(exact, "key")
        .orderBy(F.col("exact_count").desc(), F.col("key"))
        .limit(20)
        .select("key", "est_count", "exact_count")
    )
