"""Unit tests for operators/curation.py — the Gopher/DSIR/SoftDeDup
curation stage. Oracle parity at both SFs is covered by the sweep
(tools/driver_sweep.py); these pin the library semantics on small
in-memory corpora and the plan shapes that make the operators scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.operators import curation

from .conftest import SF_SMALL


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_gopher_rule_flags_bits(spark):
    long_ok = "the a " + " ".join(f"w{i:03d}" for i in range(60))
    rows = [
        (1, long_ok, "s"),  # passes everything
        (2, "the a short doc", "s"),  # fails word-count (4 < 40)
        (3, " ".join(["x" * 25] * 50) + " the a", "s"),  # max word len 25
        (4, " ".join(["dup"] * 60) + " the a", "s"),  # TTR 3/62 < 0.2
        (5, long_ok.replace("the a ", "zz yy "), "s"),  # no stopwords
    ]
    flags = {
        r["id"]: r
        for r in curation.gopher_rule_flags(
            _docs(spark, rows), "doc_id", "text"
        ).collect()
    }
    assert flags[1]["pass_all"]
    assert flags[2]["fail_word_count"] and not flags[2]["pass_all"]
    assert flags[3]["fail_max_word_len"]
    assert flags[4]["fail_ttr"]
    assert flags[5]["fail_stopwords"]
    # mean-word-length bound is an exact integer test: 60 one-char words
    # has mean 1 < 3
    one_char = _docs(spark, [(9, "the a " + " ".join(["x"] * 60), "s")])
    r9 = curation.gopher_rule_flags(one_char, "doc_id", "text").collect()[0]
    assert r9["fail_mean_word_len"]


def test_dsir_ratio_table_is_bounded_and_broadcast(spark):
    """The bucket-ratio side must stay DSIR_BUCKETS rows (broadcastable
    at any corpus size) and the doc-score join must broadcast it, never
    shuffle the token-derived side."""
    ratios = curation.dsir_bucket_logratios(
        curation.token_table(
            curation.load(spark, SF_SMALL).documents, "doc_id", "text", ["source"]
        ),
        F.col("source") == curation.DSIR_TARGET_SOURCE,
    )
    assert ratios.count() <= curation.DSIR_BUCKETS
    plan = (
        curation.dsir_importance_weights(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dsir_target_docs_score_higher(spark):
    """Model behavior: documents FROM the target domain must score
    higher on average than the pool — the whole point of importance
    resampling. Uses a corpus where the target source has a distinct
    vocabulary."""
    rows = [(i, "alpha beta gamma delta", "tgt") for i in range(10)] + [
        (100 + i, "one two three four", "raw") for i in range(30)
    ]
    toks = curation.token_table(_docs(spark, rows), "doc_id", "text", ["source"])
    db = curation.dsir_doc_buckets(toks, ["source"])
    ratios = curation.dsir_bucket_logratios(toks, F.col("source") == "tgt")
    scored = (
        db.join(ratios, "bucket")
        .groupBy("id", "source")
        .agg(F.sum(F.col("cnt") * F.col("ratio_micro")).alias("w"))
        .groupBy("source")
        .agg(F.avg("w").alias("mean_w"))
    )
    means = {r["source"]: r["mean_w"] for r in scored.collect()}
    assert means["tgt"] > means["raw"]


def test_softdedup_effective_size(spark):
    """3 copies of one doc weigh floor(1e6/3) each; uniques weigh 1e6."""
    rows = [(1, "same text", "a"), (2, "same text", "a"), (3, "same text", "b"),
            (4, "unique one", "a"), (5, "unique two", "b")]
    # the registered query reads the catalog; test the math inline
    fp = _docs(spark, rows).select(
        "doc_id", "source", F.md5("text").alias("f")
    )
    grp = fp.groupBy("f").agg(F.count(F.lit(1)).alias("c"))
    w = F.floor(1_000_000 / F.col("c")).cast("bigint")
    got = {
        r["source"]: (r["n"], r["eff"])
        for r in fp.join(grp, "f")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(w).alias("eff"))
        .collect()
    }
    # source a: two 1/3-weight copies + one unique = 2*333333 + 1000000
    assert got["a"] == (3, 2 * 333_333 + 1_000_000)
    # source b: one 1/3-weight copy + one unique
    assert got["b"] == (2, 333_333 + 1_000_000)


def test_gopher_census_sums_to_doc_count(spark):
    out = curation.gopher_quality_rules(spark, SF_SMALL)
    rows = out.collect()
    d = curation.load(spark, SF_SMALL).documents
    assert sum(r["n_docs"] for r in rows) == d.count()
    for r in rows:
        assert 0 <= r["n_pass_all"] <= r["n_docs"]
