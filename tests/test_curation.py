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


def test_gopher_expr_twin_equals_exploded_form(spark):
    """The registered census runs on the shuffle-free expression twin;
    this pins it bit-equal to the exploded/codegen yardstick on the
    real fixture corpus (and the census plan must carry exactly TWO
    exchanges — the source-key agg plus the ordered-output range
    partition; both move only |sources| rows, never tokens)."""
    d = curation.load(spark, SF_SMALL).documents
    a = curation.gopher_rule_flags(d, "doc_id", "text", ["source"])
    b = curation.gopher_rule_flags_expr(d, "doc_id", "text", ["source"]).drop(
        "n_words"
    )
    a = a.drop("n_words") if "n_words" in a.columns else a
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    import re

    plan = (
        curation.gopher_quality_rules(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = len(re.findall(r"\bExchange\b", plan))
    # exactly: hashpartitioning(source) for the agg + rangepartitioning
    # for the ordered output — a third would mean map-side combine or
    # the expression-twin shape regressed (ADVICE r8: the old <= 2
    # bound couldn't catch a regression that ADDED a shuffle)
    assert n_exchanges == 2, plan
    assert "Exchange hashpartitioning(source" in plan, plan
    assert "Generate" not in plan  # no token explode anywhere


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


def test_dsir_importance_weights_single_token_pass(spark):
    """r13 optimization pin: the importance-weight query tokenizes the
    corpus ONCE — the bucket ratios are re-aggregated from doc_buckets
    (not from a second token pass), per_bucket has a single consumer
    (totals via a bounded global window), and AQE exchange reuse
    collapses the ratio branch onto the scoring branch's shuffle. The
    AQE-final plan must therefore hold exactly one documents scan and
    at least one ReusedExchange."""
    from data_warehouse_data_mining_spark.plans import explain

    plan = explain.final_plan(
        curation.dsir_importance_weights(spark, SF_SMALL)
    )
    assert plan.count("Scan parquet") == 1, plan
    assert "ReusedExchange" in plan, plan


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


def test_curation_matches_python_mirror(spark, tmp_path):
    """Independent full-value check on a seeded RANDOM corpus (not the
    fixture parquet): gopher flags, dsir weights and softdedup sums are
    recomputed in pure Python from the same definitions and compared
    exactly. Catches any Spark-expression drift the fixed-oracle corpus
    might not exercise (empty docs, single-token docs, all-dup
    sources)."""
    import hashlib
    import math
    import random

    rng = random.Random(7)
    vocab = ["the", "a", "of", "data", "spark", "row", "x" * 25, "key",
             "value", "merge", "scan", "zz"]
    rows = []
    for i in range(120):
        src = f"s{rng.randrange(3)}"
        n = rng.choice([0, 1, 5, 45, 60])
        text = " ".join(rng.choice(vocab) for _ in range(n))
        rows.append((i, text, src))
    rows.append((120, "", "s0"))          # empty text -> one "" token
    rows.append((121, rows[0][1], "s1"))  # cross-source exact dup
    df = _docs(spark, rows)

    # --- python mirror -----------------------------------------------
    stop = set(curation.GOPHER_STOPWORDS)

    def toks(t):
        return t.split(" ")

    def flags(t):
        ws = toks(t)
        n, sl = len(ws), sum(len(w) for w in ws)
        return (
            not (curation.GOPHER_MIN_WORDS <= n <= curation.GOPHER_MAX_WORDS),
            sl < curation.GOPHER_MIN_MEAN_WORD_LEN * n
            or sl > curation.GOPHER_MAX_MEAN_WORD_LEN * n,
            sum(w in stop for w in ws) < curation.GOPHER_MIN_STOPWORD_HITS,
            max(len(w) for w in ws) > curation.GOPHER_MAX_WORD_LEN,
            len(set(ws)) * 100 < curation.GOPHER_MIN_TTR_PCT * n,
        )

    exp_gopher = {}
    for _i, t, s in rows:
        f = flags(t)
        g = exp_gopher.setdefault(s, [0] * 7)
        g[0] += 1
        for j in range(5):
            g[1 + j] += f[j]
        g[6] += not any(f)

    got_gopher = {
        r["source"]: [
            r["n_docs"], r["fail_word_count"], r["fail_mean_word_len"],
            r["fail_stopwords"], r["fail_max_word_len"], r["fail_ttr"],
            r["n_pass_all"],
        ]
        for r in curation.gopher_rule_flags(df, "doc_id", "text", ["source"])
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.sum(F.col(c).cast("int")).alias(c)
                for c in (
                    "fail_word_count", "fail_mean_word_len", "fail_stopwords",
                    "fail_max_word_len", "fail_ttr",
                )
            ],
            F.sum(F.col("pass_all").cast("int")).alias("n_pass_all"),
        )
        .collect()
    }
    assert got_gopher == exp_gopher

    # --- dsir mirror ---------------------------------------------------
    B = curation.DSIR_BUCKETS

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % B

    ct, cr = [0] * B, [0] * B
    for _i, t, s in rows:
        for w in toks(t):
            b = bucket(w)
            cr[b] += 1
            if s == "s0":
                ct[b] += 1
    nt, nr = sum(ct), sum(cr)
    ratio = [
        math.floor(
            (math.log(2 * ct[b] + 1) - math.log(2 * nt + B)
             - math.log(2 * cr[b] + 1) + math.log(2 * nr + B)) * 1_000_000
        )
        for b in range(B)
    ]
    exp_w = {
        i: sum(ratio[bucket(w)] for w in toks(t)) for i, t, _s in rows
    }
    toks_df = curation.token_table(df, "doc_id", "text", ["source"])
    ratios = curation.dsir_bucket_logratios(toks_df, F.col("source") == "s0")
    got_w = {
        r["id"]: r["w"]
        for r in curation.dsir_doc_buckets(toks_df, [])
        .join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * F.col("ratio_micro")).alias("w"))
        .collect()
    }
    assert got_w == exp_w

    # --- softdedup mirror ----------------------------------------------
    from collections import Counter

    cnt = Counter(t for _i, t, _s in rows)
    exp_soft = {}
    for _i, t, s in rows:
        g = exp_soft.setdefault(s, [0, 0, 0])
        g[0] += 1
        g[1] += cnt[t] > 1
        g[2] += 1_000_000 // cnt[t]
    fp = df.select("doc_id", "source", F.md5("text").alias("f"))
    grp = fp.groupBy("f").agg(F.count(F.lit(1)).alias("c"))
    got_soft = {
        r["source"]: [r["n"], r["d"], r["e"]]
        for r in fp.join(grp, "f")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("d"),
            F.sum(F.floor(1_000_000 / F.col("c")).cast("bigint")).alias("e"),
        )
        .collect()
    }
    assert got_soft == exp_soft


def test_ngram_novelty_invariants(spark):
    """Novel counts partition the shingle vocabulary: sum(novel) ==
    total distinct shingles, cumulative coverage ends at exactly 100%,
    the lexicographically-first source's shingles are all novel, and
    no source contributes more novel shingles than it contains."""
    rows = curation.ngram_novelty_by_source(spark, SF_SMALL).collect()
    assert rows == sorted(rows, key=lambda r: r["source"])
    assert rows[0]["novel_ngrams"] == rows[0]["distinct_ngrams"]
    total_novel = sum(r["novel_ngrams"] for r in rows)
    assert rows[-1]["cum_novel"] == total_novel
    assert rows[-1]["cum_coverage_pct"] == 100.0
    for r in rows:
        assert 0 <= r["novel_ngrams"] <= r["distinct_ngrams"]


def test_shapley_efficiency_and_symmetry_axioms(spark):
    """Shapley's efficiency axiom: the three attributions must sum
    EXACTLY (in sixths) to the grand-coalition removal count — which
    equals the ablation matrix's total 'drop' docs; each phi lies in
    [0, v(N)]."""
    from data_warehouse_data_mining_spark.operators.text import (
        filter_shapley_attribution,
        quality_filter_ablation,
    )

    rows = filter_shapley_attribution(spark, SF_SMALL).collect()
    assert len(rows) == 3
    dropped = sum(
        r["n_docs"]
        for r in quality_filter_ablation(spark, SF_SMALL).collect()
        if r["verdict"] == "drop"
    )
    assert sum(r["shapley_sixths"] for r in rows) == 6 * dropped
    for r in rows:
        assert 0 <= r["shapley_sixths"] <= 6 * dropped
        assert 0 <= r["solo_removed"] <= dropped


def test_naive_bayes_confusion_partitions_test_set(spark, duck):
    """The confusion matrix must partition the held-out docs exactly
    (sum of cells == #docs with doc_id%5==0), predict only trained
    languages, and be deterministic across invocations."""
    rows = sorted(
        tuple(r) for r in curation.naive_bayes_langid(spark, SF_SMALL).collect()
    )
    n_test = duck.execute(
        "SELECT count(*) FROM documents WHERE doc_id % 5 = 0"
    ).fetchone()[0]
    assert sum(n for _, _, n in rows) == n_test
    langs = {
        l
        for (l,) in duck.execute(
            "SELECT DISTINCT lang FROM documents WHERE doc_id % 5 <> 0"
        ).fetchall()
    }
    assert {p for _, p, _ in rows} <= langs
    again = sorted(
        tuple(r) for r in curation.naive_bayes_langid(spark, SF_SMALL).collect()
    )
    assert rows == again


def test_token_js_matrix_symmetric_bounded(spark):
    """JS divergence invariants: nonnegative, bounded by ln 2, distinct
    ordered pairs, sorted most-divergent-first."""
    import math

    rows = curation.token_js_divergence_matrix(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    vals = [r["js_nats"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert -1e-4 <= r["js_nats"] <= math.log(2) + 1e-6


def test_fd_audit_known_verdicts(spark):
    """n_name -> n_regionkey must hold (n_name is a key); every row's
    violation count is consistent with its holds bit and bounded by
    the group count."""
    from data_warehouse_data_mining_spark.operators.quality import (
        functional_dependency_audit,
    )

    rows = {
        (r["table_name"], r["lhs"], r["rhs"]): r
        for r in functional_dependency_audit(spark, SF_SMALL).collect()
    }
    assert rows[("nation", "n_name", "n_regionkey")]["holds"] == 1
    for r in rows.values():
        assert (r["holds"] == 1) == (r["n_violating"] == 0)
        assert 0 <= r["n_violating"] <= r["n_lhs_groups"]
        assert r["max_rhs_card"] >= 1


def test_prefix_filter_is_lossless_on_small_corpus(spark):
    """Prefix filtering must be COMPLETE: on a hand-built corpus the
    filtered join returns exactly the brute-force threshold pairs,
    including a pair that only collides on its rarest (prefix) token."""
    from data_warehouse_data_mining_spark.operators import dedup as D
    from pyspark.sql import functions as F

    # The registered builder reads sf_dir; completeness on real data is
    # what the oracle hash proves. Here: pin the prefix-length identity.
    for sz, plen in [(1, 1), (2, 2), (3, 2), (4, 3), (5, 3), (10, 6)]:
        want = sz - -(-sz // 2) + 1  # sz - ceil(sz/2) + 1
        assert want == plen


def test_prefix_filter_single_tokenize_pass(spark):
    """r13 optimization pin: the PPJoin main job tokenizes the corpus
    ONCE — |doc| comes from a window count over the same id partition
    the row_number/signature windows shuffle for (no sizes groupBy +
    join), and the verification arrays are built from the same window
    output, so AQE exchange reuse feeds prefix, candidate and verify
    branches from one tokenize pass. AQE-final plan: exactly one
    documents scan (the vocab rank is a separate bounded checkpoint
    job) and ReusedExchange present."""
    from data_warehouse_data_mining_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )
    from data_warehouse_data_mining_spark.plans import explain

    plan = explain.final_plan(prefix_filter_jaccard_pairs(spark, SF_SMALL))
    assert plan.count("Scan parquet") == 1, plan
    assert "ReusedExchange" in plan, plan


def test_prefix_filter_pairs_meet_threshold(spark):
    """Every emitted pair satisfies the exact integer threshold
    3*inter >= |A|+|B| (jaccard >= 1/2), and rows arrive sorted by
    jaccard descending with full tie-breaks."""
    from data_warehouse_data_mining_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    rows = prefix_filter_jaccard_pairs(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 500
    keys = [(-r["jaccard"], r["id_a"], r["id_b"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert 3 * r["inter"] >= r["size_a"] + r["size_b"]
        assert r["jaccard"] >= 0.5 - 1e-9


def test_knn_shapley_efficiency_identity(spark):
    """The KNN-Shapley closed form must satisfy the efficiency axiom
    per test point: sum over ALL training points of s_tj equals the
    utility of the full training set, i.e. (# of the K nearest
    neighbors whose label matches y_t) / K. Recomputed here from the
    UN-truncated per-(test, train) table (the registered query emits
    the top-20 aggregate); tolerance is N floor-errors of 1e-12."""
    from data_warehouse_data_mining_spark.functions import vectors as V
    from data_warehouse_data_mining_spark.operators.curation import (
        KSH_K,
        KSH_T,
    )
    from pyspark.sql import Window as W

    from data_warehouse_data_mining_spark.catalog import load

    e = load(spark, SF_SMALL).embeddings.select(
        "vec_id", "label", V.as_double(F.col("embedding")).alias("v")
    )
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
    ranked = (
        tr.crossJoin(F.broadcast(q))  # broadcast-ok: KSH_T-row test set
        .select(
            "q_id",
            F.when(F.col("label") == F.col("q_label"), 1)
            .otherwise(0)
            .alias("eq"),
            cos.alias("cos"),
            "vec_id",
        )
        .withColumn(
            "rn",
            F.row_number().over(
                wq.orderBy(F.col("cos").desc(), F.col("vec_id"))
            ),
        )
    )
    per_test = {
        r["q_id"]: r
        for r in ranked.groupBy("q_id")
        .agg(
            F.sum(F.when(F.col("rn") <= KSH_K, F.col("eq"))).alias("topk_eq"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    # replicate the fixed-point recursion in Python per test point
    rows = ranked.select("q_id", "rn", "eq").collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["q_id"], {})[r["rn"]] = r["eq"]
    import math

    for q_id, eqs in by_q.items():
        n = len(eqs)
        s = [0] * (n + 2)
        s[n] = math.floor(eqs[n] * 1e12 / n)
        for i in range(n - 1, 0, -1):
            d = math.floor(
                ((eqs[i] - eqs[i + 1]) * min(KSH_K, i) * 1e12) / (KSH_K * i)
            )
            s[i] = s[i + 1] + d
        total = sum(s[1 : n + 1]) / 1e12
        expect = per_test[q_id]["topk_eq"] / KSH_K
        # s_i carries up to (n-i) accumulated 1e-12 floor errors, so the
        # efficiency total accumulates O(n^2/2) of them
        assert abs(total - expect) <= n * n * 1e-12 + 1e-9, (
            q_id,
            total,
            expect,
        )


def test_knn_shapley_registered_output_shape(spark):
    from data_warehouse_data_mining_spark.operators.curation import (
        knn_shapley_data_values,
    )

    rows = knn_shapley_data_values(spark, SF_SMALL).collect()
    assert len(rows) == 20
    sums = [r["shap_micro_sum"] for r in rows]
    assert sums == sorted(sums, reverse=True)
    # top-valued points must be positive contributors
    assert sums[0] > 0
    for r in rows:
        # shap_value is round(.., 6) of the exact micro12 ratio
        assert abs(r["shap_value"] - r["shap_micro_sum"] / 2e13) <= 5e-7


def test_knn_shapley_topm_invariant_to_salting(spark):
    """The r12 top-M candidate cut is computed through a salted
    two-stage row_number; the FINAL top-M by (cos desc, vec_id) must be
    invariant to the salt fan-out. Pin: the registered query's result
    equals a single-window (unsalted) reference computation."""
    from pyspark.sql import Window as W

    from data_warehouse_data_mining_spark.catalog import load
    from data_warehouse_data_mining_spark.functions import vectors as V
    from data_warehouse_data_mining_spark.operators.curation import (
        KSH_K,
        KSH_M,
        KSH_T,
        _KSH_SCALE,
        knn_shapley_data_values,
    )

    got = [tuple(r) for r in knn_shapley_data_values(spark, SF_SMALL).collect()]

    e = load(spark, SF_SMALL).embeddings.select(
        "vec_id", "label", V.as_double(F.col("embedding")).alias("v")
    )
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
    ranked = (
        tr.crossJoin(F.broadcast(q))
        .select(
            "q_id",
            "vec_id",
            "label",
            F.when(F.col("label") == F.col("q_label"), 1).otherwise(0).alias("eq"),
            cos.alias("cos"),
        )
        .withColumn(
            "rn",
            F.row_number().over(wq.orderBy(F.col("cos").desc(), F.col("vec_id"))),
        )
        .filter(F.col("rn") <= KSH_M)
        .drop("cos")
    )
    w = ranked.select(
        "q_id", "vec_id", "label", "rn", "eq",
        F.lead("eq").over(wq.orderBy("rn")).alias("eqn"),
        F.count(F.lit(1)).over(wq).cast("long").alias("n"),
    ).withColumn(
        "eq_last",
        F.max(F.when(F.col("rn") == F.col("n"), F.col("eq"))).over(wq),
    )
    d = w.select(
        "q_id", "vec_id", "label", "rn", "n", "eq_last",
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
        "q_id", "vec_id", "label",
        (
            F.sum("d_micro")
            .over(wq.orderBy("rn").rowsBetween(0, W.unboundedFollowing))
            .cast("long")
            + F.expr(f"CAST(floor(eq_last * {_KSH_SCALE} / n) AS BIGINT)")
        ).alias("s_micro"),
    )
    want = [
        tuple(r)
        for r in s.groupBy("vec_id", "label")
        .agg(F.sum("s_micro").cast("long").alias("shap_micro_sum"))
        .select(
            F.col("vec_id").cast("long"),
            F.col("label").cast("int"),
            "shap_micro_sum",
            F.round(F.col("shap_micro_sum") / (KSH_T * 1e12), 6).alias("shap_value"),
        )
        .orderBy(F.col("shap_micro_sum").desc(), "vec_id")
        .limit(20)
        .collect()
    ]
    assert got == want


def test_pq_code_udf_matches_expression_argmin(spark):
    """The Arrow-vectorized coder (r12) must agree with the codegen
    expression fold it replaced: same argmin cells, same first-index
    tie rule, on the real sf0.001 embeddings."""
    from data_warehouse_data_mining_spark.catalog import load
    from data_warehouse_data_mining_spark.functions import vectors as V
    from data_warehouse_data_mining_spark.operators import similarity as S

    coarse = S._pq_codebooks(spark, SF_SMALL, "ivf", 1, S.DIM, S.IVF_NLIST)[0]
    e = load(spark, SF_SMALL).embeddings.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v")
    )
    both = e.select(
        "vec_id",
        S._argmin_center(F.col("v"), coarse).alias("cell_expr"),
        F.element_at(
            S._pq_code_udf([], S.DIM, coarse=coarse)(F.col("v")), 1
        ).alias("cell_udf"),
    )
    bad = both.filter(F.col("cell_expr") != F.col("cell_udf")).count()
    assert bad == 0


def test_lloyd_pp_is_deterministic_and_shaped():
    """Driver-side codebook fit (r12): same input + seed => identical
    centers; k is clamped to n; centers live in the data's range."""
    import numpy as np

    from data_warehouse_data_mining_spark.operators.similarity import _lloyd_pp

    rng = np.random.RandomState(7)
    x = rng.rand(200, 8)
    a = _lloyd_pp(x, 16, seed=42)
    b = _lloyd_pp(x, 16, seed=42)
    assert a.shape == (16, 8)
    assert np.array_equal(a, b)
    c = _lloyd_pp(x, 16, seed=43)
    assert not np.array_equal(a, c)
    tiny = _lloyd_pp(x[:5], 16, seed=42)
    assert tiny.shape == (5, 8)
    assert a.min() >= x.min() - 1e-12 and a.max() <= x.max() + 1e-12
