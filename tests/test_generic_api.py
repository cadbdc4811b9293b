"""The dedup/similarity operators are generic library functions — prove
they work on arbitrary user DataFrames (not just the testdata tables),
with planted ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.operators import dedup, similarity


def test_exact_duplicates_generic(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "something else")],
        "pk long, body string",
    )
    out = {r.keep_id: r.n_copies for r in
           dedup.exact_duplicates(df, "pk", "body").collect()}
    assert out == {1: 2, 3: 1}


def test_near_duplicate_pairs_generic(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different text with no overlap whatsoever in any shingle run"
    df = spark.createDataFrame(
        [(10, base), (20, near), (30, far)], "pk long, body string"
    )
    pairs = dedup.near_duplicate_pairs(
        df, "pk", "body", threshold=0.3, num_hashes=16, bands=8, rows_per_band=2
    ).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(10, 20)]
    assert 0.5 < pairs[0].jaccard < 1.0


def test_simhash_generic_identical_texts_collide(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "delta epsilon zeta")],
        "pk long, body string",
    )
    hashes = {r.id: r.simhash for r in dedup.simhash_table(df, "pk", "body").collect()}
    assert hashes[1] == hashes[2]  # order-invariant
    assert hashes[1] != hashes[3]


def test_brute_force_topk_generic(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    q = df.filter(F.col("id") == 0).select(
        F.col("id").alias("q_id"), F.col("v").alias("qv")
    )
    out = similarity.brute_force_topk(df, q, k=3)
    ranked = [r.neighbor_id for r in out.orderBy("rn").collect()]
    assert ranked == [1, 2, 3]


def test_hard_negatives_generic(spark):
    """Negatives never share the anchor's label, rank by cosine, and the
    anchor side is broadcast so the corpus never shuffles."""
    rows = [
        (0, 0, [1.0, 0.0, 0.0]),   # anchor, label 0
        (1, 0, [0.99, 0.14, 0.0]),  # same label: excluded
        (2, 1, [0.9, 0.1, 0.0]),   # cross-label, closest -> rn 1
        (3, 1, [0.0, 1.0, 0.0]),   # cross-label, orthogonal-ish
        (4, 1, [-1.0, 0.0, 0.0]),  # cross-label, opposite
    ]
    df = spark.createDataFrame(rows, "id long, label int, v array<double>")
    planes = similarity.random_hyperplanes(4, 3)
    out = similarity.hard_negatives(
        df, F.col("id") == 0, planes, k=3
    ).orderBy("rn")
    got = [(r.negative_id, r.negative_label) for r in out.collect()]
    assert all(lbl != 0 for _, lbl in got)
    assert got and got[0][0] == 2  # hardest negative first
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_blocked_cosine_pairs_generic(spark):
    rows = [
        (0, 0, [1.0, 0.0]),
        (1, 0, [0.99, 0.14]),   # same block, similar -> pair
        (2, 1, [1.0, 0.0]),     # other block: never compared to 0
        (3, 0, [0.0, 1.0]),     # same block, dissimilar
    ]
    df = spark.createDataFrame(rows, "id long, blk int, v array<double>")
    pairs = similarity.blocked_cosine_pairs(df, "blk", 0.9).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]


def test_text_generic_api(spark):
    from data_warehouse_data_mining_spark.operators.text import (
        fingerprint_expr,
        quality_scores,
        token_stats,
        token_table,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "the the the gamma")],
        "pk long, body string",
    )
    toks = token_table(df, "pk", "body")
    stats = {r.id: (r.n_tokens, r.n_distinct) for r in token_stats(toks).collect()}
    assert stats == {1: (3, 2), 2: (4, 2)}

    q = {r.id: r.stopword_ratio for r in quality_scores(toks).collect()}
    assert q[2] == 0.75  # three 'the' of four tokens

    fp = {r.pk: r.f for r in df.select("pk", fingerprint_expr(F.col("body")).alias("f")).collect()}
    # same token set ignoring order/repetition -> same fingerprint
    df2 = spark.createDataFrame([(3, "beta alpha")], "pk long, body string")
    fp3 = df2.select(fingerprint_expr(F.col("body")).alias("f")).collect()[0].f
    assert fp[1] == fp3


def test_misra_gries_heavy_hitter_guarantee(spark):
    """Every key with true frequency > n/capacity must survive the
    sketch, and every estimate must be a lower bound on the true count
    within n/capacity — the Misra-Gries contract, on skewed data."""
    from data_warehouse_data_mining_spark.operators.sketches import misra_gries

    rows = [(k,) for k in ["hot"] * 500 + ["warm"] * 200 +
            [f"cold{i}" for i in range(300)]]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    n, capacity = 1000, 16
    est = {r.key: r.est_count for r in misra_gries(df, "k", capacity).collect()}
    exact = {r.k: r.n for r in
             df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    bound = n / capacity  # global error bound: undercount <= n/capacity
    for key in ("hot", "warm"):  # true count > bound -> must survive
        assert key in est
    for key, e in est.items():
        assert e <= exact[key] and exact[key] - e <= bound


def test_hll_mergeable_estimate_accuracy(spark):
    """Unioned per-day HLL sketches must estimate distinct users within
    5% of exact — the bound that makes the mergeable pre-aggregation
    usable as a serving table."""
    from data_warehouse_data_mining_spark.catalog import load
    from data_warehouse_data_mining_spark.operators.sketches import (
        hll_mergeable_counts,
    )
    from tests.conftest import SF_SMALL

    rows = hll_mergeable_counts(spark, SF_SMALL).collect()
    exact = {
        r.event_type: r.n
        for r in load(spark, SF_SMALL)
        .events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.event_type: r.exact_users for r in rows} == exact
    for r in rows:
        assert r.within_5pct == 1, (r.event_type, r.exact_users)


def test_exact_group_percentiles_matches_buffered_reference(spark):
    """exact_group_percentiles (sketch-bracketed selection) must equal
    F.percentile (the whole-group-buffer exact reference) on edge
    cases: tiny groups (whole-rank path), groups past the small_n
    threshold (bracket path), heavy duplicates, constant groups, and
    boundary percentiles p=0/p=1."""
    import random

    from data_warehouse_data_mining_spark.operators.relational import (
        exact_group_percentiles,
    )

    rng = random.Random(7)
    rows = []
    # tiny group (whole-rank path), even count -> interpolated median
    rows += [("tiny", float(v)) for v in (3, 1, 4, 1)]
    # constant group
    rows += [("const", 5.0)] * 9
    # large group past small_n with heavy duplicates (bracket path)
    rows += [("big", float(rng.randint(0, 50))) for _ in range(3000)]
    # skewed continuous group past small_n
    rows += [("skew", rng.random() ** 4 * 1000.0) for _ in range(2500)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")

    ps = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = {
        (r.g, r.pid): r.val
        for r in exact_group_percentiles(df, "g", "v", ps, small_n=1000).collect()
    }
    ref = {
        (r.g, i): r.ref[i]
        for r in df.groupBy("g")
        .agg(F.percentile("v", F.array(*[F.lit(p) for p in ps])).alias("ref"))
        .collect()
        for i in range(len(ps))
    }
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == ref[k], (k, got[k], ref[k])


def test_utf8_validation_and_repair(spark):
    """Spark 4 UTF-8 hygiene surface: raw bytes cast to string can carry
    invalid sequences; is_valid_utf8 detects them, make_valid_utf8
    repairs with U+FFFD, try_validate_utf8 nulls instead of throwing —
    the decode-sanitization step of crawl/binary ingest, all JVM-side."""
    df = spark.createDataFrame(
        [(b"clean text",), (b"bad \xff\xfe bytes",)], "raw binary"
    ).select(F.col("raw").cast("string").alias("s"))
    checked = df.select(
        "s",
        F.expr("is_valid_utf8(s)").alias("ok"),
        F.expr("make_valid_utf8(s)").alias("fixed"),
        F.expr("try_validate_utf8(s)").alias("validated"),
    ).collect()
    by_ok = {r.ok: r for r in checked}
    assert by_ok[True].fixed == "clean text"
    assert by_ok[True].validated == "clean text"
    assert by_ok[False].validated is None
    assert "�" in by_ok[False].fixed and "bytes" in by_ok[False].fixed


def test_global_order_stats_matches_naive_window(spark):
    """The two-phase bucketed prefix sum must reproduce the naive
    global window's rank and cumsum EXACTLY — including duplicate
    values, values at power-of-two bucket boundaries, zeros, and both
    sort directions."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
    )

    rng = random.Random(7)
    rows = [
        # id, value: dense duplicates + exact powers of two + zeros
        (i, rng.choice([0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 63, 64, 65,
                        1023, 1024, 1025, rng.randrange(10**6),
                        rng.randrange(10**12)]))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, v long").withColumn(
        "m", (F.col("v") % 97 + 1).cast("long")
    )
    for asc in (True, False):
        got = {
            r["id"]: (r["global_rank"], r["global_cum"])
            for r in global_order_stats(
                df, "v", "id", measure_col="m", ascending=asc
            ).collect()
        }
        w = W.orderBy(F.col("v").asc() if asc else F.col("v").desc(),
                      F.col("id").asc())
        want = {
            r["id"]: (r["rk"], r["cum"])
            for r in df.select(
                "id",
                F.row_number().over(w).cast("long").alias("rk"),
                F.sum("m")
                .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
                .cast("long")
                .alias("cum"),
            ).collect()
        }
        assert got == want, f"ascending={asc}"


def test_ntile_from_rank_matches_builtin_ntile(spark):
    """ntile_from_rank(global_rank, n, k) must equal F.ntile(k) over the
    same ordering for every k, including n % k != 0 and n < k."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
        ntile_from_rank,
    )

    rng = random.Random(11)
    rows = [(i, rng.randrange(10**9)) for i in range(157)]  # prime size
    df = spark.createDataFrame(rows, "id long, v long").localCheckpoint(
        eager=True
    )
    n = df.count()
    for k in (2, 3, 4, 7, 10, 200):
        ranked = global_order_stats(df, "v", "id", ascending=True)
        got = {
            r["id"]: r["q"]
            for r in ranked.select(
                "id",
                ntile_from_rank(F.col("global_rank"), F.lit(n), k).alias("q"),
            ).collect()
        }
        w = W.orderBy(F.col("v").asc(), F.col("id").asc())
        want = {
            r["id"]: r["q"]
            for r in df.select("id", F.ntile(k).over(w).alias("q")).collect()
        }
        assert got == want, f"k={k}"


def test_bounded_group_topk_matches_naive_window(spark):
    """The salted two-phase per-group top-k must equal the naive
    per-group window exactly: same k rows per group (with carried
    columns) and exact group totals — including groups smaller than k
    and groups spanning many salts."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.operators.ranking import (
        bounded_group_topk,
    )

    rng = random.Random(23)
    rows = [
        (i, rng.choice(["a", "b", "c", "tiny"][: 3 if i > 40 else 4]),
         f"{rng.randrange(10**9):012d}", rng.randrange(100))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v string, m long")
    k = 7
    got = bounded_group_topk(
        df, ["g"], "v", k, salt_src="id", n_salts=8, carry_cols=("m",)
    )
    got_rows = {
        (r["g"], r["group_rank"]): (r["v"], r["m"], r["group_total"])
        for r in got.collect()
    }
    w = W.partitionBy("g").orderBy("v")
    naive = (
        df.select(
            "g", "v", "m",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(W.partitionBy("g")).alias("tot"),
        )
        .filter(F.col("rk") <= k)
    )
    want_rows = {
        (r["g"], r["rk"]): (r["v"], r["m"], r["tot"]) for r in naive.collect()
    }
    assert got_rows == want_rows


def test_global_order_stats_rejects_null_and_negative(spark):
    """NULL or negative values must raise, not silently vanish."""
    import pytest

    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
    )

    for rows in ([(1, None), (2, 5)], [(1, -3), (2, 5)]):
        df = spark.createDataFrame(rows, "id long, v long")
        with pytest.raises(Exception, match="must be non-null"):
            global_order_stats(df, "v", "id").collect()


def test_global_order_stats_custom_bucket_expr_sweep_line(spark):
    """bucket_expr must (a) produce the exact naive-window answer on a
    timestamp-like domain (huge offset, narrow span — the case where
    default log2 bucketing collapses to one bucket) with a ±1 sweep-line
    measure that drives the cumsum negative, and (b) actually spread the
    rows across multiple phase-1 buckets."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
    )

    rng = random.Random(11)
    base = 1_700_000_000_000_000  # epoch-µs-like offset
    rows = [
        (i, base + rng.randrange(3_000_000), rng.choice([1, -1]))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, k long, delta long")
    bounds = df.agg(
        F.min("k").alias("kmin"), F.max("k").alias("kmax")
    )
    bb = df.crossJoin(F.broadcast(bounds))
    bucket = F.expr("(k - kmin) * 64 div (kmax - kmin + 1)")
    # (b) the custom bucketing really is non-degenerate where log2 is
    n_buckets = bb.select(bucket.alias("b")).distinct().count()
    assert n_buckets > 8
    n_log2 = df.select(
        F.floor(F.log2(F.col("k").cast("double") + 1)).alias("b")
    ).distinct().count()
    assert n_log2 == 1  # the motivation: log2 collapses this domain
    got = {
        r["id"]: (r["global_rank"], r["global_cum"])
        for r in global_order_stats(
            bb, "k", "id", measure_col="delta", ascending=True,
            bucket_expr=bucket,
        ).collect()
    }
    w = W.orderBy(F.col("k").asc(), F.col("id").asc())
    want = {
        r["id"]: (r["rk"], r["cum"])
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rk"),
            F.sum("delta")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("long")
            .alias("cum"),
        ).collect()
    }
    assert got == want


def test_holt_step_matches_recursive_definition():
    """holt_step must be the floor-arithmetic Holt recurrence for
    negative trends too (the oracle spells floor-div sign-safely; the
    Python walker relies on // being floor division)."""
    from data_warehouse_data_mining_spark.operators.udfs import holt_step

    # declining series drives the trend negative
    s, b = 1000, 0
    for x in (800, 600, 400, 200):
        s2_expected = (x + s + b) // 2
        b2_expected = (s2_expected - s + b) // 2
        s, b = holt_step(s, b, x)
        assert (s, b) == (s2_expected, b2_expected)
    assert b < 0


def test_simhash_hamming_banding_exact_recall(spark):
    """The 4-band pigeonhole join must find EVERY pair within Hamming
    distance 3 — compare against the brute-force all-pairs scan on a
    small corpus (the exact-recall guarantee the operator's docstring
    claims, as an executable proof)."""
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.operators.dedup import (
        simhash_hamming_pairs,
        simhash_table,
    )

    rows = [
        (i, " ".join(f"w{(i * 7 + k) % 23}" for k in range(12)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_hamming_pairs(df, "doc_id", "text").collect()
    }
    sh = simhash_table(df, "doc_id", "text")
    a = sh.select(F.col("id").alias("ia"), F.col("simhash").alias("sa"))
    b = sh.select(F.col("id").alias("ib"), F.col("simhash").alias("sb"))
    brute = {
        (r["ia"], r["ib"], r["h"])
        for r in a.join(b, F.col("ia") < F.col("ib"))
        .select("ia", "ib", F.expr("bit_count(sa ^ sb)").cast("int").alias("h"))
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert got == brute
    assert brute  # the corpus actually produces near-dup pairs
    # the 100-TB band-width dial (r5): wider bands = fewer, bigger
    # band-spaces; recall stays exact as long as bands > max_hamming
    got21 = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_hamming_pairs(
            df, "doc_id", "text", max_hamming=2, band_bits=21
        ).collect()
    }
    assert got21 == {t for t in brute if t[2] <= 2}
    # and the guard refuses parameterizations that break the pigeonhole
    import pytest as _pytest

    with _pytest.raises(ValueError):
        simhash_hamming_pairs(df, "doc_id", "text", max_hamming=3, band_bits=21)


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully contained in a long one must surface with
    containment 1.0 even when Jaccard sits far below the usual
    thresholds — the asymmetric-duplication case containment_pairs
    exists for."""
    from data_warehouse_data_mining_spark.operators.dedup import (
        shingle_table,
    )
    from pyspark.sql import functions as F

    short = " ".join(f"tok{i}" for i in range(10))
    long_ = short + " " + " ".join(f"pad{i}" for i in range(90))
    df = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string"
    )
    sh = shingle_table(df, "doc_id", "text")
    sizes = {r["id"]: r["ns"] for r in sh.groupBy("id").count().withColumnRenamed("count", "ns").collect()}
    sa = sh.select(F.col("id").alias("a"), F.col("shingle").alias("s1"))
    sb = sh.select(F.col("id").alias("b"), F.col("shingle").alias("s2"))
    n_inter = (
        sa.join(sb, (F.col("s1") == F.col("s2")) & (F.col("a") < F.col("b")))
        .count()
    )
    containment = n_inter / sizes[1]
    jaccard = n_inter / (sizes[1] + sizes[2] - n_inter)
    assert containment == 1.0
    assert jaccard < 0.35  # below the near-dup threshold: Jaccard misses it


def test_bloom_prefilter_never_false_negative(spark):
    """The registered bloom query's n_false_negative column must be 0 —
    a Bloom filter can only over-approximate membership. Checked on real
    data via the registry builder."""
    from data_warehouse_data_mining_spark.registry import all_queries

    from .conftest import SF_SMALL

    q = all_queries()["bloom_filter_prefilter"]
    row = q.builder(spark, SF_SMALL).collect()[0]
    assert row["n_false_negative"] == 0
    assert row["n_bloom_pass"] >= row["n_true_match"]


def test_global_order_stats_partition_cols_matches_partitioned_window(spark):
    """partition_cols must reproduce the naive
    ``OVER (PARTITION BY g ORDER BY v, id)`` rank and cumsum EXACTLY —
    including duplicate values inside and across groups and both sort
    directions."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.operators.ranking import (
        global_order_stats,
    )

    rng = random.Random(13)
    rows = [
        (i, rng.randrange(4), rng.choice([0, 1, 7, 8, 63, 64, 1023,
                                          rng.randrange(10**9)]))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, g long, v long").withColumn(
        "m", (F.col("v") % 89 + 1).cast("long")
    )
    for asc in (True, False):
        got = {
            r["id"]: (r["global_rank"], r["global_cum"])
            for r in global_order_stats(
                df, "v", "id", measure_col="m", ascending=asc,
                partition_cols=["g"],
            ).collect()
        }
        w = W.partitionBy("g").orderBy(
            F.col("v").asc() if asc else F.col("v").desc(), F.col("id").asc()
        )
        want = {
            r["id"]: (r["rk"], r["cum"])
            for r in df.select(
                "id",
                F.row_number().over(w).cast("long").alias("rk"),
                F.sum("m")
                .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
                .cast("long")
                .alias("cum"),
            ).collect()
        }
        assert got == want, f"ascending={asc}"


def test_repeated_spans_catch_planted_verbatim_block(spark):
    """A 20-token block pasted verbatim into two otherwise-different
    documents must surface in the repeated-span census (with mod=1 the
    sampling keeps every window, so detection is certain; the default
    mod only thins the fingerprint stream)."""
    from data_warehouse_data_mining_spark.operators.text import repeated_spans

    block = " ".join(f"tpl{k}" for k in range(20))
    rows = [
        (1, "aa bb cc " + block + " dd ee"),
        (2, "xx yy " + block + " zz"),
        (3, " ".join(f"solo{k}" for k in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repeated_spans(df, "doc_id", "text", span_len=12, mod=1).collect()
    assert any(r.n_docs == 2 and {r.min_doc, r.max_doc} == {1, 2} for r in out)
    assert all({r.min_doc, r.max_doc} != {3} for r in out)


def test_negative_sampling_never_collides_with_positives(spark, duck):
    """Structural contract of the negative sampler on the real corpus:
    no emitted (user, item) pair was ever purchased, and each user gets
    at most NEG_K deterministic negatives."""
    from data_warehouse_data_mining_spark.operators.association import (
        NEG_K,
        negative_sampling_training_pairs,
    )

    from .conftest import SF_SMALL

    out = negative_sampling_training_pairs(spark, SF_SMALL).collect()
    pos = {
        (r[0], r[1])
        for r in duck.execute(
            "SELECT DISTINCT o_custkey, l_partkey FROM orders "
            "JOIN lineitem ON l_orderkey = o_orderkey"
        ).fetchall()
    }
    assert out and all((r.user_id, r.item_id) not in pos for r in out)
    from collections import Counter

    per_user = Counter(r.user_id for r in out)
    assert max(per_user.values()) <= NEG_K


def test_simhash128_banding_exact_recall_and_band_invariance(spark):
    """The 128-bit sibling's pigeonhole join must (a) find EVERY pair
    within Hamming distance 3 (brute-force comparison), and (b) return
    the IDENTICAL pair set at 16-bit and 32-bit bands — the
    band-width-invariance claim that lets the registered query
    auto-size banding without touching the answer."""
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.operators.dedup import (
        simhash128_hamming_pairs,
        simhash128_table,
    )

    rows = [
        (i, " ".join(f"w{(i * 7 + k) % 23}" for k in range(12)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got16 = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash128_hamming_pairs(
            df, "doc_id", "text", band_bits=16
        ).collect()
    }
    got32 = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash128_hamming_pairs(
            df, "doc_id", "text", band_bits=32
        ).collect()
    }
    assert got16 == got32
    sh = simhash128_table(df, "doc_id", "text")
    a = sh.select(
        F.col("id").alias("ia"),
        F.col("sh_hi").alias("ha"),
        F.col("sh_lo").alias("la"),
    )
    b = sh.select(
        F.col("id").alias("ib"),
        F.col("sh_hi").alias("hb"),
        F.col("sh_lo").alias("lb"),
    )
    brute = {
        (r["ia"], r["ib"], r["h"])
        for r in a.join(b, F.col("ia") < F.col("ib"))
        .select(
            "ia",
            "ib",
            (F.expr("bit_count(ha ^ hb)") + F.expr("bit_count(la ^ lb)"))
            .cast("int")
            .alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert got16 == brute
    assert brute  # the corpus actually produces near-dup pairs
    # guard: a banding that breaks the pigeonhole is refused
    import pytest as _pytest

    with _pytest.raises(ValueError):
        simhash128_hamming_pairs(df, "doc_id", "text", max_hamming=3, band_bits=64)


def test_simhash128_low_bits_match_64bit_simhash(spark):
    """The 128-bit fingerprint's low 64 bits come from the same first-16
    md5 hex digits as the 64-bit simhash_table, so sh_lo must EQUAL the
    64-bit fingerprint doc-for-doc — the compatibility pin that makes
    the 128-bit operator a strict widening, not a different hash."""
    from data_warehouse_data_mining_spark.operators.dedup import (
        simhash128_table,
        simhash_table,
    )

    rows = [(i, f"alpha beta w{i} gamma{i % 5} delta") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lo = {r.id: r.sh_lo for r in simhash128_table(df, "doc_id", "text").collect()}
    sh = {r.id: r.simhash for r in simhash_table(df, "doc_id", "text").collect()}
    assert lo == sh


def test_simhash128_band_bits_sizing_rule():
    """Auto-sizing follows the SCALING.md rule: 16-bit bands below the
    2^18-doc occupancy knee, 32-bit above; looser banding when
    max_hamming demands more bands than 32-bit widths provide."""
    from data_warehouse_data_mining_spark.operators.dedup import (
        SIMHASH128_OCC_KNEE,
        simhash128_band_bits,
    )

    assert simhash128_band_bits(1_000) == 16
    assert simhash128_band_bits(SIMHASH128_OCC_KNEE) == 16
    assert simhash128_band_bits(SIMHASH128_OCC_KNEE + 1) == 32
    assert simhash128_band_bits(10_000_000_000) == 32
    # max_hamming > 3: 32-bit bands (4 bands) no longer satisfy the
    # pigeonhole; the sizer falls back to widths whose band count does
    assert simhash128_band_bits(10_000_000, max_hamming=5) == 16
    assert simhash128_band_bits(10_000_000, max_hamming=9) == 8
    # the full clamp-down ladder: every radius that admits ANY valid
    # 64-divisor width must resolve instead of raising (r6 review fix —
    # the old three-width sizer raised for max_hamming in [16, 31])
    assert simhash128_band_bits(1_000, max_hamming=16) == 4
    assert simhash128_band_bits(10_000_000, max_hamming=16) == 4
    assert simhash128_band_bits(1_000, max_hamming=31) == 4
    assert simhash128_band_bits(1_000, max_hamming=63) == 2
    assert simhash128_band_bits(1_000, max_hamming=127) == 1
    with pytest.raises(ValueError):
        simhash128_band_bits(1_000, max_hamming=128)


def test_clean_corpus_parquet_staging_equals_pinned(spark, tmp_path):
    """clean_corpus(staging_dir=...) — the 100 TB path that stages the
    exact-deduped intermediate to parquet instead of localCheckpoint —
    must return exactly the pinned mode's rows (the staging is pure
    materialization, never semantics)."""
    from data_warehouse_data_mining_spark.catalog import load
    from data_warehouse_data_mining_spark.pipelines import clean_corpus

    from .conftest import SF_SMALL

    docs = load(spark, SF_SMALL).documents
    pinned = clean_corpus(docs).select("doc_id").orderBy("doc_id").collect()
    staged = (
        clean_corpus(docs, staging_dir=str(tmp_path / "exact_kept"))
        .select("doc_id")
        .orderBy("doc_id")
        .collect()
    )
    assert pinned == staged and len(pinned) > 0


def test_incremental_join_maintenance_equals_full_rebuild(spark):
    """The four-piece delta assembly must equal the single-pass rebuild
    computed in-engine (the oracle proves it cross-engine; this pins it
    against Spark itself so a split-disjointness regression fails fast)."""
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.catalog import load
    from data_warehouse_data_mining_spark.operators.advanced import (
        incremental_join_maintenance,
    )
    from .conftest import SF_SMALL

    got = {
        r["nation"]: (r["n_rows"], r["revenue_cents"])
        for r in incremental_join_maintenance(spark, SF_SMALL).collect()
    }
    t = load(spark, SF_SMALL)
    full = {
        r["nation"]: (r["n_rows"], r["revenue_cents"])
        for r in (
            t.orders.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
            .join(t.nation, F.col("n_nationkey") == F.col("c_nationkey"))
            .groupBy(F.col("n_name").alias("nation"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                .cast("long")
                .alias("revenue_cents"),
            )
            .collect()
        )
    }
    assert got == full


def test_croston_step_properties():
    """The Croston update must keep state in-range: z' between
    min(x,z) and max(x,z) (smoothing), p' between min(q,p) and
    max(q,p), and a constant series is a fixed point."""
    from data_warehouse_data_mining_spark.operators.udfs import croston_step

    assert croston_step(10, 4, 10, 4) == (10, 4)  # fixed point
    for z, p, x, q in [(10, 2, 30, 6), (30, 6, 10, 2), (1, 1, 100, 50)]:
        z2, p2 = croston_step(z, p, x, q)
        assert min(x, z) <= z2 <= max(x, z)
        assert min(q, p) <= p2 <= max(q, p)
