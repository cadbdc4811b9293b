"""Registered ML queries (rows-only driver checks — model fitting is
not ANSI-SQL-expressible, so these get the weaker rows-only check; the
distributed-metrics building blocks they use ARE oracle-checked via the
relational queries).

Dataset: the ``embeddings`` table; binary target = (label >= 5);
features = the 64-d embedding via array_to_vector. Everything is
seeded, so re-runs are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.functions import vectors as V
from data_warehouse_data_mining_spark.ml import balance, classify, metrics
from data_warehouse_data_mining_spark.registry import register

SEED = 42


def _dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir).embeddings
    return e.select(
        "vec_id",
        array_to_vector(V.as_double(F.col("embedding"))).alias("features"),
        (F.col("label") >= 5).cast("double").alias("label"),
    )


@register("ml_logreg_confusion")
def ml_logreg_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogisticRegression fit/transform (reference nb:cell9-10) with the
    distributed confusion matrix (groupBy pivot, not sklearn-on-driver)."""
    train, test = _dataset(spark, sf_dir).randomSplit([0.7, 0.3], seed=SEED)
    result = classify.train_evaluate("logistic_regression", train, test)
    return metrics.confusion_matrix(result.predictions).orderBy("label", "prediction")


@register("ml_random_forest_report")
def ml_random_forest_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RandomForest (the reference script's active classifier,
    stroke_predict.py:144-146) + distributed classification report with
    sklearn zero_division=1 parity."""
    train, test = _dataset(spark, sf_dir).randomSplit([0.7, 0.3], seed=SEED)
    result = classify.train_evaluate("random_forest", train, test)
    report = metrics.classification_report(result.predictions)
    return report.select(
        "class",
        F.round("precision", 4).alias("precision"),
        F.round("recall", 4).alias("recall"),
        F.round("f1", 4).alias("f1"),
        "support",
    )


@register("ml_five_classifiers_auc")
def ml_five_classifiers_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five reference classifier families trained and AUC-scored on
    the same seeded split (nb:cell9-10). NaiveBayes needs non-negative
    features, so it trains on shifted copies (documented reference
    quirk, SURVEY.md §7)."""
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir).embeddings
    base = e.select(
        "vec_id",
        V.as_double(F.col("embedding")).alias("arr"),
        (F.col("label") >= 5).cast("double").alias("label"),
    )
    signed = base.select(
        "vec_id", array_to_vector("arr").alias("features"), "label"
    )
    nonneg = base.select(
        "vec_id",
        array_to_vector(F.transform(F.col("arr"), lambda x: x + F.lit(1.0))).alias(
            "features"
        ),
        "label",
    )
    rows = []
    for name in [
        "logistic_regression",
        "naive_bayes",
        "linear_svc",
        "decision_tree",
        "random_forest",
    ]:
        data = nonneg if name == "naive_bayes" else signed
        train, test = data.randomSplit([0.7, 0.3], seed=SEED)
        result = classify.train_evaluate(name, train, test)
        rows.append((name, round(result.auc, 4)))
    return spark.createDataFrame(rows, "classifier string, auc double")


@register(
    "ml_cv_grid_search",
    oracle="""
    SELECT 'logistic_regression' AS classifier,
           CAST(count(*) AS BIGINT) AS n_rows_total,
           4 AS grid_size, 3 AS num_folds,
           4 AS n_cv_metrics,
           1 AS cv_metrics_in_unit_interval,
           1 AS splits_partition_input,
           1 AS auc_in_unit_interval
    FROM embeddings
    """,
)
def ml_cv_grid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free CV grid search (reference's grids are full-size,
    stroke_predict.py:183-208; a reduced LR grid keeps the per-round
    check fast — the full grids live in ml/classify.py::param_grid).

    Exact-oracle-checked as a PROPERTY (the random_split_sizes
    pattern): the fit itself isn't SQL-reproducible, but its CONTRACT
    is. The pins are derived quantities the CV must have produced, not
    grid membership of a value drawn from the grid (which would be
    tautological): ``n_cv_metrics`` is len(model.avgMetrics) — the CV
    really swept all 4 grid points; every fold-mean AUC is a valid
    probability; and the seeded 70:30 split exactly partitions the
    exact input count. The raw AUC stays observable in
    ml_five_classifiers_auc."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.tuning import ParamGridBuilder

    data = _dataset(spark, sf_dir)
    train, test = data.randomSplit([0.7, 0.3], seed=SEED)
    clf = LogisticRegression(featuresCol="features", labelCol="label")
    reg_grid, iter_grid = [0.01, 0.1], [10, 20]
    grid = (
        ParamGridBuilder()
        .addGrid(clf.regParam, reg_grid)
        .addGrid(clf.maxIter, iter_grid)
        .build()
    )
    result = classify.cross_validate(
        "logistic_regression", train, test, num_folds=3, grid=grid
    )
    cv_metrics = result.avg_metrics or []
    n_split = train.count() + test.count()
    return data.agg(F.count(F.lit(1)).alias("n_rows_total")).select(
        F.lit("logistic_regression").alias("classifier"),
        "n_rows_total",
        F.lit(len(grid)).cast("int").alias("grid_size"),
        F.lit(3).cast("int").alias("num_folds"),
        F.lit(len(cv_metrics)).cast("int").alias("n_cv_metrics"),
        F.lit(int(all(0.0 <= m <= 1.0 for m in cv_metrics))).cast("int").alias(
            "cv_metrics_in_unit_interval"
        ),
        (F.lit(n_split) == F.col("n_rows_total")).cast("int").alias(
            "splits_partition_input"
        ),
        F.lit(int(0.0 <= result.auc <= 1.0)).cast("int").alias(
            "auc_in_unit_interval"
        ),
    )


@register(
    "smote_rebalance_counts",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN label >= 9 THEN 1 ELSE 0 END AS cls,
             count(*) AS cnt
      FROM embeddings GROUP BY 1
    )
    SELECT 'before' AS stage, cls, CAST(cnt AS BIGINT) AS n FROM base
    UNION ALL
    SELECT 'after' AS stage, cls,
           CAST(CASE WHEN cls = 1 THEN 3 * cnt ELSE cnt END AS BIGINT) AS n
    FROM base
    """,
)
def smote_rebalance_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed SMOTE (ml/balance.py — LSH-bucketed applyInPandas
    k-NN synthesis, fixing the reference's driver-side implementation
    and its neighbor-indexing bug). Output: class counts before/after.

    Exact-oracle-checkable despite the synthesis being numeric: SMOTE
    adds exactly ``oversample_ratio`` synthetic rows per minority row
    (ratio 2 → after-minority = 3 × before-minority, majority
    unchanged), so the COUNT contract is deterministic even though the
    synthetic vectors themselves depend on bucket-local k-NN."""
    e = load(spark, sf_dir).embeddings
    data = e.select(
        "vec_id",
        V.as_double(F.col("embedding")).alias("v"),
        (F.col("label") >= 9).cast("int").alias("cls"),
    )
    before = data.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("before").alias("stage"), "cls", "n"
    )
    balanced = balance.smote(
        data, id_col="vec_id", features_col="v", label_col="cls",
        minority_label=1, k=5, oversample_ratio=2,
    )
    after = balanced.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("after").alias("stage"), "cls", "n"
    )
    return before.unionByName(after)


@register(
    "class_weights_profile",
    oracle="""
    WITH e AS (SELECT CASE WHEN label >= 5 THEN 1 ELSE 0 END AS cls FROM embeddings),
         c AS (SELECT cls, count(*) AS n FROM e GROUP BY cls)
    SELECT cls, n,
           round((SELECT count(*) FROM e) * 1.0
                 / ((SELECT count(*) FROM c) * n), 6) AS weight
    FROM c
    """,
)
def class_weights_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class-weight column (the zero-data-movement
    alternative to SMOTE): per-class weight summary."""
    e = load(spark, sf_dir).embeddings.select(
        "vec_id", (F.col("label") >= 5).cast("int").alias("cls")
    )
    weighted = balance.class_weights(e, "cls")
    return weighted.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("weight"), 6).alias("weight"),
    )


@register("ml_weighted_logreg")
def ml_weighted_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-weighted LogisticRegression (weightCol) — the zero-resample
    rebalancing path (ml/balance.py::class_weights) feeding a weight-
    aware estimator; compared against the unweighted AUC."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    data = _dataset(spark, sf_dir).withColumn(
        "label", (F.col("label") == 1.0).cast("double")
    )
    # make it imbalanced: treat only a thin slice as positive
    e = load(spark, sf_dir).embeddings
    from pyspark.ml.functions import array_to_vector

    imb = e.select(
        "vec_id",
        array_to_vector(V.as_double(F.col("embedding"))).alias("features"),
        (F.col("label") >= 9).cast("double").alias("label"),
    )
    weighted = balance.class_weights(imb.withColumn("cls", F.col("label")), "cls").drop(
        "cls"
    )
    train, test = weighted.randomSplit([0.7, 0.3], seed=SEED)
    evaluator = BinaryClassificationEvaluator(labelCol="label")
    plain = LogisticRegression(featuresCol="features", labelCol="label").fit(train)
    wtd = LogisticRegression(
        featuresCol="features", labelCol="label", weightCol="weight"
    ).fit(train)
    rows = [
        ("unweighted", round(float(evaluator.evaluate(plain.transform(test))), 4)),
        ("class_weighted", round(float(evaluator.evaluate(wtd.transform(test))), 4)),
    ]
    return spark.createDataFrame(rows, "variant string, auc double")


@register("ml_kmeans_clusters")
def ml_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded KMeans over the embeddings (the coarse quantizer behind
    ann_ivf_kmeans, surfaced as a first-class clustering op): per-cluster
    size and within-cluster mean distance. Rows-only (iterative fit)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir).embeddings.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v")
    ).withColumn("features", array_to_vector(F.col("v")))
    model = KMeans(k=8, seed=SEED, featuresCol="features", predictionCol="cluster").fit(e)
    assigned = model.transform(e)
    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, center array<double>",
    )
    diff = F.zip_with("v", "center", lambda a, b: a - b)
    dist = F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        assigned.join(F.broadcast(centers), "cluster")
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(dist), 4).alias("avg_center_dist"),
        )
    )


@register("ml_regression_family")
def ml_regression_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression estimators over the embeddings (label 0-9 treated as a
    continuous target): LinearRegression and GBTRegressor on the same
    seeded split, scored by RMSE and R². Extends the reference's
    classification-only surface to the regression family (rows-only —
    iterative fits)."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.regression import GBTRegressor, LinearRegression

    e = load(spark, sf_dir).embeddings
    data = e.select(
        "vec_id",
        array_to_vector(V.as_double(F.col("embedding"))).alias("features"),
        F.col("label").cast("double").alias("label"),
    )
    train, test = data.randomSplit([0.7, 0.3], seed=SEED)
    rmse = RegressionEvaluator(labelCol="label", metricName="rmse")
    r2 = RegressionEvaluator(labelCol="label", metricName="r2")
    rows = []
    for name, est in [
        ("linear_regression", LinearRegression(featuresCol="features", labelCol="label")),
        (
            "gbt_regressor",
            GBTRegressor(featuresCol="features", labelCol="label", maxIter=10, seed=SEED),
        ),
    ]:
        pred = est.fit(train).transform(test)
        rows.append(
            (name, round(float(rmse.evaluate(pred)), 4), round(float(r2.evaluate(pred)), 4))
        )
    return spark.createDataFrame(rows, "model string, rmse double, r2 double")


@register("ml_one_vs_rest")
def ml_one_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OneVsRest multiclass reduction (LogisticRegression base) over the
    full 10-class label — per-class support and recall from the same
    distributed groupBy pivot the binary metrics use (no sklearn, no
    driver-side collect)."""
    from pyspark.ml.classification import LogisticRegression, OneVsRest
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir).embeddings
    data = e.select(
        "vec_id",
        array_to_vector(V.as_double(F.col("embedding"))).alias("features"),
        F.col("label").cast("double").alias("label"),
    )
    train, test = data.randomSplit([0.7, 0.3], seed=SEED)
    ovr = OneVsRest(
        classifier=LogisticRegression(featuresCol="features", labelCol="label"),
        featuresCol="features",
        labelCol="label",
    )
    pred = ovr.fit(train).transform(test)
    per_class = pred.groupBy("label").agg(
        F.count(F.lit(1)).alias("support"),
        F.round(
            F.avg((F.col("prediction") == F.col("label")).cast("double")), 4
        ).alias("recall"),
    )
    return per_class.orderBy("label")


@register("ml_smote_then_train")
def ml_smote_then_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full balancing study end-to-end, distributed:
    imbalanced data -> distributed SMOTE -> train LR -> AUC, compared to
    training on the raw imbalance (reference: stroke_predict.py:116-157,
    where the SMOTE call was broken and never actually ran — here it
    does)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir).embeddings
    data = e.select(
        "vec_id",
        V.as_double(F.col("embedding")).alias("varr"),
        (F.col("label") >= 9).cast("int").alias("cls"),
    )
    train_raw, test_raw = data.randomSplit([0.7, 0.3], seed=SEED)
    balanced_train = balance.smote(
        train_raw, id_col="vec_id", features_col="varr", label_col="cls",
        minority_label=1, k=5, oversample_ratio=4,
    )

    def prep(df):
        return df.select(
            array_to_vector("varr").alias("features"),
            F.col("cls").cast("double").alias("label"),
        )

    evaluator = BinaryClassificationEvaluator(labelCol="label")
    test = prep(test_raw)
    rows = []
    for variant, tr in [("imbalanced", prep(train_raw)), ("smote_balanced", prep(balanced_train))]:
        model = LogisticRegression(featuresCol="features", labelCol="label").fit(tr)
        rows.append((variant, round(float(evaluator.evaluate(model.transform(test))), 4)))
    return spark.createDataFrame(rows, "variant string, auc double")


@register("ml_als_recommendations")
def ml_als_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collaborative filtering (ALS, implicit feedback): customer×part
    purchase quantities from orders⋈lineitem train a low-rank model;
    top-3 part recommendations for a fixed customer subset. Rows-only —
    ALS is an iterative least-squares solver (the distributed factor
    sweep alternates on a seeded init; scores are model-dependent).
    Scale notes: ratings stay (user, item, strength) triples — one
    shuffle per factor sweep, factors block-partitioned by id range.
    """
    from pyspark.ml.recommendation import ALS

    t = load(spark, sf_dir)
    ratings = (
        t.orders.select("o_orderkey", "o_custkey")
        .join(
            t.lineitem.select("l_orderkey", "l_partkey", "l_quantity"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.sum("l_quantity").cast("float").alias("strength"))
    )
    als = ALS(
        rank=8,
        maxIter=5,
        seed=SEED,
        implicitPrefs=True,
        userCol="user",
        itemCol="item",
        ratingCol="strength",
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    users = ratings.select("user").distinct().orderBy("user").limit(5)
    recs = model.recommendForUserSubset(users, 3)
    return recs.select(
        "user",
        F.posexplode("recommendations").alias("rank", "rec"),
    ).select(
        "user",
        (F.col("rank") + 1).alias("rank"),
        F.col("rec.item").alias("part"),
        F.round(F.col("rec.rating"), 4).alias("score"),
    )


_FH_BITS = 4  # 16 buckets — small enough to force visible collisions


@register(
    "feature_hashing_profile",
    oracle=f"""
    WITH h AS (
      SELECT p_type,
             CAST(('0x' || substr(md5(p_type), 1, 8)) AS BIGINT)
               % {1 << _FH_BITS} AS bucket,
             count(*) AS n_rows
      FROM part GROUP BY p_type
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_categories,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           CAST(count(*) > 1 AS INT) AS has_collision
    FROM h
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def feature_hashing_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009) profiled: categorical
    p_type values hash into 2^4 feature buckets via the first md5 word,
    and the profile reports how many categories share each bucket — the
    collision audit run before replacing a StringIndexer (whose label
    table must fit on the driver) with stateless feature hashing (no
    fitted vocabulary, no shuffle, stable under new categories at
    100 TB). md5-derived buckets make the assignment engine-identical,
    so even the collision structure is hash-verified."""
    p = load(spark, sf_dir).part
    h = p.groupBy("p_type").agg(F.count(F.lit(1)).alias("n_rows"))
    bucket = (
        F.conv(F.substring(F.md5("p_type"), 1, 8), 16, 10).cast("long")
        % (1 << _FH_BITS)
    ).cast("int")
    return (
        h.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_categories"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            (F.count(F.lit(1)) > 1).cast("int").alias("has_collision"),
        )
        .orderBy("bucket")
    )
