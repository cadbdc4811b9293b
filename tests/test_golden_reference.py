"""Golden-parity tests against the reference's own dataset and executed
notebook outputs (BASELINE.md §A): row count 5110, class balance
4861:249, bmi mean 28.893236911794673, StringIndexer category→index
mapping. These prove the new engine reproduces the reference pipeline's
semantics exactly. Skipped when the reference CSV isn't present."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.ml import prep
from data_warehouse_data_mining_spark.sources.csv import STROKE_SCHEMA, read_csv

RAW_CSV = "/root/reference/healthcare-dataset-stroke-data.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(RAW_CSV), reason="reference dataset not available"
)


@pytest.fixture(scope="module")
def stroke(spark):
    # nullValue="N/A" turns the sentinel into NULL at parse time, so bmi
    # arrives as double directly (vs the reference's string + repair,
    # stroke_predict.py:49-53)
    return read_csv(spark, RAW_CSV, schema=STROKE_SCHEMA, null_value="N/A").cache()


def test_row_count_and_class_balance(stroke):
    assert stroke.count() == 5110  # BASELINE.md §A
    counts = {r.stroke: r.n for r in
              stroke.groupBy("stroke").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 4861, 1: 249}  # nb:cell4 output


def test_bmi_mean_matches_reference(stroke):
    mean_bmi = stroke.agg(F.avg("bmi")).collect()[0][0]
    assert mean_bmi == pytest.approx(28.893236911794673, abs=1e-9)  # nb:cell3


def test_bmi_null_count(stroke):
    assert stroke.filter(F.col("bmi").isNull()).count() == 201  # FIXTURES.md §A


def test_string_indexer_mapping_matches_reference(stroke):
    """Frequency-ordered StringIndexer reproduces the notebook's printed
    mapping (nb:cell7): gender Female→0, Male→1, Other→2; work_type
    Private→0, Self-employed→1, children→2, Govt_job→3, Never_worked→4."""
    df = prep.impute_mean(stroke, ["bmi"])
    _, encoded = prep.fit_encode(
        df, ["gender", "work_type"], ["age", "avg_glucose_level", "bmi"]
    )
    gender = {r.gender: r["gender_index"]
              for r in prep.index_mapping(encoded, "gender").collect()}
    assert gender == {"Female": 0.0, "Male": 1.0, "Other": 2.0}
    work = {r.work_type: r["work_type_index"]
            for r in prep.index_mapping(encoded, "work_type").collect()}
    assert work == {
        "Private": 0.0,
        "Self-employed": 1.0,
        "children": 2.0,
        "Govt_job": 3.0,
        "Never_worked": 4.0,
    }


def test_feature_vector_width_21(stroke):
    """3 numeric + one-hot widths (gender 3, ever_married 2, work_type 5,
    Residence_type 2, smoking_status 4) + 2 flags = 21 (nb:cell8)."""
    df = prep.impute_mean(stroke, ["bmi"])
    cats = ["gender", "ever_married", "work_type", "Residence_type", "smoking_status"]
    nums = ["age", "avg_glucose_level", "bmi", "hypertension", "heart_disease"]
    _, encoded = prep.fit_encode(df, cats, nums)
    vec = encoded.select("features").first()[0]
    assert vec.size == 21


BALANCED_CSV = "/root/reference/hes_a_SMOTE_operator.csv"


def test_balanced_pipeline_auc_parity(spark):
    """End-to-end reproduction of the balanced notebook's study
    (nb-bal:cell1-10): SMOTE CSV -> cast repair -> impute -> encode ->
    seeded 70:30 split -> LogisticRegression + RandomForest -> AUC.
    Reference outputs: LR 0.8652, RF 0.9036 (BASELINE.md §C). Tolerance
    covers Spark-version jitter, not methodology drift."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_warehouse_data_mining_spark.ml import classify

    if not os.path.exists(BALANCED_CSV):
        _pytest.skip("balanced reference CSV not available")

    schema = T.StructType(
        [
            T.StructField("id", T.DoubleType()),
            T.StructField("gender", T.StringType()),
            T.StructField("age", T.DoubleType()),
            T.StructField("hypertension", T.DoubleType()),
            T.StructField("heart_disease", T.DoubleType()),
            T.StructField("ever_married", T.StringType()),
            T.StructField("work_type", T.StringType()),
            T.StructField("Residence_type", T.StringType()),
            T.StructField("avg_glucose_level", T.DoubleType()),
            T.StructField("bmi", T.DoubleType()),
            T.StructField("smoking_status", T.StringType()),
            T.StructField("stroke", T.IntegerType()),
        ]
    )
    from data_warehouse_data_mining_spark.sources.csv import read_csv

    df = read_csv(spark, BALANCED_CSV, schema=schema, null_value="N/A")
    # the balanced notebook's cell-1 repair: fractional SMOTE outputs
    # cast back to integer flags (nb-bal:cell1)
    df = df.withColumn("hypertension", F.col("hypertension").cast("integer")).withColumn(
        "heart_disease", F.col("heart_disease").cast("integer")
    )
    assert df.count() == 9647  # BASELINE.md §A
    df = prep.impute_mean(df, ["bmi"])

    cats = ["gender", "ever_married", "work_type", "Residence_type", "smoking_status"]
    nums = ["age", "avg_glucose_level", "bmi", "hypertension", "heart_disease"]
    _, encoded = prep.fit_encode(df, cats, nums)
    data = encoded.select("features", F.col("stroke").alias("label"))
    train, test = data.randomSplit([0.7, 0.3], seed=42)

    lr = classify.train_evaluate("logistic_regression", train, test, label_col="label")
    rf = classify.train_evaluate("random_forest", train, test, label_col="label")
    assert lr.auc == pytest.approx(0.8652, abs=0.03)  # nb-bal:cell10
    assert rf.auc == pytest.approx(0.9036, abs=0.04)  # nb-bal:cell10


def test_imbalanced_pipeline_auc_parity(spark, stroke):
    """The raw-CSV (imbalanced) study (nb:cell1-10): impute -> encode ->
    seeded 70:30 split -> LogisticRegression AUC ~ 0.8109 (BASELINE.md §B)."""
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.ml import classify

    df = prep.impute_mean(stroke, ["bmi"])
    cats = ["gender", "ever_married", "work_type", "Residence_type", "smoking_status"]
    nums = ["age", "avg_glucose_level", "bmi", "hypertension", "heart_disease"]
    _, encoded = prep.fit_encode(df, cats, nums)
    data = encoded.select("features", F.col("stroke").alias("label"))
    train, test = data.randomSplit([0.7, 0.3], seed=42)
    lr = classify.train_evaluate("logistic_regression", train, test, label_col="label")
    # nb:cell10 reports 0.8109; randomSplit membership is partition- and
    # Spark-version-dependent, so the exact split can't be reproduced —
    # the bracket still rejects a broken pipeline (which collapses
    # toward 0.5) while accepting split-composition jitter.
    assert 0.76 <= lr.auc <= 0.90, lr.auc


def test_chart_feed_parity_with_reference_plots(spark, stroke):
    """The reference's only un-twinned behavior is driver-side
    matplotlib (stroke_predict.py:35-41; nb:cell4 nominal bar charts,
    nb:cell5 numeric histograms). Rendering is presentation and stays
    out of engine scope (SURVEY §1.3), but the DATA each plot consumes
    is engine work — pin the distributed chart-feed aggregations to
    exactly what the reference's collect-then-plot code handed
    matplotlib."""
    import duckdb
    import numpy as np

    from data_warehouse_data_mining_spark.ml.prep import frequency_tables

    # (a) nb:cell4 — one bar chart per nominal column, fed by per-column
    # groupBy counts. The distributed twin is ONE stacked job for all
    # columns; DuckDB over the same CSV is the independent oracle.
    nominal = ["gender", "ever_married", "work_type", "Residence_type",
               "smoking_status"]
    got = {
        (r.col_name, r.col_value): r.n
        for r in frequency_tables(stroke, nominal).collect()
    }
    con = duckdb.connect()
    for col in nominal:
        expected = con.execute(
            f'SELECT CAST("{col}" AS VARCHAR) AS v, count(*) AS n '
            f"FROM read_csv_auto('{RAW_CSV}') GROUP BY 1"
        ).fetchall()
        for v, n in expected:
            assert got[(col, v)] == n, (col, v)

    # (b) nb:cell5 — plt.hist(values, bins='auto') per numeric column.
    # The reference collects the full column to the driver; the twin
    # keeps binning distributed. numpy derives the auto edges (the only
    # driver-side step matplotlib itself performs), then the
    # distributed counts must equal np.histogram bin-for-bin. The
    # bucket index replays numpy's exact comparisons (count of interior
    # edges <= x — float-identical to searchsorted side='right').
    for col in ["age", "avg_glucose_level"]:
        vals = np.array(
            [r[0] for r in stroke.select(col).collect()], dtype=np.float64
        )
        edges = np.histogram_bin_edges(vals, bins="auto")
        expected_hist = np.histogram(vals, edges)[0].tolist()
        interior = F.array(*[F.lit(float(e)) for e in edges[1:-1]])
        idx = F.size(F.filter(interior, lambda e: e <= F.col(col)))
        counts = {
            r.b: r.n
            for r in stroke.groupBy(idx.alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_bins = len(edges) - 1
        assert [counts.get(i, 0) for i in range(n_bins)] == expected_hist, col
