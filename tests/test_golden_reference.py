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
