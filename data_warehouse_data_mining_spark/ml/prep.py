"""Profiling & preparation (reference pipeline stages, batched).

Reference sites re-expressed here:
* null profile       — nb:cell2 (sum(isNull.cast int) per column), one job
* frequency tables   — nb:cell4 looped one job per column → single
                       stack+groupBy job here
* sentinel repair +
  mean imputation    — stroke_predict.py:46-53 ("N/A" → mean(bmi)),
                       via null normalization + pyspark.ml Imputer
* categorical encode — stroke_predict.py:62-74 (StringIndexer
                       handleInvalid='keep' + OneHotEncoder pipeline)
* feature assembly   — stroke_predict.py:127-133 (VectorAssembler)
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import Imputer, OneHotEncoder, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column null counts in ONE aggregate job."""
    cols = columns or df.columns
    return df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls") for c in cols]
    )


def frequency_tables(df: DataFrame, columns: list[str]) -> DataFrame:
    """All per-column frequency tables in ONE job (long format:
    col_name, col_value, n). The reference runs one groupBy action per
    column (nb:cell4) — a per-column scan that is untenable at scale."""
    stack_args = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in columns)
    long_df = df.selectExpr(
        f"stack({len(columns)}, {stack_args}) AS (col_name, col_value)"
    )
    return long_df.groupBy("col_name", "col_value").agg(F.count(F.lit(1)).alias("n"))


def normalize_sentinels(
    df: DataFrame, columns: list[str], sentinel: str = "N/A"
) -> DataFrame:
    """Replace string sentinels with real NULLs and cast to double —
    the principled version of the reference's when/otherwise rewrite
    (stroke_predict.py:49-53)."""
    out = df
    for c in columns:
        out = out.withColumn(
            c,
            F.when(F.col(c) == sentinel, None).otherwise(F.col(c)).cast("double"),
        )
    return out


def impute_mean(df: DataFrame, columns: list[str]) -> DataFrame:
    """Mean-impute NULLs with pyspark.ml.feature.Imputer (distributed;
    one stats pass, no driver .first() round-trip)."""
    imputer = Imputer(strategy="mean", inputCols=columns, outputCols=columns)
    return imputer.fit(df).transform(df)


def build_encoding_pipeline(
    categorical_cols: list[str],
    numeric_cols: list[str],
    features_col: str = "features",
) -> Pipeline:
    """StringIndexer(handleInvalid='keep') → OneHotEncoder →
    VectorAssembler, exactly the reference's encoding semantics
    (frequency-ordered indices, keep-bucket for unseen labels)."""
    stages = []
    encoded = []
    for c in categorical_cols:
        stages.append(
            StringIndexer(inputCol=c, outputCol=f"{c}_index", handleInvalid="keep")
        )
        stages.append(
            OneHotEncoder(inputCols=[f"{c}_index"], outputCols=[f"{c}_encoded"])
        )
        encoded.append(f"{c}_encoded")
    stages.append(
        VectorAssembler(inputCols=numeric_cols + encoded, outputCol=features_col)
    )
    return Pipeline(stages=stages)


def fit_encode(
    df: DataFrame,
    categorical_cols: list[str],
    numeric_cols: list[str],
    features_col: str = "features",
) -> tuple[PipelineModel, DataFrame]:
    model = build_encoding_pipeline(categorical_cols, numeric_cols, features_col).fit(df)
    return model, model.transform(df)


def index_mapping(df: DataFrame, column: str) -> DataFrame:
    """category → StringIndexer ordinal mapping table (the reference
    prints this per column via distinct().collect(),
    stroke_predict.py:78-87); kept distributed here."""
    return df.select(column, f"{column}_index").distinct()
