"""Distributed classification metrics.

The reference collects predictions to the driver and calls
sklearn.metrics (stroke_predict.py:159-169) — the whole test set lands
in driver memory. Here the confusion matrix is a groupBy aggregate and
the classification report is derived from it, so metrics cost one
shuffle regardless of data size.

sklearn parity notes: macro-average over the label set present in
(labels ∪ predictions); ``zero_division=1`` semantics (reference uses
classification_report(..., zero_division=1), stroke_predict.py:167):
a class with zero predicted (or zero actual) instances contributes
precision (recall) of 1.0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(
    predictions: DataFrame, label_col: str = "label", pred_col: str = "prediction"
) -> DataFrame:
    """(label, prediction, n) — the 2×2 (or k×k) matrix as a tall table."""
    return (
        predictions.groupBy(
            F.col(label_col).cast("double").alias("label"),
            F.col(pred_col).cast("double").alias("prediction"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def classification_report(
    predictions: DataFrame,
    label_col: str = "label",
    pred_col: str = "prediction",
    zero_division: float = 1.0,
) -> DataFrame:
    """Per-class precision/recall/F1 + support, plus accuracy and macro
    rows — entirely from the confusion-matrix aggregate."""
    cm = confusion_matrix(predictions, label_col, pred_col)

    classes = cm.select(F.col("label").alias("cls")).union(
        cm.select(F.col("prediction").alias("cls"))
    ).distinct()

    tp = cm.filter(F.col("label") == F.col("prediction")).select(
        F.col("label").alias("cls"), F.col("n").alias("tp")
    )
    actual = cm.groupBy(F.col("label").alias("cls")).agg(F.sum("n").alias("support"))
    predicted = cm.groupBy(F.col("prediction").alias("cls")).agg(
        F.sum("n").alias("n_pred")
    )

    zd = F.lit(float(zero_division))
    per_class = (
        classes.join(tp, "cls", "left")
        .join(actual, "cls", "left")
        .join(predicted, "cls", "left")
        .fillna(0, subset=["tp", "support", "n_pred"])
        .select(
            "cls",
            F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred"))
            .otherwise(zd)
            .alias("precision"),
            F.when(F.col("support") > 0, F.col("tp") / F.col("support"))
            .otherwise(zd)
            .alias("recall"),
            "support",
        )
        .select(
            "cls",
            "precision",
            "recall",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            )
            .otherwise(F.lit(0.0))
            .alias("f1"),
            "support",
        )
    )

    total = predictions.count()
    correct = predictions.filter(
        F.col(label_col).cast("double") == F.col(pred_col).cast("double")
    ).count()

    summary = per_class.agg(
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.avg("f1").alias("f1"),
        F.sum("support").alias("support"),
    ).select(F.lit("macro avg").alias("class"), "precision", "recall", "f1", "support")

    accuracy_row = per_class.sparkSession.createDataFrame(
        [("accuracy", float(correct) / total if total else 0.0, None, None, total)],
        "class string, precision double, recall double, f1 double, support bigint",
    )

    return (
        per_class.select(
            F.col("cls").cast("string").alias("class"),
            "precision",
            "recall",
            "f1",
            F.col("support").cast("bigint").alias("support"),
        )
        .unionByName(summary.select("class", "precision", "recall", "f1",
                                    F.col("support").cast("bigint").alias("support")))
        .unionByName(accuracy_row)
    )
