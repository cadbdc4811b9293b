"""Re-measure the ML value pins (ml_logreg_confusion /
ml_random_forest_report oracles) and check their determinism.

The two oracles in ml/queries.py pin the ACTUAL seeded-model outputs
per corpus fingerprint (count, sum(label)). Those pins were measured on
PySpark 4.1.2; an MLlib change to LBFGS/treeAggregate summation or RF
sampling order shifts the fitted models and the pins must be
re-measured. Procedure:

    python tools/ml_pin_probe.py 16 /root/testdata/sf0.01
    python tools/ml_pin_probe.py 32 /root/testdata/sf0.01
    # ... repeat for sf0.001 and sf0.1, diff the PROBE_RESULT lines;
    # identical output across partition configs = deterministic, safe
    # to pin. Then transcribe lr_cells / rf cells into the two oracle
    # VALUES lists (RF report floats are DERIVED in SQL from the four
    # cells — only the integers are transcribed).

Prints one `PROBE_RESULT {json}` line (sorted keys) so runs diff
cleanly.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

parts = sys.argv[1] if len(sys.argv) > 1 else "16"
sfs = sys.argv[2].split(",") if len(sys.argv) > 2 else ["/root/testdata/sf0.01"]

spark = (
    SparkSession.builder.master(f"local[{parts}]")
    .config("spark.sql.shuffle.partitions", parts)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from data_warehouse_data_mining_spark.ml import classify, metrics
from data_warehouse_data_mining_spark.ml.queries import SEED, _dataset

# The pins are BLAS-sensitive: MLlib's LBFGS accumulates through
# dev.ludovic.netlib, and a different backend (native OpenBLAS/MKL, or
# the plain-Java fallback vs the vector-API impl) orders float
# reductions differently. PINS_MEASURED_UNDER is the implementation the
# ml/queries.py pins were measured with; the probe records the active
# one and warns on mismatch so a red pin on such a host is diagnosed as
# "re-measure here", not "regression".
PINS_MEASURED_UNDER = "dev.ludovic.netlib.blas.VectorBLAS"
try:
    _blas = (
        spark._jvm.dev.ludovic.netlib.blas.BLAS.getInstance()
        .getClass()
        .getName()
    )
except Exception:
    _blas = "unknown"
if _blas != PINS_MEASURED_UNDER:
    print(
        f"WARNING: active BLAS is {_blas}; pins in ml/queries.py were "
        f"measured under {PINS_MEASURED_UNDER} — expect different "
        "cells; re-measure, do not chase a phantom regression."
    )

out = {"blas": _blas}
for sf in sfs:
    data = _dataset(spark, sf)
    train, test = data.randomSplit([0.7, 0.3], seed=SEED)
    lr = classify.train_evaluate("logistic_regression", train, test)
    lr_cells = {
        (r.label, r.prediction): r.n
        for r in metrics.confusion_matrix(lr.predictions).collect()
    }
    rf = classify.train_evaluate("random_forest", train, test)
    rf_cells = {
        (r.label, r.prediction): r.n
        for r in metrics.confusion_matrix(rf.predictions).collect()
    }
    report = [
        (r["class"], repr(r.precision), repr(r.recall), repr(r.f1), r.support)
        for r in metrics.classification_report(rf.predictions)
        .orderBy("class")
        .collect()
    ]
    out[sf] = {
        "n": data.count(),
        "lr_cells": sorted((f"{k[0]}|{k[1]}", v) for k, v in lr_cells.items()),
        "rf_cells": sorted((f"{k[0]}|{k[1]}", v) for k, v in rf_cells.items()),
        "rf_report": report,
    }
print("PROBE_RESULT " + json.dumps(out, sort_keys=True))
