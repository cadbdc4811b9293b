"""Class rebalancing: distributed SMOTE, undersampling, class weights.

The reference's SMOTE (smote_sampling.py:19-54) collects the entire
minority class to the driver, runs sklearn k-NN there, synthesizes in a
Python loop, and parallelizes back — two JVM↔driver round-trips holding
the minority class in driver memory, plus three latent bugs (SURVEY.md
§2.1 defects a-c: broken precedence in the percentage guard, neighbor
chosen from a global index instead of the row's own neighbor list, and
an undefined ``sc`` global).

This implementation keeps everything distributed and fixes the
neighbor-list bug (each synthetic row interpolates toward one of ITS
OWN k nearest neighbors):

1. bucket minority rows by a deterministic sign-random-projection LSH
   (locality-preserving, same family as operators/similarity.py);
2. per bucket, ``applyInPandas`` computes exact k-NN in numpy and
   synthesizes ``oversample_ratio`` rows per input row with an RNG
   seeded per input row id — deterministic re-runs;
3. union with the original rows, optional majority undersampling.

At 100 TB the minority class of any real imbalance fits a per-bucket
pandas batch; buckets bound the n² inside each task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.functions import vectors as V

SEED = 42
N_PLANES = 4  # 16 LSH buckets


def _lsh_bucket(vcol, planes: np.ndarray):
    bits = []
    for p in range(planes.shape[0]):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        bits.append(F.when(V.dot(vcol, plane) > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def smote(
    df: DataFrame,
    id_col: str,
    features_col: str,
    label_col: str,
    minority_label,
    k: int = 5,
    oversample_ratio: int = 2,
    seed: int = SEED,
) -> DataFrame:
    """Return ``df`` plus ``oversample_ratio`` synthetic minority rows
    per minority row. ``features_col`` must be array<double>.

    Synthetic rows get negative ids (-(id * ratio + j + 1)) so they are
    distinguishable and deterministic.
    """
    dim = len(df.select(features_col).first()[0])
    planes = np.round(
        np.random.RandomState(seed).standard_normal((N_PLANES, dim)), 6
    )

    minority = df.filter(F.col(label_col) == minority_label).select(
        F.col(id_col).alias("id"),
        F.col(features_col).alias("v"),
    )
    bucketed = minority.withColumn("bucket", _lsh_bucket(F.col("v"), planes))

    out_schema = f"id bigint, v array<double>, label_out string"

    def synth(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.array(pdf["v"].tolist(), dtype=np.float64)
        ids = pdf["id"].to_numpy()
        n = len(pdf)
        if n >= 2:
            kk = min(k, n - 1)
            # exact per-bucket k-NN (euclidean)
            d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
            np.fill_diagonal(d2, np.inf)
            nn = np.argsort(d2, axis=1)[:, :kk]
        else:
            # singleton bucket: SMOTE degenerates to duplication
            kk = 1
            nn = np.zeros((n, 1), dtype=int)
        rows = []
        for i in range(n):
            rng = np.random.RandomState(seed + int(ids[i]) % (2**31 - 1))
            for j in range(oversample_ratio):
                neigh = nn[i][rng.randint(0, kk)]
                gap = rng.random_sample()
                x_new = X[i] + gap * (X[neigh] - X[i])
                rows.append(
                    {
                        "id": -(int(ids[i]) * oversample_ratio + j + 1),
                        "v": x_new.tolist(),
                        "label_out": "synthetic",
                    }
                )
        return pd.DataFrame(rows)

    synthetic = (
        bucketed.groupBy("bucket")
        .applyInPandas(synth, schema=out_schema)
        .select(
            F.col("id").alias(id_col),
            F.col("v").alias(features_col),
            F.lit(minority_label).alias(label_col),
        )
    )
    return df.select(id_col, features_col, label_col).unionByName(synthetic)


def undersample_majority(
    df: DataFrame, label_col: str, majority_label, fraction: float, seed: int = SEED
) -> DataFrame:
    """Seeded Bernoulli downsampling of the majority class (reference:
    smote_sampling.py:53)."""
    maj = df.filter(F.col(label_col) == majority_label).sample(
        withReplacement=False, fraction=fraction, seed=seed
    )
    return df.filter(F.col(label_col) != majority_label).unionByName(maj)


def class_weights(df: DataFrame, label_col: str, weight_col: str = "weight") -> DataFrame:
    """Cheap alternative to resampling: inverse-frequency weight column
    for ``weightCol``-aware estimators — no data movement at all."""
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n"))
    total = df.count()
    n_classes = counts.count()
    return df.join(F.broadcast(counts), label_col).withColumn(
        weight_col, F.lit(float(total)) / (F.lit(float(n_classes)) * F.col("n"))
    ).drop("n")
