"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing and
mining capabilities of the reference repo
(TanjaArsic/Data-warehouse-data-mining, surveyed in SURVEY.md), extended
with the relational/warehouse operator set and LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
required by BASELINE.json — all designed for a multi-executor cluster at
~100 TB scale, tested locally on small scale factors.

Layout:
    session.py    SparkSession factory (AQE on, UTC, tuned shuffle)
    catalog.py    testdata table loaders + temp-view registration
    registry.py   named query registry: (spark, sf_dir) -> DataFrame,
                  each with an ANSI-SQL oracle mirror for DuckDB
    operators/    relational, window, dedup, similarity, text, multimodal
    functions/    reusable column expression helpers
    sources/      readers/writers (csv with sentinel cleaning, parquet)
    plans/        plan introspection (pushdown / broadcast assertions)
    streaming/    structured-streaming builders + batch mirrors
    ml/           prep, classification, metrics, balancing (SMOTE)
"""

__version__ = "0.1.0"
