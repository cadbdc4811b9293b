"""JSON-lines ingestion — the de-facto interchange format of web-scale
training corpora (one JSON document per line, possibly malformed).

The reference ingests only CSV (stroke_predict.py:22-23); a corpus
pipeline at 100 TB mostly reads JSONL dumps, where parse failures are a
fact of life. Spark's native JSON source handles this without any
Python in the loop:

* **explicit schema** — skips the inference scan (which at 100 TB is a
  full extra pass over the data) and pins types;
* **PERMISSIVE + columnNameOfCorruptRecord** — malformed lines land in
  a quarantine column instead of killing the job, so one job splits
  clean rows from rejects in a single scan;
* **DROPMALFORMED / FAILFAST** — for pipelines that prefer silence or
  loudness over quarantine.

JSONL is splittable line-by-line, so scans parallelize per-block even
on huge single files (unlike multiline JSON, which is one record per
file and deliberately not offered here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema. In PERMISSIVE
    mode a ``_corrupt_record`` column is appended automatically so
    callers can quarantine rejects (see ``split_corrupt``)."""
    if mode == "PERMISSIVE":
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if CORRUPT_COL not in schema.fieldNames():
            schema = schema.add(CORRUPT_COL, T.StringType())
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, rejects): clean rows with the quarantine column dropped,
    and the raw text of every malformed line. Spark requires caching or
    re-selection before filtering on the corrupt column alone; keeping
    both splits off one cached parse keeps this a single scan."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejects = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, rejects


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Line-delimited JSON sink (one file per partition — compact with
    sources.csv.compact_parquet-style repartition first if needed)."""
    df.write.mode(mode).json(path)
