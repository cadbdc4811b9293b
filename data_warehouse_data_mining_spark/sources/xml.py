"""XML ingestion — built into Spark 4 (the former spark-xml package
graduated into the core distribution), so feeds that still arrive as
XML (legacy enterprise exports, sitemaps, news archives like those in
web-scale training corpora) read without extra jars.

The reference ingests only CSV (stroke_predict.py:22-23); this rounds
out the ingest surface next to JSONL/CSV/ORC/parquet. Scale notes:

* **explicit schema** — as with JSONL, inference costs a full extra
  scan at 100 TB; pin the schema.
* **rowTag streaming parse** — the reader splits on the row tag, so a
  directory of many XML files parallelizes per-file. A single giant
  XML file is NOT splittable (one tree); corpus layouts must shard
  files — documented here as the contract, matching how the other
  sources push layout concerns to the writer.
* **PERMISSIVE quarantine** — malformed records land in a corrupt
  column rather than failing the scan, same contract as read_jsonl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | str | None = None,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read XML files, one record per ``row_tag`` element. With a
    schema, malformed records quarantine into ``_corrupt_record``
    (PERMISSIVE) exactly like read_jsonl."""
    reader = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if mode == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
            schema = schema.add(CORRUPT_COL, T.StringType())
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row", root_tag: str = "rows") -> None:
    """Write a DataFrame as XML (one ``row_tag`` element per row) —
    the round-trip partner of read_xml for export feeds."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode("overwrite")
        .save(path)
    )
