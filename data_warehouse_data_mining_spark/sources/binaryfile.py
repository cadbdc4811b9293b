"""Binary-file ingestion — the real on-ramp for multimodal corpora.

``spark.read.format("binaryFile")`` turns a directory tree of images /
audio / video / arbitrary blobs into a DataFrame of
(path, modificationTime, length, content<binary>) WITHOUT any Python in
the loop — the JVM reads each file once into a single binary cell.
operators/multimodal.py then featurizes those payloads via Arrow
mapInPandas.

Scale notes:
* one file = one row = one task unit; the source parallelizes per-file,
  so millions of small files scan wide while a handful of giant files
  serialize — shard/multi-part large media at write time.
* ``pathGlobFilter`` prunes by extension at LISTING time (no read);
  ``recursiveFileLookup`` walks nested layouts.
* files stream through the reader whole; cap blob size upstream
  (``spark.sql.sources.binaryFile.maxLength`` guards the 2 GiB row
  limit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Read every file under ``path`` as one row with its raw bytes in
    ``content``. ``glob`` (e.g. ``*.png``) prunes during listing."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    reader = reader.option("recursiveFileLookup", str(recursive).lower())
    return reader.load(path)
