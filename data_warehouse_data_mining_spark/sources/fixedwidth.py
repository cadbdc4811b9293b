"""Fixed-width (columnar-position) text ingestion — the mainframe /
COBOL-extract format that still feeds enterprise warehouses: every
field lives at a fixed 1-based [start, start+width) byte range of the
line, no delimiters.

Same architecture as sources/textlog.py: ``spark.read.text`` is the
narrowest possible scan (one string column, line-splittable at any
size), and all slicing happens in ``substring``/``trim``/``cast``
expressions inside whole-stage codegen — no Python in the loop, no
regex. Short lines yield empty slices -> NULL after the nullable cast,
and a ``_malformed`` flag quarantines lines shorter than the layout
(the JSONL corrupt-record contract).

At 100 TB: line-splittable text parallelizes for free, the slice
expressions are map-side, and column pruning drops unused substrings
at the optimizer level because each field is an independent projection
expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (name, 1-based start, width, spark type) — the classic layout record.
ColSpec = tuple[str, int, int, str]


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: list[ColSpec],
    keep_malformed: bool = False,
) -> DataFrame:
    """Parse a fixed-width file into typed columns.

    Each field is ``trim(substring(value, start, width))`` try_cast to
    its declared type — blank padding and unparseable junk both become
    NULL instead of failing the job under ANSI mode (the corrupt-record
    contract: bad FIELDS null out, bad LINES are flagged).
    Lines shorter than the layout's end are flagged ``_malformed`` and
    dropped unless ``keep_malformed`` (then they surface with the flag
    for a quarantine sink)."""
    need = max(start + width - 1 for _, start, width, _ in colspecs)
    raw = spark.read.text(path)
    cols = []
    for name, start, width, typ in colspecs:
        sliced = F.trim(F.substring(F.col("value"), start, width))
        cols.append(sliced.try_cast(typ).alias(name))
    out = raw.select(
        *cols, (F.length("value") < need).alias("_malformed")
    )
    if keep_malformed:
        return out
    return out.filter(~F.col("_malformed")).drop("_malformed")
