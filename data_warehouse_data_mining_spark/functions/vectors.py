"""Vector math over ``array<float>`` embedding columns — pure built-in
expressions (zip_with / aggregate fold), fully codegen'd, no UDF.

The fold accumulates left-to-right in double precision, matching
DuckDB's ``list_inner_product`` on ``DOUBLE[]`` for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
