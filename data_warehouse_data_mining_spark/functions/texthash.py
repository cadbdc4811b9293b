"""Deterministic, engine-portable text hashing primitives.

Dedup / fingerprinting needs hash functions that produce IDENTICAL
values in Spark and in the DuckDB oracle. Spark's ``hash``/``xxhash64``
and DuckDB's ``hash`` are different algorithms, so everything here is
built on ``md5`` (bit-identical in both engines) plus plain integer
arithmetic. md5 is ~3× slower than xxhash64 but still JVM-side,
vectorized, and entirely shuffle-free at the map stage — at 100 TB the
hashing cost is dwarfed by the candidate-join shuffle it feeds.

All helpers return Spark Column expressions; the matching oracle SQL is
assembled in the operator modules with the same formulas.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def words(text: Column) -> Column:
    """Whitespace tokenization (single-space corpus)."""
    return F.split(text, " ")


def word_shingles(ws: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string>.

    transform(sequence(...)) runs inside whole-stage codegen — no UDF.
    Documents with fewer than ``n`` words yield an empty array.
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(-1)))
    return F.when(F.size(ws) >= n, F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j + 1) for j in range(n)])
    )).otherwise(F.array().cast("array<string>"))


def seeded_md5(seed: int, value: Column) -> Column:
    """Hash family member ``h_seed``: md5 of 'seed:value' (hex string;
    lexicographic MIN over hex strings is the minhash)."""
    return F.md5(F.concat(F.lit(f"{seed}:"), value))


def minhash_aggs(shingle_col: str, num_hashes: int) -> list[Column]:
    """One pass of ``num_hashes`` minhash aggregates over an exploded
    shingle column — a single hash-aggregate job, no shuffle per hash."""
    return [
        F.min(seeded_md5(j, F.col(shingle_col))).alias(f"h{j}")
        for j in range(num_hashes)
    ]


def band_signature(band_id: int, rows_per_band: int) -> Column:
    """LSH band signature: md5 over the concatenated minhashes of the band."""
    start = band_id * rows_per_band
    cols = [F.col(f"h{j}") for j in range(start, start + rows_per_band)]
    return F.md5(F.concat_ws("|", *cols))


def hex_digit_val(hexstr: Column, pos_1based: int) -> Column:
    """Value 0-15 of one hex digit — portable to DuckDB as
    ``strpos('0123456789abcdef', substr(h, p, 1)) - 1``."""
    return F.instr(F.lit(HEX), F.substring(hexstr, pos_1based, 1)) - 1
