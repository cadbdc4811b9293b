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

    transform(...) runs inside whole-stage codegen — no UDF. Documents
    with fewer than ``n`` words yield an empty array.

    The token array is BOUND AS A LAMBDA VARIABLE via a one-element
    array wrap before the per-gram transform: callers pass ``ws`` as an
    unmaterialized expression (usually split(text)), and Catalyst
    substitutes such expressions at EVERY reference site inside lambda
    bodies — the old element_at(ws, i+j+1) form re-evaluated split()
    per gram per position, turning a 12k-token document into O(n²)
    work (measured 55 s/doc; r10). Lambda variables are evaluated
    once, so this form is linear (same document: ~1 s) with byte-
    identical output."""

    def over(arr: Column) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(arr) - n, F.lit(-1)))
        return F.when(
            F.size(arr) >= n,
            F.transform(idx, lambda i: F.array_join(F.slice(arr, i + 1, n), " ")),
        ).otherwise(F.array().cast("array<string>"))

    return bind(ws, over)


def bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` ONCE per row and pass it to ``fn`` as a BOUND
    lambda variable (one-element array wrap + transform + element_at).

    Catalyst substitutes outer expressions at EVERY reference site
    inside higher-order-function lambda bodies, so a per-element lambda
    that indexes into an unmaterialized array expression (split(text),
    typically) re-evaluates that expression once per element — the
    O(n²) class found in word_shingles in r10 (55 s for one 12k-token
    document). Any windowed/indexed walk over a derived array must go
    through this binder (or a separate projection)."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


MINHASH_PRIME = 4294967291  # largest 32-bit prime


def md5_word(value: Column, lo_1based: int) -> Column:
    """BIGINT value of 8 hex digits of md5(value) starting at ``lo``.

    Two words of ONE md5 seed the whole Carter-Wegman minhash family —
    h_j = (b1 + j·b2) mod MINHASH_PRIME — so k minhashes cost one md5
    per shingle plus k integer ops, instead of k md5 calls (~8× less
    hashing for k=16; the dominant map-stage cost at corpus scale).
    Oracle twin: fold of strpos('0123456789abcdef', ...) digits."""
    return F.conv(F.substring(F.md5(value), lo_1based, 8), 16, 10).cast("bigint")


def affine_minhash_aggs(num_hashes: int) -> list[Column]:
    """MIN aggregates of the affine hash family over pre-projected
    ``b1``/``b2`` word columns (see md5_word) — one hash-aggregate job,
    no shuffle per hash. Built as one parsed SQL string per aggregate
    (not per-operator Column composition): the Column form cost ~6 py4j
    round-trips per hash per query BUILD — ~0.24 s of the minhash
    builder's driver time at k=16, measured r13 — while F.expr parses
    the identical expression in one call. b1/b2 are non-negative
    (< 2^32) and j ≤ k, so SQL % equals the Column % here (no sign or
    overflow divergence)."""
    return [
        F.expr(f"min((b1 + {j} * b2) % {MINHASH_PRIME}) AS h{j}")
        for j in range(num_hashes)
    ]


def band_signature(band_id: int, rows_per_band: int) -> Column:
    """LSH band signature: md5 over the concatenated minhashes of the
    band (one parsed expression — see affine_minhash_aggs on why)."""
    start = band_id * rows_per_band
    cols = ", ".join(f"h{j}" for j in range(start, start + rows_per_band))
    return F.expr(f"md5(concat_ws('|', {cols}))")


def hex_digit_val(hexstr: Column, pos_1based: int) -> Column:
    """Value 0-15 of one hex digit — portable to DuckDB as
    ``strpos('0123456789abcdef', substr(h, p, 1)) - 1``."""
    return F.instr(F.lit(HEX), F.substring(hexstr, pos_1based, 1)) - 1
