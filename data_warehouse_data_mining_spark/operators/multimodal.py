"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_image`` raises NotImplementedError; the
registered query uses a deterministic fake featurizer instead). The
Spark-side plumbing — binary column construction, schema, batch
iteration, partition-preserving featurization — is real and tested.

At 100 TB this shape is exactly how image/audio corpora are processed:
parquet binary columns in, mapInPandas featurizers out, no shuffle in
the featurize stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.registry import register

FEATURE_SCHEMA = (
    "doc_id bigint, mime string, n_bytes int, head_hex string, "
    "byte_mean double, printable_ratio double"
)


def with_payload(documents: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata to each row.

    Stands in for real image/audio bytes: payload = UTF-8 bytes of the
    text column; metadata mirrors what an ingest service would attach.
    """
    return documents.select(
        "doc_id",
        "source",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.struct(
            F.col("n_chars").alias("n_chars"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """STUB — image decode requires a codec library not present in this
    container. The Spark plumbing around it (binary column, mapInPandas
    batching) is real; swap this body for PIL/ffmpeg on a real cluster.
    """
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "extract_features uses a deterministic byte-level featurizer instead"
    )


RESIZED_SCHEMA = "doc_id bigint, mime string, payload binary, n_bytes int"
FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def resize_payloads(df_with_payload: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' operator: per-row payload → fixed-size payload.

    The real implementation decodes + resamples (PIL/ffmpeg — absent in
    this container); the stand-in truncates/pads bytes DETERMINISTICALLY
    so the Spark contract — schema, batch shape, partition-preserving
    map — is fully exercised and tested."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: bytes(b[:target_bytes]).ljust(target_bytes, b"\x00")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "payload": resized,
                    "n_bytes": resized.map(len).astype("int32"),
                }
            )

    return df_with_payload.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(
    df_with_payload: DataFrame, n_frames: int = 4, frame_bytes: int = 16
) -> DataFrame:
    """'Frame sampling' operator: one payload row → n evenly-strided
    frame rows (the video→frames fan-out shape: mapInPandas expanding
    rows, output NOT 1:1 with input — the part worth testing).

    The stand-in slices byte windows at even strides; a real decoder
    would emit actual frames. Deterministic."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if not b:
                    continue
                stride = max(1, (len(b) - frame_bytes) // max(1, n_frames - 1))
                for i in range(n_frames):
                    start = min(i * stride, max(0, len(b) - frame_bytes))
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_frames.append(b[start : start + frame_bytes])
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return df_with_payload.mapInPandas(_sample, schema=FRAMES_SCHEMA)


def _round6_half_away(x: float) -> float:
    """round(x, 6) with halves away from zero — SQL semantics.

    Python/pandas round() is banker's (half-to-even); byte means over
    power-of-two lengths are EXACT dyadic .xxxxxx5 ties (e.g. sum/128),
    where the two conventions diverge. Values here are non-negative."""
    import math

    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic byte-level featurizer (the fake 'decode' path).

    Pure per-row computation over Arrow batches: no state, no shuffle,
    partition-preserving — identical shape to a real decoder.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": n_bytes.astype("int32"),
                "head_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
                "byte_mean": payloads.map(
                    lambda b: _round6_half_away(float(sum(b)) / len(b))
                    if len(b)
                    else 0.0
                ),
                "printable_ratio": payloads.map(
                    lambda b: _round6_half_away(
                        sum(32 <= x < 127 for x in b) / len(b)
                    )
                    if len(b)
                    else 0.0
                ),
            }
        )


def extract_features(df_with_payload: DataFrame) -> DataFrame:
    """mapInPandas featurization over the binary payload column."""
    return df_with_payload.mapInPandas(_featurize_batches, schema=FEATURE_SCHEMA)


@register(
    "multimodal_payload_stats",
    oracle="""
    SELECT source,
           count(*) AS n,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           round(avg(octet_length(encode(text))), 6) AS avg_bytes
    FROM documents
    GROUP BY source
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column accounting per source: byte sizes of the opaque
    payload (JVM-side octet length — the featurizer never runs here)."""
    d = with_payload(load(spark, sf_dir).documents)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
        F.round(F.avg(F.length("payload")), 6).alias("avg_bytes"),
    )


@register(
    "multimodal_feature_extract",
    oracle="""
    WITH h AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents
    ), b AS (
      SELECT doc_id, nb, hx,
         list_transform(range(1, nb + 1),
            i -> (strpos('0123456789ABCDEF', substring(hx, (i-1)*2+1, 1)) - 1) * 16
               + (strpos('0123456789ABCDEF', substring(hx, (i-1)*2+2, 1)) - 1)) AS bytes
      FROM h
    )
    SELECT doc_id, 'text/plain' AS mime, CAST(nb AS INT) AS n_bytes,
           lower(substring(hx, 1, 16)) AS head_hex,
           coalesce(round(list_aggregate(
               list_transform(bytes, x -> CAST(x AS DOUBLE)), 'avg'), 6), 0.0) AS byte_mean,
           coalesce(round(list_aggregate(
               list_transform(bytes, x -> CASE WHEN x >= 32 AND x < 127 THEN 1.0 ELSE 0.0 END),
               'avg'), 6), 0.0) AS printable_ratio
    FROM b
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas featurization of binary payloads.
    Deterministic byte stats + head hex per payload; the DuckDB oracle
    re-derives every feature from hex(encode(text)) via list_transform,
    so the Python featurizer is value-checked end-to-end, not rows-only."""
    d = with_payload(load(spark, sf_dir).documents)
    return extract_features(d)


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH p AS (
      -- DuckDB substring() has no BLOB overload: slice the hex image
      -- instead (2 hex chars per byte — offsets double, semantics equal)
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS len
      FROM documents WHERE octet_length(encode(text)) > 0
    ),
    f AS (
      SELECT doc_id, i.i AS frame_idx,
             substring(hx,
                       1 + 2 * LEAST(i.i * GREATEST(1, (len - 16) // 3),
                                     GREATEST(0, len - 16)),
                       32) AS framehex
      FROM p CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(length(framehex) // 2) AS BIGINT) AS total_frame_bytes,
           md5(string_agg(framehex, '' ORDER BY frame_idx)) AS frames_digest
    FROM f
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out, hash-verified end to end: every payload
    expands to 4 evenly-strided frame windows through the REAL
    ``sample_frames`` mapInPandas path (row-expanding Arrow batches —
    the video→frames shape), and each document's sampled frames are
    digested (md5 over index-ordered frame hex) so the oracle checks
    the exact bytes, offsets, and frame order the sampler emitted — not
    just row counts. The stride arithmetic is pure integers, replicated
    verbatim in SQL.

    Scale shape: the fan-out is partition-preserving (no shuffle until
    the per-doc digest agg); a real decoder swaps into the same
    mapInPandas slot with this test still pinning the plumbing."""
    docs = load(spark, sf_dir).documents
    payloads = with_payload(docs).filter(F.length("payload") > 0)
    frames = sample_frames(payloads, n_frames=4, frame_bytes=16)
    sorted_hex = F.array_sort(
        F.collect_list(F.struct("frame_idx", F.hex("frame").alias("hx")))
    )
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.length("frame")).cast("long").alias("total_frame_bytes"),
            F.md5(
                F.concat_ws(
                    "", F.transform(sorted_hex, lambda s: s["hx"])
                )
            ).alias("frames_digest"),
        )
        .orderBy("doc_id")
    )


SHARD_BYTES = 4096  # max payload bytes per webdataset-style shard


@register(
    "multimodal_shard_manifest",
    oracle=f"""
    WITH pay AS (
      SELECT doc_id, source, octet_length(encode(text)) AS n_bytes
      FROM documents
    ),
    placed AS (
      SELECT doc_id, source, n_bytes,
             CAST(coalesce(sum(n_bytes) OVER (
                     PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) // {SHARD_BYTES} AS BIGINT) AS shard_id
      FROM pay
    )
    SELECT source, shard_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc,
           md5(string_agg(CAST(doc_id AS VARCHAR), ','
                          ORDER BY doc_id)) AS member_digest
    FROM placed GROUP BY source, shard_id
    """,
)
def multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Webdataset-style shard manifest for a binary-payload corpus:
    assign samples to ~{SHARD_BYTES}-byte shards per source (training
    readers stream one shard per worker; shards never span sources) and
    emit the manifest a shard-writer needs — member count, byte total,
    doc range, and an order-sensitive member digest for reader-side
    integrity checks.

    Shard assignment is the scalable prefix-sum placement:
    shard_id = floor(bytes_before / cap) over the deterministic
    (source, doc_id) stream — each shard overflows by at most one
    sample, which is the standard trade for making placement a WINDOW
    expression instead of a sequential greedy walk (same trick as
    ``operators/packing.py``). One shuffle on source for the window +
    one hash-agg; payload bytes are measured, never moved."""
    d = load(spark, sf_dir).documents
    pay = with_payload(d).select(
        "doc_id", "source", F.octet_length("payload").alias("n_bytes")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = pay.withColumn(
        "bytes_before", F.coalesce(F.sum("n_bytes").over(w), F.lit(0))
    ).select(
        "doc_id",
        "source",
        "n_bytes",
        # integer div, not float-floor: exact at any cumsum magnitude
        F.expr(f"bytes_before div {SHARD_BYTES}").cast("long").alias("shard_id"),
    )
    return placed.groupBy("source", "shard_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ).alias("member_digest"),
    )
