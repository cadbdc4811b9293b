"""Deduplication operators over the ``documents`` table.

LLM-training-data dedup at 100 TB is the design point (BASELINE.json
north star). Three families, all shuffle-disciplined:

* **exact** — md5 group-by; one shuffle on the 32-char digest, never on
  the full text.
* **MinHash + LSH near-dup** — word-shingle → 16-way minhash (single
  aggregate pass) → 4 bands × 4 rows → candidates via equi-join on
  (band, signature) → exact Jaccard re-rank of candidates only.  The
  candidate join is the only pairwise step and touches candidate pairs,
  not n² pairs.  Every hash is md5-based (functions/texthash.py) so the
  DuckDB oracle reproduces values bit-for-bit.
* **SimHash** — 16-bit fingerprint via per-token hex-digit bit votes;
  near-dup buckets = equal fingerprints.

The reference has only implicit exact-dedup surface (distinct,
smote_sampling.py:9); everything else is north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.functions import texthash as th
from data_warehouse_data_mining_spark.registry import register

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = 4
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.35


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) — distinct word-3-gram shingles per document.

    The scan is repartitioned to the session's parallelism first: text
    corpora often arrive as few large unsplittable files (this one is a
    single row group), and shingling+hashing is the CPU-heavy map stage
    — without the cheap doc-level reshuffle it would run on one core.
    """
    d = load(spark, sf_dir).documents.repartition(
        spark.sparkContext.defaultParallelism
    )
    ws = th.words(F.col("text"))
    return (
        d.select("doc_id", F.explode(th.word_shingles(ws, SHINGLE_N)).alias("shingle"))
        .distinct()
    )


# Oracle CTE fragments shared by the minhash queries (DuckDB dialect,
# same formulas as the Spark builders).
_ORACLE_SHINGLES = f"""
    words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    shingles AS (
      SELECT DISTINCT doc_id,
             ws[pos] || ' ' || ws[pos + 1] || ' ' || ws[pos + 2] AS shingle
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - {SHINGLE_N - 2})) AS pos
            FROM words WHERE len(ws) >= {SHINGLE_N})
    )
"""

_ORACLE_MINHASH = (
    "minhash AS (SELECT doc_id, "
    + ", ".join(
        f"min(md5('{j}:' || shingle)) AS h{j}" for j in range(NUM_HASHES)
    )
    + " FROM shingles GROUP BY doc_id)"
)


def _oracle_bands() -> str:
    branches = []
    for b in range(BANDS):
        cols = " || '|' || ".join(
            f"h{j}" for j in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)
        )
        branches.append(
            f"SELECT doc_id, {b} AS band_id, md5({cols}) AS sig FROM minhash"
        )
    return "bands AS (" + " UNION ALL ".join(branches) + ")"


_ORACLE_CANDIDATES = f"""
    candidates AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
"""


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical representative (min doc_id) per content
    hash. Shuffles 32-byte digests, not documents — the 100 TB shape."""
    d = load(spark, sf_dir).documents
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@register(
    "minhash_signatures",
    oracle="WITH "
    + _ORACLE_SHINGLES
    + ", "
    + _ORACLE_MINHASH
    + " SELECT doc_id, h0, h7, h15 FROM minhash",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature computation (spot-checking 3 of the 16 hashes):
    one explode + one aggregate pass, no per-hash jobs."""
    sh = _shingles(spark, sf_dir)
    sig = sh.groupBy("doc_id").agg(*th.minhash_aggs("shingle", NUM_HASHES))
    return sig.select("doc_id", "h0", "h7", "h15")


@register(
    "dedup_minhash_lsh",
    headline=True,
    oracle="WITH "
    + _ORACLE_SHINGLES
    + ", "
    + _ORACLE_MINHASH
    + ", "
    + _oracle_bands()
    + ", "
    + _ORACLE_CANDIDATES
    + f""",
    sizes AS (SELECT doc_id, count(*) AS ns FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      FROM candidates c
      JOIN shingles sa ON sa.doc_id = c.doc_a
      JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           round(i.n_inter * 1.0 / (za.ns + zb.ns - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE i.n_inter * 1.0 / (za.ns + zb.ns - i.n_inter) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs: MinHash-LSH candidates re-ranked by exact
    shingle Jaccard.

    Scale shape: shingling/hashing are map-side; the band join shuffles
    (band, 32-byte sig); the Jaccard re-rank touches only candidate
    pairs' shingles.  No n² stage exists anywhere.  The shingle table
    feeds three consumers (signatures + both sides of the intersection
    join), so it is persisted — on a cluster-scale corpus stage it to a
    parquet temp table instead.
    """
    sh = _shingles(spark, sf_dir).persist()
    # one aggregate pass: all 16 minhashes AND the set size together
    sig = sh.groupBy("doc_id").agg(
        *th.minhash_aggs("shingle", NUM_HASHES), F.count(F.lit(1)).alias("ns")
    )

    # 4 band signatures in one projection + explode (no multi-branch
    # union re-reading the signature table)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                th.band_signature(b, ROWS_PER_BAND).alias("sig"),
            )
            for b in range(BANDS)
        ]
    )
    bands = sig.select(
        "doc_id", F.explode(band_structs).alias("bs")
    ).select("doc_id", F.col("bs.band_id").alias("band_id"), F.col("bs.sig").alias("sig"))

    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("band_id").alias("band_a"),
        F.col("sig").alias("sig_a"),
    )
    bnd = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("band_id").alias("band_b"),
        F.col("sig").alias("sig_b"),
    )
    candidates = (
        a.join(
            bnd,
            (F.col("band_a") == F.col("band_b"))
            & (F.col("sig_a") == F.col("sig_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )

    sizes = sig.select("doc_id", "ns")
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b2"), F.col("shingle").alias("sh_b"))
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("doc_b2")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("ns").alias("ns_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("ns").alias("ns_b"))
    jac = F.col("n_inter") / (F.col("ns_a") + F.col("ns_b") - F.col("n_inter"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def _oracle_simhash() -> str:
    """DuckDB SQL for the 16-bit simhash (mirrors simhash_fingerprints)."""
    return """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    wc AS (SELECT doc_id, w, count(*) AS cnt FROM tok GROUP BY doc_id, w),
    bits AS (
      SELECT doc_id, cnt,
             (p - 1) * 4 + b AS bit_idx,
             CAST(floor((strpos('0123456789abcdef', substr(md5(w), p, 1)) - 1)
                        / CASE b WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)
                  AS INT) % 2 AS bit_val
      FROM wc,
           (SELECT unnest(range(1, 5)) AS p),
           (SELECT unnest(range(0, 4)) AS b)
    ),
    votes AS (
      SELECT doc_id, bit_idx,
             sum(CASE WHEN bit_val = 1 THEN cnt ELSE -cnt END) AS vote
      FROM bits GROUP BY doc_id, bit_idx
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << bit_idx ELSE 0 END) AS BIGINT)
             AS simhash
    FROM votes GROUP BY doc_id
    """


@register("simhash_fingerprints", oracle=_oracle_simhash())
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document: per-token md5 hex digits vote on
    each fingerprint bit, weighted by token count. Entirely map+agg —
    two shuffles total (token counts, bit votes), independent of corpus
    size per-row."""
    d = load(spark, sf_dir).documents
    tok = d.select("doc_id", F.explode(th.words(F.col("text"))).alias("w"))
    wc = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    wc = wc.withColumn("h4", F.substring(F.md5("w"), 1, 4))

    # Expand each (doc, word) into 16 (bit_idx, bit_val) rows using only
    # codegen'd expressions (no UDF): 4 hex digits × 4 bits.
    bit_pairs = F.array(
        *[
            F.struct(
                F.lit((p - 1) * 4 + b).alias("bit_idx"),
                (
                    F.floor(th.hex_digit_val(F.col("h4"), p) / (2 ** (3 - b))).cast("int")
                    % 2
                ).alias("bit_val"),
            )
            for p in range(1, 5)
            for b in range(0, 4)
        ]
    )
    bits = wc.select("doc_id", "cnt", F.explode(bit_pairs).alias("bv")).select(
        "doc_id", "cnt", F.col("bv.bit_idx").alias("bit_idx"), F.col("bv.bit_val").alias("bit_val")
    )
    votes = bits.groupBy("doc_id", "bit_idx").agg(
        F.sum(F.when(F.col("bit_val") == 1, F.col("cnt")).otherwise(-F.col("cnt"))).alias(
            "vote"
        )
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("vote") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), bit_idx)"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).cast("bigint").alias("simhash")
    )


@register(
    "ngram_jaccard_pairs",
    oracle="WITH "
    + _ORACLE_SHINGLES
    + """,
    sizes AS (SELECT doc_id, count(*) AS ns FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS n_inter
      FROM shingles sa JOIN shingles sb
        ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           round(i.n_inter * 1.0 / (za.ns + zb.ns - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE i.n_inter * 1.0 / (za.ns + zb.ns - i.n_inter) >= 0.2
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard via inverted index: pairs form ONLY by joining on
    shared shingles (no crossJoin). Rare-shingle corpora keep this
    near-linear; degenerate hot shingles are AQE-skew-join territory."""
    sh = _shingles(spark, sf_dir).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ns"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("sh_b"))
    inter = (
        sa.join(sb, (F.col("sh_a") == F.col("sh_b")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("ns").alias("ns_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("ns").alias("ns_b"))
    jac = F.col("n_inter") / (F.col("ns_a") + F.col("ns_b") - F.col("n_inter"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
