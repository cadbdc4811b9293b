"""Table catalog for the driver-provided warehouse tables.

Loads the TPC-H-ish star schema + events/documents/embeddings parquet
tables (TESTDATA.md) and registers them as temp views. Parquet is
self-describing so no inference pass is needed (unlike the reference's
double-scanning ``inferSchema=True`` CSV reads, stroke_predict.py:22-23).

Scale notes: these are plain ``spark.read.parquet`` scans — Catalyst
gets full predicate pushdown / column pruning / partition pruning. At
100 TB the same code works against a partitioned table root; nothing
here materializes or collects.

SESSION SIDE EFFECT (deliberate, global): the first ``Catalog.table``
call pins ``spark.sql.session.timeZone=UTC`` and
``spark.sql.legacy.parquet.nanosAsLong=true`` on the session for the
rest of its lifetime — timestamp display/arithmetic semantics change
for an externally built SparkSession. This is the oracle contract (all
results are compared against DuckDB's naive-UTC timestamps) and every
operator in this package assumes it. The streaming path
(``streaming.windows.read_event_stream``) applies the same pin itself
so it does not depend on the batch catalog having run first.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Per-session memo of the LAZY table DataFrames, stored as a private
# attribute ON the SparkSession wrapper, keyed by (sf_dir, table).
# This is plan-handle reuse, not data caching: a DataFrame is an
# unexecuted logical plan over the parquet files — nothing is
# persisted, every action still computes from the files — but
# constructing one costs a ~115 ms driver round-trip
# (spark.read.parquet schema read + file listing, measured r13), paid
# per table per query build before this memo. The memo must live with
# the SESSION, not the applicationId: DataFrames carry their creating
# session (temp views, session confs), and newSession() clones share
# one appId — an appId-keyed memo handed a clone's DataFrame to the
# parent session, which broke temp-view registration and ML binds in
# the concurrent suite (measured r13). r14 (ADVICE r13): the r13
# WeakKeyDictionary form leaked — its VALUES (DataFrames) strongly
# reference their session, so each entry kept its own key alive for
# the process lifetime; an attribute on the wrapper has exactly the
# intended lifetime (dies with the session object) with no cycle
# through the registry.
#
# Known, accepted semantics (ADVICE r13): the memoized DataFrame
# freezes the parquet FILE LISTING captured at first read — within one
# session, a fresh Catalog over the same sf_dir will not see files
# added/replaced on disk (the pre-r13 code re-listed per Catalog).
# Benchmark/test data is static; regenerate data in a new session.
_MEMO_ATTR = "_spark_graft_table_memo"
# Conf-pin flag, same attribute pattern. Pinned once per session: if
# external code mutates spark.sql.session.timeZone AFTER the first
# catalog use, later Catalogs inherit the drift (the pre-r13 code
# re-pinned per Catalog). Nothing in-repo does this; the oracle
# contract assumes the session stays UTC once pinned.
_PINNED_ATTR = "_spark_graft_confs_pinned"


@dataclass
class Catalog:
    """Lazy handle over one scale-factor directory of parquet tables."""

    spark: SparkSession
    sf_dir: str
    _cache: dict[str, DataFrame] = field(default_factory=dict)

    def table(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
        if name not in self._cache:
            if not getattr(self.spark, _PINNED_ATTR, False):
                # events.parquet has carried INT64 TIMESTAMP(NANOS) in
                # some testdata generations; Spark rejects that unless
                # nanosAsLong is on. Both confs are runtime-settable,
                # and the catalog may be handed an externally built
                # SparkSession that lacks them, so set them here rather
                # than relying on session.py. The UTC pin also
                # guarantees the oracle contract (timestamps compared
                # against DuckDB's naive-UTC semantics) regardless of
                # the host session's timezone. Pinned once per SESSION
                # (confs are session-scoped; newSession() clones need
                # their own pin).
                self.spark.conf.set(
                    "spark.sql.legacy.parquet.nanosAsLong", "true"
                )
                self.spark.conf.set("spark.sql.session.timeZone", "UTC")
                setattr(self.spark, _PINNED_ATTR, True)
            per_session = getattr(self.spark, _MEMO_ATTR, None)
            if per_session is None:
                per_session = {}
                setattr(self.spark, _MEMO_ATTR, per_session)
            key = (os.path.abspath(self.sf_dir), name)
            if key not in per_session:
                df = self.spark.read.parquet(
                    os.path.join(self.sf_dir, f"{name}.parquet")
                )
                if name == "events":
                    df = normalize_events(df)
                per_session[key] = df
            self._cache[name] = per_session[key]
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for ``spark.sql`` use."""
        for name in TABLE_NAMES:
            self.table(name).createOrReplaceTempView(name)


def normalize_events(df: DataFrame) -> DataFrame:
    """Normalize events.ts to a UTC TIMESTAMP (LTZ) whatever the file
    carries. Testdata generations differ: TIMESTAMP(NANOS) arrives as a
    raw ns long under nanosAsLong (floor-divide to µs — exactly how
    DuckDB truncates ns to its µs-precision TIMESTAMP), while
    TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ
    (cast to LTZ — identity under the catalog's UTC session pin). A
    single arrival type keeps every downstream operator (window(),
    unix_micros, watermarks) on one code path. Applied by both the
    batch catalog and the streaming readers."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str | None = None) -> Catalog:
    return Catalog(spark, sf_dir or DEFAULT_SF_DIR)


def table_rows(sf_dir: str, name: str) -> int:
    """Exact row count of one catalog table from parquet FOOTER metadata
    only — no Spark job, no data pages read. Used by operators that
    auto-size from the corpus count (simhash128 banding) so sizing does
    not cost an extra scan per invocation; on a real cluster the same
    footers back the count, so this stays cheap at any scale. Handles
    both a single file and a directory of part files."""
    import pyarrow.parquet as pq

    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        return total
    return pq.ParquetFile(path).metadata.num_rows
