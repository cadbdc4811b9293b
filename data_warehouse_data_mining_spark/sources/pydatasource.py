"""Custom Python data source — Spark 4's pure-Python extension point.

The DataSource API (``pyspark.sql.datasource``) lets a source that has
no JVM connector become a first-class ``spark.read.format(...)``: the
planner asks the Python class for a schema and a PARTITION LIST, then
fans the per-partition ``read`` out across executors — so a Python
source scales horizontally exactly like a file scan, instead of
funneling through one driver-side generator.

The example source is a deterministic synthetic log generator (seeded
by row index, no RNG state) — the shape of any "read from a service/
API/custom format" connector: options → partition plan → per-partition
iterator. Arrow-batches flow back; no driver collect.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

LEVELS = ("INFO", "WARN", "ERROR")


class SyntheticLogsDataSource(DataSource):
    """``spark.read.format("synthetic_logs")`` — options:
    ``rows`` (total, default 1000), ``partitions`` (default 4)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_logs"

    def schema(self) -> str:
        return "log_id BIGINT, level STRING, msg STRING"

    def reader(self, schema) -> "SyntheticLogsReader":
        return SyntheticLogsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticLogsStreamReader":
        return SyntheticLogsStreamReader(self.options)


class SyntheticLogsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> list[InputPartition]:
        # even row-range split — the planner schedules one task per entry
        step = -(-self.n_rows // self.n_parts)
        return [
            InputPartition((lo, min(lo + step, self.n_rows)))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        lo, hi = partition.value
        for i in range(lo, hi):
            yield i, LEVELS[i % len(LEVELS)], f"unit-{i % 7} event-{i}"


class SyntheticLogsStreamReader(SimpleDataSourceStreamReader):
    """``spark.readStream.format("synthetic_logs")`` — the same source
    as a STREAMING Python data source (Spark 4): offsets are plain
    dicts the engine checkpoints, each micro-batch is the rows between
    two offsets, and ``readBetweenOffsets`` replays any committed range
    bit-identically on recovery — the exactly-once contract a custom
    connector (queue poller, API tailer) must honor. Options:
    ``batch_rows`` (default 50), ``max_batches`` (default 3; the source
    reports no new data after that, so AvailableNow/processAllAvailable
    terminates instead of tailing forever)."""

    def __init__(self, options: dict) -> None:
        self.batch_rows = int(options.get("batch_rows", 50))
        self.max_batches = int(options.get("max_batches", 3))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _rows(self, lo: int, hi: int) -> Iterator[tuple]:
        # a LIST iterator, not a generator: the engine's prefetch cache
        # copy.copy()s (and may pickle) the iterator it caches, which
        # generators don't support
        return iter(
            [
                (i, LEVELS[i % len(LEVELS)], f"unit-{i % 7} event-{i}")
                for i in range(lo, hi)
            ]
        )

    def read(self, start: dict):
        lo = start["row"]
        if lo >= self.max_batches * self.batch_rows:
            return iter([]), {"row": lo}  # caught up: no progress
        hi = lo + self.batch_rows
        return self._rows(lo, hi), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay: recovery re-reads a committed range and
        # gets byte-identical rows (row index is the only state)
        return self._rows(start["row"], end["row"])


def register_synthetic_logs(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(SyntheticLogsDataSource)
