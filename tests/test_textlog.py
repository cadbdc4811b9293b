"""Raw text-line ingest: regex field extraction, quarantine of
unparsable lines, and the status rollup — all UDF-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.sources.textlog import (
    read_text_log,
    status_rollup,
)

LINES = [
    '10.0.0.1 - alice [01/Jul/2026:10:00:00 +0000] "GET /index.html HTTP/1.1" 200 5120',
    '10.0.0.2 - - [01/Jul/2026:10:00:01 +0000] "POST /api/v1/items HTTP/1.1" 201 64',
    '10.0.0.1 - alice [01/Jul/2026:10:00:02 +0000] "GET /missing HTTP/1.1" 404 -',
    "corrupted line that matches nothing",
    '10.0.0.3 - bob [01/Jul/2026:10:00:03 +0000] "GET /index.html HTTP/1.1" 200 5120',
]


def test_text_log_parse_and_quarantine(spark, tmp_path):
    p = tmp_path / "access.log"
    p.write_text("\n".join(LINES) + "\n")
    parsed = read_text_log(spark, str(p))

    assert parsed.count() == 5
    bad = parsed.filter(F.col("host").isNull())
    assert bad.count() == 1
    assert bad.collect()[0]["raw"] == "corrupted line that matches nothing"

    ok = parsed.filter(F.col("host").isNotNull()).orderBy("ts").collect()
    assert [r["status"] for r in ok] == [200, 201, 404, 200]
    assert ok[0]["method"] == "GET" and ok[0]["path"] == "/index.html"
    assert ok[2]["n_bytes"] is None  # "-" bytes -> null, not parse failure
    assert ok[0]["ts"] is not None


def test_status_rollup(spark, tmp_path):
    p = tmp_path / "access.log"
    p.write_text("\n".join(LINES) + "\n")
    roll = status_rollup(read_text_log(spark, str(p))).collect()
    by_status = {r["status"]: r for r in roll}
    assert by_status[200]["n_requests"] == 2
    assert by_status[200]["total_bytes"] == 10240
    assert by_status[200]["n_hosts"] == 2
    assert by_status[404]["total_bytes"] == 0
