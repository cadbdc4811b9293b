"""Sources & sinks: sentinel CSV parsing, partitioned-parquet partition
pruning, bucketed-join shuffle elimination, connector gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.plans import explain
from data_warehouse_data_mining_spark.sources import connectors
from data_warehouse_data_mining_spark.sources.csv import read_csv, write_parquet

from .conftest import SF_SMALL


def test_csv_sentinel_to_null(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,score\n1,N/A\n2,3.5\n")
    df = read_csv(spark, str(p), schema="id INT, score DOUBLE", null_value="N/A")
    rows = {r.id: r.score for r in df.collect()}
    assert rows == {1: None, 2: 3.5}


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """A filter on the partition column must prune directories at plan
    time — at 100 TB this is the difference between scanning one
    partition and the whole table."""
    out = str(tmp_path / "orders_by_status")
    o = load(spark, SF_SMALL).orders
    write_parquet(o, out, partition_by=["o_orderstatus"])

    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = explain.formatted_plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0], "partition filter must appear in the scan"
    assert back.count() == o.filter(F.col("o_orderstatus") == "F").count()


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key co-locate: the sort-merge
    join needs no Exchange on either side — pre-shuffled at write time,
    the bucketing contract that amortizes one shuffle across every
    downstream join at scale."""
    t = load(spark, SF_SMALL)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # a previous crashed run may have left orphaned managed-table dirs
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for orphan in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse}/{orphan}", ignore_errors=True)
    (t.orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("b_orders"))
    (t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
     .write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("b_lineitem"))

    # force the sort-merge path (at test scale AQE would broadcast the
    # tiny side, which sidesteps bucketing; at 100 TB both sides are big
    # and SMJ is what the planner picks)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), "o_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = explain.formatted_plan(joined)
        tree = plan.split("\n\n")[0].splitlines()
        join_at = next(i for i, ln in enumerate(tree) if "SortMergeJoin" in ln)
        below_join = "\n".join(tree[join_at + 1 :])
        assert "Exchange" not in below_join, (
            "bucketed join must not shuffle either input:\n" + plan
        )
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # values still correct
    expected = {
        r.o_orderstatus: r.n
        for r in t.orders.join(
            t.lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        ).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {r.o_orderstatus: r.n for r in joined.collect()}
    assert got == expected
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_connectors_gate_cleanly(spark):
    with pytest.raises(connectors.ConnectorUnavailable, match="Delta"):
        connectors.read_delta(spark, "/tmp/nowhere")
    with pytest.raises(connectors.ConnectorUnavailable, match="Iceberg"):
        connectors.read_iceberg(spark, "nowhere.t")
    with pytest.raises(connectors.ConnectorUnavailable, match="Kafka"):
        connectors.read_kafka_stream(spark, "localhost:9092", "t")


def test_compact_parquet(spark, tmp_path):
    from data_warehouse_data_mining_spark.sources.csv import compact_parquet

    src = str(tmp_path / "fragmented")
    o = load(spark, SF_SMALL).orders
    o.repartition(32).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*")) == 32

    dst = str(tmp_path / "compacted")
    compact_parquet(spark, src, dst, target_files=2, sort_by=["o_orderdate"])
    assert len(glob.glob(f"{dst}/part-*")) == 2
    assert spark.read.parquet(dst).count() == o.count()


def test_json_lines_roundtrip(spark, tmp_path):
    """JSON-lines source with explicit schema (no inference pass)."""
    out = str(tmp_path / "docs_json")
    d = load(spark, SF_SMALL).documents
    d.write.mode("overwrite").json(out)
    back = spark.read.schema(d.schema).json(out)
    assert back.count() == d.count()
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in d.select("doc_id").collect()
    }


def test_orc_roundtrip(spark, tmp_path):
    """ORC source/sink (second columnar format, JVM-native path —
    schema, values, and pushdown-capable reads survive a round trip)."""
    out = str(tmp_path / "orders_orc")
    o = load(spark, SF_SMALL).orders
    o.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == o.schema
    assert back.count() == o.count()
    assert back.filter("o_totalprice > 1000").count() == o.filter(
        "o_totalprice > 1000"
    ).count()


def test_jsonl_permissive_quarantines_corrupt_lines(spark, tmp_path):
    """PERMISSIVE JSONL ingest: malformed lines land in _corrupt_record
    and split_corrupt separates them from clean rows in one parse —
    the quarantine pattern a 100 TB corpus ingest needs (a handful of
    bad dump lines must not kill a 1000-executor job)."""
    from data_warehouse_data_mining_spark.sources.jsonl import (
        read_jsonl,
        split_corrupt,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha beta"}\n'
        "{this is not json}\n"
        '{"doc_id": 2, "text": "gamma"}\n'
        '{"doc_id": "not_an_int", "text": "delta"}\n'
    )
    df = read_jsonl(spark, str(p), "doc_id BIGINT, text STRING")
    clean, rejects = split_corrupt(df)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert "_corrupt_record" not in clean.columns
    rej = [r._corrupt_record for r in rejects.collect()]
    assert len(rej) == 2 and "{this is not json}" in rej


def test_jsonl_dropmalformed_and_failfast(spark, tmp_path):
    """DROPMALFORMED silently keeps only parseable rows; FAILFAST
    raises on the first bad line."""
    from data_warehouse_data_mining_spark.sources.jsonl import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text('{"doc_id": 1}\nnot json at all\n{"doc_id": 2}\n')
    dropped = read_jsonl(spark, str(p), "doc_id BIGINT", mode="DROPMALFORMED")
    assert {r.doc_id for r in dropped.collect()} == {1, 2}

    import pytest as _pytest

    with _pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_jsonl(spark, str(p), "doc_id BIGINT", mode="FAILFAST").collect()


def test_xml_roundtrip(spark, tmp_path):
    """XML source/sink (built into Spark 4 core): write nation as XML,
    read it back with an explicit schema — values survive, no extra
    jars needed."""
    from data_warehouse_data_mining_spark.sources.xml import read_xml, write_xml

    out = str(tmp_path / "nation_xml")
    n = load(spark, SF_SMALL).nation
    write_xml(n, out, row_tag="nation")
    back = read_xml(
        spark,
        out,
        row_tag="nation",
        schema="n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT",
    )
    assert back.count() == n.count()
    assert {r.n_name for r in back.collect()} == {
        r.n_name for r in n.collect()
    }


def test_xml_permissive_quarantines_corrupt_records(spark, tmp_path):
    """Malformed XML records land in _corrupt_record instead of killing
    the scan — the same quarantine contract as read_jsonl."""
    from data_warehouse_data_mining_spark.sources.xml import (
        CORRUPT_COL,
        read_xml,
    )

    p = tmp_path / "feed.xml"
    p.write_text(
        "<rows>"
        "<row><id>1</id><name>ok</name></row>"
        "<row><id>not_a_number</id><name>bad</name></row>"
        "<row><id>3</id><name>ok2</name></row>"
        "</rows>"
    )
    df = read_xml(
        spark, str(tmp_path), row_tag="row", schema="id BIGINT, name STRING"
    ).cache()  # Spark disallows corrupt-column-only queries on raw scans
    clean = df.filter(F.col(CORRUPT_COL).isNull())
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    assert clean.count() == 2
    assert bad.count() == 1


def test_binary_file_source(spark, tmp_path):
    """binaryFile source: a directory of blobs becomes (path, length,
    content) rows — the ingest on-ramp the multimodal featurizer
    consumes; glob pruning filters at listing time."""
    from data_warehouse_data_mining_spark.sources.binaryfile import (
        read_binary_files,
    )

    (tmp_path / "nested").mkdir()
    blobs = {
        "a.png": b"\x89PNG\r\n\x1a\n" + bytes(range(64)),
        "b.png": b"\x89PNG\r\n\x1a\n" + bytes(range(32)),
        "nested/c.wav": b"RIFF" + b"\x00" * 44,
    }
    for rel, data in blobs.items():
        (tmp_path / rel).write_bytes(data)
    (tmp_path / "skip.txt").write_text("not binary media")

    all_media = read_binary_files(spark, str(tmp_path), glob="*.{png,wav}")
    got = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in all_media.collect()}
    assert got == {"a.png": blobs["a.png"], "b.png": blobs["b.png"], "c.wav": blobs["nested/c.wav"]}

    png_only = read_binary_files(spark, str(tmp_path), glob="*.png")
    assert png_only.count() == 2
    lengths = {r.path.rsplit("/", 1)[-1]: r.length for r in png_only.collect()}
    assert lengths == {"a.png": 72, "b.png": 40}


def test_python_datasource_partitioned_read(spark):
    """Spark 4 Python DataSource API: a pure-Python source plans
    partitions and reads them in parallel tasks — the extension point
    for connectors with no JVM driver."""
    from data_warehouse_data_mining_spark.sources.pydatasource import (
        register_synthetic_logs,
    )

    register_synthetic_logs(spark)
    df = (
        spark.read.format("synthetic_logs")
        .option("rows", 120)
        .option("partitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 120
    levels = {r.level: r.n for r in df.groupBy("level").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert levels == {"INFO": 40, "WARN": 40, "ERROR": 40}
    # deterministic content: same read twice is identical
    again = (
        spark.read.format("synthetic_logs")
        .option("rows", 120)
        .option("partitions", 5)
        .load()
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, again.collect()))


def test_python_datasource_streaming_exactly_once(spark, tmp_path):
    """The custom Python data source as a STREAMING source
    (SimpleDataSourceStreamReader): three 50-row micro-batches arrive
    through engine-managed dict offsets, then the source reports no new
    data and the drain terminates. Every row appears EXACTLY once and
    matches the deterministic generator — the replayable-offsets
    contract a custom connector must honor for exactly-once."""
    from data_warehouse_data_mining_spark.sources.pydatasource import (
        register_synthetic_logs,
    )

    register_synthetic_logs(spark)
    q = (
        spark.readStream.format("synthetic_logs")
        .option("batch_rows", 50)
        .option("max_batches", 3)
        .load()
        .writeStream.format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM pyds_stream").collect()
    assert len(rows) == 150
    got = {(r.log_id, r.level, r.msg) for r in rows}
    levels = ("INFO", "WARN", "ERROR")
    expected = {
        (i, levels[i % 3], f"unit-{i % 7} event-{i}") for i in range(150)
    }
    assert got == expected  # exactly once, byte-identical to the generator


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across parquet file generations: a column added
    in v2 must surface via mergeSchema=true with NULLs for v1 rows —
    the append-only table-evolution contract; without mergeSchema Spark
    serves one footer's schema (fast path) and silently hides the new
    column, which is why evolving readers must opt in."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, val string"
    ).write.parquet(base + "/gen=1")
    spark.createDataFrame(
        [(3, "c", 30), (4, "d", 40)], "id long, val string, score long"
    ).write.parquet(base + "/gen=2")

    merged = spark.read.option("mergeSchema", "true").parquet(
        base + "/gen=1", base + "/gen=2"
    )
    assert set(merged.columns) == {"id", "val", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: 30, 4: 40}

    plain = spark.read.parquet(base + "/gen=1", base + "/gen=2")
    # no mergeSchema: one footer wins — the evolved column is either
    # absent (v1 footer) or present (v2); both legal, neither merged
    assert set(plain.columns) in ({"id", "val"}, {"id", "val", "score"})


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC round-trips the orders table bit-for-bit and the scan pushes
    predicates down to the reader (stripe/row-group skipping at scale)."""
    from data_warehouse_data_mining_spark.sources.orc import (
        read_orc,
        write_orc_sorted,
    )

    out = str(tmp_path / "orders_orc")
    o = load(spark, SF_SMALL).orders
    write_orc_sorted(o, out, ["o_orderdate"])

    back = read_orc(spark, out)
    assert back.schema == o.schema
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in o.collect()}

    plan = explain.formatted_plan(
        back.filter(F.col("o_totalprice") > 200000.0).select("o_orderkey")
    )
    assert "PushedFilters" in plan and "o_totalprice" in plan.split(
        "PushedFilters"
    )[1].split("\n")[0], "ORC scan must carry the pushed predicate"


def test_avro_gates_cleanly_when_absent(spark, tmp_path):
    """The image has no registered avro data source (it carries avro
    CLASSES without the DataSourceRegister wiring — the trap the gate's
    lookupDataSource probe exists for); the connector must raise the
    actionable gate error, not an opaque 'Failed to find data source'."""
    if connectors._datasource_registered(spark, "avro"):
        pytest.skip("spark-avro registered on this classpath")
    with pytest.raises(connectors.ConnectorUnavailable, match="spark-avro"):
        connectors.read_avro(spark, str(tmp_path / "x.avro"))


def test_corrupt_parquet_file_quarantine(spark, tmp_path):
    """A 100 TB ingest folder WILL contain the occasional truncated/
    corrupt file; spark.sql.files.ignoreCorruptFiles=true must keep the
    scan alive and return every row from the healthy files (the
    file-level sibling of the JSONL PERMISSIVE row-level quarantine)."""
    out = str(tmp_path / "mixed")
    o = load(spark, SF_SMALL).orders.limit(100)
    o.write.parquet(out)
    # drop a corrupt file into the ingest folder
    with open(f"{out}/part-corrupt.parquet", "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer")

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    saved = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
        with _pytest.raises(Exception):
            spark.read.parquet(out).count()
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        assert spark.read.parquet(out).count() == 100
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", saved)


def test_fixed_width_reader_slices_types_and_quarantines(spark, tmp_path):
    """Typed slicing, blank->NULL, short-line quarantine, and a
    codegen-only plan (no Python evaluation node) for the fixed-width
    reader."""
    from data_warehouse_data_mining_spark.sources.fixedwidth import (
        read_fixed_width,
    )

    p = tmp_path / "fw.txt"
    # layout: id cols 1-4, name cols 5-14, qty cols 15-19
    lines = [
        f"{1:04d}{'widget':<10}{42:>5}",
        f"{2:04d}{'gadget':<10}{'':>5}",   # blank qty -> NULL
        f"{3:04d}{'gizmo':<5}",            # short line -> malformed
        f"{4:04d}{'doohickey':<10}{-7:>5}",
    ]
    p.write_text("\n".join(lines) + "\n")
    specs = [
        ("id", 1, 4, "int"),
        ("name", 5, 10, "string"),
        ("qty", 15, 5, "bigint"),
    ]
    rows = {
        r["id"]: r for r in read_fixed_width(spark, str(p), specs).collect()
    }
    assert set(rows) == {1, 2, 4}  # line 3 quarantined
    assert rows[1]["name"] == "widget" and rows[1]["qty"] == 42
    assert rows[2]["qty"] is None
    assert rows[4]["qty"] == -7
    kept = read_fixed_width(spark, str(p), specs, keep_malformed=True)
    flags = {r["id"]: r["_malformed"] for r in kept.collect()}
    assert flags[3] is True and flags[1] is False
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
