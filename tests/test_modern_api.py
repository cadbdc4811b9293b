"""Modern Spark API coverage: observe() single-pass metrics, the AQE
REBALANCE hint, and parameterized spark.sql — each pinned by plan or
value so the surface stays working."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.plans.explain import formatted_plan
from tests.conftest import SF_SMALL


def test_observe_metrics_single_pass(spark):
    """df.observe attaches aggregate metrics to a job WITHOUT a second
    scan — the way a 100 TB pipeline reports rows-kept/rows-dropped
    instead of running count() twice.

    Runs in a child session: in Spark 4.1, once a session has hosted an
    Observation its ObservationManager gets captured by later RDD task
    closures (MLlib evaluators) and fails serialization — observing in
    a newSession() keeps the shared fixture session clean."""
    from pyspark.sql import Observation

    spark = spark.newSession()
    o = load(spark, SF_SMALL).orders
    obs = Observation("quality")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_kept"),
    )
    kept = observed.filter(F.col("o_totalprice") > 100000)
    n_kept_action = kept.count()
    assert obs.get["n_total"] == o.count()
    assert obs.get["n_kept"] == n_kept_action


def test_rebalance_hint_in_plan(spark):
    """The REBALANCE hint asks AQE to split skewed / coalesce small
    output partitions — the skew-proof pre-write shuffle. Pin that the
    hint survives into the optimized plan."""
    li = load(spark, SF_SMALL).lineitem
    df = li.hint("rebalance", "l_returnflag")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RebalancePartitions" in plan
    # and it executes
    assert df.count() == li.count()


def test_parameterized_sql(spark):
    """spark.sql named parameters (Spark 3.4+): literal injection without
    string formatting — plan-cache-friendly and injection-safe."""
    cat = load(spark, SF_SMALL)
    cat.table("orders").createOrReplaceTempView("orders")
    got = spark.sql(
        "SELECT count(*) AS n FROM orders WHERE o_orderstatus = :status",
        args={"status": "O"},
    ).collect()[0]["n"]
    want = (
        cat.table("orders").filter(F.col("o_orderstatus") == "O").count()
    )
    assert got == want


def test_transpose(spark):
    """DataFrame.transpose (Spark 4): rows become columns keyed by the
    first column — the small-matrix presentation pivot without a manual
    groupBy().pivot() round."""
    df = spark.createDataFrame(
        [("count", 10, 20), ("nulls", 1, 2)], "metric STRING, a INT, b INT"
    )
    t = df.transpose()
    assert t.columns == ["key", "count", "nulls"]
    rows = {r.key: (r["count"], r["nulls"]) for r in t.collect()}
    assert rows == {"a": (10, 1), "b": (20, 2)}


def test_map_in_arrow_matches_expressions(spark):
    """mapInArrow (Spark 3.5+): the Arrow-native batch hook — zero
    pandas conversion on either side, the leanest Python entry point
    for byte-level work. Pin its output against the pure-expression
    twin so the Arrow path can back the multimodal featurizers
    interchangeably with mapInPandas."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    from data_warehouse_data_mining_spark.catalog import load

    from .conftest import SF_SMALL

    d = load(spark, SF_SMALL).documents.select("doc_id", "text")

    def batch_stats(batches):
        for batch in batches:
            tbl = pa.table(batch)
            texts = tbl.column("text").to_pylist()
            yield pa.RecordBatch.from_pydict(
                {
                    # combine_chunks: column() yields a ChunkedArray,
                    # RecordBatch wants plain Arrays
                    "doc_id": tbl.column("doc_id").combine_chunks(),
                    "n_bytes": pa.array(
                        [len(t.encode("utf-8")) for t in texts],
                        type=pa.int64(),
                    ),
                    "n_spaces": pa.array(
                        [t.count(" ") for t in texts], type=pa.int64()
                    ),
                }
            )

    got = {
        r["doc_id"]: (r["n_bytes"], r["n_spaces"])
        for r in d.mapInArrow(
            batch_stats, "doc_id long, n_bytes long, n_spaces long"
        ).collect()
    }
    want = {
        r["doc_id"]: (r["n_bytes"], r["n_spaces"])
        for r in d.select(
            "doc_id",
            F.octet_length("text").cast("long").alias("n_bytes"),
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
            .cast("long")
            .alias("n_spaces"),
        ).collect()
    }
    assert got == want


def test_group_by_all_order_by_all(spark):
    """GROUP BY ALL / ORDER BY ALL (Spark 4 SQL sugar): every
    non-aggregate select item becomes a grouping key — must equal the
    explicit grouping."""
    load(spark, SF_SMALL).register_views()
    sugar = spark.sql(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n "
        "FROM orders GROUP BY ALL ORDER BY ALL"
    ).collect()
    explicit = spark.sql(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n "
        "FROM orders GROUP BY o_orderstatus, o_orderpriority "
        "ORDER BY o_orderstatus, o_orderpriority, n"
    ).collect()
    assert sugar == explicit and len(sugar) > 1
