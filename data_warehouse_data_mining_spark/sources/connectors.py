"""Optional-format connectors, gated behind availability checks.

The local image ships only the core Spark distribution; lakehouse
formats (Delta/Iceberg/Hudi) and Kafka need their jars on the
classpath. Each reader/writer here probes for its backend and raises a
clear, actionable error when absent — the call sites stay identical on
a fully-provisioned cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    """The requested format's jars/package are not on this classpath."""


def _jvm_class_exists(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    if not _jvm_class_exists(spark, "org.apache.spark.sql.delta.DeltaLog"):
        raise ConnectorUnavailable(
            "Delta Lake jars not on classpath; add io.delta:delta-spark via "
            "spark.jars.packages on the cluster"
        )
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    if not _jvm_class_exists(spark, "org.apache.iceberg.spark.SparkCatalog"):
        raise ConnectorUnavailable(
            "Iceberg runtime not on classpath; add org.apache.iceberg:"
            "iceberg-spark-runtime via spark.jars.packages"
        )
    return spark.read.table(table)


def read_kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    if not _jvm_class_exists(
        spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    ):
        raise ConnectorUnavailable(
            "Kafka source not on classpath; add org.apache.spark:"
            "spark-sql-kafka-0-10 via spark.jars.packages"
        )
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .load()
    )


def read_jdbc(
    spark: SparkSession, url: str, table: str, options: dict[str, str] | None = None
) -> DataFrame:
    """JDBC reader (driver jar availability depends on the database);
    pass partitionColumn/lowerBound/upperBound/numPartitions in options
    for a parallel read — a single-connection JDBC scan is a driver
    bottleneck at any scale."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def _datasource_registered(spark: SparkSession, name: str) -> bool:
    """True iff ``format(name)`` would resolve. Class.forName is NOT a
    sufficient probe: this image carries avro CLASSES without the
    DataSourceRegister service wiring, so the class loads but
    ``format("avro")`` still fails — lookupDataSource is the check the
    reader itself performs."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # type: ignore[union-attr]
            name, spark._jsparkSession.sessionState().conf()  # type: ignore[attr-defined]
        )
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro reader — the row-oriented ingest format (Kafka archive dumps,
    schema-registry pipelines). Avro moved out of core in Spark 2.4, so
    it gates like the lakehouse formats; call sites are identical once
    org.apache.spark:spark-avro is on the classpath."""
    if not _datasource_registered(spark, "avro"):
        raise ConnectorUnavailable(
            "Avro module not on classpath; add org.apache.spark:spark-avro "
            "via spark.jars.packages"
        )
    return spark.read.format("avro").load(path)
