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
