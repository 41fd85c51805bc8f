"""SparkSession factory with scale-appropriate defaults.

Replaces the reference's hand-rolled cluster management (EC2 fleet
sizing Manager.java:372-404, rebalance daemon Manager.java:130-141)
with Spark's scheduler + AQE. On a real cluster the same confs apply;
dynamic allocation replaces the 30s rebalance daemon.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "dsocr-extraction",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 256,
    extra: dict | None = None,
) -> SparkSession:
    """Session tuned for the extraction workload.

    - AQE on (runtime coalesce + skew-join splitting), the Spark-native
      replacement for the reference's static ceil(tasks/n) sizing
      (Manager.java:376-377).
    - UTC session timezone (duckdb-oracle comparability).
    - Small Arrow batches for the extract stage: payloads are KB-sized
      binaries, so 256 rows/batch keeps Arrow transfer chunks ~1-2 MB
      and extraction latency per batch low (the reference's analogue:
      <=5 messages per poll, Manager.java:146).
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{default_parallelism()}]")
    cores = default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", max(cores, 8))
        )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
