"""Catalog seam: where a real Iceberg/Delta catalog slots in.

This container has no Iceberg runtime jar (verified, SURVEY.md §7), so
the default catalog realizes "Iceberg table" as partitioned parquet +
the snapshot-manifest directory maintained by operators.resume — the
same snapshot->manifest-list indirection Iceberg uses, single-writer.

On a cluster with the iceberg-spark-runtime jar, ``IcebergCatalog``
activates and the pipeline code is unchanged: it only ever talks to
``Catalog.read`` / ``Catalog.write_append`` / ``Catalog.snapshots``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ParquetSnapshotCatalog:
    """Plain-parquet tables + explicit snapshot JSON (the default)."""

    root: str

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def write_overwrite(self, df: DataFrame, table: str) -> None:
        df.write.mode("overwrite").parquet(self.path(table))

    def write_append_run(self, df: DataFrame, table: str, run_id: str) -> str:
        """Append as a run-partitioned directory; caller commits the
        snapshot via operators.resume.commit_run (atomic rename)."""
        dest = os.path.join(self.path(table), f"run_id={run_id}")
        df.write.mode("overwrite").parquet(dest)
        return dest


@dataclass
class SessionCatalog:
    """Spark's built-in session catalog (managed parquet tables under
    spark.sql.warehouse.dir). EXECUTABLE in this container — it drives
    the same ``read.table`` / ``writeTo`` API surface the Iceberg
    catalog uses, so the table-based code path is tested for real; what
    it lacks vs Iceberg is snapshot isolation, which operators.resume
    supplies on top (same as the parquet catalog).
    """

    database: str = "default"

    def _fq(self, table: str) -> str:
        return f"{self.database}.{table}"

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.table(self._fq(table))

    def write_overwrite(self, df: DataFrame, table: str) -> None:
        # v1 session-catalog tables don't support the writeTo(...)
        # REPLACE TABLE path; saveAsTable is their overwrite surface
        df.write.format("parquet").mode("overwrite").saveAsTable(
            self._fq(table)
        )

    def write_append_run(self, df: DataFrame, table: str, run_id: str) -> str:
        from pyspark.sql import functions as F

        fq = self._fq(table)
        (
            df.withColumn("run_id", F.lit(run_id))
            .write.format("parquet")
            .mode("append")
            .partitionBy("run_id")
            .saveAsTable(fq)
        )
        return fq


class IcebergCatalog:
    """Real Iceberg catalog — requires iceberg-spark-runtime on the
    classpath; unavailable in this container (import-gated)."""

    def __init__(self, catalog_name: str = "spark_catalog"):
        self.catalog = catalog_name

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.table(f"{self.catalog}.{table}")

    def write_overwrite(self, df: DataFrame, table: str) -> None:
        df.writeTo(f"{self.catalog}.{table}").createOrReplace()

    def write_append_run(self, df: DataFrame, table: str, run_id: str) -> str:
        df.writeTo(f"{self.catalog}.{table}").append()
        return f"{self.catalog}.{table}@{run_id}"


def register_jdbc_v2_catalog(
    spark: SparkSession, name: str, url: str | None = None
) -> None:
    """Register a REAL DataSourceV2 TableCatalog this container can
    execute: Spark's JDBCTableCatalog over the bundled in-memory Derby.

    This exists so the ``IcebergCatalog`` adapter's code paths
    (catalog-prefixed ``read.table``, ``writeTo(...).createOrReplace``,
    ``writeTo(...).append``) run in CI against a genuine v2 catalog —
    the Iceberg runtime jar itself is absent here, but the adapter only
    uses the TableCatalog surface, which is identical. On a cluster,
    point the same config keys at iceberg-spark-runtime instead."""
    spark.conf.set(
        f"spark.sql.catalog.{name}",
        "org.apache.spark.sql.execution.datasources.v2.jdbc"
        ".JDBCTableCatalog",
    )
    spark.conf.set(
        f"spark.sql.catalog.{name}.url",
        url or f"jdbc:derby:memory:{name};create=true",
    )
    spark.conf.set(
        f"spark.sql.catalog.{name}.driver",
        "org.apache.derby.jdbc.EmbeddedDriver",
    )


def default_catalog(spark: SparkSession, root: str):
    """IcebergCatalog when the runtime is present, parquet otherwise.

    The probe loads the class for real: a bare ``spark._jvm.org...``
    attribute access NEVER raises (py4j hands back a lazy JavaPackage),
    which made the round-1 probe always claim Iceberg was present. It
    resolves through Spark's Utils.classForName (context-or-Spark
    classloader) because jars shipped via --jars/--packages live in
    Spark's child classloader, invisible to a plain Class.forName from
    the launcher loader.
    """
    try:
        spark._jvm.org.apache.spark.util.Utils.classForName(
            "org.apache.iceberg.catalog.Catalog", True, False
        )
        return IcebergCatalog()
    except Exception:  # noqa: BLE001 — any failure means no Iceberg jar
        return ParquetSnapshotCatalog(root)
