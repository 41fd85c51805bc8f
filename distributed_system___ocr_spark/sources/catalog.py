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


def default_catalog(spark: SparkSession, root: str):
    """IcebergCatalog when the runtime is present, parquet otherwise."""
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018 — probe only
        return IcebergCatalog()
    except Exception:  # noqa: BLE001 — any failure means no Iceberg jar
        return ParquetSnapshotCatalog(root)
