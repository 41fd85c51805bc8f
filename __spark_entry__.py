"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship smoke — runs the REAL extraction pipeline
  (salted repartition -> Arrow-batched extract UDF -> manifest) over a
  deterministic synthetic pages corpus derived from sf0.001
  ``documents`` rows wrapped as HTML payloads, joined with the
  documents table read from /root/testdata/sf0.001.
- ``queries()`` / ``oracle_sql()``: the full operator registry
  (SURVEY.md §2 + training-data ops), each Spark builder paired with
  ANSI SQL that DuckDB runs on the same parquet.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system___ocr_spark import plans
from distributed_system___ocr_spark.operators.extract import extract_stage
from distributed_system___ocr_spark.operators.manifest import (
    build_manifest,
    filter_nonblank,
)
from distributed_system___ocr_spark.operators.partitioning import (
    salted_repartition,
)

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extraction manifest over sf0.001 documents-as-pages.

    Wraps each document's text as an HTML payload (binary), runs the
    vectorized extraction stage, and aggregates the url-multiplicity
    manifest — the end-to-end shape of SURVEY.md §3.2.
    """
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.concat(
            F.lit("<html><body><article><p>"),
            F.col("text"),
            F.lit("</p></article></body></html>"),
        ).cast("binary").alias("html"),
        F.lit("").alias("text"),
        F.col("lang"),
    )
    pages = filter_nonblank(pages)
    extracted = extract_stage(salted_repartition(pages, num_partitions=8))
    return build_manifest(pages, extracted)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    return plans.oracle_sql()
