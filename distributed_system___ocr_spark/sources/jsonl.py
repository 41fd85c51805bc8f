"""JSONL pages ingestion (Common-Crawl-style dump files).

Crawl dumps and inter-pipeline handoffs commonly arrive as
newline-delimited JSON. At 10^12 docs the one thing that must NOT
happen is Spark's schema inference (an extra full pass over the
data before the real scan), so the reader defaults to an EXPLICIT
permissive schema — every canonical field read as string — and
hands the frame to ``sources.normalize.normalize_pages`` for the
same boundary casting every other source goes through (string html
-> utf-8 bytes, string/epoch warc_ts -> timestamp, missing optionals
defaulted, extras dropped). ``infer=True`` is the escape hatch for
genuinely unknown layouts, paying the inference pass knowingly.

Reference analogue: the manager's url-list file input
(Manager.java:463-471) — same boundary role, different wire format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .normalize import normalize_pages

_PERMISSIVE = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.StringType()),
        T.StructField("html", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def read_jsonl_pages(
    spark: SparkSession, path: str, infer: bool = False
) -> DataFrame:
    """JSONL file(s)/glob -> canonical pages frame. Corrupt lines
    surface as null-url rows under the explicit schema (Spark's
    PERMISSIVE parse mode) — errors stay rows (reference O6), never
    task failures deep in the extract stage."""
    reader = spark.read
    if not infer:
        reader = reader.schema(_PERMISSIVE)
    raw = reader.json(path)
    if not infer and "warc_ts" in raw.columns:
        # the forced string schema turns JSON epoch NUMBERS into digit
        # strings, which string->timestamp casts to NULL — route them
        # through timestamp_seconds explicitly (normalize_pages' own
        # epoch branch only sees integer-typed columns)
        as_long = F.col("warc_ts").try_cast("long")
        raw = raw.withColumn(
            "warc_ts",
            F.coalesce(
                # try_ variants: malformed values yield NULL instead of
                # an ANSI cast error (errors stay rows). The epoch
                # branch is range-guarded: timestamp_seconds overflows
                # (job-killing ArithmeticException, not NULL) past
                # ~9.2e12, which 14-digit CDX compact timestamps and
                # epoch-microsecond values would hit — out-of-range
                # digit strings fall through to the epoch-0 default.
                F.try_to_timestamp(F.col("warc_ts")),
                F.when(
                    as_long.between(0, 99_999_999_999),
                    F.timestamp_seconds(as_long),
                ),
            ).cast("string"),
        )
    pages = normalize_pages(raw)
    # JSON is row-sparse: an absent field is a NULL in a present
    # column, which normalize_pages' column-level defaults can't see —
    # apply the same typed defaults per row
    return pages.select(
        "url",
        F.coalesce("warc_ts", F.timestamp_seconds(F.lit(0)))
        .alias("warc_ts"),
        "html",
        F.coalesce("text", F.lit("")).alias("text"),
        F.coalesce("lang", F.lit("")).alias("lang"),
    )
