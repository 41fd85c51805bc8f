"""URL-list input (the reference's actual input format).

Reference: a newline-delimited URL file, one task per line, blank
lines dropped, duplicates allowed and MEANINGFUL (counted into the
manifest) — Manager.java:463-471 parse, Manager.java:334 filter,
inputs/short_input.txt has dup urls.

In the Spark engine the url list selects WHICH pages to process: the
list is read as a tiny DataFrame, multiplicity is preserved by
re-counting the list itself, and payloads come from the pages table
via an equi-join (broadcast — a url list is small by definition; a
billion-url "list" would be a table, not a file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_url_list(spark: SparkSession, path: str) -> DataFrame:
    """url file -> (url) rows, blanks dropped, duplicates kept."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("url"))
        .filter(F.col("url") != "")
    )


def pages_for_url_list(
    spark: SparkSession, list_path: str, pages: DataFrame
) -> DataFrame:
    """pages rows for every url-list OCCURRENCE (duplicates re-expand,
    so the downstream manifest counts them like the reference's
    per-occurrence counters, Manager.java:352-357)."""
    urls = read_url_list(spark, list_path)
    return F.broadcast(urls).join(pages, "url", "inner")
