"""The extraction stage itself as an oracle-checked registry query.

The DOM heuristics aren't SQL-expressible in general, but on a
CONTROLLED corpus they are: wrap each document's (tag-free) text as
``<html><body><article><p>{text}</p></article></body></html>`` and the
extractor's output reduces to its whitespace-normalization + min-block-
length rule — exactly reproducible in SQL. This runs the REAL
vectorized extract UDF (same code path as production pages) under the
driver's value-hash gate, not a simplified stand-in.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..extractor.html_extract import MIN_BLOCK_CHARS
from ..operators.extract import extract_stage
from .queries import _t, register


@register(
    "extract_documents_as_pages",
    f"""
    WITH norm AS (
      SELECT 'doc://' || doc_id AS url,
             trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
      FROM documents
    )
    SELECT url,
           CASE WHEN length(t) >= {MIN_BLOCK_CHARS} THEN t ELSE '' END
             AS extracted_text,
           CASE WHEN length(t) >= {MIN_BLOCK_CHARS} THEN 'ok' ELSE 'empty' END
             AS status,
           CAST(CASE WHEN length(t) >= {MIN_BLOCK_CHARS}
                     THEN length(t) ELSE 0 END AS INT) AS n_chars,
           CAST(CASE WHEN length(t) >= {MIN_BLOCK_CHARS}
                     THEN 1 ELSE 0 END AS INT) AS n_spans
    FROM norm
    """,
)
def extract_documents_as_pages(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.concat(
            F.lit("<html><body><article><p>"),
            F.col("text"),
            F.lit("</p></article></body></html>"),
        ).cast("binary").alias("html"),
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )
    return extract_stage(pages).select(
        "url",
        F.col("text").alias("extracted_text"),
        "status",
        "n_chars",
        F.size("spans").alias("n_spans"),
    )
