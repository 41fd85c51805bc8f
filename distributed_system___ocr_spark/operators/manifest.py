"""Filter / dedup / multiplicity-manifest operators (O2, O7, O8, O10).

Reference semantics preserved (SURVEY.md §2c-3):
- blank urls dropped (Manager.java:334)
- duplicates EXTRACTED ONCE but their multiplicity is preserved as a
  count and re-expanded only at report time (Manager.java:216-219,
  LocalApplication.java:187-200). The reference actually OCR'd every
  occurrence and kept the last arrival's pointer; extracting once per
  distinct url is the efficient equivalent with identical output —
  at 10^12 docs a 5% dup rate is 5*10^10 extractions saved.
- "last-wins" made deterministic: latest warc_ts per url wins (the
  reference's last-*arrival*-wins is scheduling-dependent; SURVEY §2d).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def filter_nonblank(pages: DataFrame, key: str = "url") -> DataFrame:
    """O2: drop null/blank keys (Manager.java:334)."""
    return pages.filter(F.col(key).isNotNull() & (F.trim(F.col(key)) != ""))


def multiplicity(pages: DataFrame, key: str = "url") -> DataFrame:
    """O7: url -> n_occurrences. Partial aggregation (map-side combine)
    is automatic under Catalyst, so the shuffle carries one row per
    (partition, url), not per occurrence."""
    return pages.groupBy(key).agg(F.count("*").alias("n_occurrences"))


def latest_per_key(
    pages: DataFrame,
    key: str = "url",
    order: str = "warc_ts",
    tie_col: str = "html",
) -> DataFrame:
    """O8 dedup, deterministic last-wins: keep the row with max(order)
    per key (ties broken by content hash for full determinism).

    Shuffle-cost note: this window exchanges FULL rows on hash(key).
    The pipeline therefore runs it AFTER extraction (on extracted text,
    ~1/3 the bytes of raw payloads) rather than before — re-extracting
    the ~5% duplicate occurrences is far cheaper than shipping every
    payload through a shuffle (measured: pipeline 3.1k -> see
    BENCH/BASELINE.md). Call it on raw pages only when duplicates are
    dense enough to invert that tradeoff.
    """
    w = Window.partitionBy(key).orderBy(
        F.col(order).desc(), F.xxhash64(tie_col).asc()
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def build_manifest(pages: DataFrame, extracted: DataFrame) -> DataFrame:
    """O10: summary manifest (url, n_occurrences, status, n_chars) —
    the Spark form of the reference's two JSON maps url->count /
    url->result-pointer (Manager.java:250-293). The result pointer is
    the url itself (extracted table is keyed by url)."""
    counts = multiplicity(filter_nonblank(pages))
    return counts.join(
        extracted.select("url", "status", "n_chars"), "url", "left"
    )
