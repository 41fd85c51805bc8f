"""Training-data curation operators, round 3: Unicode NFC text
normalization and TF-IDF term scoring — each a (Spark builder, DuckDB
oracle) pair over ``documents``.

Cross-engine determinism: NFC is the Unicode standard algorithm
(Python ``unicodedata`` and DuckDB ``nfc_normalize`` agree byte-for-
byte — asserted in tests); TF-IDF ranks by the ROUNDED score plus a
term tie-break so last-ulp ``ln`` differences cannot reorder the
top-k across engines.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import _t, register

# --------------------------------------------------------------------------
# Unicode NFC normalization
# --------------------------------------------------------------------------
# The synthetic corpus is pure ASCII (NFC would be the identity — a
# gate that never fires is not evidence), so the query first injects
# deterministic combining sequences per doc; the normalizer itself is
# the reusable operator surface. chr(769) = combining acute, chr(778)
# = combining ring above: both compose under NFC.

_ACUTE = chr(769)
_RING = chr(778)


@register(
    "normalize_text_nfc",
    f"""
    WITH injected AS (
      SELECT doc_id,
             substring(text, 1, 40) || ' cafe' || chr(769) ||
             ' A' || chr(778) || 'ngstro' || chr(769) || 'm' AS raw
      FROM documents
    )
    SELECT doc_id,
           CAST(length(raw) AS BIGINT) AS n_raw_chars,
           CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc_chars,
           nfc_normalize(raw) AS normalized,
           nfc_normalize(raw) <> raw AS changed
    FROM injected
    """,
)
def normalize_text_nfc(spark, sf_dir):
    """NFC composition as an Arrow-batched pandas UDF (CPython's
    unicodedata.normalize is C-implemented; the Unicode algorithm is
    engine-independent, which is what makes this oracle-gatable). At
    10^12 docs this is a scan-stage map, zero shuffles — the standard
    first step before hashing/dedup so that byte-different but
    canonically-equal texts collide."""

    @F.pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(lambda x: unicodedata.normalize("NFC", x)
                     if x is not None else None)

    raw = F.concat(
        F.substring("text", 1, 40),
        F.lit(" cafe" + _ACUTE + " A" + _RING + "ngstro" + _ACUTE + "m"),
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", raw.alias("raw"))
    d = d.withColumn("normalized", nfc("raw"))
    return d.select(
        "doc_id",
        F.length("raw").cast("long").alias("n_raw_chars"),
        F.length("normalized").cast("long").alias("n_nfc_chars"),
        "normalized",
        (F.col("normalized") != F.col("raw")).alias("changed"),
    )


# --------------------------------------------------------------------------
# TF-IDF top terms per document
# --------------------------------------------------------------------------

_TOPK_TERMS = 3
_DUCK_TOKENS3 = "list_filter(string_split(text, ' '), x -> x <> '')"


@register(
    "tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKENS3}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term, tf,
             round(tf * ln((SELECT n_docs FROM n) / df), 6) AS tfidf
      FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, tf, tfidf FROM scored
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) <= {_TOPK_TERMS}
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Distributed TF-IDF, the classic two-aggregation formulation:
    term frequencies and document frequencies are partial-aggregated
    shuffles on (doc_id, term) / (term); the corpus size joins in as a
    single-row broadcast (bounded cardinality — allowed a static
    hint). Ranking windows over the ROUNDED score + term tie-break so
    engine libm ulp differences cannot flip the top-k."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term", "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), "term"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK_TERMS)
        .drop("rn")
    )
