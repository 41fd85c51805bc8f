"""Round-3 text operators: pins for the rows-only compression-ratio
signal (no DuckDB twin) and the NFC/url-canonicalization gates
actually firing."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_compression_ratio_matches_pure_python(spark):
    from distributed_system___ocr_spark.plans.textops3 import (
        quality_compression_ratio,
    )

    rows = {r["doc_id"]: r for r in
            quality_compression_ratio(spark, SF).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect() if r["text"]}
    assert set(rows) == set(docs)
    for doc_id in list(docs)[:50]:
        want = len(zlib.compress(docs[doc_id].encode("utf-8"), 6))
        got = rows[doc_id]
        assert got["n_compressed"] == want
        assert abs(
            got["compression_ratio"] - want / len(docs[doc_id])
        ) < 1e-6


def test_compression_ratio_both_branches_fire(spark):
    """A repetition gate that never rejects (or never accepts) is not
    evidence — both is_repetitive branches must occur at test sf."""
    from distributed_system___ocr_spark.plans.textops3 import (
        quality_compression_ratio,
    )

    kinds = {
        r["is_repetitive"]
        for r in quality_compression_ratio(spark, SF)
        .select("is_repetitive").distinct().collect()
    }
    assert kinds == {True, False}


def test_compression_ratio_orders_repetition():
    """The signal itself: repeated text compresses far below prose."""
    prose = ("the committee reviewed seventeen distinct proposals "
             "before narrowing the field to a shortlist of three") * 3
    repetitive = "spam ham " * 40
    r_prose = len(zlib.compress(prose.encode(), 6)) / len(prose)
    r_rep = len(zlib.compress(repetitive.encode(), 6)) / len(repetitive)
    assert r_rep < r_prose / 2


def test_nfc_and_url_gates_fire(spark):
    from distributed_system___ocr_spark.plans.textops3 import (
        canonicalize_urls,
        normalize_text_nfc,
    )

    nfc = normalize_text_nfc(spark, SF)
    assert nfc.filter(F.col("changed")).count() == nfc.count() > 0
    assert nfc.filter(F.col("n_nfc_chars") >= F.col("n_raw_chars")).count() == 0

    urls = canonicalize_urls(spark, SF)
    assert urls.filter(F.col("url_canonical") == F.col("url_raw")).count() == 0
    one = urls.filter(F.col("doc_id") == 3).collect()[0]
    assert one["url_canonical"] == (
        "https://www.src3.example.com/a/c/page3?a=1&m=0&z=2"
    )
    assert one["host"] == "www.src3.example.com"
