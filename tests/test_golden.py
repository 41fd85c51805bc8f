"""Golden corpus: byte-identical extracted text per url, pinned as a
committed sha256 manifest (the Spark analogue of the reference's
golden HTML outputs, SURVEY.md §5). Any change to the extractor
heuristics must bump EXTRACTOR_VERSION and regenerate the manifest."""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import functions as F

from distributed_system___ocr_spark.extractor.core import EXTRACTOR_VERSION
from distributed_system___ocr_spark.operators.extract import extract_stage
from distributed_system___ocr_spark.operators.manifest import latest_per_key

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_corpus_sha256.json")


def test_extracted_text_matches_golden(spark, pages):
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert golden["extractor_version"] == EXTRACTOR_VERSION

    rows = (
        extract_stage(latest_per_key(pages))
        .select("url", F.sha2("text", 256).alias("h"), "status")
        .collect()
    )
    assert len(rows) == len(golden["urls"])
    mismatches = []
    for r in rows:
        g = golden["urls"][r["url"]]
        if r["h"] != g["sha256"] or r["status"] != g["status"]:
            mismatches.append(r["url"])
    assert not mismatches, f"{len(mismatches)} urls diverge: {mismatches[:5]}"


def test_pure_python_agrees_with_spark_stage():
    """The Spark stage must be a transparent wrapper: pure-Python
    extraction of the same bytes gives the same hashes (no hidden
    state in the UDF path)."""
    from distributed_system___ocr_spark.corpus import page_row
    from distributed_system___ocr_spark.extractor import extract_payload

    with open(GOLDEN) as f:
        golden = json.load(f)
    for i in (0, 7, 42, 99, 313):
        row = page_row(i, seed=42)
        res = extract_payload(row["html"])
        g = golden["urls"][row["url"]]
        assert hashlib.sha256(res.text.encode()).hexdigest() == g["sha256"]


GOLDEN_5K_DIGEST = (
    "07e29ff0362e8e2e5e73075a81333fc3e190266cd4c79dae2a79068ba831c364"
)
GOLDEN_5K_URLS = 4764


def test_5k_corpus_aggregate_digest():
    """Aggregate sha256 over 5k docs' (url, extracted text) pairs —
    the large golden corpus pinned as a single digest (FIXTURES.md §1).
    Pure-Python (no Spark) so it runs in ~2s; any extractor or corpus
    change that alters ANY byte of ANY document fails here."""
    import hashlib

    from distributed_system___ocr_spark.corpus import page_row
    from distributed_system___ocr_spark.extractor import extract_payload
    from distributed_system___ocr_spark.extractor.core import (
        EXTRACTOR_VERSION,
    )

    assert EXTRACTOR_VERSION == "2"
    h = hashlib.sha256()
    seen = {}
    for i in range(5000):
        row = page_row(i, 42)
        seen[row["url"]] = extract_payload(row["html"]).text
    assert len(seen) == GOLDEN_5K_URLS
    for url in sorted(seen):
        h.update(url.encode())
        h.update(b"\0")
        h.update(seen[url].encode())
        h.update(b"\1")
    assert h.hexdigest() == GOLDEN_5K_DIGEST
