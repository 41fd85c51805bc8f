"""Corpus generator invariants (FIXTURES.md §1 shape knobs)."""

from __future__ import annotations

import collections

from distributed_system___ocr_spark.corpus import page_row
from distributed_system___ocr_spark.extractor import extract_payload


def test_corpus_shape_knobs():
    n = 2000
    rows = [page_row(i, seed=42) for i in range(n)]
    urls = [r["url"] for r in rows]
    dup_rate = 1 - len(set(urls)) / n
    assert 0.02 < dup_rate < 0.09, dup_rate  # ~5% duplicates

    statuses = collections.Counter(
        extract_payload(r["html"]).status for r in rows
    )
    assert 0.02 < statuses["ok_pdf"] / n < 0.09  # ~5% PDFs
    assert statuses["ok"] / n > 0.85
    assert statuses["empty"] / n < 0.05  # corrupt payloads

    hosts = collections.Counter(u.split("/")[2] for u in urls)
    top = hosts.most_common(1)[0][1] / n
    assert 0.15 < top < 0.40, top  # Zipf hot host for skew tests

    # duplicates share identical payload bytes (same url => same doc)
    by_url = {}
    for r in rows:
        if r["url"] in by_url:
            assert by_url[r["url"]] == r["html"]
        by_url[r["url"]] = r["html"]


def test_corpus_is_stable_across_processes():
    """page_row is a pure function of (i, seed): spot-pin a few values
    so accidental generator changes (which would invalidate goldens)
    fail loudly here with a clearer message."""
    r0 = page_row(0, 42)
    assert r0["url"] == "https://host08.example.com/page-0"
    assert r0["warc_ts"].isoformat() == "2024-01-01T00:00:00+00:00"
    r1 = page_row(1, 42)
    assert r1["url"] == "https://host00.example.com/page-1"
