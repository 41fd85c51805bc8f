"""Property-based tests: the extractor is a TOTAL function with valid
spans on arbitrary bytes (the error channel contract, SURVEY §2c-2)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_system___ocr_spark.extractor import extract_payload
from distributed_system___ocr_spark.extractor.html_extract import extract_html


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=4096))
def test_total_function_on_arbitrary_bytes(payload):
    res = extract_payload(payload)
    assert res.status in ("ok", "ok_pdf", "empty", "error", "too_large")
    assert isinstance(res.text, str)
    for start, end, kind in res.spans:
        assert 0 <= start < end <= len(res.text)
        assert isinstance(kind, str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2048))
def test_html_spans_slice_cleanly(doc):
    payload = f"<html><body><p>{doc}</p></body></html>".encode(
        "utf-8", errors="ignore"
    )
    text, spans = extract_html(payload)
    for s, e, _ in spans:
        assert text[s:e].strip() == text[s:e]
    # spans disjoint & ordered
    for (s1, e1, _), (s2, e2, _) in zip(spans, spans[1:]):
        assert e1 < s2


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_deterministic(payload):
    a = extract_payload(payload)
    b = extract_payload(payload)
    assert (a.text, a.spans, a.status, a.error) == (
        b.text, b.spans, b.status, b.error,
    )


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_pdf_prefix_never_crashes(payload):
    res = extract_payload(b"%PDF-" + payload)
    assert res.status in ("ok_pdf", "empty", "error")
