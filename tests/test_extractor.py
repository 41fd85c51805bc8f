"""Pure-Python extractor unit tests (no Spark) — SURVEY.md §5.1."""

from __future__ import annotations

import zlib

import pytest

from distributed_system___ocr_spark.corpus import page_row
from distributed_system___ocr_spark.extractor import extract_payload
from distributed_system___ocr_spark.extractor.core import (
    STATUS_EMPTY,
    STATUS_ERROR,
    STATUS_OK,
    STATUS_OK_PDF,
)
from distributed_system___ocr_spark.extractor.html_extract import extract_html
from distributed_system___ocr_spark.extractor.pdf_extract import extract_pdf

ARTICLE = b"""<!DOCTYPE html><html><head><title>t</title>
<script>ignored();</script><style>.x{}</style></head><body>
<nav><a href="/a">home</a><a href="/b">about page link here</a></nav>
<header>site-wide header boilerplate that is long enough to pass length</header>
<article><h1>The Heading</h1>
<p>This is the main content paragraph, long enough to clear the minimum
block length threshold easily.</p>
<p>Short.</p>
<p>A second real paragraph with enough characters to be kept by the
density scorer, including an <a href="/x">inline link</a> inside.</p>
</article>
<footer><a href="/c">contact</a> <a href="/d">terms</a></footer>
</body></html>"""


def test_main_content_kept_boilerplate_dropped():
    text, spans = extract_html(ARTICLE)
    assert "main content paragraph" in text
    assert "The Heading" in text
    assert "second real paragraph" in text
    # boilerplate & short blocks dropped
    assert "home" not in text
    assert "site-wide header" not in text  # header subtree pruned
    assert "Short." not in text  # under min length
    assert "contact" not in text


def test_spans_offsets_match_text():
    text, spans = extract_html(ARTICLE)
    assert spans, "expected spans"
    for start, end, kind in spans:
        assert 0 <= start < end <= len(text)
        assert text[start:end] == text[start:end].strip()
    kinds = [k for _, _, k in spans]
    assert "heading" in kinds
    # spans are disjoint and ordered
    for (s1, e1, _), (s2, e2, _) in zip(spans, spans[1:]):
        assert e1 < s2


def test_link_density_drops_link_farms():
    farm = (
        b"<body><div>"
        + b" ".join(
            b'<a href="/%d">many words of linked text here</a>' % i
            for i in range(10)
        )
        + b"</div></body>"
    )
    text, _ = extract_html(farm)
    assert text == ""


def test_entities_decoded():
    html = b"<p>fish &amp; chips cost &pound;5 which is enough text to keep</p>"
    text, _ = extract_html(html)
    assert "fish & chips" in text
    assert "\xa35" in text


def test_charset_fallback():
    latin = "<p>caf\xe9 content long enough to keep around here</p>".encode(
        "latin-1"
    )
    meta = (
        b'<meta charset="iso-8859-1">'
        b"<p>caf\xe9 content long enough to keep around here</p>"
    )
    # no decl: replacement char, still deterministic
    t1, _ = extract_html(latin)
    t2, _ = extract_html(meta)
    assert "caf\xe9" in t2
    assert t1  # decoded via replacement, not crashed


def test_malformed_html_no_crash():
    res = extract_payload(b"<div><p>unclosed tags <b>bold <div>nested wrong "
                          b"but long enough to keep as a content block here")
    assert res.status in (STATUS_OK, STATUS_EMPTY)


def test_pdf_flate_roundtrip():
    ops = b"BT /F1 12 Tf 72 700 Td (Hello \\(PDF\\) world) Tj ET\n" \
          b"BT [ (kerned) -120 ( text) ] TJ ET\n"
    stream = zlib.compress(ops)
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Filter /FlateDecode >>\nstream\n"
        + stream
        + b"endstream\nendobj\n%%EOF"
    )
    res = extract_payload(pdf)
    assert res.status == STATUS_OK_PDF
    assert "Hello (PDF) world" in res.text
    assert "kerned text" in res.text
    assert all(k == "pdf" for _, _, k in res.spans)


def test_pdf_octal_escapes():
    text, _ = extract_pdf(
        b"%PDF-1.4\nstream\nBT (\\101\\102\\103) Tj ET\nendstream\n"
    )
    assert text == "ABC"


def test_error_channel_total_function(monkeypatch):
    # errors are rows, never exceptions (Worker.java:133-143 analogue)
    import distributed_system___ocr_spark.extractor.core as core

    def boom(payload):
        raise ValueError("synthetic parser failure")

    monkeypatch.setattr(core, "extract_html", boom)
    res = core.extract_payload(b"<p>anything</p>")
    assert res.status == STATUS_ERROR
    assert "synthetic parser failure" in res.error
    assert res.text == ""


def test_empty_inputs():
    assert extract_payload(b"").status == STATUS_EMPTY
    assert extract_payload(None).status == STATUS_EMPTY


def test_oversized_payload_is_error_row():
    from distributed_system___ocr_spark.extractor.core import (
        MAX_PAYLOAD_BYTES,
        STATUS_TOO_LARGE,
    )

    res = extract_payload(b"x" * (MAX_PAYLOAD_BYTES + 1))
    assert res.status == STATUS_TOO_LARGE
    assert res.text == ""
    assert "cap" in res.error


@pytest.mark.parametrize("i", [0, 3, 17, 99])
def test_determinism_per_doc(i):
    payload = page_row(i)["html"]
    a = extract_payload(payload)
    b = extract_payload(payload)
    assert a.text == b.text
    assert a.spans == b.spans
    assert a.status == b.status


def test_pdf_hex_strings_and_quote_ops():
    text, _ = extract_pdf(
        b"%PDF-1.4\nstream\nBT <48656c6c6f> Tj ET\n"
        b"BT (world) \" ET\nendstream\n"
    )
    assert "Hello" in text
    assert "world" in text


def test_pdf_multikern_tj_array_and_whitespace_hex():
    """Multi-kern TJ arrays (every string followed by a kern number,
    negative and positive) and hex strings broken by whitespace — the
    corpus's generated forms, pinned at the unit level too."""
    ops = (
        b"BT [ (alpha ) -250 (beta ) 40 (gamma) 120 ] TJ ET\n"
        b"BT <4865\n6C6c6F> Tj ET\n"  # ws inside + mixed-case digits
        b"BT <3132333> Tj ET\n"       # odd digit count: padded with 0
    )
    pdf = b"%PDF-1.4\nstream\n" + ops + b"endstream\n%%EOF"
    text, spans = extract_pdf(pdf)
    assert "alpha beta gamma" in text
    assert "Hello" in text
    assert "1230" in text  # "313233" + spec's odd-digit zero-pad = "30"
    assert len(spans) == 3  # one per BT..ET object


def test_pdf_cid_font_rejected_to_error_channel():
    """Composite-font (Type0/Identity-H) PDFs must become status=error
    rows, never garbage text (round-2 verdict item 6)."""
    body = zlib.compress(b"BT <00480045> Tj ET\n")
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Type /Font /Subtype /Type0 "
        b"/Encoding /Identity-H >>\nendobj\n2 0 obj << /Filter "
        b"/FlateDecode >>\nstream\n" + body + b"endstream\n%%EOF"
    )
    res = extract_payload(pdf)
    assert res.status == STATUS_ERROR
    assert res.text == ""
    assert "Type0" in res.error or "CID" in res.error

    from distributed_system___ocr_spark.extractor.pdf_extract import (
        UnsupportedPdfEncodingError,
    )

    with pytest.raises(UnsupportedPdfEncodingError):
        extract_pdf(pdf)


def test_utf16_bom_payload():
    payload = "<p>utf sixteen content long enough to keep here ok</p>".encode(
        "utf-16"
    )
    res = extract_payload(payload)
    assert res.status == STATUS_OK
    assert "utf sixteen content" in res.text


@pytest.mark.parametrize("i", range(0, 200, 7))
def test_spans_tile_text(i):
    """Spans tile the extracted text exactly: first starts at 0, last
    ends at len(text), and inter-span gaps are only newline separators
    ("\\n\\n" for HTML blocks, "\\n" for PDF text objects)."""
    res = extract_payload(page_row(i)["html"])
    if not res.spans:
        assert res.text == ""
        return
    assert res.spans[0][0] == 0
    assert res.spans[-1][1] == len(res.text)
    for (s1, e1, _), (s2, e2, _) in zip(res.spans, res.spans[1:]):
        gap = res.text[e1:s2]
        assert gap in ("\n", "\n\n"), repr(gap)
