"""Payload dispatch + error channel: the per-document operator.

Mirrors the reference worker's contract (Worker.java:79-121
``handleOcrTask``): every payload yields exactly one result row;
failures become rows with an error marker, never exceptions — one bad
document must not kill a partition (Worker.java:133-143
``sendException``; SURVEY.md §2c-2).

EXTRACTOR_VERSION is part of the output contract: bump it whenever the
heuristics change, because golden sha256 manifests pin the output.
"""

from __future__ import annotations

from typing import NamedTuple

from .html_extract import extract_html
from .pdf_extract import extract_pdf

EXTRACTOR_VERSION = "2"

STATUS_OK = "ok"
STATUS_OK_PDF = "ok_pdf"
STATUS_EMPTY = "empty"
STATUS_ERROR = "error"
STATUS_TOO_LARGE = "too_large"

# Payloads above this become error-channel rows instead of being
# parsed: one pathological page must not blow an Arrow batch / worker
# heap (Common Crawl itself truncates at 1 MiB; we allow 8x that).
MAX_PAYLOAD_BYTES = 8 * 1024 * 1024


class ExtractResult(NamedTuple):
    # NamedTuple, not frozen dataclass: same immutable attribute
    # surface, ~3x cheaper construction — this object is built once
    # per document on the extraction hot path
    text: str
    spans: list  # [(start, end, kind)]
    status: str
    error: str | None


def extract_payload(payload: bytes | None) -> ExtractResult:
    """bytes -> ExtractResult; total function, never raises."""
    if payload is None or len(payload) == 0:
        return ExtractResult("", [], STATUS_EMPTY, None)
    if len(payload) > MAX_PAYLOAD_BYTES:
        return ExtractResult(
            "", [], STATUS_TOO_LARGE,
            f"payload {len(payload)} bytes > cap {MAX_PAYLOAD_BYTES}",
        )
    try:
        if payload[:5] == b"%PDF-":
            text, spans = extract_pdf(payload)
            if not text:
                return ExtractResult("", [], STATUS_EMPTY, None)
            return ExtractResult(text, spans, STATUS_OK_PDF, None)
        text, spans = extract_html(payload)
        if not text:
            return ExtractResult("", [], STATUS_EMPTY, None)
        return ExtractResult(text, spans, STATUS_OK, None)
    except Exception as exc:  # noqa: BLE001 — errors are rows by contract
        msg = f"{type(exc).__name__}: {exc}"
        return ExtractResult("", [], STATUS_ERROR, msg[:500])
