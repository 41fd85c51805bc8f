"""Minimal PDF text extraction (stdlib zlib + tolerant tokenizer).

Partial-fidelity layout-parse path for PDF payloads (BASELINE.json
north_star "pdfminer-style layout parse path"): the container has no
pdfminer, so this handles the common case — Flate-compressed (or raw)
content streams with ``Tj`` / ``TJ`` / ``'`` text-showing operators —
and reports anything else through the error channel rather than
raising (reference semantics: Worker.java:93-98 "OCR operation error"
becomes a result row).

Deterministic pure function of the payload bytes.
"""

from __future__ import annotations

import re
import zlib


class UnsupportedPdfEncodingError(ValueError):
    """Composite-font (Type0/CID) PDFs: text-show strings hold 2-byte
    CIDs that only a CMap can decode — byte-level latin-1 decoding
    would emit garbage, so these are REJECTED into the error channel
    (status=error) instead. Partial-fidelity contract: a false-positive
    rejection of a mixed simple/CID document is safer than silently
    corrupting its text."""


# Composite-font markers: /Type0 fonts and the Identity CMaps they use.
_CID_RE = re.compile(rb"/Type0\b|/Identity-H\b|/Identity-V\b")

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
# (string) Tj | (string) ' | (string) "  — single text-show ops
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|'|\")")
# <hexdigits> Tj — hex-string text-show
_TJHEX_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>\s*(?:Tj|'|\")")
# [ ... ] TJ — array text-show (strings interleaved with kern numbers)
_TJARR_RE = re.compile(rb"\[((?:[^\[\]\\]|\\.)*)\]\s*TJ", re.DOTALL)
_STR_IN_ARR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_BT_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():  # octal \ddd (1-3 digits)
            j = i + 1
            digits = b""
            while j < n and len(digits) < 3 and raw[j : j + 1].isdigit():
                digits += raw[j : j + 1]
                j += 1
            out.append(int(digits, 8) & 0xFF)
            i = j
        else:
            i += 1  # line continuation / unknown escape: drop backslash
    return bytes(out)


def _text_ops(content: bytes) -> list[str]:
    """Collect text-show strings from one content stream, one line per
    BT..ET text object (coarse layout grouping)."""
    lines: list[str] = []
    blocks = _BT_RE.findall(content) or [content]
    for block in blocks:
        parts: list[bytes] = []
        for m in _TJ_RE.finditer(block):
            parts.append(_unescape(m.group(1)))
        for m in _TJHEX_RE.finditer(block):
            hx = re.sub(rb"\s", b"", m.group(1))
            if len(hx) % 2:  # odd digit count: spec pads with 0
                hx += b"0"
            try:
                parts.append(bytes.fromhex(hx.decode("ascii")))
            except ValueError:
                continue
        for m in _TJARR_RE.finditer(block):
            arr = b"".join(
                _unescape(s) for s in _STR_IN_ARR_RE.findall(m.group(1))
            )
            if arr:
                parts.append(arr)
        if parts:
            lines.append(
                b" ".join(parts).decode("latin-1", errors="replace").strip()
            )
    return [ln for ln in lines if ln]


def extract_pdf(payload: bytes) -> tuple[str, list[tuple[int, int, str]]]:
    """PDF bytes -> (text, spans). Spans: one per text object (kind
    'pdf'). Returns ("", []) when no text operators are found; raises
    UnsupportedPdfEncodingError for CID/Type0 composite fonts (the
    caller's error channel turns it into a status=error row)."""
    if _CID_RE.search(payload):
        raise UnsupportedPdfEncodingError(
            "composite-font PDF (Type0/CID, Identity CMap): string "
            "bytes are CIDs, not characters; rejecting instead of "
            "emitting garbage"
        )
    lines: list[str] = []
    for m in _STREAM_RE.finditer(payload):
        raw = m.group(1)
        try:
            content = zlib.decompress(raw)
        except zlib.error:
            content = raw
        lines.extend(_text_ops(content))
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for ln in lines:
        if pos:
            pos += 1  # "\n" separator
        spans.append((pos, pos + len(ln), "pdf"))
        pos += len(ln)
    return "\n".join(lines), spans
