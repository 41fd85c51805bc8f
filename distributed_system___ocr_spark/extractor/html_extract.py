"""Main-content HTML extraction with character-span offsets.

Stdlib-only (html.parser) boilerplate stripper in the spirit of
Readability / jusText: block-level segmentation, tag-blocklist subtree
pruning, link-density + text-length scoring. Replaces the reference's
Tesseract payload operator (Worker.java:145-153 ``applyOcr``) with the
target domain's payload (HTML bytes -> main-content text), keeping the
same contract: pure function of the bytes, errors never raised past
:func:`extract_html` callers' boundary (see core.extract_payload).

The container has no lxml (verified 2026-08-16); the parser backend is
kept behind this module boundary so an lxml implementation can slot in
on a real cluster without touching the pipeline.
"""

from __future__ import annotations

import re
from html import unescape

# Subtrees that never contain main content: pruned wholesale
# (tag-blocklist pruning per BASELINE.json north_star).
_SKIP_SUBTREE = {
    "script", "style", "noscript", "template", "svg", "iframe",
    "head", "nav", "header", "footer", "aside", "form", "button",
    "select", "option", "datalist", "object", "embed", "canvas",
    "video", "audio", "figure", "map", "menu",
}

# Tags that open a new text block.
_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "body", "li", "td",
    "th", "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6",
    "figcaption", "dd", "dt", "tr", "table", "ul", "ol", "dl",
    "br", "hr",
}

_HEADINGS = {"h1", "h2", "h3", "h4", "h5", "h6"}

# jusText-style thresholds (public heuristics; values fixed here and
# versioned — changing them changes golden output).
MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33
MAX_HEADING_LINK_DENSITY = 0.50

_WS_RE = re.compile(r"\s+")
_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.IGNORECASE
)


_KIND_OF = {
    "h1": "heading", "h2": "heading", "h3": "heading", "h4": "heading",
    "h5": "heading", "h6": "heading",
    "li": "li", "dd": "li", "dt": "li",
    "pre": "pre", "blockquote": "blockquote",
    "td": "cell", "th": "cell", "tr": "cell", "table": "cell",
}

# ---------------------------------------------------------------------------
# integrated scanner: one compiled regex + inlined block segmentation.
# (History: html.parser state machine -> regex tokenizer feeding
# HTMLParser-style handlers (~2x) -> handlers inlined into the scan
# loop (this form, ~25% more). Semantics are pinned byte-identical by
# tests/golden_corpus_sha256.json at every step.)
# Behavior mirrors html.parser for our purposes: lowercased tag names,
# entities decoded in text (convert_charrefs), raw-text elements
# (script/style/textarea/title) delivered as one undecoded chunk.
# ---------------------------------------------------------------------------

_RAWTEXT = {"script", "style", "textarea", "title"}
_TOKEN_RE = re.compile(
    r"""<(?:
        !--.*?(?:-->|$)                                   # comment
      | !\[CDATA\[.*?(?:\]\]>|$)                          # cdata
      | [!?][^>]*>?                                       # doctype / pi
      | (?P<close>/)?(?P<name>[a-zA-Z][a-zA-Z0-9:._-]*)   # tag name
        (?P<attrs>(?:"[^"]*"|'[^']*'|[^>"'])*)>?          # attrs (quote-aware)
    )""",
    re.DOTALL | re.VERBOSE,
)


def _segment(html: str) -> list:
    """One pass over the document -> [(kind, text_parts, total_chars,
    link_chars)] flat block list."""
    blocks: list = []
    parts: list = []
    total = 0
    link = 0
    kind = "p"
    kind_stack: list = []
    skip_depth = 0
    link_depth = 0
    pos, n = 0, len(html)
    find = html.find
    match = _TOKEN_RE.match
    kind_of = _KIND_OF.get

    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            text = html[pos:]
            pos = n
        else:
            text = html[pos:lt] if lt > pos else None
        if text and not skip_depth:
            if "&" in text:
                text = unescape(text)
            if text.isspace():
                if parts:
                    parts.append(text)
            else:
                parts.append(text)
                c = len(text.strip())
                total += c
                if link_depth:
                    link += c
        if lt == -1:
            break
        m = match(html, lt)
        if m is None:  # bare '<' that opens no construct: literal text
            if not skip_depth:
                parts.append("<")
                total += 1
                if link_depth:
                    link += 1
            pos = lt + 1
            continue
        pos = m.end()
        # positional groups (1=close, 2=name, 3=attrs) + lazy attrs
        # fetch + islower fast path: ~1.3x on the scan loop, verified
        # output-identical (golden sha256 manifest unchanged)
        name = m.group(2)
        if not name:  # comment/doctype/cdata/pi: no event
            continue
        if not name.islower():
            name = name.lower()
        if m.group(1):  # close tag
            if name in _SKIP_SUBTREE:
                if skip_depth:
                    skip_depth -= 1
            elif skip_depth:
                pass
            elif name == "a":
                if link_depth:
                    link_depth -= 1
            elif name in _BLOCK_TAGS and name != "br" and name != "hr":
                if parts:
                    blocks.append((kind, parts, total, link))
                if kind_stack:
                    kind_stack.pop()
                kind = kind_stack[-1] if kind_stack else "p"
                parts = []
                total = 0
                link = 0
            continue
        attrs = m.group(3)
        if attrs and attrs.rstrip().endswith("/"):
            # self-closed: only br/hr matter (block flush)
            if not skip_depth and (name == "br" or name == "hr"):
                if parts:
                    blocks.append((kind, parts, total, link))
                parts = []
                total = 0
                link = 0
        else:
            if name in _SKIP_SUBTREE:
                skip_depth += 1
            elif skip_depth:
                pass
            elif name == "a":
                link_depth += 1
            elif name in _BLOCK_TAGS:
                if parts:
                    blocks.append((kind, parts, total, link))
                parts = []
                total = 0
                link = 0
                if name != "br" and name != "hr":
                    kind = kind_of(name, "p")
                    kind_stack.append(kind)
            if name in _RAWTEXT:
                # CDATA content mode: no entity decoding, no nested tags
                end = find(f"</{name}", pos)
                if end == -1:
                    raw = html[pos:]
                    pos = n
                else:
                    raw = html[pos:end]
                if raw and not skip_depth and not raw.isspace():
                    parts.append(raw)
                    c = len(raw.strip())
                    total += c
                    if link_depth:
                        link += c
                elif raw and not skip_depth and parts:
                    parts.append(raw)
                if end != -1:
                    gt = find(">", end)
                    # rawtext close tag: mirror the endtag branch above
                    if name in _SKIP_SUBTREE:
                        if skip_depth:
                            skip_depth -= 1
                    pos = n if gt == -1 else gt + 1
    if parts:
        blocks.append((kind, parts, total, link))
    return blocks


def decode_payload(payload: bytes) -> str:
    """Deterministic charset handling: utf-8 strict, else the charset
    declared in the first 2 KiB, else utf-8 with replacement."""
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return payload.decode("utf-16", errors="replace")
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        pass
    m = _CHARSET_RE.search(payload[:2048])
    if m:
        try:
            return payload.decode(m.group(1).decode("ascii"), errors="strict")
        except (UnicodeDecodeError, LookupError):
            pass
    return payload.decode("utf-8", errors="replace")


def extract_html(payload: bytes) -> tuple[str, list[tuple[int, int, str]]]:
    """HTML bytes -> (main-content text, [(start, end, kind), ...]).

    Kept blocks are joined with "\\n\\n"; spans are offsets of each kept
    block in the returned text. Raises only on truly broken input —
    callers go through core.extract_payload which maps exceptions to
    error rows (reference semantics: Worker.java:86-98, errors are
    results, not exceptions).
    """
    html = decode_payload(payload)
    out_parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for kind, parts, total, link in _segment(html):
        # whitespace collapse + strip (same as regex \s+ sub + strip)
        text = " ".join("".join(parts).split())
        if not text:
            continue
        ld = link / total if total else 0.0
        if kind == "heading":
            if ld > MAX_HEADING_LINK_DENSITY:
                continue
        else:
            if len(text) < MIN_BLOCK_CHARS or ld > MAX_LINK_DENSITY:
                continue
        if out_parts:
            pos += 2  # the "\n\n" separator
        out_parts.append(text)
        spans.append((pos, pos + len(text), kind))
        pos += len(text)
    return "\n\n".join(out_parts), spans
