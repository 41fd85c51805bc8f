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
from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser

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


@dataclass
class _Block:
    kind: str = "p"
    parts: list = field(default_factory=list)
    total_chars: int = 0
    link_chars: int = 0

    def text(self) -> str:
        # equivalent to regex \s+ collapse + strip, ~2x faster
        return " ".join("".join(self.parts).split())

    def link_density(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 0.0


class _BlockParser(HTMLParser):
    """Segment an HTML document into flat text blocks.

    convert_charrefs=True (default) folds entities into handle_data,
    so entity decoding needs no span bookkeeping of its own.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur = _Block()
        self._skip_depth = 0
        self._link_depth = 0
        self._kind_stack: list[str] = []

    # -- block lifecycle ------------------------------------------------
    def _flush(self) -> None:
        if self._cur.parts:
            self.blocks.append(self._cur)
        kind = self._kind_stack[-1] if self._kind_stack else "p"
        self._cur = _Block(kind=kind)

    @staticmethod
    def _kind_of(tag: str) -> str:
        if tag in _HEADINGS:
            return "heading"
        if tag in ("li", "dd", "dt"):
            return "li"
        if tag == "pre":
            return "pre"
        if tag == "blockquote":
            return "blockquote"
        if tag in ("td", "th", "tr", "table"):
            return "cell"
        return "p"

    # -- HTMLParser hooks -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag not in ("br", "hr"):
                self._kind_stack.append(self._kind_of(tag))
                self._cur.kind = self._kind_stack[-1]

    def handle_startendtag(self, tag, attrs):
        if self._skip_depth:
            return
        if tag in ("br", "hr"):
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREE:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            if self._link_depth:
                self._link_depth -= 1
            return
        if tag in _BLOCK_TAGS and tag not in ("br", "hr"):
            self._flush()
            if self._kind_stack:
                self._kind_stack.pop()
            self._cur.kind = self._kind_stack[-1] if self._kind_stack else "p"

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        cur = self._cur
        if data.isspace():
            # whitespace-only: counts nothing; skippable entirely at
            # block start (leading ws is stripped by text() anyway)
            if cur.parts:
                cur.parts.append(data)
            return
        cur.parts.append(data)
        n = len(data.strip())
        cur.total_chars += n
        if self._link_depth:
            cur.link_chars += n

    def close(self):
        super().close()
        self._flush()


# ---------------------------------------------------------------------------
# fast tokenizer: one compiled regex instead of html.parser's per-tag
# state machine (~3x; profiled — parser.goahead was 85% of extract time).
# Feeds the same handler methods as HTMLParser would, with the same
# observable behavior for our handler: lowercased tag names, entities
# decoded in text (convert_charrefs), raw-text elements (script/style/
# textarea/title) delivered as one undecoded data chunk.
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


def _scan(html: str, handler: "_BlockParser") -> None:
    pos, n = 0, len(html)
    find = html.find
    match = _TOKEN_RE.match
    data = handler.handle_data
    starttag = handler.handle_starttag
    endtag = handler.handle_endtag
    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            text = html[pos:]
            data(unescape(text) if "&" in text else text)
            break
        if lt > pos:
            text = html[pos:lt]
            data(unescape(text) if "&" in text else text)
        m = match(html, lt)
        if m is None:  # bare '<' that opens no construct: literal text
            data("<")
            pos = lt + 1
            continue
        pos = m.end()
        close, name, attrs = m.group("close", "name", "attrs")
        if not name:  # comment/doctype/cdata/pi: no event
            continue
        name = name.lower()
        if close:
            endtag(name)
        elif attrs and attrs.rstrip().endswith("/"):
            # html.parser fires handle_startendtag for self-closed tags;
            # our handler only needs the br/hr flush it implies
            handler.handle_startendtag(name, ())
        else:
            starttag(name, ())
            if name in _RAWTEXT:
                # CDATA content mode: no entity decoding, no nested tags
                end = find(f"</{name}", pos)
                if end == -1:
                    data(html[pos:])
                    break
                data(html[pos:end])
                gt = find(">", end)
                endtag(name)
                pos = n if gt == -1 else gt + 1


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
    parser = _BlockParser()
    _scan(html, parser)
    parser._flush()

    out_parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for blk in parser.blocks:
        text = blk.text()
        if not text:
            continue
        ld = blk.link_density()
        if blk.kind == "heading":
            if ld > MAX_HEADING_LINK_DENSITY:
                continue
        else:
            if len(text) < MIN_BLOCK_CHARS or ld > MAX_LINK_DENSITY:
                continue
        if out_parts:
            pos += 2  # the "\n\n" separator
        out_parts.append(text)
        spans.append((pos, pos + len(text), blk.kind))
        pos += len(text)
    return "\n\n".join(out_parts), spans
