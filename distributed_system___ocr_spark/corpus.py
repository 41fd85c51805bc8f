"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

Schema per BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string,
          lang string)

Every row is a pure function of (doc index, seed) — no wall clock, no
global RNG state — so the same (n, seed) always produces byte-identical
payloads regardless of which executor generates which row. That is what
makes golden sha256 manifests and cross-parallelism determinism tests
possible (FIXTURES.md §1), and lets bench corpora be generated
*distributed* (spark.range -> mapInPandas) instead of on the driver.

Shape knobs mirror the reference input's properties:
- ~5% exact-duplicate urls (duplicates meaningful: Manager.java:216-219;
  dup urls present in reference inputs/short_input.txt)
- Zipf-skewed hosts (~20 domains, one hot) to exercise salted
  repartitioning (BASELINE.json north_rule)
- ~5% PDF payloads (mixing plain/hex Tj and multi-kern TJ encodings
  that must extract to IDENTICAL text, plus ~6% CID/Identity-H docs
  rejected into the error channel), ~2% corrupt/truncated bytes
  (error channel, Worker.java:86-98 analogue)
"""

from __future__ import annotations

import datetime as dt
import hashlib
import random
import zlib

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
_LANGS = ["en", "en", "en", "fr", "es", "de", "zh"]

_WORDS = (
    "data spark engine pipeline document extraction content boiler "
    "plate crawl web page text analysis distributed shuffle partition "
    "cluster executor arrow pandas vector batch manifest lineage "
    "resume checkpoint throughput scaling latency column parquet "
    "schema query join aggregate filter window stream state"
).split()

_HOSTS = [f"host{i:02d}.example.com" for i in range(20)]
# Zipf-ish weights: host00 is hot (skew driver for salting tests).
_HOST_WEIGHTS = [1.0 / (i + 1) for i in range(20)]
_HOST_CUM = []
_acc = 0.0
for _w in _HOST_WEIGHTS:
    _acc += _w
    _HOST_CUM.append(_acc)


def _rng(i: int, seed: int) -> random.Random:
    h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _sentence(r: random.Random, lo: int = 8, hi: int = 20) -> str:
    n = r.randint(lo, hi)
    words = [r.choice(_WORDS) for _ in range(n)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(r: random.Random) -> str:
    return " ".join(_sentence(r) for _ in range(r.randint(2, 6)))


def _link_farm(r: random.Random, n: int = 8) -> str:
    return " ".join(
        f'<a href="/x{r.randint(0, 999)}">{r.choice(_WORDS)} {r.choice(_WORDS)}</a>'
        for _ in range(n)
    )


def _html_payload(r: random.Random) -> bytes:
    title = _sentence(r, 3, 7)
    paras = "\n".join(f"<p>{_paragraph(r)}</p>" for _ in range(r.randint(3, 10)))
    lis = "\n".join(
        f"<li>{_sentence(r, 6, 14)}</li>" for _ in range(r.randint(0, 5))
    )
    doc = f"""<!DOCTYPE html>
<html><head><title>{title}</title>
<script>var x = {r.randint(0, 9999)};</script>
<style>body {{ margin: 0; }}</style></head>
<body>
<nav><ul><li>{_link_farm(r, 5)}</li></ul></nav>
<header><h1>site header {r.choice(_WORDS)}</h1></header>
<div class="ads">{_link_farm(r, 12)}</div>
<article>
<h1>{title}</h1>
{paras}
<ul>{lis}</ul>
<blockquote>{_sentence(r, 10, 25)}</blockquote>
</article>
<div class="related">{_link_farm(r, 10)}</div>
<footer>copyright {_link_farm(r, 4)}</footer>
</body></html>"""
    return doc.encode("utf-8")


def _pdf_payload(r: random.Random) -> bytes:
    """PDF payload covering the extractor's operator surface: simple
    ``(s) Tj``, hex-string ``<...> Tj``, multi-kern ``[ (w) -120 ... ]
    TJ`` arrays, and (rarely) a CID/Identity-H composite-font document
    that the extractor must REJECT into the error channel rather than
    decode as garbage."""
    lines = [_sentence(r, 5, 12) for _ in range(r.randint(2, 6))]
    form = r.random()
    if form < 0.06:  # composite-font document: rejected, status=error
        body = zlib.compress(b"BT <00480045> Tj ET\n")
        return (
            b"%PDF-1.4\n1 0 obj << /Type /Font /Subtype /Type0 "
            b"/Encoding /Identity-H >>\nendobj\n2 0 obj << /Length "
            + str(len(body)).encode()
            + b" /Filter /FlateDecode >>\nstream\n"
            + body
            + b"endstream\nendobj\ntrailer\n%%EOF\n"
        )
    ops = b""
    for k, ln in enumerate(lines):
        y = 700 - 20 * k
        clean = ln.replace("(", "").replace(")", "").encode("latin-1")
        pick = r.random()
        if pick < 0.5:  # plain string show
            ops += b"BT /F1 12 Tf 72 %d Td (%s) Tj ET\n" % (y, clean)
        elif pick < 0.75:  # hex string show (mixed-case digits + ws)
            hx = clean.hex().encode("ascii")
            if r.random() < 0.5:
                hx = hx.upper()
            mid = len(hx) // 2
            hx = hx[:mid] + b"\n" + hx[mid:]  # whitespace inside hex
            ops += b"BT /F1 12 Tf 72 %d Td <%s> Tj ET\n" % (y, hx)
        else:  # TJ array: words interleaved with kern adjustments
            words = clean.split(b" ")
            arr = b" ".join(
                b"(%s%s) %d" % (w, b"" if j == len(words) - 1 else b" ",
                                r.randint(-250, 250))
                for j, w in enumerate(words)
            )
            ops += b"BT /F1 12 Tf 72 %d Td [%s] TJ ET\n" % (y, arr)
    stream = zlib.compress(ops)
    return (
        b"%PDF-1.4\n1 0 obj << /Length "
        + str(len(stream)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + stream
        + b"endstream\nendobj\ntrailer\n%%EOF\n"
    )


def page_row(i: int, seed: int = 42) -> dict:
    """One deterministic pages row for doc index ``i``."""
    r = _rng(i, seed)
    # ~5% exact duplicates: point back at an earlier doc's identity+bytes.
    if i > 0 and r.random() < 0.05:
        base = _rng(i, seed ^ 0x5EED).randrange(i)
        row = page_row(base, seed)
        # duplicate row keeps its own warc_ts (re-crawl of the same url)
        row["warc_ts"] = _EPOCH + dt.timedelta(seconds=i * 7)
        return row
    u = r.random()
    host = _HOSTS[min(range(20), key=lambda k: (_HOST_CUM[k] < u * _acc, k))]
    url = f"https://{host}/page-{i}"
    kind = r.random()
    if kind < 0.05:
        html = _pdf_payload(r)
    elif kind < 0.07:
        html = _html_payload(r)[: r.randint(0, 40)] + b"\xff\xfe\xfa"  # corrupt
    else:
        html = _html_payload(r)
    return {
        "url": url,
        "warc_ts": _EPOCH + dt.timedelta(seconds=i * 7),
        "html": html,
        "text": "",
        "lang": r.choice(_LANGS),
    }


def pages_pandas(n: int, seed: int = 42, start: int = 0):
    """pages rows [start, start+n) as a pandas DataFrame (driver-side,
    small corpora / tests)."""
    import pandas as pd

    rows = [page_row(i, seed) for i in range(start, start + n)]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed corpus: spark.range(n) -> mapInPandas(page_row).

    Scale path — at 10^12 docs the corpus/table is read, not generated,
    but the generator itself must not funnel through the driver.
    """
    import pandas as pd

    rng_df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [page_row(int(i), seed) for i in pdf["id"]],
                columns=["url", "warc_ts", "html", "text", "lang"],
            )

    return rng_df.mapInPandas(gen, PAGES_SCHEMA)
