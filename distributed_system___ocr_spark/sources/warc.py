"""WARC source: read Common-Crawl-native WARC files into the ``pages``
schema, distributed.

WARC/1.0 (ISO 28500, public format): a file is a sequence of records,
each ``WARC/1.0\\r\\n`` + header lines + ``\\r\\n`` + Content-Length
payload bytes + ``\\r\\n\\r\\n``. Common Crawl ships them gzipped
per-record (member-concatenated .warc.gz), which stdlib zlib handles
by decompressing members in a loop.

Distribution model: WARC (and per-record gzip) is not byte-splittable,
so the unit of parallelism is the FILE — exactly how production CC
jobs shard (one task per ~1 GB warc.gz, 100k+ files at crawl scale).
We list files on the driver (cheap: names only), parallelize the name
list, and parse inside ``mapInPandas`` so payload bytes never touch
the driver.

Only ``response`` records with an http payload become pages rows; the
http header block is stripped; warc_ts comes from WARC-Date.
"""

from __future__ import annotations

import datetime as dt
import glob
import gzip
import io
import zlib

from pyspark.sql import DataFrame, SparkSession

from ..corpus import PAGES_SCHEMA

_CRLF = b"\r\n"


def _split_gzip_members(data: bytes):
    """Yield decompressed gzip members from member-concatenated data
    (or the data itself if not gzipped)."""
    if data[:2] != b"\x1f\x8b":
        yield data
        return
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            member = d.decompress(data[pos:])
        except zlib.error:
            # corrupt member / non-gzip trailing bytes: keep the
            # records already yielded, drop the rest of this file —
            # one bad file must cost rows, never the task (the
            # "tolerant of trailing garbage" contract; errors-as-rows
            # discipline applied at the file level)
            return
        yield member
        tail = len(d.unused_data)
        pos = len(data) - tail if tail else len(data)


def parse_warc_records(raw: bytes):
    """Yield (url, warc_date, payload_bytes) for response records.
    Pure function of the bytes; tolerant of trailing garbage."""
    for chunk in _split_gzip_members(raw):
        pos = 0
        n = len(chunk)
        while pos < n:
            head_end = chunk.find(_CRLF + _CRLF, pos)
            if head_end == -1:
                break
            head = chunk[pos:head_end].decode("latin-1", errors="replace")
            lines = head.split("\r\n")
            if not lines or not lines[0].startswith("WARC/"):
                break
            hdr = {}
            for ln in lines[1:]:
                k, _, v = ln.partition(":")
                hdr[k.strip().lower()] = v.strip()
            try:
                length = int(hdr.get("content-length", "0"))
            except ValueError:
                break
            body = chunk[head_end + 4 : head_end + 4 + length]
            pos = head_end + 4 + length + 4  # record + blank-line sep
            if hdr.get("warc-type") != "response":
                continue
            url = hdr.get("warc-target-uri", "")
            date = hdr.get("warc-date", "")
            # strip the http header block if present
            if body[:5] in (b"HTTP/",):
                he = body.find(_CRLF + _CRLF)
                if he != -1:
                    body = body[he + 4 :]
            yield url, date, body


def _parse_date(s: str) -> dt.datetime:
    try:
        return dt.datetime.fromisoformat(s.replace("Z", "+00:00")).replace(
            tzinfo=None
        )
    except ValueError:
        return dt.datetime(1970, 1, 1)


def read_warc(
    spark: SparkSession, path_glob: str, partitions: int | None = None
) -> DataFrame:
    """WARC file glob -> pages(url, warc_ts, html, text, lang)."""
    files = sorted(glob.glob(path_glob))
    if not files:
        raise FileNotFoundError(f"no WARC files match {path_glob}")
    parts = partitions or min(
        len(files), spark.sparkContext.defaultParallelism * 2
    )
    fdf = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(parts, "path")

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                with open(p, "rb") as fh:
                    raw = fh.read()
                for url, date, body in parse_warc_records(raw):
                    rows.append(
                        {
                            "url": url,
                            "warc_ts": _parse_date(date),
                            "html": body,
                            "text": "",
                            "lang": "",
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return fdf.mapInPandas(parse, PAGES_SCHEMA)


def write_warc(path: str, records, gzip_members: bool = True) -> None:
    """Write (url, warc_date_iso, payload_bytes) records as a .warc(.gz)
    file — test/fixture writer mirroring the reader's format."""
    out = io.BytesIO()
    for url, date, body in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\nContent-Length: {len(http)}\r\n"
        ).encode()
        rec = head + _CRLF + http + _CRLF + _CRLF
        out.write(gzip.compress(rec) if gzip_members else rec)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())


__all__ = ["read_warc", "write_warc", "parse_warc_records"]


