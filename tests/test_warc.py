"""WARC source: roundtrip through the reader into the pipeline."""

from __future__ import annotations

from distributed_system___ocr_spark.corpus import page_row
from distributed_system___ocr_spark.pipeline import run_pipeline
from distributed_system___ocr_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    write_warc,
)


def _fixture_records(n, seed=42):
    for i in range(n):
        row = page_row(i, seed)
        yield row["url"], row["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"), row[
            "html"
        ]


def test_parse_roundtrip_plain_and_gzip(tmp_path):
    recs = list(_fixture_records(20))
    for gz, name in ((False, "a.warc"), (True, "b.warc.gz")):
        p = str(tmp_path / name)
        write_warc(p, recs, gzip_members=gz)
        with open(p, "rb") as f:
            parsed = list(parse_warc_records(f.read()))
        assert len(parsed) == 20
        assert [u for u, _, _ in parsed] == [u for u, _, _ in recs]
        # payload bytes identical after http-header strip
        assert [b for _, _, b in parsed] == [b for _, _, b in recs]


def test_read_warc_into_pipeline(spark, tmp_path):
    warc_dir = tmp_path / "warcs"
    warc_dir.mkdir()
    recs = list(_fixture_records(60))
    for k in range(3):  # 3 files = 3 parallel units
        write_warc(str(warc_dir / f"part-{k}.warc.gz"), recs[k * 20 : (k + 1) * 20])

    pages = read_warc(spark, str(warc_dir / "*.warc.gz"))
    assert pages.count() == 60
    assert pages.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,html:binary,text:string,"
        "lang:string>"
    )

    out = str(tmp_path / "out")
    info = run_pipeline(spark, pages, out, run_id="w1", num_partitions=4)
    n_urls = pages.select("url").distinct().count()
    assert info["n_extracted_this_run"] == n_urls


def test_non_response_records_skipped(tmp_path):
    raw = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\n"
        b"hello\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/1\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 4\r\n\r\n"
        b"body\r\n\r\n"
    )
    parsed = list(parse_warc_records(raw))
    assert parsed == [("http://x/1", "2024-01-01T00:00:00Z", b"body")]


def test_corrupt_gzip_member_drops_tail_not_task(tmp_path):
    """A .warc.gz with a corrupt member (or non-gzip trailing bytes)
    must yield the records before the corruption and stop — never
    raise out of the parser (one bad file costs rows, not the task)."""
    recs = list(_fixture_records(3))
    p = str(tmp_path / "good.warc.gz")
    write_warc(p, recs, gzip_members=True)
    with open(p, "rb") as f:
        good = f.read()
    # append a member with a valid gzip magic but a broken header:
    # decompression of that member raises zlib.error
    parsed = list(parse_warc_records(good + b"\x1f\x8b" + b"\x00" * 20))
    assert [u for u, _, _ in parsed] == [u for u, _, _ in recs]
    # non-gzip trailing garbage after valid members
    parsed2 = list(parse_warc_records(good + b"trailing garbage"))
    assert [u for u, _, _ in parsed2] == [u for u, _, _ in recs]


def test_warc_parser_total_on_garbage():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=2048))
    def check(raw):
        for url, date, body in parse_warc_records(raw):
            assert isinstance(url, str)
            assert isinstance(body, bytes)

    check()


def test_url_list_source_multiplicity(spark, pages, tmp_path):
    """Reference input-format parity: newline-delimited url list with
    blanks and duplicates -> blank-dropped, dup-counted pages rows."""
    from pyspark.sql import functions as F

    from distributed_system___ocr_spark.operators.manifest import (
        build_manifest,
    )
    from distributed_system___ocr_spark.operators.extract import extract_stage
    from distributed_system___ocr_spark.operators.manifest import (
        latest_per_key,
    )
    from distributed_system___ocr_spark.sources.urllist import (
        pages_for_url_list,
        read_url_list,
    )

    distinct = latest_per_key(pages)
    urls = [r["url"] for r in distinct.select("url").limit(5).collect()]
    lst = tmp_path / "urls.txt"
    lst.write_text(
        f"{urls[0]}\n\n{urls[1]}\n{urls[0]}\n  \n{urls[2]}\n{urls[0]}\n"
    )
    parsed = read_url_list(spark, str(lst))
    assert parsed.count() == 5  # blanks dropped, dups kept

    selected = pages_for_url_list(spark, str(lst), distinct)
    assert selected.count() == 5
    manifest = build_manifest(
        selected, extract_stage(latest_per_key(selected))
    )
    by_url = {r["url"]: r["n_occurrences"] for r in manifest.collect()}
    assert by_url[urls[0]] == 3  # multiplicity preserved (MGR:216)
    assert by_url[urls[1]] == 1
