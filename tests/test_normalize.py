"""Schema-tolerant ingestion (sources/normalize.py): drifted pages
tables project onto the canonical schema and run through the REAL
pipeline end-to-end."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from distributed_system___ocr_spark.sources.normalize import normalize_pages


def test_missing_optionals_and_extra_columns(spark):
    drifted = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["https://a/1", "https://a/2"],
                "html": [
                    "<p>string payload long enough to keep as a block</p>",
                    "<p>another string payload long enough to keep</p>",
                ],  # STRING html, no warc_ts/text/lang, extra col:
                "crawl_batch": [7, 7],
            }
        )
    )
    got = normalize_pages(drifted)
    assert [f.name for f in got.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    types = {f.name: f.dataType.simpleString() for f in got.schema.fields}
    assert types == {
        "url": "string", "warc_ts": "timestamp",
        "html": "binary", "text": "string", "lang": "string",
    }
    rows = got.collect()
    assert all(r["warc_ts"] == dt.datetime(1970, 1, 1) for r in rows)
    assert all(isinstance(r["html"], (bytes, bytearray)) for r in rows)


def test_epoch_seconds_timestamp_and_pipeline_e2e(spark, tmp_path):
    drifted = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"https://b/{i}" for i in range(30)],
                "warc_ts": [1_700_000_000 + i for i in range(30)],  # epoch s
                "html": [
                    f"<html><body><article><p>Body text {i} with enough "
                    f"words to pass the density scorer in the content "
                    f"classifier.</p></article></body></html>"
                    for i in range(30)
                ],
            }
        )
    )
    pages = normalize_pages(drifted)
    assert pages.schema["warc_ts"].dataType.simpleString() == "timestamp"
    ts0 = pages.orderBy("url").limit(1).collect()[0]["warc_ts"]
    assert ts0.year == 2023  # 1.7e9 epoch seconds

    from distributed_system___ocr_spark.pipeline import (
        read_extracted,
        run_pipeline,
    )

    info = run_pipeline(spark, pages, str(tmp_path / "out"), run_id="n1")
    assert info["n_extracted_this_run"] == 30
    got = read_extracted(spark, str(tmp_path / "out"))
    assert got.filter(F.col("status") == "ok").count() == 30


def test_missing_url_rejected(spark):
    df = spark.createDataFrame(pd.DataFrame({"html": ["<p>x</p>"]}))
    with pytest.raises(ValueError, match="required column"):
        normalize_pages(df)


def test_default_epoch_is_timezone_independent_and_non_utc_rejected(spark):
    """The warc_ts default is timestamp_seconds(0) — the true epoch in
    any session timezone — and parsing a STRING warc_ts under a
    non-UTC session fails loud instead of silently shifting (round-3
    advice: this is a public boundary API reachable from externally-
    created sessions)."""
    import pytest
    from pyspark.sql import functions as F

    tz_before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # no warc_ts column: default must still be the exact epoch
        out = normalize_pages(
            spark.createDataFrame([("u1",)], ["url"])
        ).select(F.unix_micros("warc_ts").alias("us")).collect()
        assert out[0]["us"] == 0
        # string warc_ts under non-UTC: refuse
        with pytest.raises(ValueError, match="timeZone"):
            normalize_pages(
                spark.createDataFrame(
                    [("u1", "2024-01-01 00:00:00")], ["url", "warc_ts"]
                )
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)


def test_jsonl_ingestion_explicit_schema(spark, tmp_path):
    """JSONL pages read with the explicit schema (no inference pass)
    and normalized at the boundary; corrupt lines become null-url
    rows (errors-as-rows), not task failures."""
    from distributed_system___ocr_spark.sources.jsonl import (
        read_jsonl_pages,
    )

    p = tmp_path / "pages.jsonl"
    body1 = "json payload one kept as a real content block by length"
    body2 = "json payload two kept as a real content block by length"
    p.write_text(
        f'{{"url": "https://j/1", "html": "<p>{body1}</p>", '
        '"warc_ts": "2024-05-01 10:00:00", "lang": "en", "extra": 9}\n'
        f'{{"url": "https://j/2", "html": "<p>{body2}</p>"}}\n'
        "this line is not json at all\n"
    )
    got = read_jsonl_pages(spark, str(p))
    assert [f.name for f in got.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    rows = {r["url"]: r for r in got.collect()}
    assert set(rows) == {"https://j/1", "https://j/2", None}
    assert rows["https://j/1"]["warc_ts"] == dt.datetime(2024, 5, 1, 10)

    # epoch-NUMBER timestamps (forced to digit strings by the explicit
    # schema) must parse as epoch seconds, not collapse to the default
    # (code-review finding)
    p2 = tmp_path / "epoch.jsonl"
    # 14-digit CDX compact timestamps would overflow timestamp_seconds
    # (job-killing ArithmeticException, round-4 review finding) — they
    # must fall through to the epoch-0 default instead
    p2.write_text(
        '{"url": "https://j/3", "warc_ts": 1714557600}\n'
        '{"url": "https://j/4", "warc_ts": 20240501100000}\n'
    )
    got2 = {r["url"]: r["warc_ts"]
            for r in read_jsonl_pages(spark, str(p2)).collect()}
    assert got2["https://j/3"] == dt.datetime.fromtimestamp(
        1714557600, dt.timezone.utc
    ).replace(tzinfo=None)
    assert got2["https://j/4"] == dt.datetime(1970, 1, 1)
    assert bytes(rows["https://j/1"]["html"]) == (
        b"<p>" + body1.encode() + b"</p>"
    )
    assert rows["https://j/2"]["warc_ts"] == dt.datetime(1970, 1, 1)

    # the canonical frame runs through the real extraction pipeline
    import tempfile

    from distributed_system___ocr_spark.pipeline import (
        read_extracted,
        run_pipeline,
    )

    out = tempfile.mkdtemp(prefix="jsonl_out_")
    info = run_pipeline(
        spark, got.filter(F.col("url").isNotNull()), out, run_id="j1",
        write_manifest=False,
    )
    assert info["n_extracted_this_run"] == 2
    texts = {
        r["url"]: r["text"] for r in read_extracted(spark, out).collect()
    }
    assert texts["https://j/1"] == body1
