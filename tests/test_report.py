"""O12 report format parity (LocalApplication.java:158-216) and
streaming-extraction exactly-once (foreachBatch through the same
snapshot layer)."""

from __future__ import annotations

import datetime as dt
import os
import re

import pandas as pd
from pyspark.sql import functions as F

from distributed_system___ocr_spark.pipeline import read_extracted, run_pipeline
from distributed_system___ocr_spark.report import (
    FOOTER,
    HEADER,
    render_report,
)
from distributed_system___ocr_spark.streaming.stream import (
    extract_foreach_batch,
    windowed_event_counts_stream,
)


def _mini_tables(spark):
    ts = dt.datetime(2024, 1, 1)
    manifest = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["http://a/1", "http://b/2", "http://c/3", "http://d/4"],
                "n_occurrences": [2, 1, 1, 1],
            }
        )
    )
    extracted = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["http://a/1", "http://b/2", "http://c/3", "http://d/4"],
                "text": ["line one\nline two", "plain", "", ""],
                "status": ["ok", "ok", "error", "too_large"],
                "error": [None, None, "Image download error",
                          "payload exceeds limit"],
            }
        )
    )
    return manifest, extracted


def test_report_format_matches_reference(spark):
    manifest, extracted = _mini_tables(spark)
    html = render_report(manifest, extracted)
    assert html.startswith(HEADER)
    assert html.endswith(FOOTER)
    # quoted src= exactly as LocalApplication.createHtml emits it
    blocks = re.findall(
        r'\t<p>\n\t\t<img src="(.*?)"><br/>\n\t\t(.*?)\n\t</p>\n',
        html, re.DOTALL)
    # multiplicity re-expansion: url a appears twice (LA:187-200)
    urls = [u for u, _ in blocks]
    assert urls == ["http://a/1", "http://a/1", "http://b/2",
                    "http://c/3", "http://d/4"]
    by_url = dict(blocks)  # last block per url
    assert by_url["http://a/1"] == "line one<br/>line two"  # \n -> <br/> (LA:191)
    assert by_url["http://c/3"] == "Image download error"  # errors rendered as data
    # too_large rows render their error too (lineage counts them failed)
    assert by_url["http://d/4"] == "payload exceeds limit"


def test_report_refuses_oversized(spark):
    manifest, extracted = _mini_tables(spark)
    import pytest

    with pytest.raises(ValueError, match="filter the manifest"):
        render_report(manifest, extracted, max_rows=2)


def test_streaming_extract_exactly_once(spark, pages, tmp_path):
    """File-stream + foreachBatch commits through the same snapshot
    layer: a second stream over the SAME directory (fresh stream
    checkpoint, simulating redelivery) extracts zero new urls."""
    src = str(tmp_path / "pages_src")
    pages.limit(200).write.parquet(src)
    out = str(tmp_path / "out")

    runs1 = extract_foreach_batch(spark, src, out, run_prefix="s1")
    n1 = sum(r["n_extracted_this_run"] for r in runs1)
    n_urls = spark.read.parquet(src).select("url").distinct().count()
    assert n1 == n_urls

    # redelivery: new stream, no stream checkpoint -> every file replayed,
    # but the processed-url manifest drops all of them
    runs2 = extract_foreach_batch(spark, src, out, run_prefix="s2")
    n2 = sum(r["n_extracted_this_run"] for r in runs2)
    assert n2 == 0
    assert read_extracted(spark, out).count() == n_urls


def test_streaming_windowed_equals_batch(spark):
    stream_res = windowed_event_counts_stream(
        spark, "/root/testdata/sf0.001/events.parquet", "win_eq_batch"
    )
    batch = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    a = {(r["window_start"], r["event_type"], r["n"])
         for r in stream_res.select("window_start", "event_type", "n").collect()}
    b = {(r["window_start"], r["event_type"], r["n"]) for r in batch.collect()}
    assert a == b


def test_streaming_append_drops_post_watermark_late_rows(spark, tmp_path):
    """Append-mode + watermark is the bounded-state scale form: once
    the watermark passes a window's end the window is emitted exactly
    once and a LATER-arriving row for it must be dropped, not
    re-aggregated. Three files forced into three ordered micro-batches:
    batch A advances event time past the 12:00 window; batch B lets the
    watermark take effect and emits the finalized window (Spark's
    late-data filter lags eviction by one batch); batch C delivers a
    late 12:02 row, which must be dropped — the emitted count stays 2
    and append mode never re-emits the window."""
    import time

    from distributed_system___ocr_spark.streaming.stream import (
        windowed_event_counts_append_stream,
    )

    in_dir = str(tmp_path / "in")

    def _write(rows):
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value",
                     "props"],
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
            in_dir
        )

    t = dt.datetime(2024, 3, 1, 12, 0, 0)

    def at(mins, secs=0):
        return t + dt.timedelta(minutes=mins, seconds=secs)

    # batch A: two rows in [12:00,12:05), one at 12:30 -> watermark
    # after A = 12:30 - 10min = 12:20 > 12:05 (window finalizable)
    _write([(1, at(0, 1), 1, "click", 1.0, None),
            (2, at(4), 1, "click", 1.0, None),
            (3, at(30), 1, "click", 1.0, None)])
    time.sleep(1.1)  # distinct mtime: file source processes oldest first
    # batch B: fresh row only — runs with watermark 12:20, evicting and
    # EMITTING the [12:00,12:05) window with n=2
    _write([(5, at(31), 1, "click", 1.0, None)])
    time.sleep(1.1)
    # batch C: a LATE row for the already-emitted window (must be
    # dropped by the in-force watermark) + a fresh row
    _write([(4, at(2), 1, "click", 1.0, None),
            (6, at(32), 1, "click", 1.0, None)])

    got = windowed_event_counts_append_stream(
        spark, in_dir, table_name="late_drop_test",
        source_options={"maxFilesPerTrigger": 1},
    )
    emitted = [(r["window_start"].replace(tzinfo=None), r["n"])
               for r in got.select("window_start", "n").collect()]
    # exactly one finalized window (final watermark 12:22 < the 12:30+
    # window ends), emitted once, counting ONLY the two on-time rows —
    # the late event_id=4 neither bumps the count nor re-emits
    assert emitted == [(at(0), 2)]
    # a batch aggregation over the same files WOULD count the late row
    batch_n = spark.read.parquet(in_dir).filter(F.col("ts") < at(5)).count()
    assert batch_n == 3  # 2 on-time + 1 late


def test_streaming_append_parquet_sink_matches_batch_oracle(
    spark, tmp_path
):
    """Round-3 verdict stretch: append mode to a REAL sink. The same
    three-ordered-micro-batch late-row protocol as the memory-sink
    test, but the finalized windows land in Spark's exactly-once
    parquet file sink; the on-disk result (read through the
    _spark_metadata commit log) must equal the batch aggregation
    restricted to windows whose end <= the final watermark — append
    semantics verbatim — and a RESTART over the same checkpoint must
    be a no-op (no duplicated output files)."""
    import time

    from distributed_system___ocr_spark.streaming.stream import (
        windowed_event_counts_append_to_parquet,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    def _write(rows):
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value",
                     "props"],
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
            in_dir
        )

    t = dt.datetime(2024, 3, 1, 12, 0, 0)

    def at(mins, secs=0):
        return t + dt.timedelta(minutes=mins, seconds=secs)

    _write([(1, at(0, 1), 1, "click", 1.0, None),
            (2, at(4), 1, "click", 2.5, None),
            (3, at(30), 1, "view", 1.0, None)])
    time.sleep(1.1)
    _write([(5, at(31), 1, "view", 1.0, None)])
    time.sleep(1.1)
    _write([(4, at(2), 1, "click", 99.0, None),   # late: must be dropped
            (6, at(32), 1, "view", 1.0, None)])

    got = windowed_event_counts_append_to_parquet(
        spark, in_dir, out_dir, query_name="append_pq_test",
        source_options={"maxFilesPerTrigger": 1},
    )
    emitted = {
        (r["window_start"].replace(tzinfo=None), r["event_type"], r["n"],
         r["total_value"])
        for r in got.collect()
    }
    # final watermark = max(ts) - 10min = 12:22; only [12:00,12:05)
    # ends before it. The late 99.0-value row neither bumps n nor sum.
    assert emitted == {(at(0), "click", 2, 3.5)}

    # restart over the same checkpoint: all input already committed ->
    # no new micro-batch output, on-disk result byte-stable
    got2 = windowed_event_counts_append_to_parquet(
        spark, in_dir, out_dir, query_name="append_pq_test2",
    )
    assert {
        (r["window_start"].replace(tzinfo=None), r["event_type"], r["n"],
         r["total_value"])
        for r in got2.collect()
    } == emitted


def test_stream_static_enrich_matches_batch_join(spark):
    """Stream-static enrichment + event_id dedup must equal the batch
    distinct-join (the file source delivers every event exactly once
    here, so dedup is an identity — the semantics under test are the
    join correctness and the dedup not LOSING rows)."""
    from distributed_system___ocr_spark.streaming.stream import (
        stream_static_enrich,
    )

    path = "/root/testdata/sf0.001/events.parquet"
    ev = spark.read.parquet(path)
    dim = ev.groupBy("user_id").agg(F.count("*").alias("user_total"))
    got = stream_static_enrich(spark, path, dim, "sse_test")
    batch = ev.dropDuplicates(["event_id"]).join(dim, "user_id", "left")
    assert got.count() == batch.count()
    a = {(r["event_id"], r["user_total"])
         for r in got.select("event_id", "user_total").collect()}
    b = {(r["event_id"], r["user_total"])
         for r in batch.select("event_id", "user_total").collect()}
    assert a == b


def test_stateful_stream_counts_match_batch(spark):
    from distributed_system___ocr_spark.streaming.stream import (
        stateful_user_counts_stream,
    )

    res = stateful_user_counts_stream(
        spark, "/root/testdata/sf0.001/events.parquet", "suc_test"
    )
    # update mode may emit one row per user per batch: take the final
    got = {
        r["user_id"]: r["n_events"]
        for r in res.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    }
    batch = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == batch


def test_native_session_window_agrees_with_manual(spark):
    """Spark's session_window must agree with the manual lag/cumsum
    sessionization (the oracle-checked sessionize_events query)."""
    from distributed_system___ocr_spark.plans import REGISTRY

    manual = {
        (r["user_id"], r["n_sessions"])
        for r in REGISTRY["sessionize_events"]["builder"](
            spark, "/root/testdata/sf0.001"
        ).select("user_id", "n_sessions").collect()
    }
    native = {
        (r["user_id"], r["n"])
        for r in spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert native == manual


def test_golden_report_artifact_reproducible(spark, tmp_path):
    """outputs/golden_report_100docs.html (the repo's analogue of the
    reference's outputs/short_output.html golden) must be exactly
    reproducible from seed 42."""
    import os

    from distributed_system___ocr_spark.corpus import pages_df
    from distributed_system___ocr_spark.pipeline import (
        read_extracted,
        run_pipeline,
    )
    from distributed_system___ocr_spark.report import render_report

    out = str(tmp_path / "out")
    pages = pages_df(spark, 100, seed=42)
    info = run_pipeline(spark, pages, out, run_id="golden")
    manifest = spark.read.parquet(info["manifest_path"])
    html = render_report(manifest, read_extracted(spark, out))
    golden_path = os.path.join(
        os.path.dirname(__file__), "..", "outputs",
        "golden_report_100docs.html",
    )
    with open(golden_path, encoding="utf-8") as f:
        assert html == f.read()
