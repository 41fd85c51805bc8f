"""O15 multi-tenant job submission: namespace isolation, concurrent
execution, per-job error responses (Manager.java:111-127, 309-310
semantics in Spark idiom)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from distributed_system___ocr_spark.jobs import submit_jobs
from distributed_system___ocr_spark.pipeline import read_extracted


def test_two_concurrent_jobs_are_isolated(spark, pages, tmp_path):
    base = str(tmp_path / "tenants")
    a_in = pages.filter(F.abs(F.xxhash64("url")) % 2 == 0)
    b_in = pages.filter(F.abs(F.xxhash64("url")) % 2 == 1)
    res = submit_jobs(
        spark,
        [
            {"app_id": "tenant-a", "pages": a_in, "partitions": 4},
            {"app_id": "tenant-b", "pages": b_in, "partitions": 4},
        ],
        base,
        max_parallel=2,
    )
    assert [r["app_id"] for r in res] == ["tenant-a", "tenant-b"]
    assert all(r["ok"] for r in res)

    for app_id, inp in (("tenant-a", a_in), ("tenant-b", b_in)):
        out = os.path.join(base, app_id)
        got = read_extracted(spark, out)
        n_urls = inp.select("url").distinct().count()
        assert got.count() == n_urls
        # nothing from the other tenant leaked into this namespace
        got_urls = {r["url"] for r in got.select("url").collect()}
        want_urls = {r["url"] for r in inp.select("url").distinct().collect()}
        assert got_urls == want_urls


def test_failed_job_responds_without_affecting_siblings(spark, pages, tmp_path):
    base = str(tmp_path / "tenants")
    ok1 = submit_jobs(
        spark, [{"app_id": "t1", "pages": pages.limit(40),
                 "partitions": 2}], base,
    )
    assert ok1[0]["ok"]
    # t1 replays its committed run_id (a job-level error) while t2 is new
    res = submit_jobs(
        spark,
        [
            {"app_id": "t1", "pages": pages.limit(40), "partitions": 2},
            {"app_id": "t2", "pages": pages.limit(40), "partitions": 2},
        ],
        base,
        max_parallel=2,
    )
    assert res[0]["ok"] is False and "already committed" in res[0]["error"]
    assert res[1]["ok"] is True
    assert read_extracted(spark, os.path.join(base, "t2")).count() > 0
    # t1's committed data untouched by its failed replay
    assert read_extracted(spark, os.path.join(base, "t1")).count() > 0
