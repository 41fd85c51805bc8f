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
                 "run_id": "r1", "partitions": 2}], base,
    )
    assert ok1[0]["ok"]
    # t1 replays its committed run_id (a job-level error) while t2 is new
    res = submit_jobs(
        spark,
        [
            {"app_id": "t1", "pages": pages.limit(40), "run_id": "r1",
             "partitions": 2},
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


def test_duplicate_app_ids_in_one_submission_rejected(spark, pages, tmp_path):
    """Two concurrent runs of one tenant would race the single-writer
    snapshot in operators/resume.py (both read the same snapshot n; one
    commit silently drops from LATEST) — reject before dispatch."""
    import pytest

    with pytest.raises(ValueError, match="duplicate app_id"):
        submit_jobs(
            spark,
            [
                {"app_id": "t1", "pages": pages.limit(10)},
                {"app_id": "t1", "pages": pages.limit(10)},
            ],
            str(tmp_path / "tenants"),
            max_parallel=2,
        )
    # nothing was dispatched: no tenant dir was created
    assert not os.path.exists(str(tmp_path / "tenants" / "t1"))


def test_resubmission_without_run_id_resumes(spark, pages, tmp_path):
    """Default run_id is a fresh id per submission, so resubmitting a
    tenant's job resumes (0 reprocessed) instead of tripping the
    replay guard."""
    base = str(tmp_path / "tenants")
    # deterministic subset (limit row identity is unstable across runs)
    subset = pages.filter(F.abs(F.xxhash64("url")) % 10 == 0)
    job = {"app_id": "t1", "pages": subset, "partitions": 2}
    r1 = submit_jobs(spark, [dict(job)], base)
    assert r1[0]["ok"] and r1[0]["n_extracted_this_run"] > 0
    r2 = submit_jobs(spark, [dict(job)], base)
    assert r2[0]["ok"] and r2[0]["n_extracted_this_run"] == 0


def test_mixed_extract_and_curate_jobs_share_one_session(
    spark, pages, tmp_path
):
    """Round-5 stretch (round-4 verdict item 7): curation runs through
    the same multi-tenant queue as extraction — one session, per-tenant
    namespaces, concurrent FAIR pools, per-job error capture, and the
    curation fingerprint barrier still no-ops on resubmission."""
    import pandas as pd

    base = str(tmp_path / "tenants")
    docs = spark.createDataFrame(pd.DataFrame([
        {"url": f"https://ex.com/{i}",
         "text": " ".join(f"t{i:02d}w{j:02d}" for j in range(40)),
         "lang": "en"}
        for i in range(12)
    ]))
    jobs = [
        {"app_id": "ext1", "pages": pages.limit(20), "partitions": 2},
        {"app_id": "cur1", "kind": "curate", "docs": docs,
         "curation": {"pack_target": 2048}},
    ]
    r = submit_jobs(spark, jobs, base, max_parallel=2)
    assert [x["app_id"] for x in r] == ["ext1", "cur1"]
    assert all(x["ok"] for x in r), r
    assert r[1]["n_survivors"] == 12
    # namespaced layout: each tenant's snapshot lives under its own dir
    from distributed_system___ocr_spark.curation import (
        load_curation_snapshot,
        read_curated,
    )

    assert load_curation_snapshot(os.path.join(base, "cur1")) is not None
    assert read_curated(spark, os.path.join(base, "cur1")).count() == 12
    # the extraction tenant's namespace has no curated output (its
    # _checkpoint belongs to the extraction resume layer) — isolation
    # is a property of the layout
    assert not os.path.exists(os.path.join(base, "ext1", "curated"))
    assert os.path.exists(os.path.join(base, "cur1", "curated"))

    # resubmission (fresh auto run_id): curation barrier no-ops
    r2 = submit_jobs(
        spark,
        [{"app_id": "cur1", "kind": "curate", "docs": docs,
          "curation": {"pack_target": 2048}}],
        base,
    )
    assert r2[0]["ok"] and r2[0].get("skipped_noop") is True

    # a failing curation job responds as an error without crashing
    # siblings (invalid pack config)
    r3 = submit_jobs(
        spark,
        [{"app_id": "cur_bad", "kind": "curate", "docs": docs,
          "curation": {"pack_target": -1}},
         {"app_id": "cur2", "kind": "curate", "docs": docs}],
        base,
        max_parallel=2,
    )
    assert r3[0]["ok"] is False and "positive" in r3[0]["error"]
    assert r3[1]["ok"] is True
