"""End-to-end extraction pipeline (SURVEY.md §3.2 Spark equivalent).

    pages --filter(O2)--> anti-join resume --> [salted repartition(O3)
    if forced] --> mapInPandas extract (O4/O5/O6) --> last-wins dedup
    on extracted text (O8) --> write extracted(O11) --> commit snapshot
    --> lineage(O17) + manifest(O7/O10)

Shuffle budget: ZERO shuffles of raw payload bytes on the default path
(file scans are byte-uniform; the only exchanges carry extracted text
for the dedup window and tiny key/count rows for resume + manifest).
At scale the extract stage dominates and its input partitioning comes
straight from the scan splits.

Cross-run semantics: within a run, last-wins dedup by (warc_ts,
xxhash64(text)); across runs, the FIRST committed extraction of a url
wins — a later re-crawl of an already-processed url is dropped by the
resume anti-join, mirroring the reference's one-result-per-distinct-url
contract (Manager.java:218-219). Re-extract a re-crawl by starting a
fresh out_dir (or a compaction run over the manifest).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from .operators.extract import extract_stage
from .operators.lineage import lineage_from_extracted
from .operators.manifest import build_manifest, filter_nonblank, latest_per_key
from .operators.partitioning import salted_repartition
from .operators.resume import (
    all_committed_run_ids,
    commit_run,
    load_snapshot,
    pending,
    processed_urls,
)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    num_partitions: int | None = None,
    write_manifest: bool = True,
) -> dict:
    """Run (or resume) the extraction job; returns summary counts/paths.

    run_id is a caller-supplied parameter (deterministic, resumable) —
    the reference's random UUID job ids (GeneralUtils.java:46-48) are
    replaced so reruns are addressable.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    if run_id in all_committed_run_ids(out_dir):
        # Replaying an EVER-committed run must not clobber its data
        # files (the overwrite below would; after compact() the latest
        # snapshot forgets old run_ids but time travel still reads
        # their dirs). Retrying a CRASHED run_id is fine — it never
        # reached any snapshot. Idempotent-rerun means: new run_id,
        # resume skips done urls.
        raise ValueError(
            f"run_id {run_id!r} is already committed in {out_dir}; "
            "rerun with a fresh run_id to resume"
        )
    pages = filter_nonblank(pages)

    # Resume: drop urls already committed by a prior snapshot.
    processed = processed_urls(spark, out_dir)
    todo = pending(pages, processed)

    # Nothing pending -> commit NOTHING. Without this, every scheduled
    # resubmission appends an empty run dir + processed parquet +
    # snapshot entry and rebuilds the manifest over the full input —
    # manufacturing the small-files problem compact() exists to fix.
    # (The isEmpty probe costs a limit-1 anti-join scan, no extraction;
    # only paid when a prior snapshot exists.)
    if processed is not None and todo.isEmpty():
        return {
            "run_id": run_id,
            "snapshot": load_snapshot(out_dir),
            "n_extracted_this_run": 0,
            "extracted_path": None,
            "manifest_path": None,
            "lineage_path": None,
            "skipped_empty_run": True,
        }

    # O3: uniform fan-out for the expensive stage. File scans are
    # already byte-uniform (maxPartitionBytes), so by default the
    # payload bytes NEVER cross a shuffle — at 10^12 docs a payload
    # shuffle would be the single largest cost in the job. An explicit
    # num_partitions forces a salted exchange (skewed/non-file sources,
    # or when the caller must match a parallelism level in benches).
    if num_partitions is not None:
        todo = salted_repartition(todo, "url", num_partitions)

    # O4/O5/O6: extract EVERY occurrence (scan-partitioned), then O8:
    # dedup last-wins on the extracted rows — text is ~1/3 the bytes of
    # raw payloads, so the dedup window's shuffle moves far less than a
    # pre-extraction dedup would, for ~5% redundant extraction work
    # (measured 3.1k -> 8k+ docs/s end-to-end; BENCH/BASELINE.md).
    extracted = latest_per_key(
        extract_stage(todo), order="warc_ts", tie_col="text"
    )

    # O11: commit this run's data files.
    extracted_dir = os.path.join(out_dir, "extracted")
    run_dir = os.path.join(extracted_dir, f"run_id={run_id}")
    extracted.write.mode("overwrite").parquet(run_dir)

    # One cached read-back serves the processed-url manifest, lineage,
    # and the count (never re-runs extraction).
    run_extracted = spark.read.parquet(run_dir).persist()
    try:
        # Atomic snapshot publish (exactly-once boundary).
        snap = commit_run(spark, out_dir, run_id, run_df=run_extracted)

        # O17: lineage from the written files.
        lineage_dir = os.path.join(out_dir, "lineage", f"run_id={run_id}")
        lineage_from_extracted(run_extracted, run_id).write.mode(
            "overwrite"
        ).parquet(lineage_dir)

        n_extracted = run_extracted.count()
    finally:
        run_extracted.unpersist()

    # O7/O10: manifest over the FULL input vs ALL committed runs.
    manifest_path = None
    if write_manifest:
        all_extracted = spark.read.option("basePath", extracted_dir).parquet(
            *[
                os.path.join(extracted_dir, f"run_id={r}")
                for r in snap["runs"]
            ]
        )
        manifest_df = build_manifest(pages, all_extracted)
        manifest_path = os.path.join(out_dir, "manifest")
        manifest_df.write.mode("overwrite").parquet(manifest_path)

    return {
        "run_id": run_id,
        "snapshot": snap,
        "n_extracted_this_run": n_extracted,
        "extracted_path": run_dir,
        "manifest_path": manifest_path,
        "lineage_path": lineage_dir,
    }


def read_extracted(
    spark: SparkSession, out_dir: str, snapshot: int | None = None
) -> DataFrame:
    """All committed extracted rows (snapshot-scoped, like an Iceberg
    table read — uncommitted run dirs are never visible).

    ``snapshot=n`` time-travels to an earlier commit: the read sees
    exactly the runs listed by snapshot-n.json (snapshots are
    immutable; the data files they reference are never rewritten)."""
    import json as _json

    from .operators.resume import load_snapshot

    if snapshot is None:
        snap = load_snapshot(out_dir)
    else:
        path = os.path.join(out_dir, "_checkpoint", f"snapshot-{snapshot}.json")
        with open(path) as f:
            snap = _json.load(f)
    if not snap or not snap["runs"]:
        raise FileNotFoundError(f"no committed snapshot under {out_dir}")
    base = os.path.join(out_dir, "extracted")
    return spark.read.option("basePath", base).parquet(
        *[os.path.join(base, f"run_id={r}") for r in snap["runs"]]
    )
