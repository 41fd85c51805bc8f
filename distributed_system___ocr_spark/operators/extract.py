"""The vectorized extraction stage (SURVEY.md O4/O5/O6).

Reference: Worker.java:79-153 — fetch payload, run the extractor, turn
failures into result rows. Here the payload already sits in the
``html`` binary column, and the whole worker loop becomes one
``mapInArrow`` stage: Arrow batches in, Arrow batches out, one output
row per input row, exceptions mapped to error rows inside the
pure-Python extractor (errors are data, SURVEY §2c-2).

mapInArrow over mapInPandas (measured ~10% on the full stage): the
pass-through columns (url, warc_ts, lang) are re-emitted as the SAME
Arrow arrays with zero conversion; only the computed columns are
materialized in Python.

Lineage columns (part_id, elapsed_ms) ride along on every row so the
per-partition metrics table (reference's debug-log audit trail,
GeneralUtils.java:50-59) can be aggregated from the *written* output
without re-running extraction.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame

from ..extractor.core import EXTRACTOR_VERSION, extract_payload

EXTRACTED_SCHEMA = (
    "url string, warc_ts timestamp, lang string, text string, "
    "spans array<struct<start:int,end:int,kind:string>>, "
    "status string, error string, n_chars int, "
    "part_id int, elapsed_ms bigint"
)


def _extract_batches(batches):
    """Per-partition Arrow batch iterator. elapsed_ms is cumulative
    within the partition, so max(elapsed_ms) per part_id = partition
    wall time."""
    import pyarrow as pa
    from pyspark import TaskContext

    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else -1
    t0 = time.monotonic()

    def span_array(results):
        # flattened ListArray<Struct> construction: ~3x cheaper than
        # list-of-dicts conversion (no per-span dict churn)
        offsets = [0]
        starts: list[int] = []
        ends: list[int] = []
        kinds: list[str] = []
        off = 0
        for r in results:
            off += len(r.spans)
            offsets.append(off)
            for s, e, k in r.spans:
                starts.append(s)
                ends.append(e)
                kinds.append(k)
        struct = pa.StructArray.from_arrays(
            [
                pa.array(starts, pa.int32()),
                pa.array(ends, pa.int32()),
                pa.array(kinds, pa.string()),
            ],
            ["start", "end", "kind"],
        )
        return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)

    for b in batches:
        results = [extract_payload(p) for p in b.column("html").to_pylist()]
        n = len(results)
        elapsed = int((time.monotonic() - t0) * 1000)
        yield pa.RecordBatch.from_arrays(
            [
                b.column("url"),
                b.column("warc_ts"),
                b.column("lang"),
                pa.array([r.text for r in results], pa.string()),
                span_array(results),
                pa.array([r.status for r in results], pa.string()),
                pa.array([r.error for r in results], pa.string()),
                pa.array([len(r.text) for r in results], pa.int32()),
                pa.array([pid] * n, pa.int32()),
                pa.array([elapsed] * n, pa.int64()),
            ],
            names=[
                "url", "warc_ts", "lang", "text", "spans", "status",
                "error", "n_chars", "part_id", "elapsed_ms",
            ],
        )


def extract_stage(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> extracted rows.

    Narrow op: preserves the input partitioning (scan splits or an
    explicit salted repartition); the plan shows exactly one
    MapInArrow/ArrowEvalPython node and no per-row Python (audited in
    tests via explain()).

    Only the columns the extractor reads cross the Arrow boundary —
    in particular the input's ``text`` column (pre-extracted text on
    Common-Crawl-style tables, potentially KBs per row) is pruned
    before the Python stage rather than serialized and dropped inside
    it. Catalyst pushes this projection below any explicit repartition,
    so the exchange doesn't carry it either.
    """
    return pages.select("url", "warc_ts", "lang", "html").mapInArrow(
        _extract_batches, EXTRACTED_SCHEMA
    )


__all__ = ["extract_stage", "EXTRACTED_SCHEMA", "EXTRACTOR_VERSION"]
