"""The vectorized extraction stage (SURVEY.md O4/O5/O6).

Reference: Worker.java:79-153 — fetch payload, run the extractor, turn
failures into result rows. Here the payload already sits in the
``html`` binary column, and the whole worker loop becomes one
``mapInPandas`` stage: Arrow-batched binary in, (text, spans, status,
error) out, one output row per input row, exceptions mapped to error
rows inside the pure-Python extractor (errors are data, SURVEY §2c-2).

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
    """Per-partition batch iterator. elapsed_ms is cumulative within the
    partition, so max(elapsed_ms) per part_id = partition wall time."""
    import pandas as pd
    from pyspark import TaskContext

    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else -1
    t0 = time.monotonic()
    for pdf in batches:
        results = [extract_payload(b) for b in pdf["html"]]
        elapsed = int((time.monotonic() - t0) * 1000)
        yield pd.DataFrame(
            {
                "url": pdf["url"].to_numpy(),
                "warc_ts": pdf["warc_ts"].to_numpy(),
                "lang": pdf["lang"].to_numpy(),
                "text": [r.text for r in results],
                "spans": [
                    [
                        {"start": s, "end": e, "kind": k}
                        for (s, e, k) in r.spans
                    ]
                    for r in results
                ],
                "status": [r.status for r in results],
                "error": [r.error for r in results],
                "n_chars": [len(r.text) for r in results],
                "part_id": pid,
                "elapsed_ms": elapsed,
            }
        )


def extract_stage(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> extracted rows.

    Input should already be repartitioned (salted_repartition) —
    mapInPandas is a narrow op and preserves that partitioning; the
    plan shows exactly one MapInPandas/ArrowEvalPython node and no
    per-row Python (audited in tests via explain()).
    """
    return pages.mapInPandas(_extract_batches, EXTRACTED_SCHEMA)


__all__ = ["extract_stage", "EXTRACTED_SCHEMA", "EXTRACTOR_VERSION"]
