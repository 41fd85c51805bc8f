"""O12: HTML report renderer, format-compatible with the reference.

Reference: LocalApplication.java:158-216 ``createHtml`` — header
(``<html>\\n<title>OCR</title>\\n<body>\\n``, LA:168), one
``<p><img src="url"><br/>text</p>`` block per url OCCURRENCE (the
multiplicity loop LA:187-200 re-expands the per-url count), newlines
rewritten to ``<br/>`` (LA:191), error rows rendered like results
(errors are data), footer ``</body>\\n</html>`` (LA:206).

Differences (documented, deliberate):
- blocks are ordered by url (the reference iterates a HashMap —
  *unspecified* order, so its goldens are order-insensitive per
  SURVEY.md §2c-5; we pick the deterministic order);
- the footer closes the document with ``</html>``; the reference
  appends a second opening ``<html>`` (LA:206 suffix string — a bug,
  SURVEY §2d class, visible in both golden outputs), which we do not
  replicate;
- ``too_large`` rows render their error message like ``error`` rows
  (errors are data, §2c-2; lineage counts too_large as failed, the
  report agrees);
- the report is assembled from a manifest⋈extracted join whose
  collect is bounded by the report size itself — a report is a
  human-readable artifact, so rendering is inherently driver-side;
  at scale you render a FILTERED manifest, never the full table
  (enforced via max_rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEADER = "<html>\n<title>OCR</title>\n<body>\n"
FOOTER = "</body>\n</html>"


def report_blocks(manifest: DataFrame, extracted: DataFrame) -> DataFrame:
    """manifest(url, n_occurrences) ⋈ extracted(url, text, status,
    error) -> one row per url with the rendered block and its
    multiplicity. The join shuffles on url; the per-row rendering is
    pure column ops (JVM-side, no UDF)."""
    body = F.when(
        F.col("error").isNotNull(), F.col("error")
    ).otherwise(F.coalesce(F.col("text"), F.lit("")))
    block = F.concat(
        F.lit('\t<p>\n\t\t<img src="'),
        F.col("url"),
        F.lit('"><br/>\n\t\t'),
        F.regexp_replace(body, "\n", "<br/>"),
        F.lit("\n\t</p>\n"),
    )
    return (
        manifest.select("url", "n_occurrences")
        .join(
            extracted.select("url", "text", "status", "error"), "url", "left"
        )
        .select("url", "n_occurrences", block.alias("block"))
    )


def render_report(
    manifest: DataFrame,
    extracted: DataFrame,
    max_rows: int = 100_000,
) -> str:
    """Assemble the full HTML string (driver-side by design; see
    module docstring). Raises if the report would exceed max_rows
    blocks — filter the manifest first."""
    blocks = report_blocks(manifest, extracted).orderBy("url")
    rows = blocks.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"report would exceed {max_rows} urls; filter the manifest"
        )
    parts = [HEADER]
    for r in rows:
        parts.extend([r["block"]] * int(r["n_occurrences"]))
    parts.append(FOOTER)
    return "".join(parts)


def write_report(
    manifest: DataFrame, extracted: DataFrame, path: str, **kw
) -> None:
    html = render_report(manifest, extracted, **kw)
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)
