"""Schema-tolerant pages ingestion.

Real crawl tables drift from the canonical shape (BASELINE.json
input_hint: url string, warc_ts timestamp, html binary, text string,
lang string): optional columns are missing, html arrives as string,
timestamps as strings/ints, extra columns ride along. The pipeline's
operators assume the canonical schema, so ingestion normalizes ONCE at
the boundary instead of every operator defending itself.

Pure column projection/casting — stays in the scan stage (zero
shuffles, codegen casts), so it is free at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

REQUIRED = {"url"}
_CANON = [
    ("url", T.StringType()),
    ("warc_ts", T.TimestampType()),
    ("html", T.BinaryType()),
    ("text", T.StringType()),
    ("lang", T.StringType()),
]
# lazy: Column construction needs an active SparkContext, so building
# these at import time would break Spark-less imports of the package
def _defaults():
    return {
        # timestamp_seconds(0) is the epoch in ANY session timezone —
        # a string literal cast shifts with spark.sql.session.timeZone
        # (this is a public boundary API, also reachable from
        # externally-created non-UTC sessions)
        "warc_ts": F.timestamp_seconds(F.lit(0)),
        "html": F.lit(None).cast("binary"),
        "text": F.lit(""),
        "lang": F.lit(""),
    }


def normalize_pages(df: DataFrame) -> DataFrame:
    """Project any pages-like frame onto the canonical schema:

    - ``url`` is required (raises ValueError if absent);
    - missing optional columns get typed defaults (epoch timestamp,
      null payload, empty text/lang);
    - present columns are cast to the canonical type (string html ->
      utf-8 bytes via cast, string/long warc_ts -> timestamp — longs
      are read as epoch SECONDS);
    - extra columns are dropped (operators select by name; carrying
      unknown columns through the Arrow extract stage would ship
      dead bytes).
    """
    have = dict(df.dtypes)
    missing_req = REQUIRED - have.keys()
    if missing_req:
        raise ValueError(
            f"pages input lacks required column(s) {sorted(missing_req)}; "
            f"got {sorted(have)}"
        )
    # string->timestamp casting is session-timezone dependent; the
    # engine's own sessions pin UTC (session.get_spark), but this is a
    # public boundary API — fail loud rather than silently shift
    # timestamps parsed under an externally-created non-UTC session.
    if have.get("warc_ts") == "string":
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
        if tz not in ("UTC", "Etc/UTC", "GMT"):
            raise ValueError(
                "normalize_pages parses string warc_ts with the session "
                f"timezone, which is {tz!r}; set spark.sql.session."
                "timeZone=UTC (session.get_spark does) or pre-cast the "
                "column"
            )
    defaults = _defaults()
    cols = []
    for name, dtype in _CANON:
        if name not in have:
            cols.append(defaults[name].alias(name))
            continue
        cur = have[name]
        if name == "warc_ts" and cur in ("bigint", "int"):
            # epoch seconds -> timestamp (cast long->timestamp does
            # exactly this in Spark)
            cols.append(F.col(name).cast("timestamp").alias(name))
        else:
            cols.append(F.col(name).cast(dtype).alias(name))
    return df.select(*cols)
