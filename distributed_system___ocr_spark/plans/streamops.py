"""Streaming operators as registry queries. The windowed stream shares
the batch oracle — bounded source + event-time windows + complete mode
make the streaming result equal the batch aggregation."""

from __future__ import annotations

from ..streaming.stream import (
    windowed_event_counts_append_stream,
    windowed_event_counts_stream,
)
from .queries import register

_WINDOWED_SQL = """
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
       event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


@register("streaming_windowed_counts", _WINDOWED_SQL)
def streaming_windowed_counts(spark, sf_dir):
    return windowed_event_counts_stream(spark, f"{sf_dir}/events.parquet")


# Append-mode semantics in SQL: only windows FINALIZED by the final
# watermark (max event ts - delay) are ever emitted; window ends sit on
# 5-minute boundaries while the watermark carries sub-second precision,
# so the <= boundary can never be ambiguous between engines.
_WINDOWED_APPEND_SQL = """
WITH w AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
         event_type,
         count(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1, 2
)
SELECT w.* FROM w,
     (SELECT max(ts) - INTERVAL '10 minutes' AS wm FROM events) t
WHERE w.window_start + INTERVAL '5 minutes' <= t.wm
"""


@register("streaming_windowed_counts_append", _WINDOWED_APPEND_SQL)
def streaming_windowed_counts_append(spark, sf_dir):
    return windowed_event_counts_append_stream(
        spark, f"{sf_dir}/events.parquet"
    )
