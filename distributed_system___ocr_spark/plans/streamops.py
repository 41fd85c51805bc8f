"""Streaming operators as registry queries. The windowed stream shares
the batch oracle — bounded source + event-time windows + complete mode
make the streaming result equal the batch aggregation."""

from __future__ import annotations

from ..streaming.stream import windowed_event_counts_stream
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
