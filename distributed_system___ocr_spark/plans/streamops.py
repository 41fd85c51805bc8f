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


# Sliding (hopping) windows: 10-minute windows every 5 minutes — each
# event lands in exactly two windows. The oracle unnests the two
# epoch-aligned window starts Spark's native F.window(slide) assigns.
_SLIDING_SQL = """
WITH assigned AS (
  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                 time_bucket(INTERVAL '5 minutes', ts)
                   - INTERVAL '5 minutes']) AS window_start,
         event_type, value
  FROM events
)
SELECT window_start, event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM assigned GROUP BY 1, 2
"""


@register("sliding_window_counts", _SLIDING_SQL)
def sliding_window_counts(spark, sf_dir):
    """Spark's NATIVE sliding window (F.window with slideDuration):
    windowDuration 10 min, slide 5 min, epoch-aligned — the engine
    expands each event into windowDuration/slide rows before the
    partial agg, exactly what the oracle's unnest writes out."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )
