"""Salted url-hash repartitioning (SURVEY.md O3).

The reference fans out one SQS message per url onto a shared queue with
competing consumers (Manager.java:351-369) — implicit uniform load
balancing. In Spark, the equivalent explicit step is a repartition on a
*uniform* function of the key before the expensive extract stage, so
host-domain skew in the url distribution (one hot crawl host) cannot
concentrate payload bytes in few partitions (BASELINE.json north_rule:
"salted repartitioning on url-hash to break host-domain skew").

``xxhash64(url, salt_cols...)`` is uniform over urls; adding extra salt
columns (e.g. warc_ts) additionally spreads exact-duplicate keys. This
is a single shuffle whose cost is repaid by even partition sizes at the
extract stage — at 10^12 docs the extract stage dominates, so evenness
there is the whole ballgame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    key: str = "url",
    num_partitions: int | None = None,
    salt_cols: tuple = (),
    seed: int = 0,
) -> DataFrame:
    """Hash-repartition on xxhash64(key, *salt_cols, seed).

    ``num_partitions=None`` lets AQE pick post-shuffle sizing; pass an
    explicit count when the downstream stage must match a parallelism
    level (bench runs do).
    """
    h = F.xxhash64(F.col(key), *[F.col(c) for c in salt_cols], F.lit(seed))
    if num_partitions is None:
        return df.repartition(h)
    return df.repartition(num_partitions, h)
