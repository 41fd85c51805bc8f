"""Unit tests for functions/: strict-order vector kernels, bloom."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from distributed_system___ocr_spark.functions.vectors import (
    cosine_udf,
    l2_norm_udf,
    lsh_bucket_udf,
)


def _vec_df(spark, n=50, d=16, seed=3):
    rng = np.random.RandomState(seed)
    rows = [
        (i, rng.uniform(-1, 1, d).tolist(), rng.uniform(-1, 1, d).tolist())
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )


def test_cosine_udf_matches_catalyst_fold(spark):
    df = _vec_df(spark)
    fold = F.aggregate(
        F.zip_with("a", "b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / (
        F.sqrt(F.aggregate(F.zip_with("a", "a", lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x))
        * F.sqrt(F.aggregate(F.zip_with("b", "b", lambda x, y: x * y),
                             F.lit(0.0), lambda acc, x: acc + x))
    )
    rows = df.select(
        "id",
        cosine_udf()(F.col("a"), F.col("b")).alias("u"),
        fold.alias("f"),
    ).collect()
    for r in rows:
        assert r["u"] == r["f"], (r["id"], r["u"], r["f"])  # bit-exact


def test_l2_and_bucket_udfs(spark):
    df = _vec_df(spark, d=8)
    planes = [[0.5] * 8, [-0.25] * 8]
    rows = df.select(
        "id", "a",
        l2_norm_udf()(F.col("a")).alias("norm"),
        lsh_bucket_udf(planes)(F.col("a")).alias("bucket"),
    ).collect()
    for r in rows:
        a = np.array(r["a"])
        acc = 0.0
        for x in a:
            acc += x * x
        assert r["norm"] == np.sqrt(acc)
        expected = sum(
            (1 << i)
            for i, p in enumerate(planes)
            if sum(x * y for x, y in zip(a, p)) > 0
        )
        assert r["bucket"] == expected
