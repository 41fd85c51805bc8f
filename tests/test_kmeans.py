"""Distributed k-means trainer invariants (operators.kmeans) — the
non-SQL-oracle checks backing the rows-only ann_ivf_trained_topk
registry entry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_system___ocr_spark.functions.vectors import ivf_cell_udf
from distributed_system___ocr_spark.operators.kmeans import (
    inertia,
    kmeans_train,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def test_training_is_deterministic_across_partitioning(spark, emb):
    c1 = kmeans_train(emb.repartition(2), k=4, iters=2)
    c2 = kmeans_train(emb.repartition(7), k=4, iters=2)
    assert c1 == c2  # decimal-exact updates: bitwise equal centroids


def test_inertia_monotone_nonincreasing(spark, emb):
    prev = None
    for iters in (0, 1, 2, 3):
        cents = kmeans_train(emb, k=4, iters=iters)
        cur = inertia(emb, cents)
        if prev is not None:
            assert cur <= prev, (iters, float(cur), float(prev))
        prev = cur


def test_assignment_is_nearest_centroid(spark, emb):
    """The kernel's cell must be the true argmin of squared L2 over
    the trained centroids (checked in plain Python per row)."""
    cents = kmeans_train(emb, k=4, iters=2)
    rows = (
        emb.limit(100)
        .withColumn("cell", ivf_cell_udf(cents)(F.col("v")))
        .collect()
    )
    for r in rows:
        d = [
            sum((x - c[i]) ** 2 for i, x in enumerate(r["v"]))
            for c in cents
        ]
        assert r["cell"] == d.index(min(d)) + 1


def test_trained_ivf_recall_at_least_fixed(spark):
    """Training the quantizer on the corpus must not LOSE recall vs
    the fixed seeded centroids (measured against brute-force truth)."""
    from distributed_system___ocr_spark.plans import REGISTRY

    def pairs(name):
        return {
            (r["query_id"], r["neighbor_id"])
            for r in REGISTRY[name]["builder"](spark, SF).collect()
        }

    truth = pairs("knn_brute_cosine")
    fixed = len(pairs("ann_ivf_topk") & truth)
    trained = len(pairs("ann_ivf_trained_topk") & truth)
    assert trained >= fixed
