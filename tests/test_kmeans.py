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


def test_training_sample_is_bounded_and_deterministic(spark):
    """The md5-bucket sample (the 100-TB guard: training never scans
    the full vector table) actually FIRES on an over-cap input, is
    partitioning/rerun-stable, and the trainers stay deterministic
    through it."""
    from distributed_system___ocr_spark.operators.kmeans import (
        bounded_training_input,
    )

    big = spark.range(5000).select(
        F.col("id").alias("_id"),
        F.array(
            *[
                ((F.col("id") * (i + 3)) % 17).cast("double")
                for i in range(4)
            ]
        ).alias("v"),
    )
    s = bounded_training_input(big, 1000)
    ids_a = sorted(r["_id"] for r in s.collect())
    assert 700 <= len(ids_a) <= 1300  # ~cap, never the full table
    ids_b = sorted(
        r["_id"]
        for r in bounded_training_input(big.repartition(13), 1000).collect()
    )
    assert ids_a == ids_b  # no RNG: identical across partitionings

    c1 = kmeans_train(big, k=4, iters=2, id_col="_id", sample_cap=1000)
    c2 = kmeans_train(
        big.repartition(9), k=4, iters=2, id_col="_id", sample_cap=1000
    )
    assert c1 == c2
    # under-cap input trains on the full table (cap is a no-op)
    assert kmeans_train(big, k=4, iters=2, id_col="_id") == kmeans_train(
        big, k=4, iters=2, id_col="_id", sample_cap=5000
    )


def test_local_and_distributed_strategies_agree(spark, emb):
    """The distributed decimal-exact path and the default local numpy
    path implement the same Lloyd's (same init, same argmin, mean
    updates differing only in rounding discipline): centroids agree to
    float precision and the distributed path stays deterministic
    across partitionings."""
    import numpy as np

    loc = kmeans_train(emb, k=4, iters=2, strategy="local")
    d1 = kmeans_train(emb, k=4, iters=2, strategy="distributed")
    d2 = kmeans_train(emb.repartition(7), k=4, iters=2, strategy="distributed")
    assert d1 == d2
    assert np.allclose(np.array(loc), np.array(d1), rtol=1e-9, atol=1e-12)


def test_pq_train_sampled_and_distributed_agree(spark):
    """pq_train: the cap fires and stays deterministic; the joint
    distributed trainer agrees with the local path to float
    precision."""
    import numpy as np

    from distributed_system___ocr_spark.operators.pq import pq_train

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    a = pq_train(emb, m=4, k=8, iters=2, sample_cap=200)
    b = pq_train(emb.repartition(11), m=4, k=8, iters=2, sample_cap=200)
    assert a == b
    loc = pq_train(emb, m=4, k=8, iters=2)
    dist = pq_train(emb, m=4, k=8, iters=2, strategy="distributed")
    assert np.allclose(np.array(loc), np.array(dist), rtol=1e-9, atol=1e-12)
