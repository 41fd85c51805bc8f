"""Distributed Lloyd's k-means for IVF coarse quantizers.

The fixed seeded centroids in plans.vectorops keep the SQL oracle
reproducible; a REAL IVF index trains its quantizer on the corpus.
This is that trainer: assignment runs the same strict-order numpy
kernel as ann_ivf_topk (functions.vectors.ivf_cell_udf), the update
step is one partial-agg shuffle per iteration, and centroid means are
decimal-summed so the trained centroids are bit-identical across
partitionings and reruns (same discipline as every oracle query).

Iterative + data-dependent, so there is no ANSI-SQL oracle; the
registry entry (ann_ivf_trained_topk) is a rows-only check and pytest
pins the invariants instead: deterministic centroids, monotone
inertia, assignment optimality, and recall >= the fixed-centroid IVF.

Driver traffic per iteration: k x dim doubles (the centroids), never
rows — the k-means state is the only thing that leaves the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import ivf_cell_udf


def _centroid_rows(assigned: DataFrame, dim: int) -> dict[int, list[float]]:
    """cell -> mean vector, decimal-exact (order-independent)."""
    means = (
        assigned.select("cell", F.posexplode("v").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(38,18)")) / F.count("*")
            ).cast("double").alias("m")
        )
        .collect()  # k x dim rows — bounded by the model size, not data
    )
    out: dict[int, list[float]] = {}
    for r in means:
        out.setdefault(r["cell"], [0.0] * dim)[r["pos"]] = r["m"]
    return out


def kmeans_train(
    emb: DataFrame,
    k: int = 8,
    iters: int = 4,
    vec_col: str = "v",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Train k centroids on emb(id, array<double> v); deterministic:
    init = the k lowest-id vectors, updates are decimal-exact means.
    Returns the centroid list (driver-side model, k x dim)."""
    # persist the projected training set across Lloyd iterations —
    # without it every iteration re-scans the source (4 iters = 4 full
    # scans). At 10^12-vector scale the training input is a bounded
    # SAMPLE anyway (standard IVF practice), so caching it is always
    # memory-safe; the trained centroids are identical either way
    # (pinned by tests/test_kmeans.py determinism).
    emb = emb.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("v")
    ).persist()
    try:
        init = emb.orderBy("_id").limit(k).collect()
        if len(init) < k:
            raise ValueError(f"need >= {k} vectors to train, got {len(init)}")
        dim = len(init[0]["v"])
        cents = [list(r["v"]) for r in init]
        for _ in range(iters):
            assigned = emb.withColumn(
                "cell", ivf_cell_udf(cents)(F.col("v"))
            )
            by_cell = _centroid_rows(assigned, dim)
            # empty cells keep their previous centroid (standard Lloyd)
            cents = [by_cell.get(c + 1, cents[c]) for c in range(k)]
    finally:
        emb.unpersist()
    return cents


def inertia(emb: DataFrame, cents: list[list[float]], vec_col: str = "v") -> float:
    """Sum of squared distance to the assigned centroid (decimal-summed
    for cross-run comparability)."""
    assigned = emb.withColumn("cell", ivf_cell_udf(cents)(F.col(vec_col)))
    dist_cols = [
        F.when(
            F.col("cell") == c + 1,
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(x) for x in cent]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        for c, cent in enumerate(cents)
    ]
    return (
        assigned.select(F.coalesce(*dist_cols).alias("d"))
        .agg(F.sum(F.col("d").cast("decimal(38,18)")).alias("s"))
        .collect()[0]["s"]
    )
