"""Product quantization (Jegou et al. 2011, public algorithm) for
compressed ANN search.

The corpus's vectors are split into M contiguous sub-blocks; each
block gets its own k-centroid codebook (trained with the SAME
distributed decimal-exact Lloyd's as the IVF quantizer —
operators/kmeans.py), and a vector is stored as M small codes. Query
time is asymmetric distance computation (ADC): the query builds M
k-entry lookup tables once, and each candidate's approximate distance
is the sum of M table lookups — no float vector is ever touched again.

Scale shape: codebooks are a driver-side model (M x k x dim/M
doubles); encoding is a per-row vectorized kernel in the scan stage
(M argmin kernels over sliced blocks, reusing ivf_cell_udf); the ADC
scoring is PURE Catalyst (element_at over literal tables — no Python
at query time), so a 10^12-row code table scans at JVM speed and the
raw float vectors never leave storage after encoding.

Iterative + data-dependent training => no ANSI-SQL oracle; the
registry entry (ann_pq_topk) is rows-only and tests/test_pq.py pins
determinism, code validity, ADC-score exactness vs pure Python, and
recall against the exact top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import ivf_cell_udf
from .kmeans import kmeans_train


def pq_train(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 3,
    vec_col: str = "v",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train M per-block codebooks of k centroids each. Deterministic
    (inherits kmeans_train's decimal-exact updates + lowest-id init)."""
    first = emb.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not first:
        raise ValueError("cannot train PQ on an empty corpus")
    dim = first[0]["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} blocks")
    sub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        block = emb.select(
            id_col, F.slice(vec_col, j * sub + 1, sub).alias("v")
        )
        books.append(kmeans_train(block, k=k, iters=iters, id_col=id_col))
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "v",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>) — M codes per vector, each in [0, k)."""
    sub = len(codebooks[0][0])
    code_cols = [
        (
            ivf_cell_udf(cb)(F.slice(vec_col, j * sub + 1, sub)) - 1
        ).cast("int").alias(f"_c{j}")
        for j, cb in enumerate(codebooks)
    ]
    tmp = emb.select(F.col(id_col).alias("vec_id"), *code_cols)
    return tmp.select(
        "vec_id",
        F.array(*[F.col(f"_c{j}") for j in range(len(codebooks))])
        .alias("codes"),
    )


def adc_tables(
    codebooks: list[list[list[float]]], qv: list[float]
) -> list[list[float]]:
    """Per-block squared-L2 lookup tables for one query (driver-side,
    M x k floats; the strict left-to-right fold keeps them
    reproducible)."""
    sub = len(codebooks[0][0])
    tables = []
    for j, cb in enumerate(codebooks):
        q = qv[j * sub : (j + 1) * sub]
        tables.append(
            [
                float(sum((q[d] - c[d]) * (q[d] - c[d]) for d in range(sub)))
                for c in cb
            ]
        )
    return tables


def pq_adc_score(codes_col, tables: list[list[float]]):
    """Catalyst expression: approximate squared distance = sum of M
    table lookups on the codes array. JVM-side — no Python at query
    time."""
    score = None
    for j, table in enumerate(tables):
        term = F.element_at(
            F.array(*[F.lit(t) for t in table]),
            F.element_at(codes_col, j + 1) + 1,
        )
        score = term if score is None else score + term
    return score
