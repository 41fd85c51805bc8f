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

import numpy as np
import pandas as pd  # module level: pandas_udf string hints resolve here
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import _seq_dot, _seq_dot_mat, _stack, ivf_cell_udf
from .kmeans import (
    _collect_sorted,
    _lloyd_local,
    bounded_training_input,
    default_train_cap,
)


def pq_train(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 3,
    vec_col: str = "v",
    id_col: str = "vec_id",
    sample_cap: int | None = None,
    strategy: str = "auto",
) -> list[list[list[float]]]:
    """Train M per-block codebooks of k centroids each. Semantics:
    init = the k lowest-id vectors' block slices, empty cells keep
    their previous centroid.

    Training input is bounded by ``sample_cap`` (None ->
    ``default_train_cap(k)``; 0 disables) via the deterministic
    md5-bucket sample — PQ codebook quality saturates at a few
    hundred samples per centroid, so scanning a 10^12-row table per
    Lloyd iteration is pure waste (see operators/kmeans.py docstring).

    ``strategy="local"`` (the "auto" default for cap-bounded input)
    collects the sample once and trains every block in numpy — zero
    Spark jobs per iteration. ``strategy="distributed"`` trains all M
    blocks JOINTLY on the cluster: all M assignments and updates in
    the SAME two Spark jobs per iteration (m independent kmeans_train
    loops would run m x (2*iters + 1) jobs — scheduling overhead
    dominated the wall at small scale, 21.7 s -> ~4 s), updates are
    decimal-exact means. Both paths are bit-deterministic across
    reruns and input partitionings."""
    if sample_cap is None:
        sample_cap = default_train_cap(k)
    emb = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("v"))
    if sample_cap:
        emb = bounded_training_input(emb, sample_cap)
    if strategy == "auto":
        strategy = "local" if sample_cap else "distributed"
    if strategy == "local":
        ids, V = _collect_sorted(emb)
        if len(ids) < k:
            raise ValueError(f"need >= {k} vectors, got {len(ids)}")
        dim = V.shape[1]
        if dim % m:
            raise ValueError(f"dim {dim} not divisible into {m} blocks")
        sub = dim // m
        return [
            _lloyd_local(
                V[:, j * sub : (j + 1) * sub],
                k,
                iters,
                [list(v) for v in V[:k, j * sub : (j + 1) * sub].tolist()],
            )
            for j in range(m)
        ]
    emb = emb.persist()
    try:
        init = emb.orderBy("_id").limit(k).collect()
        if len(init) < k:
            raise ValueError(f"need >= {k} vectors, got {len(init)}")
        dim = len(init[0]["v"])
        if dim % m:
            raise ValueError(f"dim {dim} not divisible into {m} blocks")
        sub = dim // m
        books = [
            [list(r["v"][j * sub : (j + 1) * sub]) for r in init]
            for j in range(m)
        ]
        for _ in range(iters):
            # all M assignments in one projection, then ONE posexplode
            # of the full vector with block/pos derived from position —
            # a per-block union would re-execute the UDF projection
            # once per branch (measured 8x the kernel cost)
            cells = F.array(
                *[
                    ivf_cell_udf(books[j])(F.slice("v", j * sub + 1, sub))
                    for j in range(m)
                ]
            )
            assigned = emb.select("v", cells.alias("cells"))
            ex = assigned.select(
                F.posexplode("v").alias("p0", "x"), "cells"
            )
            b = F.floor(F.col("p0") / sub)
            means = (
                ex.select(
                    b.alias("b"),
                    (F.col("p0") % sub).alias("pos"),
                    F.element_at("cells", (b + 1).cast("int")).alias(
                        "cell"
                    ),
                    "x",
                )
                .groupBy("b", "cell", "pos")
                .agg(
                    (
                        F.sum(F.col("x").cast("decimal(38,18)"))
                        / F.count("*")
                    ).cast("double").alias("m")
                )
                .collect()  # m x k x sub rows — model-sized, not data
            )
            by_key: dict[tuple[int, int], list[float]] = {}
            for r in means:
                by_key.setdefault(
                    (r["b"], r["cell"]), [0.0] * sub
                )[r["pos"]] = r["m"]
            books = [
                [
                    by_key.get((j, c + 1), books[j][c])
                    for c in range(k)
                ]
                for j in range(m)
            ]
    finally:
        emb.unpersist()
    return books


def pq_codes_udf(codebooks: list[list[list[float]]]):
    """array<double> -> array<int>: all M block argmins in ONE
    vectorized kernel. Float semantics are identical to running
    functions.vectors.ivf_cell_udf per block ((dot(b,b) - 2*dot(b,c))
    + |c|^2, strict dim order, first argmin on ties) — one UDF instead
    of M keeps both the driver-side plan build (M pandas_udf
    registrations) and the worker-side column passes flat in M."""
    cbs = [
        np.stack([np.asarray(c, dtype=np.float64) for c in cb])
        for cb in codebooks
    ]
    sqs = [
        np.array([sum(x * x for x in c) for c in cb]) for cb in codebooks
    ]
    sub = len(codebooks[0][0])

    @F.pandas_udf("array<int>")
    def codes(v: pd.Series) -> pd.Series:
        a = _stack(v)
        out = np.empty((a.shape[0], len(cbs)), dtype=np.int32)
        for j, (cb, sq) in enumerate(zip(cbs, sqs)):
            b = a[:, j * sub : (j + 1) * sub]
            bb = _seq_dot(b, b)
            # strict-order dots via the matrix kernel (bit-identical)
            d = (bb[:, None] - 2.0 * _seq_dot_mat(b, cb)) + sq[None, :]
            out[:, j] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return codes


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "v",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>) — M codes per vector, each in [0, k)."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        pq_codes_udf(codebooks)(F.col(vec_col)).alias("codes"),
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


def pq_adc_score_sql(codes_col: str, tables: list[list[float]]) -> str:
    """SQL text of the ADC score (sum of M table lookups, left-to-
    right fold) over a codes column name — composable into larger
    expressions (e.g. the per-probed-cell CASE in IVFADC)."""
    terms = [
        "element_at(array("
        + ",".join(repr(float(t)) + "D" for t in table)
        + f"), element_at({codes_col}, {j + 1}) + 1)"
        for j, table in enumerate(tables)
    ]
    return "(" + " + ".join(terms) + ")"


def pq_adc_score(codes_col, tables: list[list[float]]):
    """Catalyst expression: approximate squared distance = sum of M
    table lookups on the codes array (left-to-right fold, matching a
    plain Python sum). JVM-side — no Python at query time.

    Pass ``codes_col`` as a column NAME to get the fast construction
    path: the whole score is ONE F.expr SQL string (a single py4j
    round-trip; building it from per-element F.lit was ~400 py4j
    calls per query and dominated the driver-side plan-build wall at
    M=8, k=16). A Column falls back to the composed-Column form."""
    if isinstance(codes_col, str):
        return F.expr(pq_adc_score_sql(codes_col, tables))
    score = None
    for j, table in enumerate(tables):
        term = F.element_at(
            F.lit([float(t) for t in table]),
            F.element_at(codes_col, j + 1) + 1,
        )
        score = term if score is None else score + term
    return score
