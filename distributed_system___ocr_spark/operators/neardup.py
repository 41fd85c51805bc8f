"""Near-duplicate candidate pairs at scale: Arrow-kernel MinHash
signatures + LSH band equi-join.

This is the 10^12-doc execution shape for what the oracle-gated
``dedup_minhash_lsh`` registry query proves correct at small scale
(plans/textops.py:206): there, every shingle becomes ``n_hashes`` rows
so DuckDB can replay it; here, signatures are computed in one
vectorized pass per Arrow batch (functions/minhash.py) and the only
row inflation is docs x n_bands (8). The band self-join shuffles both
sides identically, so Spark's ReusedExchange executes the kernel ONCE
(verified in tests: the physical plan contains a ReusedExchange node).

Replaces the reference's all-pairs impossibility at scale — the
reference never deduped at all (SURVEY §2d); this is the added
LLM-pipeline capability, same family as the oracle op.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.minhash import minhash_band_values


def minhash_bands(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, band_idx, band_val) — 8 rows per doc with >=3 tokens."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bands_udf(s: pd.Series) -> pd.Series:
        return pd.Series(minhash_band_values(s))

    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(bands_udf(F.col(text_col))).alias(
            "band_idx", "band_val"
        ),
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (a_id, b_id) sharing at least one band. Sub-quadratic:
    pairs form only inside (band_idx, band_val) buckets; the global
    cost is sum over buckets of c^2, never corpus^2."""
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )


def minhash_lsh_pairs_scale(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """End-to-end: text -> signatures -> band buckets -> candidate
    pairs. One kernel execution (exchange reuse), two shuffles (band
    hash-partitioning + distinct)."""
    return lsh_candidate_pairs(minhash_bands(df, id_col, text_col))
