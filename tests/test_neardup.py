"""Scale-path MinHash/LSH (functions/minhash.py + operators/neardup.py):
determinism, exact-dup recall, agreement with a naive reference
implementation, and the one-kernel-execution plan shape."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from distributed_system___ocr_spark.functions.minhash import (
    BAND_SIZE,
    K,
    N_HASHES,
    _A,
    _B,
    _C1,
    _C2,
    _C3,
    minhash_band_values,
    minhash_signatures,
)

_BASE = (
    "the quick brown fox jumps over the lazy dog while the patient "
    "crane watches from a distance and the river keeps moving toward "
    "the sea carrying leaves and small branches past the old mill"
)
TEXTS = [
    _BASE,
    _BASE,  # exact dup
    "a completely different document about distributed minhash lsh",
    "",  # no tokens
    "two words",  # < K tokens
    _BASE.replace("dog", "cat"),  # near dup: 1 of 33 words changed
]


def _fnv_splitmix(s: str) -> int:
    """Independent pure-int token hash (the TOKEN_HASH_VERSION=1
    contract: FNV-1a over UTF-8 + splitmix64 finisher)."""
    M = (1 << 64) - 1
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & M
    h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) & M
    h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) & M
    return h ^ (h >> 31)


def _naive_signature(text: str) -> np.ndarray:
    """Reference implementation: explicit shingle loop, same hashes."""
    toks = text.split()
    if len(toks) < K:
        return np.empty(0, dtype=np.uint64)
    th = np.array([_fnv_splitmix(t) for t in toks], dtype=np.uint64)
    sigs = np.full(N_HASHES, np.iinfo(np.uint64).max, dtype=np.uint64)
    for i in range(len(toks) - K + 1):
        s = th[i] * _C1 ^ th[i + 1] * _C2 ^ th[i + 2] * _C3
        sigs = np.minimum(sigs, s * _A + _B)
    return sigs


def test_kernel_matches_naive_reference():
    got = minhash_signatures(TEXTS)
    for text, sig in zip(TEXTS, got):
        assert np.array_equal(sig, _naive_signature(text)), text[:30]


def test_deterministic_and_batch_invariant():
    a = minhash_signatures(TEXTS)
    b = minhash_signatures(TEXTS)
    # one-by-one batches must give identical results (no cross-doc state)
    c = [minhash_signatures([t])[0] for t in TEXTS]
    for x, y, z in zip(a, b, c):
        assert np.array_equal(x, y) and np.array_equal(x, z)


def test_exact_dup_identical_bands_near_dup_partial():
    bands = minhash_band_values(TEXTS)
    assert bands[0] == bands[1]  # exact dup: every band collides
    assert len(bands[0]) == N_HASHES // BAND_SIZE
    assert bands[3] == [] and bands[4] == []  # sub-K docs: no bands
    # near-dup (1 word of 33 changed, jaccard ~0.83): collides with
    # the original in >=1 of the 16 bands at (128, 8) on this fixture
    assert set(bands[0]) & set(bands[5])
    # unrelated doc shares none
    assert not set(bands[0]) & set(bands[2])


def test_spark_pairs_recall_and_plan(spark):
    from distributed_system___ocr_spark.operators.neardup import (
        minhash_bands,
        minhash_lsh_pairs_scale,
    )

    rows = [(i, t) for i, t in enumerate(TEXTS)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs_scale(df)
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    assert (0, 1) in got  # exact dup always recalled
    assert (0, 5) in got and (1, 5) in got  # near dup via shared band
    assert all(a < b for a, b in got)
    assert not any({a, b} & {2, 3, 4} for a, b in got)

    # plan shape: the self-join reuses one exchange (kernel runs once)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan

    # band stage is 8 rows per eligible doc
    n_bands = minhash_bands(df).count()
    assert n_bands == 4 * (N_HASHES // BAND_SIZE)


def test_corpus_pairs_superset_of_exact_dups(spark, pages):
    """On the 500-doc corpus (the corpus's own dups are same-URL
    re-crawls that latest_per_key collapses, so cross-url dups are
    INJECTED: every 10th doc re-added under url#dup) every exact-dup
    pair must be recalled — a near-dup gate that never fires is thin
    evidence."""
    from distributed_system___ocr_spark.operators.extract import extract_stage
    from distributed_system___ocr_spark.operators.manifest import (
        latest_per_key,
    )
    from distributed_system___ocr_spark.operators.neardup import (
        minhash_lsh_pairs_scale,
    )
    from pyspark.sql import functions as F

    docs = extract_stage(latest_per_key(pages)).select("url", "text").filter(
        F.length("text") > 0
    )
    clones = (
        docs.filter(F.crc32("url") % 10 == 0)
        .select(F.concat("url", F.lit("#dup")).alias("url"), "text")
    )
    n_clones = clones.count()
    assert n_clones > 10, "fixture produced too few clones — thin evidence"
    corpus = docs.unionByName(clones)
    pairs = {(r["a_id"], r["b_id"])
             for r in minhash_lsh_pairs_scale(
                 corpus, id_col="url", text_col="text").collect()}
    want = {
        tuple(sorted((r["url"], r["url"] + "#dup")))
        for r in docs.filter(F.crc32("url") % 10 == 0)
        .select("url").collect()
    }
    missing = want - pairs
    assert not missing, f"{len(missing)}/{len(want)} exact-dup pairs missed"


def test_registry_scale_query_recalls_all_clones(spark):
    """The rows-only registry entry (dedup_minhash_scale) must recall
    every injected clone pair and be deterministic across runs (the
    driver's weaker rows-only check needs a stable count)."""
    from distributed_system___ocr_spark.plans.textops2 import (
        _CLONE_OFFSET,
        dedup_minhash_scale,
    )

    sf = "/root/testdata/sf0.001"
    got = {(r["a_id"], r["b_id"])
           for r in dedup_minhash_scale(spark, sf).collect()}
    again = {(r["a_id"], r["b_id"])
             for r in dedup_minhash_scale(spark, sf).collect()}
    assert got == again
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    clone_ids = [r["doc_id"] for r in docs.filter(
        (F.col("doc_id") % 20 == 0) & (F.length("text") > 0)
    ).select("doc_id").collect()]
    assert len(clone_ids) > 5
    want = {(i, i + _CLONE_OFFSET) for i in clone_ids}
    missing = want - got
    assert not missing, f"{len(missing)}/{len(want)} clone pairs missed"
