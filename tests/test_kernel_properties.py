"""Hypothesis property tests for the round-3 pure-Python kernels
(functions/minhash.py, operators/pq.py helpers): totality over
arbitrary text, batch invariance, and exact-dup collision — the
properties the Spark operators rely on, checked over generated input
rather than fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_system___ocr_spark.functions.minhash import (
    BAND_SIZE,
    N_HASHES,
    minhash_band_values,
    minhash_signatures,
)

# arbitrary printable text incl. weird whitespace-only and unicode
_texts = st.text(max_size=300)


@settings(max_examples=60, deadline=None)
@given(st.lists(_texts, max_size=8))
def test_minhash_total_and_batch_invariant(texts):
    batch = minhash_signatures(texts)
    assert len(batch) == len(texts)
    solo = [minhash_signatures([t])[0] for t in texts]
    for a, b in zip(batch, solo):
        assert np.array_equal(a, b)
    for t, sig in zip(texts, batch):
        n_toks = len(t.split())
        assert sig.shape[0] == (N_HASHES if n_toks >= 3 else 0)


@settings(max_examples=60, deadline=None)
@given(_texts)
def test_minhash_exact_dup_always_collides(text):
    a, b = minhash_band_values([text, text])
    assert a == b
    if len(text.split()) >= 3:
        assert len(a) == N_HASHES // BAND_SIZE


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(-10, 10, allow_nan=False), min_size=8, max_size=8),
        min_size=2,
        max_size=6,
    )
)
def test_adc_tables_match_direct_distance(vectors):
    """For any query/codebook made of real vectors, the ADC table entry
    equals the direct squared distance between query block and
    centroid."""
    from distributed_system___ocr_spark.operators.pq import adc_tables

    books = [[v[:4] for v in vectors], [v[4:] for v in vectors]]
    q = vectors[0]
    tables = adc_tables(books, q)
    assert len(tables) == 2 and all(len(t) == len(vectors) for t in tables)
    for j in (0, 1):
        qb = q[j * 4 : (j + 1) * 4]
        for c, cent in enumerate(books[j]):
            want = sum((qb[d] - cent[d]) ** 2 for d in range(4))
            assert abs(tables[j][c] - want) < 1e-9
    # the query's own block distance is exactly zero
    assert tables[0][0] == 0.0 and tables[1][0] == 0.0


def test_token_hash_is_pinned_by_version_not_by_library():
    """TOKEN_HASH_VERSION=1 pins the exact algorithm: FNV-1a over
    UTF-8 bytes then a splitmix64 finisher. The reference here is an
    independent pure-Python int implementation — if a numpy/pandas
    upgrade (or a refactor) changes any produced value, this fails and
    the version must be bumped with persisted artifacts re-derived."""
    import numpy as np

    from distributed_system___ocr_spark.functions.minhash import (
        TOKEN_HASH_VERSION,
        _hash_bytes_u64,
    )

    assert TOKEN_HASH_VERSION == 1
    M = (1 << 64) - 1

    def ref(s: str) -> int:
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & M
        h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) & M
        h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) & M
        return h ^ (h >> 31)

    toks = ["a", "bc", "the", "naïve", "東京", "tok4711", "", "a" * 300]
    got = _hash_bytes_u64(np.array(toks, dtype=object))
    assert [int(x) for x in got] == [ref(t) for t in toks]
