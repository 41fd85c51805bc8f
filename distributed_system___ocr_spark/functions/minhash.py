"""MinHash signatures + LSH band values as a per-doc vectorized
kernel — the SCALE path for near-dup candidate generation.

The oracle-gated registry query (``plans/textops.py dedup_minhash_lsh``)
keeps the explode-every-shingle + md5-string formulation because DuckDB
must reproduce it bit-for-bit; that shape inflates each document into
``n_shingles x n_hashes`` rows, which is correctness evidence, not a
10^12-doc plan. This kernel computes the same FAMILY of signature
(min over per-shingle affine hashes) in one Arrow-batched pass:

- tokens: whitespace split, empties dropped (same as the oracle op);
- shingles: word trigrams, but hashed ARITHMETICALLY from the three
  token hashes (no shingle string is ever materialized);
- token hash: OWN versioned implementation (FNV-1a over UTF-8 bytes +
  splitmix64 finisher, TOKEN_HASH_VERSION below) — pd.util.hash_array
  was stable within a run but not contractually stable across pandas
  versions, which silently broke the cross-run determinism the
  rows-only registry checks rely on (round-3 advice);
- signature_j = min over shingles of (a_j * s + b_j mod 2^64), with
  (a_j, b_j) fixed splitmix64-derived constants (no runtime RNG);
- band value b = mix(sig_{2b}, sig_{2b+1}) — one int64 per band.

Exact-duplicate texts get identical signatures, hence identical band
values in every band (recall 1.0 on exact dups, pinned in tests).
Cost per batch: O(total_tokens) string hashing + O(total_shingles x
n_hashes) integer ops, all numpy — no Python loop over shingles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

K = 3  # shingle width in tokens (matches the oracle op's trigrams)
# (128, 16x8) is the standard web-dedup parameterization: band
# collision probability 1-(1-j^8)^16 — ~0.75 jaccard threshold. The
# oracle op's tiny (8, 4x2) exists only so DuckDB can replay it; at
# corpus scale it admits j~0.2 pairs and bucket sizes explode
# quadratically (measured: 15.7M candidate pairs over 1M template-y
# docs at (16, 8x2) vs ~linear growth here).
N_HASHES = 128
BAND_SIZE = 8  # 16 bands x 8 rows

_M64 = 0xFFFFFFFFFFFFFFFF

# Version of the token-hash algorithm below. Signatures/band values are
# a deterministic function of (TOKEN_HASH_VERSION, N_HASHES, BAND_SIZE,
# K); changing ANY of them changes every signature, so bump this and
# re-derive any persisted band/bucket artifacts together (same
# discipline as extractor.core.EXTRACTOR_VERSION).
TOKEN_HASH_VERSION = 1

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _hash_bytes_u64(tokens) -> np.ndarray:
    """Vectorized 64-bit hash of a sequence of strings: FNV-1a over
    the UTF-8 bytes, then a splitmix64 finisher for avalanche. Owned
    here so the value is pinned by TOKEN_HASH_VERSION, not by whatever
    pandas ships. Work is O(total bytes): the position loop indexes
    only tokens still longer than p."""
    enc = [t.encode("utf-8") for t in tokens]
    n = len(enc)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n:
        lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
        if int(lens.max(initial=0)) > 0:
            buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
            offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
            for p in range(int(lens.max())):
                mask = lens > p
                idx = offs[mask] + p
                h[mask] = (h[mask] ^ buf[idx].astype(np.uint64)) * _FNV_PRIME
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


# fixed affine constants: a_j odd (bijective mod 2^64), b_j arbitrary
_A = np.array(
    [_splitmix64(2 * j + 1) | 1 for j in range(N_HASHES)], dtype=np.uint64
)
_B = np.array(
    [_splitmix64(2 * j + 2) for j in range(N_HASHES)], dtype=np.uint64
)
# shingle mix multipliers (three positions must not commute)
_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)
_C3 = np.uint64(0x165667B19E3779F9)
_BANDMIX = np.uint64(0xFF51AFD7ED558CCD)


def minhash_signatures(texts: "pd.Series | list[str]") -> list[np.ndarray]:
    """Per-doc uint64 signature vectors (length N_HASHES); empty array
    for docs with fewer than K tokens."""
    tok_lists = [t.split() if t else [] for t in texts]
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                         count=len(tok_lists))
    total = int(counts.sum())
    out: list[np.ndarray] = [np.empty(0, dtype=np.uint64)] * len(tok_lists)
    if total == 0:
        return out
    flat = np.empty(total, dtype=object)
    pos = 0
    for toks in tok_lists:
        flat[pos : pos + len(toks)] = toks
        pos += len(toks)
    # hash only the UNIQUE tokens (corpora repeat tokens heavily),
    # then gather — factorize's first-occurrence coding is a stable
    # pandas contract, the hash itself is ours (TOKEN_HASH_VERSION)
    codes, uniques = pd.factorize(pd.Series(flat), sort=False)
    th = _hash_bytes_u64(uniques)[codes]

    # shingle hashes on the flat array; positions crossing a doc
    # boundary are invalidated below
    if total < K:
        return out
    s_all = (
        th[: total - K + 1] * _C1
        ^ th[1 : total - K + 2] * _C2
        ^ th[2:] * _C3
    )
    offsets = np.concatenate(([0], np.cumsum(counts)))
    # segmented min via np.minimum.reduceat over the VALID shingles
    # (bit-identical to the per-doc (n_shingles x N_HASHES) broadcast
    # it replaces, measured 1.45x: one C-level segmented reduction per
    # hash instead of a Python iteration + 2D allocation per doc).
    # Valid positions: drop the last K-1 before each doc end (those
    # shingles cross a doc boundary); docs with n < K lose all.
    ns = total - K + 1
    mask = np.ones(ns, dtype=bool)
    ends = offsets[1:]
    for d in range(1, K):
        bad = ends - d
        mask[bad[(bad >= 0) & (bad < ns)]] = False
    s_valid = s_all[mask]
    keep = counts >= K
    nk = int(keep.sum())
    if nk == 0:
        return out
    vcounts = counts[keep] - (K - 1)
    starts = np.concatenate(([0], np.cumsum(vcounts)))[:-1]
    sig = np.empty((nk, N_HASHES), dtype=np.uint64)
    tmp = np.empty_like(s_valid)
    for j in range(N_HASHES):
        np.multiply(s_valid, _A[j], out=tmp)
        np.add(tmp, _B[j], out=tmp)
        sig[:, j] = np.minimum.reduceat(tmp, starts)
    for i, d in enumerate(np.nonzero(keep)[0]):
        out[d] = sig[i]
    return out


def minhash_band_values(texts: "pd.Series | list[str]") -> list[list[int]]:
    """Per-doc LSH band values as int64 (N_HASHES // BAND_SIZE of them);
    empty list for docs with no shingles. The band fold runs ONCE over
    all non-empty docs stacked (bit-identical to the per-doc fold)."""
    sigs = minhash_signatures(texts)
    res: list[list[int]] = [[] for _ in sigs]
    ne = [i for i, s in enumerate(sigs) if s.shape[0]]
    if not ne:
        return res
    m = np.stack([sigs[i] for i in ne]).reshape(len(ne), -1, BAND_SIZE)
    val = m[:, :, 0] * _BANDMIX
    for c in range(1, BAND_SIZE):
        val = (val ^ m[:, :, c]) * _BANDMIX
    v64 = val.astype(np.int64)
    for r, i in enumerate(ne):
        res[i] = v64[r].tolist()
    return res
