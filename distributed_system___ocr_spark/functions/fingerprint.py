"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, public
algorithm) as a per-doc kernel.

Winnowing is a pure function of one document's token stream, so the
scale-safe Spark form is a narrow Arrow-batched map over the documents
scan — NO explode of every k-gram into rows and NO per-doc window sort
(the round-1 plan did both: ~n_tokens× row inflation + a shuffle, the
slowest query in the suite at 13.4 s / sf0.1). The SQL oracle keeps
the explode+window formulation; this kernel must be value-identical
to it:

- tokens: split on single space, empties dropped;
- k-grams: word trigrams joined with ' ' (docs with <3 tokens have
  none);
- gram hash: first 8 hex chars of md5(gram) as int64;
- fingerprint at position p (1-based): min hash over the window of
  the last ``w`` grams, kept only for full windows (p >= w);
- per doc: the DISTINCT fingerprint set; docs with no full window
  produce no output row.
"""

from __future__ import annotations

import hashlib

import numpy as np

K = 3  # gram width (word trigrams)
W = 4  # winnowing window (consecutive gram hashes)


def gram_hashes(text: str, k: int = K) -> np.ndarray:
    """int64 hash per k-gram, in document order."""
    toks = [t for t in text.split(" ") if t]
    n = len(toks) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    return np.fromiter(
        (
            int(
                hashlib.md5(
                    " ".join(toks[i : i + k]).encode("utf-8")
                ).hexdigest()[:8],
                16,
            )
            for i in range(n)
        ),
        dtype=np.int64,
        count=n,
    )


def winnow(text: str, k: int = K, w: int = W) -> np.ndarray:
    """Sorted distinct winnowing fingerprints of one document."""
    hs = gram_hashes(text, k)
    if hs.shape[0] < w:
        return np.empty(0, dtype=np.int64)
    # min over each full sliding window of w gram hashes (vectorized;
    # the classic one-pass deque gives the same set)
    mins = np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
    return np.unique(mins)


def winnow_stage(docs, id_col: str = "doc_id", text_col: str = "text"):
    """documents -> (doc_id, n_fingerprints, min_fp, max_fp), one row
    per doc with at least one full window. Narrow op over the scan:
    zero shuffles, zero row inflation."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            ids, ns, mins, maxs = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                fps = winnow(text or "")
                if fps.shape[0] == 0:
                    continue
                ids.append(did)
                ns.append(fps.shape[0])
                mins.append(fps[0])
                maxs.append(fps[-1])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_fingerprints": pd.Series(ns, dtype="int64"),
                    "min_fp": pd.Series(mins, dtype="int64"),
                    "max_fp": pd.Series(maxs, dtype="int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        batches,
        "doc_id bigint, n_fingerprints bigint, min_fp bigint, max_fp bigint",
    )
