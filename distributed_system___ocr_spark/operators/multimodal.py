"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schema, batching, partitioning, UDF
signature) is real and tested; the actual image/audio decode is
STUBBED — the decode libraries (Pillow/ffmpeg/etc.) are not in this
container, so ``decode_media(real=True)`` raises NotImplementedError
and the default path computes a deterministic fake feature set from
the bytes (size-derived dims, content hash). Swapping in a real
decoder changes ONLY the body of :func:`_fake_decode`.

This mirrors how the extraction UDF treats HTML/PDF payloads: bytes
in, typed struct out, errors as rows.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "media_id bigint, byte_len bigint, sha256 string, "
    "width int, height int, n_frames int, status string"
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decode: dims derived from
    the byte content. Replace with PIL/ffmpeg on a real cluster."""
    n = len(payload)
    digest = hashlib.sha256(payload).hexdigest()
    return {
        "byte_len": n,
        "sha256": digest,
        "width": 64 + (n % 512),
        "height": 64 + ((n // 7) % 512),
        "n_frames": 1 + (n % 4),
        "status": "ok_stub",
    }


def decode_media(payload: bytes, real: bool = False) -> dict:
    if real:
        raise NotImplementedError(
            "real media decode requires image/audio libs not present in "
            "this container; install Pillow/av and replace _fake_decode"
        )
    if payload is None or len(payload) == 0:
        return {
            "byte_len": 0, "sha256": None, "width": None, "height": None,
            "n_frames": None, "status": "empty",
        }
    return _fake_decode(payload)


def media_meta_stage(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """(id, binary payload) -> typed metadata rows, Arrow-batched.

    Same partitioning discipline as the extract stage: narrow op, one
    output row per input row, errors as status values.
    """

    def batches(it):
        import pandas as pd

        for pdf in it:
            metas = [decode_media(b) for b in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "media_id", pdf[id_col].to_numpy())
            yield out[
                [
                    "media_id", "byte_len", "sha256", "width", "height",
                    "n_frames", "status",
                ]
            ]

    return df.select(id_col, payload_col).mapInPandas(
        batches, MEDIA_META_SCHEMA
    )
