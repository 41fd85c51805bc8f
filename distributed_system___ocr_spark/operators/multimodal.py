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


FRAME_SAMPLE_SCHEMA = (
    "media_id bigint, n_frames int, sampled_frames array<int>, "
    "resized_w int, resized_h int, status string"
)


def frame_sample_stage(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    every_k: int = 2,
    target_w: int = 224,
) -> DataFrame:
    """Frame-sample + resize plumbing for video-like payloads.

    The Spark side (Arrow batching, schema, array output column) is
    real; the decode is the deterministic stub (decode_media). Sampled
    frame indices = every k-th frame; resize preserves aspect to
    target_w. Swapping in ffmpeg/PIL changes only decode_media."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            out_rows = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                meta = decode_media(b)
                if meta["status"] != "ok_stub":
                    out_rows.append(
                        {
                            "media_id": mid, "n_frames": None,
                            "sampled_frames": None, "resized_w": None,
                            "resized_h": None, "status": meta["status"],
                        }
                    )
                    continue
                n = meta["n_frames"]
                w, h = meta["width"], meta["height"]
                out_rows.append(
                    {
                        "media_id": mid,
                        "n_frames": n,
                        "sampled_frames": list(range(0, n, every_k)),
                        "resized_w": target_w,
                        # integer arithmetic (floor), not float round:
                        # banker's-vs-half-away rounding differs across
                        # engines and this must be SQL-reproducible
                        "resized_h": max(1, (h * target_w) // w),
                        "status": "ok_stub",
                    }
                )
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "media_id", "n_frames", "sampled_frames",
                    "resized_w", "resized_h", "status",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, FRAME_SAMPLE_SCHEMA
    )


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
