"""Multimodal metadata extraction as a registry query.

The Spark side runs the REAL plumbing (binary payload column ->
Arrow-batched mapInPandas -> typed metadata struct, see
operators.multimodal); the oracle reproduces the deterministic fake
decode arithmetic in SQL, which is possible precisely because the
stubbed decode is a pure function of the bytes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import frame_sample_stage, media_meta_stage
from .queries import _t, register


@register(
    "multimodal_media_meta",
    """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           sha256(text) AS sha256,
           CAST(64 + (octet_length(encode(text)) % 512) AS INT) AS width,
           CAST(64 + ((octet_length(encode(text)) // 7) % 512) AS INT) AS height,
           CAST(1 + (octet_length(encode(text)) % 4) AS INT) AS n_frames,
           'ok_stub' AS status
    FROM documents
    """,
)
def multimodal_media_meta(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return media_meta_stage(docs, "doc_id", "payload")


@register(
    "multimodal_frame_sample",
    """
    WITH meta AS (
      SELECT doc_id AS media_id,
             octet_length(encode(text)) AS n,
             64 + (octet_length(encode(text)) % 512) AS w,
             64 + ((octet_length(encode(text)) // 7) % 512) AS h,
             1 + (octet_length(encode(text)) % 4) AS n_frames
      FROM documents
    )
    SELECT media_id,
           CAST(n_frames AS INT) AS n_frames,
           array_to_string([CAST(x AS INT) for x in
                            generate_series(0, n_frames - 1)
                            if x % 2 = 0], ',') AS sampled_frames,
           CAST(224 AS INT) AS resized_w,
           CAST(greatest(1, (h * 224) // w) AS INT) AS resized_h,
           'ok_stub' AS status
    FROM meta
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    # sampled_frames crosses the oracle boundary as a comma-joined
    # string: the driver's canonicalizer sorts rows with pandas, which
    # cannot hash list cells (round-1 CORRECTNESS err). The operator
    # itself keeps the typed array<int> column.
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    out = frame_sample_stage(docs, "doc_id", "payload")
    return out.withColumn(
        "sampled_frames",
        F.array_join(F.col("sampled_frames").cast("array<string>"), ","),
    )
