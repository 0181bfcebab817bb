"""Registry entries: multimodal binary-column pipeline (X5).

- mm_binary_metadata : JVM-side metadata (length/md5/mime/frames) —
  fully oracle-able (md5 of utf-8 payload == md5 of the source string).
- mm_features        : mapInPandas fake-decode features; the byte
  histogram is deterministic, and DuckDB can replicate it over the utf-8
  code units via list aggregation, so even the Python path is
  value-checked.
- mm_frame_stats     : frame sampling (row explosion in Arrow) then a
  per-doc aggregate; oracle replicates counts from octet_length
  arithmetic (frame CONTENT is checked by unit tests; the count/shape
  contract is what SQL can see).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.operators.multimodal import (
    FRAME_BYTES,
    binary_metadata,
    extract_features,
    sample_frames,
    with_payload,
)
from whisper_pandas_spark.registry import _table, register


@register(
    "mm_binary_metadata",
    oracle=f"""
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS payload_md5,
  'application/octet-stream' AS mime,
  CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS INT) AS n_frames
FROM documents ORDER BY doc_id
""",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: typed metadata over an opaque BinaryType payload — pure
    codegen expressions (octet_length, md5, magic-byte mime sniff)."""
    docs = with_payload(_table(spark, sf_dir, "documents"))
    return binary_metadata(docs, "doc_id").orderBy("doc_id")


@register(
    "mm_features",
    oracle="""
WITH codes AS (
  SELECT doc_id, length(text) AS n,
         list_transform(range(1, length(text) + 1),
                        i -> ord(substr(text, i, 1)) % 16) AS bins
  FROM documents
)
SELECT doc_id, bin,
  round(len(list_filter(bins, x -> x = bin)) * 1.0 / greatest(n, 1), 6)
    AS feature
FROM codes CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
ORDER BY doc_id, bin
""",
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: mapInPandas fake decode → 16-bin byte histogram features,
    exploded to (doc_id, bin, feature) scalar rows (array-typed result
    columns don't hash portably across engines). The decode itself is the
    stub (see operators/multimodal.py); the Arrow plumbing and schema
    contract are the real thing. NB: oracle uses ord() over single-byte
    slices — exact for this ASCII corpus; the Spark side operates on raw
    bytes and is the ground truth for non-ASCII."""
    docs = with_payload(_table(spark, sf_dir, "documents"))
    feats = extract_features(docs, "doc_id")
    return feats.select(
        "doc_id", F.posexplode("features").alias("bin", "feature")
    ).withColumn("feature", F.round("feature", 6)).orderBy("doc_id", "bin")


@register(
    "mm_frame_stats",
    oracle=f"""
SELECT doc_id,
  CAST(ceil(octet_length(encode(text)) / ({FRAME_BYTES} * 4.0)) AS BIGINT)
    AS frames_sampled
FROM documents ORDER BY doc_id
""",
)
def mm_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: frame-sample every 4th fixed-size frame (row explosion inside
    one Arrow pass, no shuffle) then count per doc — the video-pipeline
    shape: decode→sample narrow, aggregate after."""
    docs = with_payload(_table(spark, sf_dir, "documents"))
    frames = sample_frames(docs, "doc_id", every=4)
    return (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("frames_sampled"))
        .orderBy("doc_id")
    )
