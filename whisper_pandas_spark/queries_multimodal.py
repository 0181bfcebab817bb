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
- mm_image_features  : the REAL feature head over DECODED pixels —
  planted PGM payloads make the moments/gradient math SQL-replayable.
- mm_audio_stats     : the REAL audio decode leaf — planted RIFF-PCM
  WAV payloads whose rms/duration DuckDB recomputes from the sample
  formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.operators.multimodal import (
    FRAME_BYTES,
    binary_metadata,
    extract_features,
    image_features,
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
    "mm_image_features",
    oracle="""
WITH px AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS i,
         ord(substr(rpad(text, 256, text), CAST(t.i + 1 AS INT), 1)) % 128 AS b
  FROM documents CROSS JOIN range(0, 256) AS t(i)
), g AS (
  SELECT doc_id, i, b,
         CASE WHEN i % 16 < 15 THEN abs(lead(b, 1) OVER w - b) END AS gx,
         CASE WHEN i < 240 THEN abs(lead(b, 16) OVER w - b) END AS gy
  FROM px
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
), s AS (
  SELECT doc_id,
         CAST(sum(b) AS BIGINT) AS s1,
         CAST(sum(b*b) AS BIGINT) AS s2,
         CAST(sum(b*b*b) AS BIGINT) AS s3,
         CAST(sum(gx) AS BIGINT) AS gxs,
         CAST(sum(gy) AS BIGINT) AS gys
  FROM g GROUP BY doc_id
), m AS (
  SELECT doc_id, s1, s2, s3, gxs, gys,
         s1 / 256.0 AS mean,
         sqrt(greatest(s2 / 256.0 - (s1 / 256.0) * (s1 / 256.0), 0)) AS std
  FROM s
)
SELECT doc_id,
       CAST(16 AS INT) AS height, CAST(16 AS INT) AS width,
       CAST(1 AS INT) AS channels,
       round(mean + 1e-9, 6) AS mean_px,
       round(std + 1e-9, 6) AS std_px,
       round(CASE WHEN std > 0 THEN
               ((s3 - 3.0 * mean * s2 + 3.0 * mean * mean * s1
                 - 256 * mean * mean * mean) / 256.0)
               / (std * std * std) END + 1e-9, 6) AS skew_px,
       round(gxs / 240.0 + 1e-9, 6) AS grad_x_mean,
       round(gys / 240.0 + 1e-9, 6) AS grad_y_mean
FROM m ORDER BY doc_id
""",
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: the REAL image feature head (operators/multimodal.py:
    image_features) driven end-to-end through the pure-stdlib codec —
    each document's text is cycled to 256 CHARACTERS, each mapped to the
    single-byte alphabet codepoint % 128 (so the utf-8 plane is exactly
    256 bytes even for non-ASCII text — r6 advisory), and wrapped as a
    binary P5 PGM (header + raw pixel plane), so the Arrow task performs
    a genuine netpbm decode and the featurizer computes moments +
    gradient energy from DECODED pixels; DuckDB replays the exact
    integer power sums by enumerating the same mod-128 codepoints with
    rpad/ord. The orientation histogram (libm-boundary-sensitive) is
    pytest-covered instead."""
    docs = _table(spark, sf_dir, "documents")
    pgm = docs.select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit("P5\n16 16\n255\n"),
                F.expr(
                    "array_join(transform(split(rpad(text, 256, text), ''),"
                    " c -> char(ascii(c) % 128)), '')"
                ),
            ),
            "utf-8",
        ).alias("payload"),
    )
    feats = image_features(pgm, "doc_id")
    eps = F.lit(1e-9)
    return feats.select(
        "doc_id",
        "height",
        "width",
        "channels",
        F.round(F.col("mean_px") + eps, 6).alias("mean_px"),
        F.round(F.col("std_px") + eps, 6).alias("std_px"),
        F.round(F.col("skew_px") + eps, 6).alias("skew_px"),
        F.round(F.col("grad_x_mean") + eps, 6).alias("grad_x_mean"),
        F.round(F.col("grad_y_mean") + eps, 6).alias("grad_y_mean"),
    ).orderBy("doc_id")


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


@register(
    "mm_audio_stats",
    oracle="""
WITH s AS (
  SELECT doc_id,
         ((doc_id * 31 + t.i * 7) % 65536) - 32768 AS v
  FROM documents CROSS JOIN range(0, 256) AS t(i)
)
SELECT doc_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(1 AS INT) AS channels,
       CAST(256 AS BIGINT) AS n_samples,
       256.0 / 8000.0 AS duration_s,
       round(sqrt(CAST(sum(v * v) AS BIGINT) / 256.0) + 1e-9, 6) AS rms
FROM s GROUP BY doc_id ORDER BY doc_id
""",
)
def mm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: the audio decode leaf driven end-to-end with a full value
    oracle (the audio twin of `mm_image_features`): deterministic int16
    samples s_i = ((doc_id*31 + i*7) mod 65536) - 32768 are wrapped as
    real RIFF-PCM WAV containers inside the Arrow pass, decoded by the
    pure-stdlib codec (functions/codecs.py:decode_wav), and summarized
    by decode_audio_stats. Sample squares are exact integers whose sum
    fits a double, so rms = sqrt(sum/n) is bit-deterministic and DuckDB
    replays it by enumerating the same formula. Spectral features
    (FFT-based, not SQL-expressible) stay pytest-pinned in
    `audio_features` tests."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from whisper_pandas_spark.functions.codecs import encode_wav
    from whisper_pandas_spark.operators.multimodal import decode_audio_stats

    docs = _table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        idx = np.arange(256, dtype=np.int64)
        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                s = (((int(d) * 31 + idx * 7) % 65536) - 32768).astype(
                    np.int16
                )
                ids.append(d)
                blobs.append(encode_wav(s, 8000))
            yield pd.DataFrame({"doc_id": ids, "payload": blobs})

    src = docs.mapInPandas(gen, "doc_id long, payload binary")
    st = decode_audio_stats(src, "doc_id")
    return st.select(
        "doc_id",
        "sample_rate",
        "channels",
        "n_samples",
        "duration_s",
        F.round(F.col("rms") + F.lit(1e-9), 6).alias("rms"),
    ).orderBy("doc_id")
