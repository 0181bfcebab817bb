"""Registry entries: batch replays of the §2.9 Structured Streaming
operators (rollup, stream-stream interval join, incremental near-dup).

The streaming surface (streaming/rollup.py) is covered by stream≡batch
pytest, but Structured Streaming can't run inside the driver's DuckDB
oracle harness — so this entry REPLAYS the real streaming query
(readStream → withWatermark → window agg) over the static events table
with ``Trigger.AvailableNow`` into a memory sink, and returns the drained
result as a batch DataFrame. Because the streaming rollup is
bucket-for-bucket equal to the batch rollup (epoch-aligned tumbling
windows, same 8-method agg map), the entry carries the SAME full SQL
oracle as ``rollup_average`` — a hash-match CORRECTNESS row for §2.9,
not just a rows-only count.

Scale: availableNow is exactly how a 100 TB backfill runs in production —
the same streaming query graph, bounded input, watermark-bounded state;
one code path for live and replay is the point of Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.functions.text import duck_minhash_pairs_ctes
from whisper_pandas_spark.registry import register

_SINK = "stream_rollup_replay_sink"
_RES = 3600  # same 1-hour tumbling window as the batch rollup family

# Same oracle as rollup_average (queries_rollup._oracle_rollup("average"));
# inlined because importing queries_rollup here would be circular (registry
# imports this module, and queries_rollup imports registry). Parity of the
# two strings is asserted in tests/test_streaming.py.
_ORACLE = f"""SELECT event_type, (CAST(floor(epoch(ts)) AS BIGINT) // {_RES}) * {_RES} AS bucket_epoch, round(avg(value) + 1e-9, 6) AS value, count(value) AS n_points
FROM events
GROUP BY event_type, bucket_epoch
ORDER BY event_type, bucket_epoch"""


@register("stream_rollup_replay", oracle=_ORACLE)
def stream_rollup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 driver-visible row: the watermarked streaming rollup replayed
    over the static events table via availableNow + memory sink. Complete
    output mode re-emits all windows at end-of-replay (append mode would
    hold back windows the final watermark hasn't passed)."""
    from whisper_pandas_spark.sources.tables import stream_events
    from whisper_pandas_spark.streaming.rollup import streaming_rollup

    sdf = stream_events(spark, sf_dir)
    out = streaming_rollup(
        sdf,
        _RES,
        "average",
        keys=("event_type",),
        ts_col="ts",
        value_col="value",
        watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName(_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return (
        spark.table(_SINK)
        .select(
            "event_type",
            F.unix_timestamp("bucket").alias("bucket_epoch"),
            # + 1e-9 boundary bias, matching _spark_rollup (round 13)
            F.round(F.col("value") + F.lit(1e-9), 6).alias("value"),
            "n_points",
        )
        .orderBy("event_type", "bucket_epoch")
    )


_JOIN_SINK = "stream_interval_join_replay_sink"
_JOIN_UB = 3600  # seconds: purchase within an hour of the click


@register(
    "stream_interval_join_replay",
    oracle=f"""
SELECT l.user_id,
       l.event_id AS click_id,
       CAST(floor(epoch(l.ts)) AS BIGINT) AS click_epoch,
       r.event_id AS purchase_id,
       CAST(floor(epoch(r.ts)) AS BIGINT) AS purchase_epoch
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND l.event_type = 'click' AND r.event_type = 'purchase'
 AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL {_JOIN_UB} SECOND
ORDER BY l.user_id, click_id, purchase_id
""",
)
def stream_interval_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: the stream-stream interval join (streaming/joins.py —
    watermark-bounded state on both sides) replayed over the static
    events table: clicks joined to purchases by the same user within an
    hour. An inner join's result SET is order-independent, so the replay
    is deterministic and carries a plain SQL join oracle — the strongest
    correctness statement available for a stream-stream operator."""
    from whisper_pandas_spark.sources.tables import stream_events
    from whisper_pandas_spark.streaming.joins import stream_interval_join

    def side(event_type: str, prefix: str) -> DataFrame:
        sdf = stream_events(spark, sf_dir)
        return sdf.filter(F.col("event_type") == event_type).select(
            "user_id",
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("ts").alias(f"{prefix}_ts"),
        )

    joined = stream_interval_join(
        side("click", "click"),
        side("purchase", "purchase"),
        on="user_id",
        left_ts="click_ts",
        right_ts="purchase_ts",
        lower_seconds=0,
        upper_seconds=_JOIN_UB,
        watermark="1 hour",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(_JOIN_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return (
        spark.table(_JOIN_SINK)
        .select(
            "user_id",
            "click_id",
            F.unix_timestamp("click_ts").alias("click_epoch"),
            "purchase_id",
            F.unix_timestamp("purchase_ts").alias("purchase_epoch"),
        )
        .orderBy("user_id", "click_id", "purchase_id")
    )


# Same MinHash/LSH parameters as the batch dedup family (queries_dedup);
# the shared oracle builder lives in functions/text.py so this module
# doesn't import queries_dedup (registration order stays put). Parameter
# parity with the batch entry is asserted in tests/test_streaming.py.
_ND_NUM_PERM, _ND_BANDS, _ND_ROWS, _ND_JACCARD_T = 12, 4, 3, 0.8
#: sf_dir -> materialized replay dir (cleared by reset_result_caches)
_ND_REPLAY_DIR: dict[str, str] = {}


@register(
    "stream_near_dup_replay",
    oracle=f"""
WITH {duck_minhash_pairs_ctes(_ND_NUM_PERM, _ND_BANDS, _ND_ROWS, _ND_JACCARD_T)}
SELECT doc_i, doc_j, jaccard FROM mh_pairs ORDER BY doc_i, doc_j
""",
)
def stream_near_dup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 × §2.10: the INCREMENTAL MinHash-LSH near-dup stream
    (streaming/dedup.py — foreachBatch around the batch operators with a
    persistent signature store) replayed over `documents` split into 3
    files with maxFilesPerTrigger=1 + availableNow, so the store really
    grows across micro-batches. A pair is emitted exactly once, in the
    micro-batch where the YOUNGER side arrives; band assignment and the
    Jaccard verify are deterministic per document, so the union of all
    emissions equals the batch lsh_pairs over the full corpus — the same
    full algorithm-replication oracle as dedup_minhash_lsh."""
    import os
    import shutil
    import tempfile

    from whisper_pandas_spark.registry import _table
    from whisper_pandas_spark.streaming.dedup import stream_near_dup

    # per-process result cache (same pattern as queries_dedup._PAIRS_CACHE
    # / queries_materialize._ROUNDTRIP_DIR, cleared by
    # registry.reset_result_caches) — without it every driver/oracle/test
    # invocation leaves a full corpus copy + checkpoint under /tmp
    cached = _ND_REPLAY_DIR.get(sf_dir)
    if cached is not None and os.path.isdir(os.path.join(cached, "pairs")):
        return (
            spark.read.parquet(os.path.join(cached, "pairs"))
            .select("doc_i", "doc_j", "jaccard")
            .orderBy("doc_i", "doc_j")
        )

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    stale = _ND_REPLAY_DIR.pop(sf_dir, None)
    if stale is not None:
        shutil.rmtree(stale, ignore_errors=True)
    base = tempfile.mkdtemp(prefix="wps_stream_neardup_")
    _ND_REPLAY_DIR[sf_dir] = base
    src = os.path.join(base, "in")
    # 3 files -> 3 micro-batches under maxFilesPerTrigger=1: batch 2's
    # docs are deduped against batches 0-1 through the signature store
    docs.repartition(3).write.parquet(src)
    sdf = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_near_dup(
        sdf,
        pairs_dir=os.path.join(base, "pairs"),
        sig_store_dir=os.path.join(base, "sigs"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        num_perm=_ND_NUM_PERM,
        bands=_ND_BANDS,
        rows=_ND_ROWS,
        jaccard_threshold=_ND_JACCARD_T,
        available_now=True,
    )
    q.awaitTermination()
    q.stop()
    return (
        spark.read.parquet(os.path.join(base, "pairs"))
        .select("doc_i", "doc_j", "jaccard")
        .orderBy("doc_i", "doc_j")
    )


_EW_SINK = "stream_ewma_replay_sink"
_EW_ALPHA = 0.25  # exact binary: 1 - alpha = 0.75 is exact too
_EW_BASE = 1_700_000_000
_EW_CAP = 400  # points per metric (bounds the oracle's O(n^2) prefix folds)

_EW_ORACLE = f"""
WITH pts AS (
  SELECT event_type AS metric,
         {_EW_BASE} + 10 * row_number() OVER (PARTITION BY event_type
                                              ORDER BY event_id) AS epoch,
         round(value, 6) AS value
  FROM events
  QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY event_id)
          <= {_EW_CAP}
), arrs AS (
  SELECT metric,
         list(value ORDER BY epoch) AS vs,
         list(epoch ORDER BY epoch) AS es
  FROM pts GROUP BY metric
), ew AS (
  SELECT metric, es, vs,
         list_transform(range(1, len(vs) + 1),
           i -> list_reduce(list_slice(vs, 1, i),
                            (acc, x) -> {_EW_ALPHA} * x
                                        + {1.0 - _EW_ALPHA} * acc)) AS ems
  FROM arrs
)
SELECT metric,
       CAST(unnest(es) AS BIGINT) AS epoch,
       unnest(vs) AS value,
       round(unnest(ems) + 1e-9, 6) AS ewma
FROM ew ORDER BY metric, epoch
"""


@register("stream_ewma_replay", oracle=_EW_ORACLE)
def stream_ewma_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 ST3 driver-visible row: the applyInPandasWithState per-key
    EWMA (streaming/stateful.py) replayed end-to-end with a FULL value
    oracle. A deterministic per-metric time ramp from `events` is
    written as two time-ordered files and streamed one file per
    micro-batch, so state genuinely carries the running EWMA ACROSS
    batches; the oracle replays the sequential fold per point with
    DuckDB prefix list_reduce (alpha = 0.25 exactly representable, the
    fold's multiply-add order mirrored operation-for-operation)."""
    import tempfile

    from pyspark.sql.window import Window

    from whisper_pandas_spark.streaming.stateful import streaming_ewma

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy("event_id")
    pts = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _EW_CAP)
        .select(
            F.col("event_type").alias("metric"),
            F.timestamp_seconds(F.lit(_EW_BASE) + 10 * F.col("rn")).alias(
                "timestamp"
            ),
            F.round("value", 6).alias("value"),
            "rn",
        )
    )
    d = tempfile.mkdtemp(prefix="wps_ewma_replay_")
    pts.filter(F.col("rn") <= _EW_CAP // 2).drop("rn").coalesce(
        1
    ).write.parquet(f"{d}/src/f1")
    pts.filter(F.col("rn") > _EW_CAP // 2).drop("rn").coalesce(
        1
    ).write.parquet(f"{d}/src/f2")
    sdf = (
        spark.readStream.schema(
            "metric string, timestamp timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/src/*")
    )
    out = streaming_ewma(sdf, alpha=_EW_ALPHA)
    q = (
        out.writeStream.format("memory")
        .queryName(_EW_SINK)
        .outputMode("append")
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return (
        spark.table(_EW_SINK)
        .select(
            "metric",
            F.unix_timestamp("timestamp").alias("epoch"),
            "value",
            F.round(F.col("ewma") + F.lit(1e-9), 6).alias("ewma"),
        )
        .orderBy("metric", "epoch")
    )
