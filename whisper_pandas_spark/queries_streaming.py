"""Registry entry: batch replay of the §2.9 Structured Streaming rollup.

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

from whisper_pandas_spark.registry import register

_SINK = "stream_rollup_replay_sink"
_RES = 3600  # same 1-hour tumbling window as the batch rollup family

# Same oracle as rollup_average (queries_rollup._oracle_rollup("average"));
# inlined because importing queries_rollup here would be circular (registry
# imports this module, and queries_rollup imports registry). Parity of the
# two strings is asserted in tests/test_streaming.py.
_ORACLE = f"""SELECT event_type, (CAST(floor(epoch(ts)) AS BIGINT) // {_RES}) * {_RES} AS bucket_epoch, round(avg(value), 6) AS value, count(value) AS n_points
FROM events
GROUP BY event_type, bucket_epoch
ORDER BY event_type, bucket_epoch"""


@register("stream_rollup_replay", oracle=_ORACLE)
def stream_rollup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 driver-visible row: the watermarked streaming rollup replayed
    over the static events table via availableNow + memory sink. Complete
    output mode re-emits all windows at end-of-replay (append mode would
    hold back windows the final watermark hasn't passed)."""
    from pyspark.sql.types import LongType

    from whisper_pandas_spark.streaming.rollup import streaming_rollup

    path = f"{sf_dir}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(path)
    # The file stream source requires a DIRECTORY; narrow it to the one
    # table file with a glob filter.
    sdf = (
        spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Same ts normalization as sources/tables.py (both driver layouts).
    if isinstance(raw.schema["ts"].dataType, LongType):
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))

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
            F.round("value", 6).alias("value"),
            "n_points",
        )
        .orderBy("event_type", "bucket_epoch")
    )
