"""Streaming → Whisper sink: persist a metric stream as .wsp files.

Composes Structured Streaming with the batch write path
(sources/whisper_write.py) via ``foreachBatch`` — the idiomatic Spark
pattern for sinks without a native streaming writer. Each micro-batch
writes in MERGE mode: a touched metric's existing file is read and the
batch's points overlay its stored ring slots, so points that arrived in
earlier micro-batches survive. Slot overlay is idempotent (replaying a
batch writes the same values into the same slots), so foreachBatch's
at-least-once delivery is safe too.

This makes the engine a (batch-fed) Graphite-compatible writer: stream →
optional rollup/dedup → .wsp tree readable by Graphite tooling and by our
own reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from whisper_pandas_spark.sources.whisper_write import write_whisper


def stream_to_whisper(
    sdf: DataFrame,
    out_dir: str,
    archives: str = "10:1000,60:500",
    aggregation: str = "average",
    x_files_factor: float = 0.5,
    checkpoint_dir: str | None = None,
    output_mode: str = "append",
):
    """Start a streaming query writing (metric, timestamp, value) rows to
    a .wsp tree. Returns the StreamingQuery (caller awaits/stops).

    ``output_mode``: "append" for raw point streams; "update" when *sdf*
    is a streaming AGGREGATION (windows then flush their current value
    every trigger instead of waiting for watermark expiry, and the
    merge-mode slot overlay makes re-writes of a window idempotent —
    last update wins, exactly Whisper's own slot semantics)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_whisper(
            batch_df, out_dir, archives, aggregation, x_files_factor, merge=True
        )

    writer = sdf.writeStream.foreachBatch(sink).outputMode(output_mode)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
