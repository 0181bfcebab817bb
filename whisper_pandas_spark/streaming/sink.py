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


def stream_merge_into_parquet(
    sdf: DataFrame,
    base: str,
    key_col: str,
    seq_col: str,
    delete_col: str | None = None,
    checkpoint_dir: str | None = None,
):
    """Streaming CDC apply: maintain a keyed copy-on-write parquet table
    (operators/merge.py) from a stream of change rows — the
    Delta-`MERGE`-from-CDC pattern on plain parquet.

    Per micro-batch: compress the batch to its LAST change per key
    (``max_by`` over ``seq_col``, key tiebreak deterministic), then
    ``merge_into_parquet`` writes version N+1 and flips the pointer.
    Exactly-once across restarts: the applied batch id is recorded in a
    ``_LAST_BATCH`` marker INSIDE the new version directory before the
    pointer flips, so a replayed batch (foreachBatch is at-least-once)
    is detected and skipped — the table never double-applies and the
    version chain stays one-per-batch.

    Returns the StreamingQuery. Scale shape is merge_into_parquet's (one
    key join + full rewrite per batch — partition the base path and
    merge per partition to bound rewrite amplification); the per-batch
    key compression is one partial-agg exchange over the BATCH, not the
    table.
    """
    from pathlib import Path

    from pyspark.sql import functions as F

    from whisper_pandas_spark.operators.merge import (
        current_version_path,
        merge_into_parquet,
    )

    data_cols = [c for c in sdf.columns if c != key_col]

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cur = current_version_path(base)
        if cur is not None:
            marker = Path(cur) / "_LAST_BATCH"
            if marker.exists() and int(marker.read_text()) >= batch_id:
                return  # replayed batch — already applied
        latest = batch_df.groupBy(key_col).agg(
            *[
                F.max_by(F.col(c), F.struct(F.col(seq_col), F.col(key_col)))
                .alias(c)
                for c in data_cols
            ]
        )
        new_dir = merge_into_parquet(
            batch_df.sparkSession, base, latest, key_col, delete_col
        )
        (Path(new_dir) / "_LAST_BATCH").write_text(str(batch_id))

    writer = sdf.writeStream.foreachBatch(apply).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
