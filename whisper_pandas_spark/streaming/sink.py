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

    Correctness is carried by the MERGE, not by delivery order: every
    micro-batch compresses to one row per key (whole-row ``max_by`` over
    ``(seq, remaining columns)`` — a (key, seq) tie resolves to ONE
    input row, never stitched column-by-column), and the table merge is
    sequence-aware (`merge_changes_ordered`): highest seq wins across
    batches, deletes persist as TOMBSTONE rows. Consequences:

    - batches may arrive in any order (a backfill file sorted late by
      the file source cannot regress newer state or resurrect a delete);
    - re-applying any batch is IDEMPOTENT, so foreachBatch's
      at-least-once delivery — including a restart from a fresh
      checkpoint — converges to the same table.

    On top of that, when a ``checkpoint_dir`` is given a ``_LAST_BATCH``
    marker (checkpoint-scoped: ``<stream id>:<batch id>``) is written
    INTO the new version directory before the pointer flips; a replay
    under the SAME checkpoint skips cleanly so the version chain stays
    one-per-batch. A different checkpoint dir is a different stream id —
    its batch numbering restarts, and its batches re-merge (harmlessly,
    by idempotence) instead of being wrongly skipped. WITHOUT a
    checkpoint, batch ids are not durable (a restart renumbers from 0),
    so no marker is written or honored — every batch re-merges through
    the idempotent path rather than risking a wrong skip.

    Read the live state with ``read_current_state(spark, base,
    delete_col=..., seq_col=...)`` — the raw versions keep tombstones
    and sequence numbers on purpose.

    Returns the StreamingQuery. Scale shape: one partial-agg exchange
    over the BATCH (compression) + merge_into_parquet's key-grouped
    rewrite; partition the base path and merge per partition to bound
    rewrite amplification.
    """
    from pathlib import Path

    from pyspark.sql import functions as F

    from whisper_pandas_spark.operators.merge import (
        current_version_path,
        merge_into_parquet,
    )

    stream_id = checkpoint_dir
    cols = list(sdf.columns)
    others = [c for c in cols if c not in (key_col, seq_col)]

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # The marker short-circuit is only sound when batch ids are
        # durable, i.e. a checkpoint exists. A checkpoint-less restart
        # renumbers batches from 0 — matching on a shared placeholder id
        # would wrongly skip its early batches, silently dropping new
        # change data; without a checkpoint we rely on the seq-aware
        # merge's idempotence alone (re-merges are harmless).
        cur = current_version_path(base) if stream_id is not None else None
        if cur is not None:
            marker = Path(cur) / "_LAST_BATCH"
            if marker.exists():
                sid, _, last = marker.read_text().rpartition(":")
                if sid == stream_id and int(last) >= batch_id:
                    return  # same stream replaying — already applied
        latest = (
            batch_df.groupBy(key_col)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in cols]),
                    F.struct(F.col(seq_col), *[F.col(c) for c in others]),
                ).alias("__r")
            )
            .select(*[F.col(f"__r.{c}").alias(c) for c in cols])
        )
        merge_into_parquet(
            batch_df.sparkSession,
            base,
            latest,
            key_col,
            delete_col=delete_col,
            seq_col=seq_col,
            extra_files=(
                {"_LAST_BATCH": f"{stream_id}:{batch_id}"}
                if stream_id is not None
                else {}
            ),
        )

    writer = sdf.writeStream.foreachBatch(apply).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
