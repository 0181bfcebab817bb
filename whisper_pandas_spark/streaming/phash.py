"""Streaming perceptual-image dedup: a growing dHash fingerprint
registry maintained by foreachBatch — the streaming face of
`mm_phash_neardup`/`mm_phash_canonical` (the batch pair/canonical
operators), and the perceptual sibling of streaming/sketches.py's Bloom
maintainer.

Semantics per micro-batch (deterministic given the batch sequence):

1. dHash every image in the batch (one Arrow decode pass,
   operators/multimodal.py:image_dhash);
2. EXACT within-batch dedup: keep the min img_id per dhash (two
   near-but-not-identical images in the SAME batch both register —
   documented; a production variant would band within the batch too);
3. reject any survivor within ``max_hamming`` of an EXISTING registry
   fingerprint — the banded candidate join transplanted from the batch
   operator (8x8-bit bands: complete for max_hamming <= 7, so the
   reject set is exactly the hamming ball, no false accepts);
4. append the accepted (dhash, img_id) rows to the versioned state.

Merge law: like Bloom/KMV and unlike the additive CMS, the state
transition is IDEMPOTENT — a replayed batch's fingerprints are all
within hamming 0 of the registry, so every row is rejected and the
state is unchanged. No `_LAST_BATCH` marker machinery exists in this
path; the registry survives duplicated files and full reprocesses by
construction (asserted end-to-end by the `stream_phash_dedup` entry,
which reprocesses the whole stream into the same state).

Scale shape: the registry holds one 8-byte hash + one id per UNIQUE
image — orders of magnitude smaller than the stream; each batch pays
one decode pass over its own payloads, one band join against the
registry (registry side band table is registry-sized), and one
append-only state write. Payloads never shuffle and never enter state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bands(df: DataFrame) -> DataFrame:
    keys = F.array(
        *[
            F.shiftrightunsigned("dhash", b * 8).bitwiseAND(F.lit(255))
            for b in range(8)
        ]
    )
    return df.select(
        "dhash", F.posexplode(keys).alias("band", "bkey")
    )


def stream_phash_dedup(
    sdf: DataFrame,
    base: str,
    id_col: str = "img_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    checkpoint_dir: str | None = None,
):
    """Start the streaming registry maintainer over an (id, payload)
    stream; state versions land under ``base`` (operators/merge.py
    write_version layout). See module docstring for semantics."""
    from pathlib import Path

    from whisper_pandas_spark.operators.merge import (
        current_version_path,
        write_version,
    )
    from whisper_pandas_spark.operators.multimodal import image_dhash

    if not 0 <= max_hamming <= 7:
        raise ValueError(
            f"max_hamming must be in [0, 7] (8-band completeness), "
            f"got {max_hamming}"
        )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        hashes = image_dhash(batch_df, id_col, payload_col)
        batch_min = (
            hashes.groupBy("dhash")
            .agg(F.min("doc_id").alias("img_id"))
            .localCheckpoint(eager=True)
        )
        cur = current_version_path(base)
        if cur is None:
            new_state = batch_min
            next_version = 0
        else:
            state = spark.read.parquet(cur).select("dhash", "img_id")
            lb = _bands(batch_min).select(
                F.col("dhash").alias("bh"), "band", "bkey"
            )
            rb = _bands(state).select(
                F.col("dhash").alias("sh"), "band", "bkey"
            )
            conflict = (
                lb.join(rb, ["band", "bkey"])
                .filter(F.bit_count(F.expr("bh ^ sh")) <= max_hamming)
                .select(F.col("bh").alias("dhash"))
                .distinct()
            )
            accepted = batch_min.join(conflict, "dhash", "left_anti")
            next_version = int(Path(cur).name[1:]) + 1
            new_state = state.unionByName(accepted)
        write_version(base, new_state, next_version)

    writer = sdf.writeStream.foreachBatch(apply).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
