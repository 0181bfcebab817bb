"""Streaming sketch-table maintenance: keep a mergeable quantile sketch
(operators/sketches.py histogram family) current from a stream.

Each micro-batch is sketched on its own (one tiny histogram row per key
group — the batch IS the shard) and merged element-wise into the
versioned state table with the same full-write-then-flip discipline as
the CDC sink (operators/merge.py:write_version). Because the merge is
ADDITIVE, replaying a batch would double-count — unlike the seq-aware
CDC merge there is no idempotence to fall back on — so a checkpoint is
REQUIRED and the `_LAST_BATCH` marker short-circuit provides the
standard exactly-once foreachBatch recipe (skip batch ids at or below
the marker written with the version they produced).

The payoff at 100 TB: the state is kilobytes per key group, every batch
costs one partial aggregation over the BATCH, and any later consumer
reads quantiles (hist_quantiles) off the merged counts without touching
raw history — the streaming twin of the `sketch_quantile_rollup` entry,
value-checked end-to-end by `stream_sketch_replay` (exact regime, so the
final state equals the batch recompute bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_sketch_update(
    sdf: DataFrame,
    base: str,
    keys: tuple[str, ...],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    checkpoint_dir: str,
):
    """Start a streaming query maintaining a per-*keys* histogram sketch
    table at ``base`` from the (keys..., value) stream ``sdf``. Returns
    the StreamingQuery (caller awaits/stops); read the live state with
    ``spark.read.parquet(current_version_path(base))`` and summarize it
    with :func:`~whisper_pandas_spark.operators.sketches.hist_quantiles`.
    """
    from pathlib import Path

    from whisper_pandas_spark.operators.merge import (
        current_version_path,
        write_version,
    )
    from whisper_pandas_spark.operators.sketches import (
        hist_rollup,
        hist_shard_sketches,
    )

    if not checkpoint_dir:
        raise ValueError(
            "checkpoint_dir is required: the sketch merge is additive, so "
            "a replayed batch would double-count — batch-id dedup needs "
            "durable batch numbering"
        )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cur = current_version_path(base)
        next_version = 0
        if cur is not None:
            marker = Path(cur) / "_LAST_BATCH"
            if marker.exists():
                sid, _, last = marker.read_text().rpartition(":")
                if sid == checkpoint_dir and int(last) >= batch_id:
                    return  # replay of an already-merged batch
            next_version = int(Path(cur).name[1:]) + 1
        batch_sketch = hist_shard_sketches(
            batch_df, keys, value_col, lo, hi, n_bins
        )
        if cur is None:
            new_state = batch_sketch
        else:
            prior = batch_df.sparkSession.read.parquet(cur).select(
                *keys, "cnt"
            )
            new_state = hist_rollup(
                prior.unionByName(batch_sketch), keys
            )
        write_version(
            base,
            new_state,
            next_version,
            extra_files={"_LAST_BATCH": f"{checkpoint_dir}:{batch_id}"},
        )

    return (
        sdf.writeStream.foreachBatch(apply)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_kmv_update(
    sdf: DataFrame,
    base: str,
    keys: tuple[str, ...],
    value_col: str,
    k: int = 64,
    seed: int = 0,
    checkpoint_dir: str | None = None,
):
    """Streaming twin for the KMV set-operation sketches
    (operators/sketches.py kmv_*): each micro-batch is sketched on its
    own and set-union-merged (kmv_rollup) into the versioned state.

    Unlike the ADDITIVE histogram merge above, the KMV merge is
    IDEMPOTENT — re-unioning hashes that are already in the state leaves
    the bottom-k unchanged — so a replayed batch cannot corrupt the
    state and ``checkpoint_dir`` is optional for CORRECTNESS (it still
    buys restart progress tracking and avoids wasted recompute; the
    idempotence is asserted in tests). This is the practical argument
    for KMV state in an at-least-once pipeline.
    """
    from pathlib import Path

    from whisper_pandas_spark.operators.merge import (
        current_version_path,
        write_version,
    )
    from whisper_pandas_spark.operators.sketches import (
        kmv_rollup,
        kmv_shard_sketches,
    )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_sketch = kmv_shard_sketches(batch_df, keys, value_col, k, seed)
        cur = current_version_path(base)
        if cur is None:
            new_state = kmv_rollup(batch_sketch, keys)
            next_version = 0
        else:
            prior = batch_df.sparkSession.read.parquet(cur).select(
                *keys, "k", "hs"
            )
            new_state = kmv_rollup(prior.unionByName(batch_sketch), keys)
            next_version = int(Path(cur).name[1:]) + 1
        write_version(base, new_state, next_version)

    writer = sdf.writeStream.foreachBatch(apply).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_topk_update(
    sdf: DataFrame,
    base: str,
    keys: tuple[str, ...],
    item_col: str,
    capacity: int,
    checkpoint_dir: str,
):
    """Streaming heavy-hitters maintenance — the third member of the
    streaming-sketch family (additive histogram, idempotent KMV, and
    now merge-truncated top-k): each micro-batch is summarized by
    operators/sketches.py:topk_shard_sketches and merged into the
    versioned state by the space-saving merge rule — per-item LO counts
    add, the truncation slack (`rest_max`) of the two summaries ADDS
    (an item absent from one side could have held up to that side's
    rest_max), and the merged item list re-truncates to `capacity`,
    folding the largest dropped count into the new slack. In the exact
    regime (distinct items per group <= capacity end to end) rest_max
    stays 0 and the state equals the batch recompute bit-for-bit —
    which is what the registry oracle checks; the approximate-regime
    bound (lo <= true <= lo + rest_max) is pytest-pinned.

    Like the histogram stream (and unlike KMV), the merge is ADDITIVE:
    a replayed batch would double-count, so the checkpoint-scoped
    `_LAST_BATCH` marker is REQUIRED for correctness.
    """
    from pathlib import Path

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from whisper_pandas_spark.operators.merge import (
        current_version_path,
        write_version,
    )
    from whisper_pandas_spark.operators.sketches import topk_shard_sketches

    if not checkpoint_dir:
        raise ValueError(
            "checkpoint_dir is required: the top-k merge is additive, so "
            "a replayed batch would double-count — batch-id dedup needs "
            "durable batch numbering"
        )
    kcols = list(keys)

    def merge_states(a: DataFrame, b: DataFrame) -> DataFrame:
        def exploded(df: DataFrame) -> DataFrame:
            return df.select(
                *kcols, F.explode("items").alias("e"), "rest_max"
            ).select(
                *kcols,
                F.col("e.item").alias("item"),
                F.col("e.cnt").alias("cnt"),
            )

        items = (
            exploded(a)
            .unionByName(exploded(b))
            .groupBy(*kcols, "item")
            .agg(F.sum("cnt").alias("cnt"))
        )
        slack = (
            a.select(*kcols, "rest_max")
            .unionByName(b.select(*kcols, "rest_max"))
            .groupBy(*kcols)
            .agg(F.sum("rest_max").alias("rest_in"))
        )
        w = Window.partitionBy(*kcols).orderBy(F.desc("cnt"), F.asc("item"))
        ranked = items.withColumn("__rn", F.row_number().over(w))
        return (
            ranked.join(slack, kcols)
            .groupBy(*kcols)
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__rn") <= capacity,
                            F.struct("item", "cnt"),
                        )
                    )
                ).alias("items"),
                (
                    F.min("rest_in")
                    + F.coalesce(
                        F.max(
                            F.when(F.col("__rn") > capacity, F.col("cnt"))
                        ),
                        F.lit(0),
                    )
                ).alias("rest_max"),
            )
        )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cur = current_version_path(base)
        next_version = 0
        if cur is not None:
            marker = Path(cur) / "_LAST_BATCH"
            if marker.exists():
                sid, _, last = marker.read_text().rpartition(":")
                if sid == checkpoint_dir and int(last) >= batch_id:
                    return  # replay of an already-merged batch
            next_version = int(Path(cur).name[1:]) + 1
        batch_sketch = topk_shard_sketches(batch_df, keys, item_col, capacity)
        if cur is None:
            new_state = batch_sketch
        else:
            prior = batch_df.sparkSession.read.parquet(cur).select(
                *kcols, "items", "rest_max"
            )
            new_state = merge_states(prior, batch_sketch)
        write_version(
            base,
            new_state,
            next_version,
            extra_files={"_LAST_BATCH": f"{checkpoint_dir}:{batch_id}"},
        )

    return (
        sdf.writeStream.foreachBatch(apply)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_cms_update(
    sdf: DataFrame,
    base: str,
    keys: tuple[str, ...],
    value_col: str,
    depth: int = 3,
    width: int = 128,
    seed: int = 0,
    checkpoint_dir: str | None = None,
):
    """Streaming twin for the count-min sketches (operators/sketches.py
    cms_*): each micro-batch is sketched on its own (the batch IS the
    shard) and merged into the versioned state by the CMS elementwise-sum
    law (cms_rollup over the sparse cell union).

    Like the histogram merge — and unlike KMV — the merge is ADDITIVE,
    so a replayed batch would double-count every counter and
    ``checkpoint_dir`` is REQUIRED: the `_LAST_BATCH` marker
    short-circuit provides the standard exactly-once foreachBatch
    recipe. State is (keys..., row, col, cnt) — at most
    groups x depth x width rows, kilobytes per group — and any later
    consumer reads point-frequency estimates off it with cms_estimate
    without touching raw history.
    """
    from pathlib import Path

    from whisper_pandas_spark.operators.merge import (
        current_version_path,
        write_version,
    )
    from whisper_pandas_spark.operators.sketches import (
        cms_rollup,
        cms_shard_sketches,
    )

    if not checkpoint_dir:
        raise ValueError(
            "checkpoint_dir is required: the CMS merge is additive, so a "
            "replayed batch would double-count — batch-id dedup needs "
            "durable batch numbering"
        )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cur = current_version_path(base)
        next_version = 0
        if cur is not None:
            marker = Path(cur) / "_LAST_BATCH"
            if marker.exists():
                sid, _, last = marker.read_text().rpartition(":")
                if sid == checkpoint_dir and int(last) >= batch_id:
                    return  # replay of an already-merged batch
            next_version = int(Path(cur).name[1:]) + 1
        batch_sketch = cms_shard_sketches(
            batch_df, keys, value_col, depth=depth, width=width, seed=seed
        )
        if cur is None:
            new_state = batch_sketch
        else:
            prior = batch_df.sparkSession.read.parquet(cur).select(
                *keys, "row", "col", "cnt"
            )
            new_state = cms_rollup(prior.unionByName(batch_sketch), keys)
        write_version(
            base,
            new_state,
            next_version,
            extra_files={"_LAST_BATCH": f"{checkpoint_dir}:{batch_id}"},
        )

    return (
        sdf.writeStream.foreachBatch(apply)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_hll_update(
    sdf: DataFrame,
    base: str,
    keys: tuple[str, ...],
    value_col: str,
    m: int = 64,
    seed: int = 0,
    checkpoint_dir: str | None = None,
):
    """Streaming twin for the HyperLogLog sketches (operators/hll.py):
    each micro-batch is sketched on its own and element-wise-MAX-merged
    (hll_rollup) into the versioned register state — live distinct
    counts per group over an unbounded stream in O(groups x m) state.

    Like Bloom/KMV — and unlike the additive CMS — the merge is
    IDEMPOTENT (max-merging registers that are already absorbed changes
    nothing), so a replayed batch or a full reprocess cannot corrupt
    the state: no `_LAST_BATCH` marker machinery, asserted end-to-end
    by the `stream_hll_replay` entry's deliberate double-pass.
    """
    from pathlib import Path

    from whisper_pandas_spark.operators.hll import (
        hll_rollup,
        hll_shard_sketches,
    )
    from whisper_pandas_spark.operators.merge import (
        current_version_path,
        write_version,
    )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_sketch = hll_shard_sketches(
            batch_df, keys, value_col, m=m, seed=seed
        )
        cur = current_version_path(base)
        if cur is None:
            new_state = hll_rollup(batch_sketch, keys)
            next_version = 0
        else:
            prior = batch_df.sparkSession.read.parquet(cur).select(
                *keys, "bucket", "reg"
            )
            new_state = hll_rollup(prior.unionByName(batch_sketch), keys)
            next_version = int(Path(cur).name[1:]) + 1
        write_version(base, new_state, next_version)

    writer = sdf.writeStream.foreachBatch(apply).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_bloom_update(
    sdf: DataFrame,
    base: str,
    keys: tuple[str, ...],
    value_col: str,
    k: int = 3,
    m: int = 4096,
    seed: int = 0,
    checkpoint_dir: str | None = None,
):
    """Streaming twin for the Bloom membership sketches
    (operators/sketches.py bloom_*): each micro-batch is sketched on its
    own and set-union-merged (bloom_rollup) into the versioned state —
    the streaming face of Dolma-style corpus dedup, where every arriving
    shard's keys are added to one global membership filter.

    Like KMV — and unlike the additive CMS — the merge is IDEMPOTENT
    (re-unioning bits that are already set changes nothing), so a
    replayed batch, a duplicated file, or a full reprocess CANNOT
    corrupt the state: ``checkpoint_dir`` is optional for correctness
    (it still buys restart progress tracking), and no `_LAST_BATCH`
    marker machinery is needed. Asserted end-to-end in the
    `stream_bloom_replay` entry, which deliberately reprocesses the
    whole stream into the same state.
    """
    from pathlib import Path

    from whisper_pandas_spark.operators.merge import (
        current_version_path,
        write_version,
    )
    from whisper_pandas_spark.operators.sketches import (
        bloom_rollup,
        bloom_shard_sketches,
    )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_sketch = bloom_shard_sketches(
            batch_df, keys, value_col, k=k, m=m, seed=seed
        )
        cur = current_version_path(base)
        if cur is None:
            new_state = bloom_rollup(batch_sketch, keys)
            next_version = 0
        else:
            prior = batch_df.sparkSession.read.parquet(cur).select(
                *keys, "bit"
            )
            new_state = bloom_rollup(prior.unionByName(batch_sketch), keys)
            next_version = int(Path(cur).name[1:]) + 1
        write_version(base, new_state, next_version)

    writer = sdf.writeStream.foreachBatch(apply).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_kn_counts_update(
    sdf: DataFrame,
    base: str,
    id_col: str,
    text_col: str,
    checkpoint_dir: str | None = None,
):
    """Streaming maintenance of the Kneser-Ney trigram COUNT TABLE
    (operators/knlm.py): each micro-batch of documents contributes its
    trigram counts, merged into the versioned (w1, w2, w3, c123) state
    by elementwise SUM — live LM statistics over an unbounded corpus,
    scoreable at any time via kn_score_from_counts.

    Like the CMS/histogram family — and unlike Bloom/KMV/HLL — the
    merge is ADDITIVE, so a replayed batch would double-count and
    ``checkpoint_dir`` is REQUIRED (the `_LAST_BATCH` marker
    short-circuit, the standard exactly-once foreachBatch recipe).
    State is the Zipf-bounded trigram-type table — orders of magnitude
    below corpus scale and exactly the c123 root the batch scorer
    derives everything from, so stream-maintained counts score
    BIT-IDENTICALLY to a batch rebuild (asserted by the
    `stream_kn_replay` entry's shared oracle).
    """
    from pathlib import Path

    from whisper_pandas_spark.operators.knlm import trigram_stream
    from whisper_pandas_spark.operators.merge import (
        current_version_path,
        write_version,
    )

    if not checkpoint_dir:
        raise ValueError(
            "checkpoint_dir is required: the trigram-count merge is "
            "additive, so a replayed batch would double-count — batch-id "
            "dedup needs durable batch numbering"
        )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cur = current_version_path(base)
        next_version = 0
        if cur is not None:
            marker = Path(cur) / "_LAST_BATCH"
            if marker.exists():
                sid, _, last = marker.read_text().rpartition(":")
                if sid == checkpoint_dir and int(last) >= batch_id:
                    return  # replay of an already-merged batch
            next_version = int(Path(cur).name[1:]) + 1
        from pyspark.sql import functions as F

        batch_counts = (
            trigram_stream(batch_df, id_col, text_col)
            .groupBy("w1", "w2", "w3")
            .agg(F.count(F.lit(1)).alias("c123"))
        )
        if cur is None:
            new_state = batch_counts
        else:
            prior = batch_df.sparkSession.read.parquet(cur).select(
                "w1", "w2", "w3", "c123"
            )
            new_state = (
                prior.unionByName(batch_counts)
                .groupBy("w1", "w2", "w3")
                .agg(F.sum("c123").alias("c123"))
            )
        write_version(
            base,
            new_state,
            next_version,
            extra_files={"_LAST_BATCH": f"{checkpoint_dir}:{batch_id}"},
        )

    return (
        sdf.writeStream.foreachBatch(apply)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_bottomk_update(
    sdf: DataFrame,
    base: str,
    keys: tuple[str, ...],
    id_col: str,
    k: int,
    seed: int = 0,
    checkpoint_dir: str | None = None,
):
    """Streaming per-group UNIFORM SAMPLE maintenance: bottom-k by the
    deterministic md5 key hash (operators/sampling.py:hash_bucket) —
    the streaming face of content-keyed sampling. The state per group
    is the k rows with the smallest hash values; because the hash is a
    pure function of the row's key, bottom-k over a union is
    associative, commutative AND idempotent:

        bk(S ∪ T) = bk(bk(S) ∪ T),   bk(S ∪ S) = bk(S)

    so — like Bloom/KMV/HLL and unlike the additive CMS/KN counters —
    a replayed batch or a full checkpoint-less reprocess cannot corrupt
    the state (no `_LAST_BATCH` marker machinery; asserted end-to-end
    by `stream_bottomk_replay`'s deliberate double pass).

    Relation to :func:`stream_kmv_update` above: KMV keeps only the k
    minimum HASHES per group, packed as a sketch array — an estimator
    (distinct counts / set ops), not a sample. This maintainer keeps
    the k minimum-hash ROWS (group, id, h): the same merge law carrying
    an actual uniform sample — the content-keyed eval-holdout /
    inspection sample a 100 TB streaming ingest needs, which no
    estimator state can reconstruct. O(groups x k) state, one window
    over (prior ∪ batch) — never over the stream's bulk.
    """
    from pathlib import Path

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from whisper_pandas_spark.operators.merge import (
        current_version_path,
        write_version,
    )
    from whisper_pandas_spark.operators.sampling import hash_bucket

    key_cols = [*keys, id_col]

    def bottom_k(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy("h", id_col)
        return (
            df.dropDuplicates(key_cols)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hashed = batch_df.select(*key_cols).withColumn(
            "h", hash_bucket(F.col(id_col).cast("string"), seed)
        )
        cur = current_version_path(base)
        if cur is None:
            new_state = bottom_k(hashed)
            next_version = 0
        else:
            prior = batch_df.sparkSession.read.parquet(cur).select(
                *key_cols, "h"
            )
            new_state = bottom_k(prior.unionByName(hashed))
            next_version = int(Path(cur).name[1:]) + 1
        write_version(base, new_state, next_version)

    writer = sdf.writeStream.foreachBatch(apply).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
