"""Deterministic distributed k-means for IVF codebook training (X3).

Makes the IVF ANN path (:func:`~whisper_pandas_spark.operators.similarity.
cosine_topk_ivf`) self-contained: real deployments train a codebook
offline, and this is that trainer, expressed Spark-first so it runs on the
full corpus.

Design constraints and how they map to Spark:

- **Initialization** must be deterministic AND oracle-able, so instead of
  k-means||'s random oversampling we take the k vectors with the smallest
  ``md5(seed || vec_id)`` — a deterministic pseudo-random sample (the md5
  order is uncorrelated with insertion order, which is what the random
  init buys you) that any SQL engine reproduces exactly.
- **Assignment** step is :func:`ivf_assign` with nprobe=1 — broadcast
  centroids, map-side scoring, groupBy + max_by partial aggregation: one
  narrow shuffle of pre-reduced rows per iteration.
- **Update** step is the classic posexplode → groupBy(cell, pos) mean.
  The dim-way explode gets map-side partial aggregation on (cell, pos) —
  K·dim running sums per input partition, NOT |corpus|·dim shuffled rows.
- **Determinism of the mean**: double summation is order-dependent under
  Spark's partial aggregation, so sums run in DECIMAL(38,12) (exact,
  associative — bit-identical under any partitioning) and the final
  ``sum_dec::double / n`` division is performed on both engines
  identically. Iterations therefore converge to the same bits everywhere.
- Empty cells simply drop (k shrinks) — consistent on both engines.

A fixed iteration count (no convergence test) keeps the computation a
static DAG: at 100 TB each iteration is one scan + two narrow shuffles,
and the caller picks the compute budget explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisper_pandas_spark.operators.similarity import ivf_assign


def kmeans_cosine(
    vectors: DataFrame,
    k: int,
    iters: int = 2,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: bool = True,
) -> DataFrame:
    """Train k cosine-space centroids; returns (cid BIGINT, embedding
    ARRAY<DOUBLE>) with cid = 0..k-1 assigned in init-hash order.

    ``iters`` Lloyd iterations over the full corpus: assign each vector to
    its nearest centroid by cosine (deterministic ties by centroid id),
    recompute each centroid as the exact-decimal element-wise mean of its
    members. Cosine is scale-invariant, so the mean is used un-normalized
    (spherical k-means' normalization step only rescales — it cannot
    change any subsequent assignment).

    ``checkpoint=True`` (the DEFAULT — it is the production shape for
    iterative training) materializes the (tiny, k-row) centroid frame
    after every iteration with an eager ``localCheckpoint``, truncating
    lineage so the downstream plan contains ONE iteration's operators
    regardless of ``iters``. ``checkpoint=False`` compounds the
    iterations into a single plan whose exchange count grows linearly
    and whose corpus scan repeats per iteration — kept only as the
    labelled single-tree baseline proving bit-parity. Results are
    bit-identical either way (asserted in tests): the exact-decimal
    means make every iteration's centroids independent of partitioning,
    and checkpointing only changes WHERE the bits come from, not the
    bits.
    """
    src = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    # deterministic pseudo-random init: k smallest md5(seed:vec_id)
    init = (
        src.withColumn(
            "h", F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("vec_id")))
        )
        .orderBy("h")
        .limit(k)
    )
    # Global (unpartitioned) window — Spark logs a single-partition warning,
    # but the frame is the k-row limit() above, not the corpus: the "all
    # data" it moves is <= k centroids, constant at any corpus scale.
    w = Window.orderBy("h")
    cent = init.select(
        (F.row_number().over(w) - 1).cast("bigint").alias("cid"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )

    for _ in range(iters):
        # ivf_assign expects one id/vec naming on both sides; the centroid
        # frame masquerades its cid as the id column.
        assigned = ivf_assign(
            src.select("vec_id", "embedding"),
            cent.select(F.col("cid").alias("vec_id"), "embedding"),
            nprobe=1,
        ).select("vec_id", "vec", "cell")
        exploded = assigned.select(
            "cell", F.posexplode("vec").alias("pos", "val")
        )
        means = exploded.groupBy("cell", "pos").agg(
            (
                F.sum(F.col("val").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mval")
        )
        cent = means.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mval"))),
                lambda s: s.mval,
            ).alias("embedding")
        ).select(F.col("cell").alias("cid"), "embedding")
        if checkpoint:
            cent = cent.localCheckpoint(eager=True)

    return cent
