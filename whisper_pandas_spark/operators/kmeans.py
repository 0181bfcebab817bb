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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisper_pandas_spark.operators.embeddings import _quantize, _vabs_max
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


# ---------------------------------------------------------------------------
# int8-code k-means (exact integer arithmetic)
# ---------------------------------------------------------------------------
# The auditable sibling of kmeans_cosine: clustering the int8 CODES
# (operators/embeddings.py quantization) makes every distance an exact
# BIGINT sum of squares and every centroid update an exact floored
# integer mean — assignments and centroids are bit-reproducible across
# engines/partitionings/retries, so the DuckDB oracle can replay the
# FULL iteration history value-exactly (emb_kmeans_int8).
#
# Semantics note: per-vector symmetric quantization divides each vector
# by its own max|v|, so code-space L2 sees DIRECTION, not magnitude —
# this is spherical (cosine-like) k-means, which is what embedding
# pipelines want. Callers needing magnitude-aware clustering should
# quantize against a global scale (tests/test_round12b.py pins this).
#
# Scale shape (same as kmeans_cosine): ASSIGN is map-side (literal
# centroids, codegen zip_with folds, zero shuffle); UPDATE is one
# (cluster, dim) partial-agg exchange + a k x dim bounded collect per
# iteration (the BPE-merge-table collect pattern). Empty clusters keep
# their previous centroid.

def int8_codes(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, q) — the raw int8 code vectors (array<bigint>), same
    arithmetic as operators/embeddings.quantize_int8."""
    v = F.col(vec_col)
    return df.select(F.col(id_col), _quantize(v, _vabs_max(v)).alias("q"))


def _sq_dist(q: Column, centroid: list[int]) -> Column:
    """Exact BIGINT squared L2 distance code-vector -> literal centroid."""
    c = F.array(*[F.lit(int(x)).cast("long") for x in centroid])
    return F.aggregate(
        F.zip_with(q, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(codes: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(id, cluster, dist) — argmin over literal centroids, ties to the
    lowest cluster id (struct min compares dist first, then cid)."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _sq_dist(F.col("q"), c).alias("dist"),
                    F.lit(j).alias("cid"),
                )
                for j, c in enumerate(centroids)
            ]
        )
    )
    return codes.select(
        *codes.columns,
        best.getField("cid").alias("cluster"),
        best.getField("dist").alias("dist"),
    )


def kmeans_int8(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Lloyd's iterations over int8 codes; returns the final assignment
    ``(id, cluster, dist)`` (dist = exact integer squared L2 in code
    space).

    Init: the codes of the k smallest ids (deterministic, replayable —
    k-means++ would drag float randomness into the parity contract).
    Each iteration: map-side assign -> one partial-agg exchange ->
    k x dim bounded collect -> floored integer mean per component.
    """
    if k < 1 or iters < 0:
        raise ValueError(f"need k >= 1, iters >= 0; got k={k} iters={iters}")
    codes = int8_codes(df, id_col, vec_col)
    init_rows = codes.orderBy(id_col).limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(f"k={k} but only {len(init_rows)} vectors")
    centroids = [list(r["q"]) for r in init_rows]
    dim = len(centroids[0])

    for _ in range(iters):
        assigned = _assign(codes, centroids)
        comp = (
            assigned.select("cluster", F.posexplode("q").alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            # |s| <= rows * 127: exact in double, floor matches DuckDB //
            .select(
                "cluster",
                "dim",
                F.floor(F.col("s").cast("double") / F.col("n"))
                .cast("long")
                .alias("comp"),
            )
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep previous
        for r in comp:
            new[r["cluster"]][r["dim"]] = r["comp"]
        centroids = new

    return _assign(codes, centroids).select(id_col, "cluster", "dist")


def kmeans_summary(assigned: DataFrame, id_col: str) -> DataFrame:
    """Per-cluster audit row: size, exact id checksum, exact total
    inertia (all BIGINT — hash-gateable)."""
    return assigned.groupBy("cluster").agg(
        F.count("*").alias("size"),
        F.sum(id_col).alias("id_sum"),
        F.sum("dist").alias("inertia"),
    )
