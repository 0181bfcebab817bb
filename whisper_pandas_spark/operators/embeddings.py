"""Embedding compression: int8 scalar quantization + quantized ANN.

The storage/bandwidth lever for 100 TB-scale vector corpora: a 64-dim
float32 embedding is 256 B; symmetric int8 quantization cuts it to
64 B + one float scale, and integer dot products are exact (no float
summation-order hazard) — candidate scoring becomes portable integer
arithmetic with one final per-pair rescale.

Reference parity: the reference engine has no vector surface at all
(`whisper_pandas.py` is a time-series decoder); this family is part of
the engine's own LLM-pipeline bar (SURVEY.md §2.10 X3 extension).

Parity design (see the oracle strings in queries_embeddings.py):

- scale = max(|v_i|) is a comparison-only fold — no float arithmetic,
  bit-identical on any engine and any fold order;
- q_i = floor(v_i / scale * 127 + 0.5): one division, one multiply,
  one add, floored — identical IEEE doubles on Spark and DuckDB
  (floor(x+0.5) is used instead of round() because round's half-up vs
  half-even behavior differs across engines);
- integer sums/dots over q are exact BIGINT math;
- the only float that leaves the operator is quantized to micro units
  (floor(x * 1e6)) before it reaches a result column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Q_LEVELS = 127.0  # symmetric int8 range [-127, 127]


def _vabs_max(v: Column) -> Column:
    """max(|v_i|) — comparison-only fold, order-independent, exact."""
    return F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )


def _quantize(v: Column, scale: Column) -> Column:
    """Element-wise int8 codes; all-zero vectors map to all-zero codes."""
    return F.transform(
        v,
        lambda x: F.when(scale == F.lit(0.0), F.lit(0).cast("long")).otherwise(
            F.floor(x.cast("double") / scale * F.lit(Q_LEVELS) + F.lit(0.5)).cast(
                "long"
            )
        ),
    )


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Per-vector symmetric int8 quantization with reconstruction audit.

    Returns (id, scale_micro, sum_q, l1_q, err_micro_max):

    - scale_micro: floor(max|v| * 1e6) — the dequantization scale;
    - sum_q / l1_q: exact integer code sums (membership check for the
      whole code vector without emitting 64 columns);
    - err_micro_max: floor(max reconstruction error * 1e6) — the audit
      that the codes actually dequantize back within int8 tolerance.

    Scan-shaped: one projection, zero shuffles; scales linearly.
    """
    v = F.col(vec_col)
    scale = _vabs_max(v)
    q = _quantize(v, scale)
    # Reconstruction error per element: |v_i - q_i * scale / 127|.
    err = F.zip_with(
        v,
        q,
        lambda x, c: F.abs(
            x.cast("double") - c.cast("double") * scale / F.lit(Q_LEVELS)
        ),
    )
    return df.select(
        F.col(id_col),
        F.floor(scale * F.lit(1e6)).cast("long").alias("scale_micro"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("sum_q"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda a, x: a + F.abs(x)
        ).alias("l1_q"),
        F.floor(
            F.aggregate(err, F.lit(0.0), lambda a, x: F.greatest(a, x))
            * F.lit(1e6)
        )
        .cast("long")
        .alias("err_micro_max"),
    )


def int8_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: DataFrame,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF + SQ8: the production billion-scale ANN shape — coarse
    quantization (IVF cells) bounds WHICH pairs are scored, scalar int8
    quantization bounds WHAT each comparison costs.

    Corpus vectors land in their 1 nearest cell (``ivf_assign``,
    broadcast centroids, map-side argmax); queries probe their ``nprobe``
    nearest cells; candidates = cell-equality join (each (query, vec)
    pair at most once, since a corpus vector lives in exactly one cell).
    Candidate scoring is the exact BIGINT code dot rescaled by the two
    stored float scales — identical arithmetic to :func:`int8_topk`, but
    over Σ|probed cells| candidates instead of |corpus|.

    Result: (query_id, vec_id, dot_q, score, rnk), ties (score desc,
    vec_id asc), ranked by the same two-stage local/global reduction.
    """
    from whisper_pandas_spark.operators.similarity import ivf_assign, two_stage_topk

    def coded(assigned: DataFrame, ida: str, prefix: str) -> DataFrame:
        v = F.col("vec")
        scale = _vabs_max(v)
        return assigned.select(
            F.col("vec_id").alias(ida),
            F.col("cell"),
            _quantize(v, scale).alias(f"{prefix}_q"),
            scale.alias(f"{prefix}_scale"),
        )

    cells = coded(ivf_assign(corpus, centroids, 1, id_col, vec_col), "doc_id", "doc")
    probes = F.broadcast(
        coded(ivf_assign(queries, centroids, nprobe, id_col, vec_col), "qry_id", "qry")
    )
    dot_q = F.aggregate(
        F.zip_with(F.col("qry_q"), F.col("doc_q"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    score = F.round(
        F.col("dot_q").cast("double")
        * F.col("qry_scale")
        * F.col("doc_scale")
        / F.lit(Q_LEVELS * Q_LEVELS),
        6,
    )
    scored = (
        cells.join(probes, "cell")
        .filter(F.col("doc_id") != F.col("qry_id"))
        .withColumn("dot_q", dot_q)
        .select(
            F.col("qry_id").alias("query_id"),
            F.col("doc_id").alias("vec_id"),
            F.col("dot_q"),
            score.alias("score"),
        )
    )
    return two_stage_topk(scored, k, score_col="score", extra_cols=("dot_q",))


def int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-arithmetic quantized ANN: top-k by int8 dot product.

    Both sides are quantized once; the candidate score is the INTEGER
    code dot product rescaled by the two stored scales —
    ``score = (q_a · q_b) * scale_a * scale_b / 127²`` — an unbiased
    estimate of ⟨a, b⟩ whose heavy inner loop is pure BIGINT math (the
    SIMD-friendly layout every production int8 ANN uses). The per-pair
    work after the integer dot is two multiplies and a divide.

    Ranking is the same two-stage scale-safe reduction as
    :func:`whisper_pandas_spark.operators.similarity.topk_per_query`
    (local top-k per (query, input partition), then global top-k over
    the ≤ Q × partitions × k survivors — no per-query shuffle hotspot);
    ties break (score desc, vec_id). Result:
    (query_id, vec_id, dot_q, score, rnk).
    """
    from whisper_pandas_spark.operators.similarity import two_stage_topk

    def coded(df: DataFrame, idc: str, vecc: str, prefix: str) -> DataFrame:
        v = F.col(vecc)
        scale = _vabs_max(v)
        return df.select(
            F.col(idc).alias(f"{prefix}_id"),
            _quantize(v, scale).alias(f"{prefix}_q"),
            scale.alias(f"{prefix}_scale"),
        )

    q = F.broadcast(coded(queries, id_col, vec_col, "qry"))
    c = coded(corpus, id_col, vec_col, "doc")
    dot_q = F.aggregate(
        F.zip_with(F.col("qry_q"), F.col("doc_q"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    score = F.round(
        F.col("dot_q").cast("double")
        * F.col("qry_scale")
        * F.col("doc_scale")
        / F.lit(Q_LEVELS * Q_LEVELS),
        6,
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("doc_id") != F.col("qry_id"))
        .withColumn("dot_q", dot_q)
        .select(
            F.col("qry_id").alias("query_id"),
            F.col("doc_id").alias("vec_id"),
            F.col("dot_q"),
            score.alias("score"),
        )
    )
    return two_stage_topk(scored, k, score_col="score", extra_cols=("dot_q",))
