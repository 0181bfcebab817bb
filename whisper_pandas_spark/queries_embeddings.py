"""Registry entries: int8 embedding quantization + quantized ANN (X3+).

Wires `operators/embeddings.py` into the driver-checkable surface — the
storage/bandwidth lever for 100 TB vector corpora (4× smaller payloads,
integer-dot candidate scoring).

Parity design (mirrors the contract stated in operators/embeddings.py):

- scale = max(|v_i|) is a comparison-only fold — order-independent and
  bit-identical on Spark and DuckDB;
- codes  q_i = floor(v_i / scale * 127 + 0.5), evaluated left-to-right
  with the same double casts on both engines (floor(x+0.5), NOT round():
  round's half-up vs half-even differs across engines);
- every integer sum/dot is a left fold over BIGINT — exact, no float
  summation-order hazard (and no DuckDB HUGEINT widening, which a sum()
  aggregate would introduce);
- floats leave the operator only as micro-quantized integers
  (floor(x*1e6)) or round(x, 6) doubles, same as the sim_* family.

Reference parity: the reference engine (whisper_pandas.py, 299 lines) has
no vector surface; this family is part of the engine's own LLM-pipeline
bar (SURVEY.md §2.10 X3 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.operators.embeddings import int8_topk, quantize_int8
from whisper_pandas_spark.registry import _table, register

K = 10

# DuckDB fragments replicating the Spark-side arithmetic exactly.

_SCALE = (
    "list_reduce(list_prepend(0.0, list_transform({v}, x -> abs(x::DOUBLE))), "
    "(a, b) -> greatest(a, b))"
)

_CODES = (
    "list_transform({v}, x -> CASE WHEN {s} = 0.0 THEN 0::BIGINT "
    "ELSE CAST(floor(x::DOUBLE / {s} * 127.0 + 0.5) AS BIGINT) END)"
)


def _duck_scale(v: str) -> str:
    return _SCALE.format(v=v)


def _duck_codes(v: str, s: str) -> str:
    return _CODES.format(v=v, s=s)


def _duck_isum(lst: str) -> str:
    """Exact BIGINT left-fold sum (no sum() aggregate ⇒ no HUGEINT)."""
    return f"CAST(list_reduce(list_prepend(0::BIGINT, {lst}), (a, x) -> a + x) AS BIGINT)"


def _duck_fold_max(lst: str) -> str:
    return f"list_reduce(list_prepend(0.0, {lst}), (a, x) -> greatest(a, x))"


@register(
    "emb_quantize_int8",
    oracle=f"""
WITH s AS (
  SELECT vec_id, embedding,
         {_duck_scale("embedding")} AS scale
  FROM embeddings
), qz AS (
  SELECT vec_id, embedding, scale,
         {_duck_codes("embedding", "scale")} AS q
  FROM s
)
SELECT vec_id,
       CAST(floor(scale * 1000000.0) AS BIGINT) AS scale_micro,
       {_duck_isum("q")} AS sum_q,
       {_duck_isum("list_transform(q, x -> abs(x))")} AS l1_q,
       CAST(floor({_duck_fold_max(
           "list_transform(range(1, len(embedding)+1), "
           "i -> abs(embedding[i]::DOUBLE - q[i]::DOUBLE * scale / 127.0))"
       )} * 1000000.0) AS BIGINT) AS err_micro_max
FROM qz
ORDER BY vec_id
""",
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+: per-vector symmetric int8 quantization with reconstruction
    audit (operators/embeddings.py:53-90). Scan-shaped — one projection,
    zero shuffles; scales linearly with corpus size."""
    emb = _table(spark, sf_dir, "embeddings")
    return quantize_int8(emb, "vec_id", "embedding").orderBy("vec_id")


@register(
    "emb_int8_topk",
    oracle=f"""
WITH coded AS (
  SELECT vec_id,
         {_duck_scale("embedding")} AS scale,
         {_duck_codes("embedding", _duck_scale("embedding"))} AS q
  FROM embeddings
), doc AS (
  SELECT vec_id AS doc_id, scale AS doc_scale, q AS doc_q FROM coded
), qry AS (
  SELECT vec_id AS qry_id, scale AS qry_scale, q AS qry_q
  FROM coded WHERE vec_id < 5
), scored AS (
  SELECT qry_id AS query_id, doc_id AS vec_id,
         {_duck_isum(
             "list_transform(range(1, len(doc_q)+1), i -> qry_q[i] * doc_q[i])"
         )} AS dot_q,
         qry_scale, doc_scale
  FROM doc CROSS JOIN qry
  WHERE doc_id != qry_id
), rescored AS (
  SELECT query_id, vec_id, dot_q,
         round(dot_q::DOUBLE * qry_scale * doc_scale / 16129.0, 6) AS score
  FROM scored
), ranked AS (
  SELECT query_id, vec_id, dot_q, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) AS rnk
  FROM rescored
)
SELECT query_id, vec_id, dot_q, score, rnk
FROM ranked WHERE rnk <= {K}
ORDER BY query_id, rnk
""",
)
def emb_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+: quantized ANN — top-{K} by exact INTEGER code dot product,
    rescaled by the two stored float scales (operators/embeddings.py:
    93-164). Query side broadcast, two-stage local/global rank — the same
    scale-safe reduction as sim_topk_bruteforce, but the hot inner loop
    is pure BIGINT math."""
    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return int8_topk(emb, q, K).orderBy("query_id", "rnk")


IVF_K_CENTROIDS = 16
IVF_NPROBE = 4


def _ivf_sq8_oracle() -> str:
    from whisper_pandas_spark.functions.duck import duck_cos as _duck_cos

    dot = _duck_isum(
        "list_transform(range(1, len(doc_q)+1), i -> qry_q[i] * doc_q[i])"
    )
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS centroid FROM embeddings
  WHERE vec_id < {IVF_K_CENTROIDS}
), corpus_scored AS (
  SELECT e.vec_id, e.embedding AS v, c.cid,
         {_duck_cos("e.embedding", "c.centroid")} AS ccos
  FROM embeddings e CROSS JOIN cent c
), cells AS (
  SELECT vec_id AS doc_id, cid AS cell,
         {_duck_scale("v")} AS doc_scale,
         {_duck_codes("v", _duck_scale("v"))} AS doc_q
  FROM (
    SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cid) AS rn
    FROM corpus_scored
  ) WHERE rn = 1
), query_scored AS (
  SELECT e.vec_id, e.embedding AS v, c.cid,
         {_duck_cos("e.embedding", "c.centroid")} AS ccos
  FROM embeddings e CROSS JOIN cent c
  WHERE e.vec_id < 5
), probes AS (
  SELECT vec_id AS qry_id, cid AS cell,
         {_duck_scale("v")} AS qry_scale,
         {_duck_codes("v", _duck_scale("v"))} AS qry_q
  FROM (
    SELECT vec_id, v, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cid) AS rn
    FROM query_scored
  ) WHERE rn <= {IVF_NPROBE}
), cand AS (
  SELECT p.qry_id AS query_id, s.doc_id AS vec_id,
         {dot} AS dot_q,
         p.qry_scale, s.doc_scale
  FROM cells s JOIN probes p USING (cell)
  WHERE s.doc_id != p.qry_id
), rescored AS (
  SELECT query_id, vec_id, dot_q,
         round(dot_q::DOUBLE * qry_scale * doc_scale / 16129.0, 6) AS score
  FROM cand
), ranked AS (
  SELECT query_id, vec_id, dot_q, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) AS rnk
  FROM rescored
)
SELECT query_id, vec_id, dot_q, score, rnk
FROM ranked WHERE rnk <= {K}
ORDER BY query_id, rnk
"""


@register("emb_int8_ivf_topk", oracle=_ivf_sq8_oracle())
def emb_int8_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+: IVF + SQ8 — the production billion-scale ANN composition
    (operators/embeddings.py:int8_topk_ivf). Coarse cells bound WHICH
    pairs score (nprobe={IVF_NPROBE} of {IVF_K_CENTROIDS} cells), int8
    codes bound WHAT each comparison costs (BIGINT dot + one rescale)."""
    from whisper_pandas_spark.operators.embeddings import int8_topk_ivf

    emb = _table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < IVF_K_CENTROIDS)
    q = emb.filter(F.col("vec_id") < 5)
    return int8_topk_ivf(emb, q, K, cent, IVF_NPROBE).orderBy("query_id", "rnk")
