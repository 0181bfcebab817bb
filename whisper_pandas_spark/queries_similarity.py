"""Registry entries: similarity search over `embeddings` (X3).

Float-parity design: every cosine on BOTH engines is computed as the same
left fold over the same element order with the same double casts
(Spark ``aggregate(zip_with(...))`` ≡ DuckDB
``list_reduce(list_prepend(0.0, list_transform(...)))``), so results are
bit-identical, not merely close — `round(..., 6)` is then safe on both
sides. We deliberately do NOT use DuckDB's `list_cosine_similarity`
(different internal summation order ⇒ last-ulp drift ⇒ hash mismatches).

- sim_topk_bruteforce : exact top-k; broadcast query side, corpus never
  shuffles; window rank per query with deterministic tie-break.
- sim_topk_lsh        : hyperplane-LSH bucketed ANN; oracle replicates the
  same deterministic hyperplanes (literal doubles shared via repr →
  exact parse on both engines).
- sim_near_dup_pairs  : label-blocked near-dup pairs (the embedding
  analogue of dedup_ngram_jaccard's blocking strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.operators.similarity import (
    _hyperplane,
    cosine_topk,
    cosine_topk_lsh,
)

# ALL module constants live ABOVE the registry import: importing registry
# triggers the staged-module promotion chain (registry -> queries_round6),
# and queries_round6's oracle builders read DIM/KM_K/KM_ITERS back from
# this (then only partially initialized) module at import time.  With the
# constants bound first, either import order is safe; with them below,
# `import whisper_pandas_spark.queries_similarity` standalone raises
# ImportError (the test_extensions.py standalone-run failure).
DIM = 64
K = 10
N_PLANES = 8
NEAR_DUP_T = 0.3
N_TABLES = 16
N_PLANES_MULTI = 3
IVF_K_CENTROIDS = 16
IVF_NPROBE = 4
KM_K = 8
KM_ITERS = 2

from whisper_pandas_spark.functions.duck import (  # noqa: E402
    duck_cos as _duck_cos,
    duck_dot as _duck_dot,
    duck_norm as _duck_norm,
)


def _kmeans_iter_sql(prev: str, idx: int) -> str:
    """One Lloyd iteration as CTE blocks: assignment (argmax cosine, ties
    by cid) then exact-decimal element-wise mean — the same arithmetic the
    Spark trainer runs (operators/kmeans.py).  Defined above the registry
    import because queries_round6's oracle builders call it through the
    partially initialized module during the promotion chain."""
    return f"""asg{idx} AS (
  SELECT e.vec_id, e.embedding AS vec, c.cid,
         {_duck_cos("e.embedding", "c.centroid")} AS ccos
  FROM embeddings e CROSS JOIN {prev} c
), cell{idx} AS (
  SELECT vec_id, vec, cid AS cell FROM (
    SELECT vec_id, vec, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cid) AS rn
    FROM asg{idx}
  ) WHERE rn = 1
), mean{idx} AS (
  SELECT cell, r.range AS pos,
         CAST(sum(CAST(CAST(vec[r.range + 1] AS DOUBLE) AS DECIMAL(38,12)))
              AS DOUBLE) / count(*) AS mval
  FROM cell{idx}, range(0, {DIM}) r
  GROUP BY cell, r.range
), cent{idx} AS (
  SELECT cell AS cid, list(mval ORDER BY pos) AS centroid
  FROM mean{idx} GROUP BY cell
)"""


from whisper_pandas_spark.registry import _table, register  # noqa: E402


def _duck_plane_literal(plane: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"


def _duck_bucket(vec: str, planes: list[list[float]]) -> str:
    bits = []
    for p, plane in enumerate(planes):
        dot = (
            f"list_reduce(list_prepend(0.0, list_transform(range(1, len({vec})+1), "
            f"i -> {vec}[i]::DOUBLE * ({_duck_plane_literal(plane)})[i])), "
            f"(x, y) -> x + y)"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {2 ** p}::BIGINT ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


@register(
    "sim_topk_bruteforce",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, embedding AS cvec FROM embeddings
), scored AS (
  SELECT q.query_id, c.vec_id,
         round({_duck_cos("qvec", "cvec")}, 6) AS cos_sim
  FROM c CROSS JOIN q
  WHERE c.vec_id != q.query_id
), ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rnk
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rnk
FROM ranked WHERE rnk <= {K}
ORDER BY query_id, rnk
""",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 baseline: exact cosine top-{K} for 5 query vectors. Query side is
    broadcast; corpus stays map-side until the tiny per-query window."""
    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, q, K).orderBy("query_id", "rnk")


def _lsh_oracle() -> str:
    planes = [_hyperplane(0, p, DIM) for p in range(N_PLANES)]
    return f"""
WITH c AS (
  SELECT vec_id, embedding AS cvec,
         {_duck_bucket("embedding", planes)} AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS qvec,
         {_duck_bucket("embedding", planes)} AS bucket
  FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, c.vec_id,
         round({_duck_cos("qvec", "cvec")}, 6) AS cos_sim
  FROM c JOIN q USING (bucket)
  WHERE c.vec_id != q.query_id
), ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rnk
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rnk
FROM ranked WHERE rnk <= {K}
ORDER BY query_id, rnk
"""


@register("sim_topk_lsh", oracle=_lsh_oracle())
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path: random-hyperplane LSH bucket match then exact
    re-rank — candidate work is O(|bucket|) per query, not O(|corpus|).
    Deterministic md5-derived hyperplanes, replicated in the oracle."""
    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return cosine_topk_lsh(emb, q, K, DIM, N_PLANES).orderBy("query_id", "rnk")


@register(
    "sim_near_dup_pairs",
    oracle=f"""
SELECT a.vec_id AS vec_i, b.vec_id AS vec_j,
       round({_duck_cos("a.embedding", "b.embedding")}, 6) AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round({_duck_cos("a.embedding", "b.embedding")}, 6) >= {NEAR_DUP_T}
ORDER BY vec_i, vec_j
""",
)
def _near_dup_pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from whisper_pandas_spark.operators.similarity import cosine_with_norms, norm

    emb = _table(spark, sf_dir, "embeddings").select(
        "label", "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    a = emb.select(
        F.col("label").alias("label"),
        F.col("vec_id").alias("vec_i"),
        F.col("embedding").alias("e_i"),
        F.col("nrm").alias("n_i"),
    )
    b = emb.select(
        F.col("label").alias("label"),
        F.col("vec_id").alias("vec_j"),
        F.col("embedding").alias("e_j"),
        F.col("nrm").alias("n_j"),
    )
    sim = F.round(
        cosine_with_norms(F.col("e_i"), F.col("e_j"), F.col("n_i"), F.col("n_j")), 6
    )
    return (
        a.join(b, "label")
        .filter(F.col("vec_i") < F.col("vec_j"))
        .select("vec_i", "vec_j", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= NEAR_DUP_T)
    )


def sim_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/X2 hybrid: embedding-cosine near-dup pairs blocked by label
    (cluster prior). Equi-join on the blocking key keeps the pair count
    Σ n_label² instead of n²; at 100 TB the blocking key would be an LSH
    bucket (sim_topk_lsh's) — identical join shape."""
    return _near_dup_pairs_df(spark, sf_dir).orderBy("vec_i", "vec_j")


@register(
    "sim_components",
    oracle=f"""
WITH RECURSIVE sim_pairs AS (
  SELECT a.vec_id AS vec_i, b.vec_id AS vec_j
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE round({_duck_cos("a.embedding", "b.embedding")}, 6) >= {NEAR_DUP_T}
), edges AS (
  SELECT vec_i AS a, vec_j AS b FROM sim_pairs
  UNION
  SELECT vec_j AS a, vec_i AS b FROM sim_pairs
), reach AS (
  SELECT a AS node, a AS comp FROM edges
  UNION
  SELECT e.b AS node, r.comp FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node AS vec_id, min(comp) AS component
FROM reach GROUP BY node ORDER BY vec_id
""",
)
def sim_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clustering operator is family-generic: the same min-label
    propagation (operators/components.py) that clusters MinHash text
    pairs clusters embedding-cosine pairs — semantic dedup groups over
    the `embeddings` table. Independent recursive-closure oracle."""
    from whisper_pandas_spark.operators.components import connected_components

    comp = connected_components(
        _near_dup_pairs_df(spark, sf_dir), src="vec_i", dst="vec_j"
    )
    return comp.select(
        F.col("node").alias("vec_id"), F.col("comp").alias("component")
    ).orderBy("vec_id"
    )


# Multi-table geometry is a recall/candidate-count dial: planes/table b
# sets per-table collision prob p^b, tables K sets recall 1-(1-p^b)^K.
# The test embeddings are near-random (top-10 cosine ~0.3 => p ~0.6), so
# b=3, K=16 is what reaches >=0.9 recall HERE (asserted in
# test_extensions.py); at 1 B clustered vectors p rises toward 1 for true
# neighbors and b grows with ln(n) while K stays O(10) — same operator,
# different dial settings (SCALE.md).  (N_TABLES / N_PLANES_MULTI are
# bound in the top constants block, above the registry import.)


def _lsh_multi_oracle() -> str:
    conds = []
    for t in range(N_TABLES):
        planes = [_hyperplane(t, p, DIM) for p in range(N_PLANES_MULTI)]
        conds.append(
            f"{_duck_bucket('c.embedding', planes)} = {_duck_bucket('qx.embedding', planes)}"
        )
    any_table = " OR ".join(conds)
    return f"""
WITH qx AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5
), cand AS (
  SELECT DISTINCT qx.vec_id AS query_id, qx.embedding AS qvec,
                  c.vec_id, c.embedding AS cvec
  FROM embeddings c JOIN qx ON ({any_table})
  WHERE c.vec_id != qx.vec_id
), scored AS (
  SELECT query_id, vec_id,
         round({_duck_cos("qvec", "cvec")}, 6) AS cos_sim
  FROM cand
), ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rnk
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rnk
FROM ranked WHERE rnk <= {K}
ORDER BY query_id, rnk
"""


@register("sim_topk_lsh_multi", oracle=_lsh_multi_oracle())
def sim_topk_lsh_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 recall fix for billion-vector scale: {N_TABLES} independent
    hyperplane tables, candidates = bucket match in ANY table, exact
    re-rank once per distinct pair. Spark side realizes the union of K
    bucketed joins as ONE hash join on a composite (table, bucket) key
    (operators/similarity.py:cosine_topk_lsh_multi); recall vs the
    bruteforce ground truth is asserted >= 0.9 in tests."""
    from whisper_pandas_spark.operators.similarity import cosine_topk_lsh_multi

    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return cosine_topk_lsh_multi(emb, q, K, DIM, N_TABLES, N_PLANES_MULTI).orderBy(
        "query_id", "rnk"
    )


def _lsh_near_dup_oracle() -> str:
    planes = [_hyperplane(0, p, DIM) for p in range(N_PLANES)]
    return f"""
WITH b AS (
  SELECT vec_id, label, embedding,
         {_duck_bucket("embedding", planes)} AS bucket
  FROM embeddings
)
SELECT a.vec_id AS vec_i, x.vec_id AS vec_j,
       round({_duck_cos("a.embedding", "x.embedding")}, 6) AS cos_sim
FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id < x.vec_id
WHERE round({_duck_cos("a.embedding", "x.embedding")}, 6) >= {NEAR_DUP_T}
ORDER BY vec_i, vec_j
"""


@register("sim_near_dup_lsh", oracle=_lsh_near_dup_oracle())
def sim_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3: embedding near-dup pairs blocked by the SAME hyperplane-LSH
    bucket (sign pattern agreement) instead of a label — the blocking key
    that exists at 100 TB when no labels do. Same-bucket candidates get
    the exact cosine; recall trades against bucket density via N_PLANES."""
    from whisper_pandas_spark.operators.similarity import _hyperplane, lsh_bucket

    from whisper_pandas_spark.operators.similarity import cosine_with_norms, norm

    planes = [_hyperplane(0, p, DIM) for p in range(N_PLANES)]
    emb = _table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        lsh_bucket(F.col("embedding"), planes).alias("bucket"),
        norm(F.col("embedding")).alias("nrm"),
    )
    a = emb.select(
        F.col("bucket").alias("bucket"),
        F.col("vec_id").alias("vec_i"),
        F.col("embedding").alias("e_i"),
        F.col("nrm").alias("n_i"),
    )
    b = emb.select(
        F.col("bucket").alias("bucket"),
        F.col("vec_id").alias("vec_j"),
        F.col("embedding").alias("e_j"),
        F.col("nrm").alias("n_j"),
    )
    sim = F.round(
        cosine_with_norms(F.col("e_i"), F.col("e_j"), F.col("n_i"), F.col("n_j")), 6
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_i") < F.col("vec_j"))
        .select("vec_i", "vec_j", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= NEAR_DUP_T)
        .orderBy("vec_i", "vec_j")
    )


def _ivf_oracle() -> str:
    """Full IVF replication: centroid assignment (argmin by cosine, ties
    by centroid id), nprobe=4 query probes, exact re-rank in probed
    cells. Same fold arithmetic as the Spark side."""
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS centroid FROM embeddings WHERE vec_id < 16
), corpus_scored AS (
  SELECT e.vec_id, e.embedding AS cvec, c.cid,
         {_duck_cos("e.embedding", "c.centroid")} AS ccos
  FROM embeddings e CROSS JOIN cent c
), cells AS (
  SELECT vec_id, cvec, cid AS cell FROM (
    SELECT vec_id, cvec, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cid) AS rn
    FROM corpus_scored
  ) WHERE rn = 1
), query_scored AS (
  SELECT e.vec_id AS query_id, e.embedding AS qvec, c.cid,
         {_duck_cos("e.embedding", "c.centroid")} AS ccos
  FROM embeddings e CROSS JOIN cent c
  WHERE e.vec_id < 5
), probes AS (
  SELECT query_id, qvec, cid AS cell FROM (
    SELECT query_id, qvec, cid,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ccos DESC, cid) AS rn
    FROM query_scored
  ) WHERE rn <= {IVF_NPROBE}
), cand AS (
  SELECT p.query_id, s.vec_id,
         round({_duck_cos("p.qvec", "s.cvec")}, 6) AS cos_sim
  FROM cells s JOIN probes p USING (cell)
  WHERE s.vec_id != p.query_id
), ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rnk
  FROM cand
)
SELECT query_id, vec_id, cos_sim, rnk
FROM ranked WHERE rnk <= {K}
ORDER BY query_id, rnk
"""


@register("sim_topk_ivf", oracle=_ivf_oracle())
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path #2: IVF-flat ANN — coarse-quantize into 16 cells
    (codebook = first 16 corpus vectors, standing in for an offline
    k-means codebook), probe 4 cells per query, exact re-rank inside.
    Candidate work ≈ nprobe·N/K per query; cell join is a hash equi-join
    on an int key (the data-adaptive sibling of sim_topk_lsh)."""
    from whisper_pandas_spark.operators.similarity import cosine_topk_ivf

    emb = _table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < IVF_K_CENTROIDS)
    q = emb.filter(F.col("vec_id") < 5)
    return cosine_topk_ivf(emb, q, K, cent, IVF_NPROBE).orderBy("query_id", "rnk")


def _ivf_trained_oracle() -> str:
    iter_blocks = ",\n".join(
        _kmeans_iter_sql(f"cent{i}" if i else "cent0", i + 1)
        for i in range(KM_ITERS)
    )
    return f"""
WITH init AS (
  SELECT vec_id, embedding, md5('0:' || vec_id) AS h
  FROM embeddings ORDER BY h LIMIT {KM_K}
), cent0 AS (
  SELECT row_number() OVER (ORDER BY h) - 1 AS cid,
         embedding::DOUBLE[] AS centroid
  FROM init
),
{iter_blocks},
corpus_scored AS (
  SELECT e.vec_id, e.embedding AS cvec, c.cid,
         {_duck_cos("e.embedding", "c.centroid")} AS ccos
  FROM embeddings e CROSS JOIN cent{KM_ITERS} c
), cells AS (
  SELECT vec_id, cvec, cid AS cell FROM (
    SELECT vec_id, cvec, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cid) AS rn
    FROM corpus_scored
  ) WHERE rn = 1
), query_scored AS (
  SELECT e.vec_id AS query_id, e.embedding AS qvec, c.cid,
         {_duck_cos("e.embedding", "c.centroid")} AS ccos
  FROM embeddings e CROSS JOIN cent{KM_ITERS} c
  WHERE e.vec_id < 5
), probes AS (
  SELECT query_id, qvec, cid AS cell FROM (
    SELECT query_id, qvec, cid,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ccos DESC, cid) AS rn
    FROM query_scored
  ) WHERE rn <= {IVF_NPROBE}
), cand AS (
  SELECT p.query_id, s.vec_id,
         round({_duck_cos("p.qvec", "s.cvec")}, 6) AS cos_sim
  FROM cells s JOIN probes p USING (cell)
  WHERE s.vec_id != p.query_id
), ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rnk
  FROM cand
)
SELECT query_id, vec_id, cos_sim, rnk
FROM ranked WHERE rnk <= {K}
ORDER BY query_id, rnk
"""


@register("sim_topk_ivf_trained", oracle=_ivf_trained_oracle())
def sim_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: the IVF ANN path made self-contained — the codebook comes from
    the deterministic distributed k-means trainer (operators/kmeans.py:
    md5-seeded init, 2 Lloyd iterations, exact-decimal means) instead of
    a caller-supplied centroid set. Same probe/re-rank machinery as
    sim_topk_ivf. Uses the trainer's DEFAULT per-iteration lineage
    checkpoint, so the downstream plan holds one iteration's operators
    plus a LogicalRDD scan of the k-row codebook — constant in iters
    (the production iterative-training shape; the unbounded single-tree
    twin is the labelled baseline sim_topk_ivf_single_tree)."""
    from whisper_pandas_spark.operators.kmeans import kmeans_cosine
    from whisper_pandas_spark.operators.similarity import cosine_topk_ivf

    emb = _table(spark, sf_dir, "embeddings")
    cent = kmeans_cosine(emb, KM_K, KM_ITERS, seed=0).select(
        F.col("cid").alias("vec_id"), F.col("embedding")
    )
    q = emb.filter(F.col("vec_id") < 5)
    return cosine_topk_ivf(emb, q, K, cent, IVF_NPROBE).orderBy("query_id", "rnk")


@register("sim_topk_ivf_single_tree", oracle=_ivf_trained_oracle())
def sim_topk_ivf_single_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 BASELINE: sim_topk_ivf_trained with checkpoint=False — the
    KM_ITERS Lloyd iterations compound into ONE plan tree (r3 measured 17
    exchanges vs 5 checkpointed), scanning the corpus once per iteration.
    Kept as the explicitly-labelled single-tree baseline: same oracle as
    the default path, so the driver re-proves the two trainers are
    bit-identical every round (also asserted in tests/test_extensions.py).
    Not a production shape — use the default."""
    from whisper_pandas_spark.operators.kmeans import kmeans_cosine
    from whisper_pandas_spark.operators.similarity import cosine_topk_ivf

    emb = _table(spark, sf_dir, "embeddings")
    cent = kmeans_cosine(emb, KM_K, KM_ITERS, seed=0, checkpoint=False).select(
        F.col("cid").alias("vec_id"), F.col("embedding")
    )
    q = emb.filter(F.col("vec_id") < 5)
    return cosine_topk_ivf(emb, q, K, cent, IVF_NPROBE).orderBy("query_id", "rnk")
