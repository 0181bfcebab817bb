"""Round-7 registry entries.

- sketch_kll_rollup       KLL bounded-error mergeable quantile sketches
                          (unknown value range), exact-regime oracle
- merge_schema_evolution  add-only MERGE schema evolution across two
                          change batches (null-backfill, then a second
                          added column + deletes)

Same conventions as every other queries_* module: each entry pairs a
Spark implementation with a DuckDB oracle that replays the algorithm
value-exactly at the driver's sf0.01 scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.registry import _table, register

# -- KLL mergeable quantile sketch tables ------------------------------------

_KQ_QS = (0.05, 0.5, 0.95, 0.99)
_KQ_K = 8192  # level-0 capacity; documents stays in the exact regime
# (no compaction) through sf0.1, so shard -> merge -> read-off must
# reproduce the true quantiles — value-checking the sketch PLUMBING the
# same way sketch_distinct_rollup checks HLL in its sparse regime. The
# compacting regime's O(1/k) rank-error bound is pytest-pinned
# (tests/test_extensions.py::test_kll_rank_error_bound_in_compacting_regime).


@register(
    "sketch_kll_rollup",
    oracle=f"""
WITH cnts AS (
  SELECT lang, n_chars AS v, count(*) AS c
  FROM documents GROUP BY lang, n_chars
), cum AS (
  SELECT lang, v,
         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM cnts
), qs AS (SELECT unnest([{", ".join(str(q) for q in _KQ_QS)}]) AS q)
SELECT lang, q,
       CAST(min(n) AS BIGINT) AS n,
       CAST(min(CASE WHEN cum >= ceil(q * n) THEN v END) AS DOUBLE)
         AS quantile
FROM cum CROSS JOIN qs
GROUP BY lang, q
ORDER BY lang, q
""",
)
def sketch_kll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: KLL quantile sketch tables (operators/sketches.py kll_*
    family, Karnin-Lang-Liberty 2016) — the bounded-error mergeable
    quantile state for UNKNOWN value ranges, complementing the exact
    fixed-bin hist_* family (which needs a known [lo, hi) and
    resolution). Per-(lang, shard) sketches over n_chars merge to
    per-lang state; quantiles read off the merged ladder JVM-side
    (smallest value whose cumulative weight reaches ceil(q*n) — the
    family's shared definition, which the oracle replays from raw
    data)."""
    from whisper_pandas_spark.operators.sketches import (
        kll_merge,
        kll_quantiles,
        kll_shard_sketches,
    )

    docs = _table(spark, sf_dir, "documents").withColumn(
        "__shard", F.pmod(F.col("doc_id"), F.lit(4))
    )
    shards = kll_shard_sketches(docs, ("lang", "__shard"), "n_chars", k=_KQ_K)
    merged = kll_merge(shards, ("lang",))
    return kll_quantiles(merged, ("lang",), _KQ_QS).orderBy("lang", "q")


# -- MERGE add-only schema evolution ------------------------------------------


@register(
    "merge_schema_evolution",
    oracle="""
WITH c1 AS (
  SELECT doc_id, text || ' [v2]' AS text, n_chars / 100.0 AS quality
  FROM documents WHERE doc_id % 5 = 0
), s1 AS (
  SELECT d.doc_id, d.text, CAST(NULL AS DOUBLE) AS quality FROM documents d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM c1)
  UNION ALL
  SELECT doc_id, text, quality FROM c1
), c2 AS (
  SELECT doc_id, text || ' [v3]' AS text, n_chars / 50.0 AS quality,
         CAST(2 AS INT) AS rev, false AS is_delete
  FROM documents WHERE doc_id % 11 = 0 AND doc_id % 97 <> 3
  UNION ALL
  SELECT doc_id, NULL, NULL, NULL, true
  FROM documents WHERE doc_id % 97 = 3
)
SELECT doc_id, text, round(quality, 6) AS quality, rev FROM (
  SELECT s.doc_id, s.text, s.quality, CAST(NULL AS INT) AS rev FROM s1 s
  WHERE s.doc_id NOT IN (SELECT doc_id FROM c2)
  UNION ALL
  SELECT doc_id, text, quality, rev FROM c2 WHERE NOT is_delete
) ORDER BY doc_id
""",
)
def merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y28+: add-only MERGE schema evolution (operators/merge.py) — the
    Delta/Iceberg ``mergeSchema`` contract on the plain copy-on-write
    MERGE. Batch 1 adds a typed ``quality`` column (every pre-existing
    row null-backfills); batch 2 adds ``rev`` on top AND deletes a key
    slice, proving evolved state keeps merging. The oracle replays both
    merges relationally (anti-join + union with explicit NULL casts)."""
    from whisper_pandas_spark.operators.merge import merge_changes

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    state0 = docs.select("doc_id", "text")
    c1 = docs.where(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        F.concat("text", F.lit(" [v2]")).alias("text"),
        (F.col("n_chars") / 100.0).alias("quality"),
    )
    state1 = merge_changes(state0, c1, "doc_id")
    upserts = docs.where(
        (F.col("doc_id") % 11 == 0) & (F.col("doc_id") % 97 != 3)
    ).select(
        "doc_id",
        F.concat("text", F.lit(" [v3]")).alias("text"),
        (F.col("n_chars") / 50.0).alias("quality"),
        F.lit(2).cast("int").alias("rev"),
        F.lit(False).alias("is_delete"),
    )
    deletes = docs.where(F.col("doc_id") % 97 == 3).select(
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("double").alias("quality"),
        F.lit(None).cast("int").alias("rev"),
        F.lit(True).alias("is_delete"),
    )
    final = merge_changes(
        state1, upserts.unionByName(deletes), "doc_id", "is_delete"
    )
    return final.select(
        "doc_id", "text", F.round("quality", 6).alias("quality"), "rev"
    ).orderBy("doc_id")
