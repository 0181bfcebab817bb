"""Lexical-diversity profiling: per-document token Shannon entropy,
type/token ratio, and Simpson repetition index.

Extension beyond the reference (whisper_pandas.py, a 299-line .wsp
decoder, has no text surface): token-distribution screens are the
information-theoretic cousins of the zlib compression-ratio gate
(operators/compratio.py) — low entropy / high Simpson = keyword-stuffed
or template text; entropy near log2(n) with TTR ~ 1 = unnatural
iid-noise text. Gopher/Dolma-class quality rule packs carry exactly
these statistics.

Cross-engine determinism (the pinned-log2 contract)
---------------------------------------------------
Everything before the final rounding is BIT-IDENTICAL between Spark
and DuckDB, by construction rather than by luck:

- all counts (token count ``c``, doc totals ``n``, type counts,
  ``sum(c^2)``) are exact integers;
- the only transcendental — log2 — is NEVER computed by either engine:
  both sides read the same pinned table of ``repr(math.log2(i))``
  literals for ``i in 1..LOG2_MAX`` (shortest-repr round trip is exact
  for IEEE doubles, so Spark and DuckDB parse the same bit patterns);
- each entropy term ``c * log2(c)`` is one exactly-rounded IEEE
  multiply of identical operands;
- the per-document term sum is a LEFT FOLD over the terms in sorted
  token order on both engines (Spark ``aggregate`` over
  ``sort_array(collect_list(struct(tok, term)))``, DuckDB
  ``list_reduce`` over ``list(term ORDER BY tok)``) — same addition
  sequence, same IEEE results — never a ``SUM()`` whose accumulation
  order the engine chooses;
- ``H = log2(n) - tsum / n`` and the TTR / Simpson ratios are single
  exactly-rounded divisions of identical operands.

Scale design
------------
One explode + two keyed exchanges: (doc, token) partial-agg count,
then the per-doc aggregation; the pinned log2 table (LOG2_MAX rows)
broadcasts. The fold lambda is a higher-order function (interpreted,
not codegen) but runs once per DISTINCT (doc, token) — bounded by doc
length, not corpus size — the same budget class as the winnowing
fingerprint fold. At 100 TB nothing here changes shape: the explode is
narrow, both exchanges are hash-partitioned on high-cardinality keys,
and the broadcast side is constant.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.functions.text import tokenize

# Pinned log2 domain. Documents in the fixture family top out at ~100
# tokens; 512 leaves 5x headroom and keeps the broadcast/VALUES table
# trivial. Docs beyond the domain are NEVER silently dropped: the
# lookups are LEFT joins, so an out-of-range count propagates NULL
# through the fold and the row surfaces with entropy NULL (identically
# on both engines) while the log2-free columns (n_tokens, n_types,
# ttr, simpson) stay fully computed — pinned by pytest with a
# 600-token document.
LOG2_MAX = 512


def log2_table() -> list[tuple[int, float]]:
    """(i, log2(i)) for 1..LOG2_MAX — the single source both engines
    read; the DuckDB twin interpolates repr() of these same floats."""
    return [(i, math.log2(i)) for i in range(1, LOG2_MAX + 1)]


def log2_values_sql() -> str:
    """DuckDB VALUES body pinning the identical doubles."""
    return ",".join(f"({i},{v!r})" for i, v in log2_table())


def token_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_types, entropy, ttr, simpson) per document.

    entropy = log2(n) - (1/n) * sum_t c_t*log2(c_t)   [bits/token]
    ttr     = n_types / n_tokens                      [type/token ratio]
    simpson = sum_t c_t^2 / n^2                       [repeat-draw prob]

    All three rounded to 6 with the +1e-9 half-ulp bias (the
    rollup-family precedent); everything upstream of the rounding is
    bit-identical cross-engine per the module contract. Documents
    whose token counts exceed LOG2_MAX keep their row — entropy comes
    back NULL (left-join + NULL-propagating fold, same on both
    engines); ttr/simpson need no log2 and stay exact.
    """
    spark = SparkSession.getActiveSession() or df.sparkSession
    lut = F.broadcast(
        spark.createDataFrame(log2_table(), "i int, l2 double")
    )

    toks = (
        df.select(F.col(id_col).alias("doc"), tokenize(text_col).alias("t"))
        .select("doc", F.explode("t").alias("tok"))
        .filter(F.col("tok") != "")
    )
    counts = toks.groupBy("doc", "tok").agg(
        F.count(F.lit(1)).cast("int").alias("c")
    )
    terms = counts.join(lut, counts["c"] == lut["i"], "left").select(
        "doc",
        "tok",
        "c",
        (F.col("c").cast("double") * F.col("l2")).alias("term"),
    )
    agg = terms.groupBy("doc").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.col("c").cast("bigint") * F.col("c")).alias("c2"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("tok", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("tsum"),
    )
    n_dbl = F.col("n_tokens").cast("double")
    out = agg.join(lut, agg["n_tokens"] == lut["i"], "left").select(
        F.col("doc").alias(id_col),
        "n_tokens",
        "n_types",
        F.round(
            F.col("l2") - F.col("tsum") / n_dbl + F.lit(1e-9), 6
        ).alias("entropy"),
        F.round(
            F.col("n_types").cast("double") / n_dbl + F.lit(1e-9), 6
        ).alias("ttr"),
        F.round(
            F.col("c2").cast("double") / (n_dbl * n_dbl) + F.lit(1e-9), 6
        ).alias("simpson"),
    )
    return out
