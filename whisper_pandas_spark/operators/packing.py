"""Sequence packing — grouping documents into fixed token-budget bins
(the training-data step that turns a deduped corpus into ~budget-token
concatenated training sequences).

Deterministic contiguous packing: within each (block, shard), documents
in stable id order accumulate tokens; a document is assigned to the bin
in effect when it STARTS (``bin = floor(prev_cumulative / budget)``), so
bins can overflow by at most one document — the standard
concatenate-then-truncate regime. The rule is a single window cumsum,
expressible identically in any SQL engine (oracle-able), and — unlike
best-fit/first-fit heuristics — independent of partitioning.

Scale: packing is inherently sequential per block, so the corpus is
sharded first — ``shard = md5_bucket(id) % n_shards`` (the same
engine-portable hash as operators/sampling.py). Each (block, shard) is
one window partition: n_shards × #blocks independent sequential scans,
sized so one shard's documents fit a partition. At 100 B docs with
n_shards ≈ 100 k the window state is one running sum per partition —
no skew surface beyond block imbalance, which the shard count absorbs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisper_pandas_spark.operators.sampling import hash_bucket


def pack_bins(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    block_col: str,
    budget: int,
    n_shards: int = 1,
    seed: int = 0,
) -> DataFrame:
    """Assign each document a packing bin.

    Returns the input columns plus ``shard``, ``n_tok`` and ``bin_id``
    (bin ids are per (block, shard), 0-based).
    """
    shard = F.pmod(hash_bucket(F.col(id_col), seed), F.lit(n_shards)).cast("int")
    out = df.withColumn("n_tok", token_count).withColumn("shard", shard)
    w = (
        Window.partitionBy(block_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return out.withColumn("bin_id", F.floor(prev / budget).cast("bigint"))
