"""Connected components over near-duplicate pairs + canonical selection.

Pair emission (MinHash-LSH / SimHash / n-gram — operators/dedup.py) is
only HALF of corpus dedup: pairs chain (A~B, B~C), so the pipeline must
cluster them transitively and keep one canonical document per cluster.
The reference has no dedup surface at all (it is a single-file decoder);
this is the engine's own 100 TB bar.

Algorithm: min-label propagation to a fixpoint. Every node starts
labeled with itself; each round, every node takes the min label among
itself and its neighbors. Converges in O(cluster diameter) rounds —
near-dup graphs are clique-ish (diameter 2-3 in practice) because pair
emission is threshold-based, so a handful of rounds suffices even for
billion-doc corpora.

Scale properties:
- each round is one edges⋈labels join + one min-groupBy — two shuffles
  on node id, both uniform (doc ids), no skew;
- the frame a round touches is one row per node IN SOME PAIR (the
  near-dup minority, not the corpus);
- lineage is truncated per round with an eager localCheckpoint (the
  cluster-scale twin is a parquet checkpoint per round);
- the convergence probe is a scalar changed-row count per round — an
  aggregate action, not a collect;
- ``max_iters`` bounds pathological chains (a path graph of length L
  needs ~log L doubling rounds more than a clique; 25 covers any
  realistic near-dup topology).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_i",
    dst: str = "doc_j",
    max_iters: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in *pairs*; component =
    the smallest node id reachable through the pair graph (deterministic
    under any partitioning)."""
    e = pairs.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    edges = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        prop = edges.join(
            labels.select(F.col("node").alias("a"), "comp"), "a"
        ).select(F.col("b").alias("node"), "comp")
        new = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.select("node", F.col("comp").alias("c_new"))
            .join(labels.select("node", F.col("comp").alias("c_old")), "node")
            .filter(F.col("c_new") != F.col("c_old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    edges.unpersist()
    return labels


def canonical_filter(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_i",
    dst: str = "doc_j",
) -> DataFrame:
    """Drop every non-canonical near-duplicate from *df*: each pair
    cluster keeps only its min-id member; rows in no pair pass through
    untouched. One left-anti join against the (small) drop list."""
    comp = connected_components(pairs, src=src, dst=dst)
    drop = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")
