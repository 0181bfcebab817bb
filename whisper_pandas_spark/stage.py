"""Stage-boundary materialization: one helper for every multi-consumer
funnel stage (VERDICT r13 #7).

``localCheckpoint(eager=True)`` is the engine's standard answer to
shared lineage (N downstream consumers would otherwise each re-run the
whole upstream subtree — the curation funnel measured 64 redundant
fixture scans without its three barriers). But localCheckpoint blocks
live on EXECUTOR-LOCAL storage: correct in local mode and on healthy
clusters, lost with an executor — a long multi-stage funnel on a 1000-
executor cluster should not be one preemption away from recompute-
from-nothing failure.

:func:`stage_materialize` keeps one call site and picks the binding:

- if the SparkContext has a RELIABLE checkpoint directory configured
  (``spark.sparkContext.setCheckpointDir('hdfs://...')`` — the one-line
  cluster deployment step), stages checkpoint THERE:
  ``df.checkpoint(eager=True)`` writes replicated files that survive
  executor loss and driver GC of the RDD graph;
- otherwise it falls back to ``localCheckpoint(eager=True)`` — the
  local-mode / quick-job binding.

The third pattern (an explicit intermediate parquet write + re-read,
operators/merge.py's versioned-state layout) remains the right call
when the stage output is ALSO a product the pipeline wants to keep;
the funnels' barriers are pure plan-sharing, so checkpointing is the
cheaper fit. SCALE.md "Funnel stage boundaries" carries the 100 TB
narrative; tests/test_round14.py proves the funnel bit-identical under
a fresh default-config session with a reliable checkpoint dir set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stage_materialize(df: DataFrame) -> DataFrame:
    """Materialize a multi-consumer stage boundary once — reliable
    checkpoint when a checkpoint dir is configured, localCheckpoint
    otherwise. Eager in both bindings, so the stage runs exactly once
    at the call site."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
