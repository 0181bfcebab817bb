"""Stream-stream interval join (§2.9 × §2.5, beyond reference parity).

Correlating two live event streams within a time window — alerts against
deploys, trades against quotes, errors against releases — is the
streaming twin of :func:`~whisper_pandas_spark.operators.asof.range_join`.
Spark's stream-stream inner join buffers both sides in state; the two
ingredients that make that state BOUNDED (and that this wrapper
enforces) are:

- a watermark on BOTH sides, so late rows stop counting against state;
- a time-RANGE join condition, so Spark can evict a buffered row as soon
  as the other side's watermark passes its last possible match — state
  per key is (watermark + interval width) worth of rows, independent of
  stream age.

At scale the join state shuffles on the key like any equi-join; skewed
keys split with AQE where applicable, and the interval width is the
state-size dial (same role as `chunk_points` in the whisper scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int = 0,
    upper_seconds: int = 60,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner-join rows of two streams sharing *on* where
    ``right_ts ∈ [left_ts + lower, left_ts + upper]``.

    *left_ts* / *right_ts* must be DISTINCT column names (they both
    survive into the output). Works identically on batch frames — the
    batch-vs-stream agreement test relies on that.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {int(lower_seconds)} SECONDS")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {int(upper_seconds)} SECONDS")
        )
    )
    return l.join(r, cond, "inner").drop(F.col(f"r.{on}"))
