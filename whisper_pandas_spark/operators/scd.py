"""Slowly-changing-dimension (SCD type 2) materialization from a change
log.

Given an event/change log ``(key, ts, attributes...)``, build the
versioned dimension table every warehouse keeps next to its facts:
one row per (key, attribute-state run) with ``valid_from`` /
``valid_to`` half-open intervals and a current-row flag. Consecutive
rows with identical attributes compress into one version (the standard
SCD2 change-compression rule), so replaying the same log is idempotent.

Scale shape: ONE shuffle on the key (the per-key window); change
detection is a lag comparison, interval assignment a lead — both inside
the same window partition, no second exchange. At 100 TB of log the
parallelism unit is the key, the classic SCD2 shape (a single monster
key would need the as-of join's time-bucketing trick; dimension keys
are users/devices/SKUs — they don't get that hot).

The result joins to facts with the engine's existing range/as-of joins
(``operators/asof.py``): fact.ts in [valid_from, valid_to).

No reference-repo parity: whisper_pandas has no relational surface;
this backs SURVEY.md §2.11 pipeline engineering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_log(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Compress a change log into SCD2 version rows.

    Returns ``(key, <attr_cols...>, valid_from, valid_to, is_current)``
    — ``valid_to`` is the next version's ``valid_from`` (half-open) and
    null on the current version. Rows are ordered within a key by
    ``(ts, attrs...)`` so same-timestamp ties are deterministic.
    """
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty")
    order = [F.col(ts_col)] + [F.col(c) for c in attr_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(c).over(w)
        # null-safe inequality: a null attr differing from non-null counts
        changed = changed | ~F.col(c).eqNullSafe(prev)
    first = F.lag(ts_col).over(w).isNull()
    marked = df.withColumn("_is_change", first | changed)
    versions = marked.where(F.col("_is_change")).drop("_is_change")
    wv = Window.partitionBy(key_col).orderBy(*order)
    return versions.select(
        F.col(key_col).alias("key"),
        *[F.col(c) for c in attr_cols],
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(wv).alias("valid_to"),
        F.lead(ts_col).over(wv).isNull().alias("is_current"),
    )
