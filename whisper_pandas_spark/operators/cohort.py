"""Cohort retention analysis over an event log.

The product-analytics companion to funnels (operators/funnel.py): group
users into cohorts by their FIRST-SEEN time bucket, then measure what
fraction of each cohort is still active k buckets later — the retention
triangle every growth dashboard draws.

Scale shape: one (user, bucket)-distinct partial aggregation over the
log, one user-keyed aggregation for first-seen, one user-keyed join
(both sides already partitioned on user — sort-merge with no extra
exchange under AQE), then tiny (cohort, offset) aggregations. No
windows, no Python; at 10^9 users the per-user tables are the only
large intermediates and they stay user-partitioned throughout.

No reference parity: whisper_pandas has no event-log surface; this
extends SURVEY §2.11 next to funnel analysis and SCD2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_seconds: int = 7 * 86400,
) -> DataFrame:
    """(cohort BIGINT, offset BIGINT, n_active BIGINT,
    cohort_size BIGINT, retention DOUBLE): for every cohort (bucket of
    first activity) and bucket offset >= 0, how many of the cohort's
    users were active and the fraction of the cohort that represents.
    ``offset = 0`` rows always have retention 1.0 (every user is active
    in their first bucket by construction)."""
    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be >= 1")
    b = (F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
    activity = (
        df.select(F.col(user_col).alias("__u"), b.alias("__b"))
        .where(F.col("__b").isNotNull())
        .distinct()
    )
    first_seen = activity.groupBy("__u").agg(F.min("__b").alias("cohort"))
    joined = activity.join(first_seen, "__u")
    per = (
        joined.groupBy(
            F.col("cohort"), (F.col("__b") - F.col("cohort")).alias("offset")
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = first_seen.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return per.join(sizes, "cohort").select(
        "cohort",
        "offset",
        "n_active",
        "cohort_size",
        (F.col("n_active") / F.col("cohort_size")).alias("retention"),
    )
