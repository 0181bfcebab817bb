"""CUSUM changepoint detection over bucketed metric series.

`changepoint_max_cusum` — the classic cumulative-sum changepoint
estimator (Page 1954; the scan form in Taylor's CUSUM-with-bootstrap
writeup): bucket each series to a regular grid, form the cumulative sum
S_t of the bucket values, and locate the split t* maximizing the
centered statistic |S_t - (t/n) * S_n| — the point where the running
total deviates most from the constant-mean line, i.e. the
maximum-likelihood single shift in mean. The anomaly family's third
member: `anomaly_zscore` flags single outlier buckets, seasonal
decomposition flags deseasonalized spikes, this finds the LEVEL SHIFT.

Determinism (oracle-parity): values quantize to integer micro-units
(round(value * scale) as BIGINT) BEFORE any summation, so bucket sums,
cumulative sums, and the centered statistic rescaled by n —

    D_t = n * S_t - t * S_n   (|D_t| maximal at the same t as the
                               textbook |S_t - (t/n) S_n|, since
                               D_t = n * that)

— are EXACT integers end to end: no float accumulation anywhere, so a
SQL engine replays the argmax bit-for-bit. Ties break to the earliest
bucket. Magnitude bound: |D_t| <= n * |S_n|; with daily buckets over
years of data n is O(1e3-1e4), so BIGINT holds through ~2^39 of summed
micro-units per series — far past 100 TB of any real metric; the
operator documents (not silently wraps) that contract.

Scale: one groupBy (series, bucket) with map-side partial aggregation,
then per-series window functions over bucket counts — the same
per-series partitioning every timeseries operator here uses (skew
ceiling = buckets per series, bounded by retention). The final
one-row-per-series pick is a max_by over the window output, another
partial-aggregable groupBy. Nothing driver-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def changepoint_max_cusum(
    df: DataFrame,
    group_cols: Sequence[str],
    time_col: str,
    value_col: str,
    *,
    bucket: str = "day",
    scale: int = 1000,
    min_buckets: int = 3,
) -> DataFrame:
    """Most-likely single mean-shift point per series.

    Returns one row per group: ``n_buckets``, the totals ``s_n`` (summed
    micro-units), the changepoint bucket ``cp_bucket`` (timestamp of the
    LAST bucket of the left segment), and ``d_stat`` = max |n*S_t - t*S_n|
    (the centered CUSUM statistic scaled by n — divide by n*scale for the
    textbook units). Groups with fewer than `min_buckets` buckets are
    dropped (a 1-2 point series has no interior split).
    """
    gcols = list(group_cols)
    buckets = bucket_sums(df, gcols, time_col, value_col, bucket=bucket, scale=scale)
    return cusum_from_buckets(buckets, gcols, min_buckets=min_buckets)


def bucket_sums(
    df: DataFrame,
    group_cols: Sequence[str],
    time_col: str,
    value_col: str,
    *,
    bucket: str = "day",
    scale: int = 1000,
) -> DataFrame:
    """(group..., bucket_ts, y) integer micro-unit bucket sums — the
    mergeable state the CUSUM reads off (sums are additive, so shards or
    micro-batches merge by plain addition; streaming/changepoint.py
    maintains exactly this table)."""
    gcols = list(group_cols)
    return (
        df.where(F.col(time_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(
            *gcols, F.date_trunc(bucket, F.col(time_col)).alias("bucket_ts")
        )
        .agg(
            F.sum(F.round(F.col(value_col) * scale).cast("long")).alias("y")
        )
    )


def cusum_from_buckets(
    buckets: DataFrame,
    group_cols: Sequence[str],
    *,
    min_buckets: int = 3,
) -> DataFrame:
    """The argmax read-off over a (group..., bucket_ts, y) table —
    shared by the batch operator above and the streaming state reader."""
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy("bucket_ts")
    wall = Window.partitionBy(*gcols)
    cum = (
        buckets.withColumn("t", F.row_number().over(w))
        .withColumn("s_t", F.sum("y").over(w))
        .withColumn("n_buckets", F.count(F.lit(1)).over(wall))
        .withColumn("s_n", F.sum("y").over(wall))
    )
    # Interior splits only: t = n has D_n = 0 by construction and names
    # no shift; drop it so cp_bucket is always a real left-segment end.
    stat = cum.where(
        (F.col("n_buckets") >= min_buckets) & (F.col("t") < F.col("n_buckets"))
    ).withColumn(
        "d_abs",
        F.abs(F.col("n_buckets") * F.col("s_t") - F.col("t") * F.col("s_n")),
    )
    # Earliest-bucket tie-break: max_by on (d_abs, -t) would need a
    # struct ordering; the window formulation keeps it integer-only.
    pick = Window.partitionBy(*gcols).orderBy(F.desc("d_abs"), F.asc("t"))
    return (
        stat.withColumn("__r", F.row_number().over(pick))
        .where(F.col("__r") == 1)
        .select(
            *gcols,
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.col("s_n").alias("s_n"),
            F.col("bucket_ts").alias("cp_bucket"),
            F.col("d_abs").alias("d_stat"),
        )
    )
