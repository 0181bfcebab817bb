"""Time-series alignment joins Spark lacks as built-ins: as-of join and
bucketed range join (SURVEY.md §2.5).

The reference leaves cross-metric alignment to pandas (its notebook
delegates analysis, whisper_pandas.ipynb cell 25; ``pd.merge_asof`` is the
pandas idiom). Here both are compositions of shuffle-friendly built-ins —
no Pandas UDF, no cross join:

- **as-of**: union both sides with a side marker, one window pass carrying
  the last right-side value forward (``last(..., ignorenulls=True)``).
  Cost: ONE shuffle on the key — same as any groupBy — versus the naive
  range-join + max_by which explodes candidate pairs.
- **range join**: equi-join on coarse time buckets (left rows fan out to
  every bucket their window overlaps) + exact refine filter. Turns an
  O(n·m) theta join into a co-partitioned hash join; bucket width tunes
  fan-out vs selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
    inner: bool = True,
) -> DataFrame:
    """For each left row, attach the most recent right row at-or-before its
    timestamp (``right.ts <= left.ts``), per key *on*.

    Matches ``pd.merge_asof(..., direction="backward")`` / DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics (ties: the right row at the
    exact same timestamp wins). ``inner=True`` drops left rows with no
    preceding right row.
    """
    lcols = left.columns
    marker = F.lit(1)
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        marker.alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    # Right rows sort before left rows at equal timestamps → inclusive match.
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *lcols, *[f"{c}{suffix}" for c in value_cols]
    )
    if inner:
        out = out.filter(F.col(f"{value_cols[0]}{suffix}").isNotNull())
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    bucket_seconds: int | None = None,
    extra_condition: Column | None = None,
) -> DataFrame:
    """Join rows where ``right_ts ∈ [left_ts + lower, left_ts + upper]``.

    Implemented as bucket-equi-join + refine: the left side explodes to all
    coarse buckets its window overlaps (a small constant fan-out), both
    sides hash-shuffle on the bucket, and the exact predicate filters the
    co-partitioned pairs. Scales where a raw theta join (broadcast nested
    loop) cannot.
    """
    if bucket_seconds is None:
        bucket_seconds = max(upper_seconds - lower_seconds, 1)
    # NOTE: bucket math truncates toward zero — valid for post-1970 data.
    l = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                ((F.unix_timestamp(F.col(left_ts)) + F.lit(lower_seconds)) / F.lit(bucket_seconds)).cast("long"),
                ((F.unix_timestamp(F.col(left_ts)) + F.lit(upper_seconds)) / F.lit(bucket_seconds)).cast("long"),
            )
        ),
    )
    r = right.withColumn(
        "__bucket", (F.unix_timestamp(F.col(right_ts)) / F.lit(bucket_seconds)).cast("long")
    )
    cond = (
        (F.unix_timestamp(r[right_ts]) >= F.unix_timestamp(l[left_ts]) + F.lit(lower_seconds))
        & (F.unix_timestamp(r[right_ts]) <= F.unix_timestamp(l[left_ts]) + F.lit(upper_seconds))
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    return l.join(r, on=(l["__bucket"] == r["__bucket"]) & cond, how="inner").drop("__bucket")
