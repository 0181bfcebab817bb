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

  **Hot-key ceiling + mitigation**: the one-window form partitions by the
  join key ONLY, so one pathological key (billions of points) sorts in a
  single task. ``time_bucket_seconds`` switches to a sub-bucketed plan:
  the big window shuffles on (key, time-bucket) — bounded partitions no
  matter how hot the key — and a second, TINY window over one row per
  (key, bucket) carries the last right value across bucket boundaries.
  Same semantics (equivalence is pytest- and oracle-checked); ~3 extra
  small shuffles buy an unbounded-cardinality key budget.
- **range join**: equi-join on coarse time buckets (left rows fan out to
  every bucket their window overlaps) + exact refine filter. Turns an
  O(n·m) theta join into a co-partitioned hash join; bucket width tunes
  fan-out vs selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
    inner: bool = True,
    time_bucket_seconds: int | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach the matching right row per key *on*:
    the most recent at-or-before its timestamp (``direction="backward"``,
    the default), the nearest at-or-after (``"forward"``), or whichever
    of the two is closer in time (``"nearest"``, ties -> backward) —
    the full ``pd.merge_asof`` direction surface. ``tolerance_seconds``
    rejects matches farther than the window (both directions), like
    merge_asof's ``tolerance``.

    Matches ``pd.merge_asof(..., direction="backward")`` / DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics (ties: the right row at the
    exact same timestamp wins — in every direction, an equal-timestamp
    right row IS the match at distance 0). ``allow_exact_matches=False``
    mirrors the pd.merge_asof parameter: matches must be STRICTLY
    before (backward) / after (forward) the left timestamp — equal-ts
    right rows are invisible. ``inner=True`` drops left rows with no
    match.

    Non-backward directions and tolerance run on the one-window plan;
    combining them with ``time_bucket_seconds`` raises (for a hot-key
    forward join, negate the timestamps and run backward bucketed).

    ``time_bucket_seconds`` selects the skew-immune plan for hot keys
    (see module docstring): the carry window partitions by (key,
    time-bucket) instead of key alone, so no single task ever sorts more
    than one bucket's worth of one key's rows. Pick it so a bucket holds
    ~10^5-10^6 points of the hottest key. Duplicate right-side (key, ts)
    rows are unspecified-tie territory (as in pd.merge_asof): the
    bucketed plan deterministically keeps the largest value; the
    one-window plan keeps whichever sorts last. With unique (key, ts) —
    e.g. anything scanned from whisper slots — the two plans are
    row-identical.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if time_bucket_seconds is not None and (
        direction != "backward" or tolerance_seconds is not None
    ):
        raise ValueError(
            "time_bucket_seconds supports only direction='backward' "
            "without tolerance — negate timestamps for a bucketed forward"
        )
    lcols = left.columns
    marker = F.lit(1)
    # the matched right row travels as ONE struct (its timestamp first,
    # then the value columns): a single last(ignorenulls) carries the
    # whole row ATOMICALLY, so a matched row with NULL values can never
    # tear into "this row's timestamp, an older row's value" — the
    # nearest/tolerance logic reads the timestamp of exactly the row
    # whose values it returns
    row_struct = F.struct(
        F.col(right_ts).alias("__mts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    row_type = right.select(row_struct.alias("x")).schema["x"].dataType
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        marker.alias("__is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(row_type).alias("__rrow"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        row_struct.alias("__rrow"),
    )
    u = l_tag.unionByName(r_tag)

    # At equal timestamps the carry window must see right rows BEFORE the
    # left row iff exact matches count — flip the side tie-break otherwise
    # (left sorts first, so same-ts right rows stay outside its frame).
    _tie = (
        F.col("__is_left").asc()
        if allow_exact_matches
        else F.col("__is_left").desc()
    )

    _ts_typed = isinstance(u.schema["__ts"].dataType, TimestampType)

    def _epoch(col: Column) -> Column:
        """Bucket-resolution epoch (whole seconds for timestamps)."""
        return F.unix_timestamp(col) if _ts_typed else col.cast("long")

    def _dist(col: Column) -> Column:
        """Full-precision epoch for nearest-direction distances and
        tolerance gaps: unix_micros keeps sub-second timestamps exact
        (unix_timestamp truncates to whole seconds, which can pick the
        farther row or accept an out-of-tolerance match — pd.merge_asof
        and DuckDB ASOF both compare at full precision)."""
        return F.unix_micros(col) if _ts_typed else col.cast("long")

    if time_bucket_seconds is None:
        carried = u
        # With exact matches allowed, right rows sort before left rows at
        # equal timestamps → the equal-ts right row is a distance-0 match
        # in EVERY direction; the strict variant flips the tie-break.
        if direction in ("backward", "nearest"):
            wb = (
                Window.partitionBy("__k")
                .orderBy(F.col("__ts").asc(), _tie)
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            carried = carried.withColumn(
                "__b_row", F.last("__rrow", ignorenulls=True).over(wb)
            )
        if direction in ("forward", "nearest"):
            wf = (
                Window.partitionBy("__k")
                .orderBy(F.col("__ts").desc(), _tie)
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            carried = carried.withColumn(
                "__f_row", F.last("__rrow", ignorenulls=True).over(wf)
            )
        carried = carried.filter(F.col("__is_left") == 1)
        if direction == "nearest":
            dtb = _dist(F.col("__ts")) - _dist(F.col("__b_row.__mts"))
            dtf = _dist(F.col("__f_row.__mts")) - _dist(F.col("__ts"))
            pick_b = F.col("__f_row").isNull() | (
                F.col("__b_row").isNotNull() & (dtb <= dtf)
            )
            match = F.when(pick_b, F.col("__b_row")).otherwise(
                F.col("__f_row")
            )
        elif direction == "backward":
            match = F.col("__b_row")
        else:
            match = F.col("__f_row")
        carried = carried.withColumn("__match", match)
        if tolerance_seconds is not None:
            gap = F.abs(
                _dist(F.col("__ts")) - _dist(F.col("__match.__mts"))
            )
            # tolerance in the distance units: micros for timestamp
            # columns (keeps fractional tolerances exact too), raw units
            # for long columns
            tol = (
                int(round(tolerance_seconds * 1_000_000))
                if _ts_typed
                else int(tolerance_seconds)
            )
            carried = carried.withColumn(
                "__match",
                F.when(gap <= F.lit(tol), F.col("__match")),
            )
        out = carried
    else:
        u = u.withColumn(
            "__b",
            F.floor(_epoch(F.col("__ts")) / F.lit(time_bucket_seconds)).cast(
                "long"
            ),
        )
        # 1. within-bucket carry — the BIG window, shuffled on (key, bucket)
        #    so a hot key's rows split across its time range
        w1 = (
            Window.partitionBy("__k", "__b")
            .orderBy(F.col("__ts").asc(), _tie)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        within = u.withColumn(
            "__w_row", F.last("__rrow", ignorenulls=True).over(w1)
        )
        # 2. final right row of each (key, bucket) that HAS right rows:
        #    one row per key×bucket — the frame every later step works on
        heads = (
            u.filter(F.col("__is_left") == 0)
            .groupBy("__k", "__b")
            .agg(
                F.max_by(
                    F.col("__rrow"),
                    F.struct(F.col("__ts"), F.col("__rrow")),
                ).alias("__f_row")
            )
        )
        # 3. carry across bucket boundaries on the bucket SPINE (buckets of
        #    either side, so left-only buckets inherit too). Window is per
        #    key over ~points/bucket_size rows — thousands of times smaller
        #    than the data; the hot key is harmless here.
        wprev = (
            Window.partitionBy("__k")
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prev = (
            u.select("__k", "__b")
            .distinct()
            .join(heads, ["__k", "__b"], "left")
            .select(
                "__k",
                "__b",
                F.last("__f_row", ignorenulls=True).over(wprev).alias("__p_row"),
            )
        )
        # 4. stitch: same-bucket carry wins, else the boundary carry.
        #    `within` is already partitioned by (__k, __b) from w1, so this
        #    join reuses that exchange; `prev` is broadcast-size in practice.
        out = (
            within.filter(F.col("__is_left") == 1)
            .join(prev, ["__k", "__b"], "left")
            .withColumn("__match", F.coalesce("__w_row", "__p_row"))
        )
    out = out.select(
        *lcols,
        F.col("__match").alias("__match"),
        *[
            F.col(f"__match.{c}").alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    if inner:
        # "no match" = no matched ROW (a matched row with NULL values is
        # still a match, exactly like pd.merge_asof / ASOF JOIN)
        out = out.filter(F.col("__match").isNotNull())
    return out.drop("__match")


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
