"""Graphite render-API series functions over the whisper-source schema.

The reference (whisper_pandas.py) stops at decoding `.wsp` files; the
queries its users actually run live in graphite-web's render API
(`derivative`, `perSecond`, `sumSeries`, `groupByNode`, ...; public
docs: https://graphite.readthedocs.io/en/latest/functions.html). This
module re-expresses that function family over the engine's scan schema
``(metric, archive, timestamp, value)`` so a Graphite user can port
render expressions 1:1.

Two shapes, both scale-safe:

- **per-series transforms** (derivative / perSecond / integral /
  movingAverage / keepLastValue / timeShift / scale / offset /
  absolute): one window partitioned by ``metric`` — series are the
  parallelism unit, so a million series spread over executors and the
  window never sees more than one series' points. (A single monster
  series is the known window-skew case; the as-of join's bucketing
  trick applies if one ever matters.)
- **cross-series aggregations** (sumSeries / averageSeries /
  groupByNode): one shuffle on (group, timestamp) with partial
  aggregation — the same single-exchange shape as the rollup family.

Everything is built-in expressions — no Python in any path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_METRIC, _TS, _VAL = "metric", "timestamp", "value"


def _series_window() -> Window:
    return Window.partitionBy(_METRIC).orderBy(_TS)


def _series_rev_window() -> Window:
    """The same per-series window ordered DESCENDING — running
    (unbounded-preceding, current) frames over it read the original
    order's suffix in one O(n) streaming pass, replacing (current row,
    unbounded following) frames, which Spark evaluates by re-scanning
    the partition tail per row (O(rows²) per series)."""
    return Window.partitionBy(_METRIC).orderBy(F.col(_TS).desc())


def _with_value(df: DataFrame, col: Column) -> DataFrame:
    return df.withColumn(_VAL, col)


# -- pointwise ------------------------------------------------------------


def scale(df: DataFrame, factor: float) -> DataFrame:
    """graphite ``scale(series, factor)``."""
    return _with_value(df, F.col(_VAL) * F.lit(float(factor)))


def offset(df: DataFrame, amount: float) -> DataFrame:
    """graphite ``offset(series, amount)``."""
    return _with_value(df, F.col(_VAL) + F.lit(float(amount)))


def absolute(df: DataFrame) -> DataFrame:
    """graphite ``absolute(series)``."""
    return _with_value(df, F.abs(F.col(_VAL)))


def clamp(df: DataFrame, lo: float | None = None, hi: float | None = None) -> DataFrame:
    """graphite ``minimumAbove``/``maximumBelow`` family as a clamp:
    values outside [lo, hi] become null (Graphite's None)."""
    v = F.col(_VAL)
    keep = F.lit(True)
    if lo is not None:
        keep = keep & (v >= F.lit(float(lo)))
    if hi is not None:
        keep = keep & (v <= F.lit(float(hi)))
    return _with_value(df, F.when(keep, v))


def time_shift(df: DataFrame, seconds: int) -> DataFrame:
    """graphite ``timeShift(series, '+Ns')`` — move points in time."""
    return df.withColumn(
        _TS, F.timestamp_seconds(F.unix_timestamp(F.col(_TS)) + F.lit(int(seconds)))
    )


# -- per-series windows ---------------------------------------------------


def derivative(df: DataFrame) -> DataFrame:
    """graphite ``derivative(series)``: point-to-point delta; the first
    point of each series is null (no predecessor)."""
    w = _series_window()
    return _with_value(df, F.col(_VAL) - F.lag(_VAL).over(w))


def non_negative_derivative(
    df: DataFrame, max_value: float | None = None
) -> DataFrame:
    """graphite ``nonNegativeDerivative(series[, maxValue])``: like
    derivative but a negative delta (counter reset) yields null — or,
    when *max_value* is given (the counter's wrap point, e.g. 2^32-1),
    the wrap-corrected rate ``delta + maxValue + 1`` as graphite-web
    computes for wrapping counters."""
    w = _series_window()
    d = F.col(_VAL) - F.lag(_VAL).over(w)
    if max_value is None:
        return _with_value(df, F.when(d >= 0, d))
    return _with_value(
        df,
        F.when(d >= 0, d).when(
            d < 0, d + F.lit(float(max_value)) + F.lit(1.0)
        ),
    )


def per_second(df: DataFrame) -> DataFrame:
    """graphite ``perSecond``: non-negative delta divided by the actual
    seconds between points (robust to gaps — Graphite divides by step;
    with jitter/gaps the elapsed-time divisor is the meaningful rate)."""
    w = _series_window()
    dv = F.col(_VAL) - F.lag(_VAL).over(w)
    dt = F.unix_timestamp(F.col(_TS)) - F.unix_timestamp(F.lag(_TS).over(w))
    return _with_value(df, F.when((dv >= 0) & (dt > 0), dv / dt))


def integral(df: DataFrame) -> DataFrame:
    """graphite ``integral(series)``: running sum; a null slot stays
    null (graphite-web preserves None — gaps remain visible) while
    still contributing nothing to later sums."""
    w = _series_window().rowsBetween(Window.unboundedPreceding, 0)
    return _with_value(
        df, F.when(F.col(_VAL).isNotNull(), F.sum(_VAL).over(w))
    )


def moving_average_points(df: DataFrame, n: int) -> DataFrame:
    """graphite ``movingAverage(series, N)`` (N points, trailing):
    average of the last N points including the current one. The first
    N-1 points average what exists so far (Graphite emits None until the
    window fills when xFilesFactor demands it; the permissive form here
    matches the default)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    w = _series_window().rowsBetween(-(n - 1), 0)
    return _with_value(df, F.avg(_VAL).over(w))


def keep_last_value(df: DataFrame, limit: int | None = None) -> DataFrame:
    """graphite ``keepLastValue(series[, limit])``: forward-fill nulls
    with the last seen value. graphite-web fills a null RUN only when
    the ENTIRE run is <= *limit* slots (it backfills on reaching the
    next non-None, and fills a trailing run the same way) — a longer
    gap stays fully null, it is not partially filled."""
    wp = _series_window().rowsBetween(Window.unboundedPreceding, 0)
    filled = F.last(_VAL, ignorenulls=True).over(wp)
    if limit is None:
        return _with_value(df, filled)
    rn = F.row_number().over(_series_window())
    last_present = F.max(F.when(F.col(_VAL).isNotNull(), rn)).over(wp)
    # suffix-min via the REVERSED running frame — a (current row,
    # unbounded following) frame re-scans the partition tail per row
    # (O(rows²) per series; see operators/resample.py) and min() is
    # set-order-insensitive, so the descending frame is exact
    wf_rev = _series_rev_window().rowsBetween(Window.unboundedPreceding, 0)
    next_present = F.min(F.when(F.col(_VAL).isNotNull(), rn)).over(wf_rev)
    n_rows = F.count(F.lit(1)).over(
        Window.partitionBy(_METRIC).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    # whole-run length: bounded by the next non-null slot, or the series
    # end for a trailing run (graphite fills those too)
    run_len = F.coalesce(next_present - F.lit(1), n_rows) - last_present
    return _with_value(
        df,
        F.when(F.col(_VAL).isNotNull(), F.col(_VAL)).when(
            last_present.isNotNull() & (run_len <= limit), filled
        ),
    )


def moving_median_points(df: DataFrame, n: int) -> DataFrame:
    """graphite ``movingMedian(series, N)`` (N points, trailing) — the
    same permissive partial-window form as `moving_average_points`."""
    if n < 1:
        raise ValueError("n must be >= 1")
    # median()/percentile() reject window frames; an exact median over
    # the trailing N points via sorted collect_list stays codegen-side
    # and the array is bounded by N
    w = _series_window().rowsBetween(-(n - 1), 0)
    arr = F.array_sort(F.collect_list(_VAL).over(w))
    k = F.size(arr)
    mid_hi = F.element_at(arr, (k / 2).cast("int") + 1)
    mid_lo = F.element_at(arr, ((k + 1) / 2).cast("int"))
    return _with_value(df, F.when(k > 0, (mid_lo + mid_hi) / 2.0))


def offset_to_zero(df: DataFrame) -> DataFrame:
    """graphite ``offsetToZero(series)``: subtract each series' own
    minimum, so every series bottoms at 0 (one unordered full-partition
    window per series — no extra exchange beyond the metric partition)."""
    wall = Window.partitionBy(_METRIC).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return _with_value(df, F.col(_VAL) - F.min(_VAL).over(wall))


# -- cross-series aggregation --------------------------------------------


def _node(idx: int) -> Column:
    # graphite node = dot-separated path component
    return F.split(F.col(_METRIC), r"\.").getItem(idx)


_AGGS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


def group_by_node(df: DataFrame, node_idx: int, agg: str = "sum") -> DataFrame:
    """graphite ``groupByNode(series, N, 'sum')``: group series whose
    metric path shares node N, aggregate pointwise per timestamp.

    Output keeps the whisper-source shape: (metric=node, timestamp,
    value) — one exchange on (node, timestamp), partial agg map-side.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    return (
        df.groupBy(_node(node_idx).alias(_METRIC), F.col(_TS))
        .agg(_AGGS[agg](_VAL).alias(_VAL))
    )


def sum_series(df: DataFrame, name: str = "sumSeries") -> DataFrame:
    """graphite ``sumSeries(seriesList)`` — pointwise sum of ALL series."""
    return (
        df.groupBy(F.col(_TS))
        .agg(F.sum(_VAL).alias(_VAL))
        .select(F.lit(name).alias(_METRIC), _TS, _VAL)
    )


def average_series(df: DataFrame, name: str = "averageSeries") -> DataFrame:
    """graphite ``averageSeries(seriesList)``."""
    return (
        df.groupBy(F.col(_TS))
        .agg(F.avg(_VAL).alias(_VAL))
        .select(F.lit(name).alias(_METRIC), _TS, _VAL)
    )


def summarize(df: DataFrame, interval_s: int, func: str = "sum") -> DataFrame:
    """graphite ``summarize(series, 'Ns', 'sum')``: re-bucket each series
    onto an *interval_s* grid (epoch-aligned, like Whisper slots) and
    aggregate pointwise — the render-API face of the engine's rollup
    family. One exchange on (metric, bucket), partial agg map-side."""
    if func not in _AGGS:
        raise ValueError(f"func must be one of {sorted(_AGGS)}, got {func!r}")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(_TS)) / interval_s).cast("long") * interval_s
    )
    return (
        df.groupBy(F.col(_METRIC), bucket.alias(_TS))
        .agg(_AGGS[func](_VAL).alias(_VAL))
    )


def alias_by_node(df: DataFrame, node_idx: int) -> DataFrame:
    """graphite ``aliasByNode(series, N)`` — rename each series to path
    node N (no aggregation; collisions stay separate rows)."""
    return df.withColumn(_METRIC, _node(node_idx))


def as_percent(df: DataFrame) -> DataFrame:
    """graphite ``asPercent(series_list)``: each point as a percentage
    of that timestamp's cross-series total (null when the total is 0 or
    null — Graphite's None). One exchange on timestamp; the per-ts
    totals window never holds more than the series count."""
    wt = Window.partitionBy(_TS)
    total = F.sum(_VAL).over(wt)
    return _with_value(
        df, F.when(total != 0, F.col(_VAL) / total * F.lit(100.0))
    )


def divide_series(df: DataFrame, divisor_metric: str) -> DataFrame:
    """graphite ``divideSeries(dividend_list, divisor)``: every series
    divided pointwise by the named divisor series (null where the
    divisor is 0 or missing at that timestamp). The divisor is ONE
    series — small by construction — so it broadcasts; dividends never
    shuffle."""
    divisor = (
        df.where(F.col(_METRIC) == divisor_metric)
        .select(F.col(_TS).alias("_div_ts"), F.col(_VAL).alias("_div_val"))
    )
    out = (
        df.where(F.col(_METRIC) != divisor_metric)
        .join(F.broadcast(divisor), F.col(_TS) == F.col("_div_ts"), "left")
        .drop("_div_ts")
    )
    return _with_value(
        out,
        F.when(F.col("_div_val") != 0, F.col(_VAL) / F.col("_div_val")),
    ).drop("_div_val")


def highest(df: DataFrame, n: int, func: str = "max") -> DataFrame:
    """graphite ``highest(series_list, N, 'max')`` (and ``highestMax`` /
    ``highestAverage`` via *func*): keep only the N series whose
    aggregate is largest. One per-series agg exchange; the winner set is
    N metric names, broadcast back as a semi join — the full point set
    never shuffles."""
    if func not in _AGGS:
        raise ValueError(f"func must be one of {sorted(_AGGS)}, got {func!r}")
    if n < 1:
        raise ValueError("n must be >= 1")
    winners = (
        df.groupBy(_METRIC)
        .agg(_AGGS[func](_VAL).alias("_rank_val"))
        .orderBy(F.col("_rank_val").desc(), F.col(_METRIC))
        .limit(n)
        .select(_METRIC)
    )
    return df.join(F.broadcast(winners), _METRIC, "left_semi")


def moving_stddev_points(df: DataFrame, n: int) -> DataFrame:
    """graphite ``stdev(series, n)``: POPULATION standard deviation over
    the last *n* points (graphite divides by n, not n-1), emitting
    values for the partial head windows too (graphite renders them
    unless the window is mostly empty; the windowTolerance dial is the
    one simplification — documented, not hidden). ``stddev_pop`` of a
    1-point frame is 0.0, matching graphite's head behavior."""
    if n < 1:
        raise ValueError("n must be >= 1")
    w = _series_window().rowsBetween(-(n - 1), 0)
    return _with_value(df, F.stddev_pop(_VAL).over(w))


def linear_regression(df: DataFrame) -> DataFrame:
    """graphite ``linearRegression(series)``: replace each series with
    its ordinary-least-squares fitted line over the WHOLE series
    (x = epoch seconds). Closed form per series — slope =
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) — via ``regr_slope`` /
    ``regr_intercept`` window aggregates: one unordered window per
    series, no second scan. Degenerate series (all points at one
    timestamp) yield NULL, matching graphite's undefined fit."""
    w = Window.partitionBy(_METRIC)
    x = F.unix_timestamp(F.col(_TS)).cast("double")
    slope = F.regr_slope(F.col(_VAL), x).over(w)
    icept = F.regr_intercept(F.col(_VAL), x).over(w)
    return _with_value(df, slope * x + icept)


def average_above(df: DataFrame, threshold: float) -> DataFrame:
    """graphite ``averageAbove(series, t)``: keep only series whose mean
    value exceeds *t*. Selector shape: per-series mean via one
    unordered window, then a filter — no join, series stay intact."""
    w = Window.partitionBy(_METRIC)
    return df.withColumn("__avg", F.avg(_VAL).over(w)).filter(
        F.col("__avg") > threshold
    ).drop("__avg")


def current_above(df: DataFrame, threshold: float) -> DataFrame:
    """graphite ``currentAbove(series, t)``: keep series whose LAST
    value exceeds *t* (the live-alerting selector)."""
    w = (
        Window.partitionBy(_METRIC)
        .orderBy(_TS)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return df.withColumn("__last", F.last(_VAL, ignorenulls=True).over(w)).filter(
        F.col("__last") > threshold
    ).drop("__last")


def transform_null(df: DataFrame, default: float = 0.0) -> DataFrame:
    """graphite ``transformNull(series, default)`` — replace None points
    with *default* (pointwise, codegen)."""
    return _with_value(df, F.coalesce(F.col(_VAL), F.lit(float(default))))


def remove_above_value(df: DataFrame, threshold: float) -> DataFrame:
    """graphite ``removeAboveValue(series, n)`` — values above the
    threshold become None (spike suppression)."""
    return _with_value(
        df, F.when(F.col(_VAL) <= F.lit(float(threshold)), F.col(_VAL))
    )


def remove_below_value(df: DataFrame, threshold: float) -> DataFrame:
    """graphite ``removeBelowValue(series, n)``."""
    return _with_value(
        df, F.when(F.col(_VAL) >= F.lit(float(threshold)), F.col(_VAL))
    )


def grep_metrics(df: DataFrame, pattern: str, exclude: bool = False) -> DataFrame:
    """graphite ``grep(seriesList, pattern)`` / ``exclude(seriesList,
    pattern)`` — keep (or drop) series whose NAME matches the regex.
    Pure filter: pushes into the scan when the source supports metric
    predicates (the whisper reader's prefix/contains pushdown)."""
    m = F.col(_METRIC).rlike(pattern)
    return df.where(~m if exclude else m)


def alias_sub(df: DataFrame, pattern: str, replacement: str) -> DataFrame:
    """graphite ``aliasSub(seriesList, search, replace)`` — regex rename
    of series names (capture groups via $1.. like Java replaceAll)."""
    return df.withColumn(
        _METRIC, F.regexp_replace(F.col(_METRIC), pattern, replacement)
    )


def diff_series(df: DataFrame, minuend_metric: str) -> DataFrame:
    """graphite ``diffSeries(minuend, *subtrahends)``: the named series
    minus the pointwise sum of every other series (null timestamps in a
    subtrahend count as 0, per graphite). Minuend is one series —
    broadcast; subtrahends aggregate in one exchange."""
    minuend = (
        df.where(F.col(_METRIC) == minuend_metric)
        .select(F.col(_TS).alias("_m_ts"), F.col(_VAL).alias("_m_val"))
    )
    subs = (
        df.where(F.col(_METRIC) != minuend_metric)
        .groupBy(F.col(_TS))
        .agg(F.sum(_VAL).alias("_s_val"))
    )
    out = subs.join(F.broadcast(minuend), F.col(_TS) == F.col("_m_ts"), "full_outer")
    return out.select(
        F.lit("diffSeries").alias(_METRIC),
        F.coalesce(F.col(_TS), F.col("_m_ts")).alias(_TS),
        (
            F.coalesce(F.col("_m_val"), F.lit(0.0))
            - F.coalesce(F.col("_s_val"), F.lit(0.0))
        ).alias(_VAL),
    )


def min_series(df: DataFrame, name: str = "minSeries") -> DataFrame:
    """graphite ``minSeries(seriesList)``."""
    return (
        df.groupBy(F.col(_TS))
        .agg(F.min(_VAL).alias(_VAL))
        .select(F.lit(name).alias(_METRIC), _TS, _VAL)
    )


def max_series(df: DataFrame, name: str = "maxSeries") -> DataFrame:
    """graphite ``maxSeries(seriesList)``."""
    return (
        df.groupBy(F.col(_TS))
        .agg(F.max(_VAL).alias(_VAL))
        .select(F.lit(name).alias(_METRIC), _TS, _VAL)
    )


def range_of_series(df: DataFrame, name: str = "rangeOfSeries") -> DataFrame:
    """graphite ``rangeOfSeries(seriesList)`` — pointwise max - min."""
    return (
        df.groupBy(F.col(_TS))
        .agg((F.max(_VAL) - F.min(_VAL)).alias(_VAL))
        .select(F.lit(name).alias(_METRIC), _TS, _VAL)
    )


def count_series(df: DataFrame, name: str = "countSeries") -> DataFrame:
    """graphite ``countSeries(seriesList)`` — how many series report a
    (non-null) point at each timestamp."""
    return (
        df.groupBy(F.col(_TS))
        .agg(F.count(_VAL).cast("double").alias(_VAL))
        .select(F.lit(name).alias(_METRIC), _TS, _VAL)
    )


def n_percentile(df: DataFrame, q: float) -> DataFrame:
    """graphite ``nPercentile(seriesList, n)`` — each series replaced by
    its flat n-th percentile line, using graphite's exact non-interpolating
    NIST rank pick (``render/functions.py _getPercentile``):
    ``rank = ceil(q/100 * (count+1))`` into the sorted non-null values,
    clamped to [1, count] — NOT linear interpolation, so results match
    graphite even when q*(n+1)/100 is fractional (r6 advisory fixed the
    percentile_cont mismatch). One shuffle on the series key (two window
    passes, no per-series array materialization) + broadcast back."""
    if not 0 < q <= 100:
        raise ValueError("q must be in (0, 100]")
    w_sort = Window.partitionBy(_METRIC).orderBy(F.col(_VAL))
    w_all = Window.partitionBy(_METRIC)
    ranked = (
        df.where(F.col(_VAL).isNotNull())
        .select(_METRIC, _VAL)
        .withColumn("_rn", F.row_number().over(w_sort))
        .withColumn("_cnt", F.count(F.lit(1)).over(w_all))
    )
    rank = F.ceil(F.lit(q / 100.0) * (F.col("_cnt") + 1))
    pick = F.least(F.greatest(rank, F.lit(1)), F.col("_cnt"))
    pct = ranked.where(F.col("_rn") == pick).select(
        _METRIC, F.col(_VAL).alias("_p")
    )
    return (
        df.join(F.broadcast(pct), _METRIC)
        .select(_METRIC, _TS, F.col("_p").alias(_VAL))
    )


def sort_by_total(df: DataFrame, limit: int | None = None) -> DataFrame:
    """graphite ``sortByTotal(seriesList)`` (+ ``limit(seriesList, N)``
    when *limit* is given): order series by their total, largest first,
    exposed as a ``series_rank`` column (a DataFrame has no inherent
    series order); optionally keep only the top N series' points."""
    totals = (
        df.groupBy(_METRIC)
        .agg(F.sum(_VAL).alias("_tot"))
    )
    w = Window.orderBy(F.col("_tot").desc(), F.col(_METRIC))
    ranked = totals.withColumn("series_rank", F.row_number().over(w))
    if limit is not None:
        ranked = ranked.where(F.col("series_rank") <= limit)
    return df.join(
        F.broadcast(ranked.select(_METRIC, "series_rank")), _METRIC
    )


# -- round-8 tail (next 10 by graphite-web usage) ---------------------------


def hitcount(df: DataFrame, interval_s: int, step_s: int | None = None) -> DataFrame:
    """graphite ``hitcount(seriesList, intervalString)`` — values are
    rates (hits/sec); each point contributes ``value * step`` hits over
    its coverage ``[t, t+step)``, distributed PROPORTIONALLY across the
    epoch-aligned ``interval_s`` buckets it overlaps (graphite-web
    render/functions.py hitcount splits boundary-straddling points the
    same way). ``step_s`` defaults to each series' own step — the
    minimum positive timestamp delta (graphite reads series.step; the
    scan schema carries it implicitly).

    Plan shape: one series-window pass for the step, a 1-2 element
    ``sequence`` explode for boundary points (step <= interval ⇒ at most
    2 buckets), then the standard (metric, bucket) partial-agg exchange
    — no Python anywhere."""
    if interval_s < 1:
        raise ValueError("interval_s must be >= 1")
    t = F.unix_timestamp(F.col(_TS))
    if step_s is None:
        w = Window.partitionBy(_METRIC)
        dt = t - F.unix_timestamp(F.lag(_TS).over(_series_window()))
        df = df.withColumn("__step", F.min(dt).over(w))
    else:
        if step_s < 1:
            raise ValueError("step_s must be >= 1")
        df = df.withColumn("__step", F.lit(step_s).cast("long"))
    end = t + F.col("__step")
    # spread guard: a point covers ceil(step/interval)+1 buckets; a
    # pathologically sparse series (two points a year apart) with a
    # DERIVED step would explode one row into tens of thousands of
    # buckets — fail loudly in-plan instead (pass step_s explicitly for
    # genuinely coarse data).  The lower bound catches duplicate
    # timestamps: min positive-delta would derive __step = 0, making
    # end-1 < t so F.sequence silently produces a descending range and
    # a spurious bucket with negative overlap weight — an error, not a
    # number.
    chk = F.assert_true(
        (F.col("__step") >= 1)
        & (F.col("__step") <= F.lit(10_000) * interval_s),
        F.concat(
            F.lit("hitcount: derived step "),
            F.col("__step").cast("string"),
            F.lit(
                f" invalid — must be >= 1s (duplicate timestamps?) and"
                f" span <= 10000 buckets of {interval_s}s — pass step_s"
            ),
        ),
    )
    buckets = F.when(
        chk.isNull(),
        F.sequence(F.floor(t / interval_s), F.floor((end - 1) / interval_s)),
    )
    b = df.where(F.col(_VAL).isNotNull() & F.col("__step").isNotNull()).select(
        _METRIC,
        F.col(_VAL).alias("__v"),
        t.alias("__t"),
        end.alias("__e"),
        F.explode(buckets).alias("__b"),
    )
    lo = F.greatest(F.col("__b") * interval_s, F.col("__t"))
    hi = F.least((F.col("__b") + 1) * interval_s, F.col("__e"))
    return (
        b.groupBy(_METRIC, F.col("__b"))
        .agg(F.sum(F.col("__v") * (hi - lo)).alias(_VAL))
        .select(
            _METRIC,
            F.timestamp_seconds(F.col("__b") * interval_s).alias(_TS),
            _VAL,
        )
    )


def time_slice(df: DataFrame, start_epoch: int, end_epoch: int) -> DataFrame:
    """graphite ``timeSlice(seriesList, start, end)`` — points keep
    their slots but values OUTSIDE ``[start, end]`` become null (the
    render API nulls rather than filters, so cross-series alignment is
    preserved)."""
    t = F.unix_timestamp(F.col(_TS))
    return _with_value(
        df,
        F.when((t >= start_epoch) & (t <= end_epoch), F.col(_VAL)),
    )


def integral_by_interval(df: DataFrame, interval_s: int) -> DataFrame:
    """graphite ``integralByInterval(seriesList, intervalUnit)`` —
    ``integral`` resetting to zero at every epoch-aligned interval
    boundary: a running sum windowed by (series, interval bucket). Null
    slots stay null (gaps stay visible) while contributing nothing,
    exactly like :func:`integral`."""
    if interval_s < 1:
        raise ValueError("interval_s must be >= 1")
    bucket = F.floor(F.unix_timestamp(F.col(_TS)) / interval_s)
    w = (
        Window.partitionBy(F.col(_METRIC), bucket)
        .orderBy(_TS)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return _with_value(
        df, F.when(F.col(_VAL).isNotNull(), F.sum(_VAL).over(w))
    )


def sort_by_maxima(df: DataFrame, limit: int | None = None) -> DataFrame:
    """graphite ``sortByMaxima(seriesList)`` — series ordered by their
    maximum value, largest first, exposed as ``series_rank`` (same
    DataFrame convention as :func:`sort_by_total`); optional top-N cut."""
    totals = df.groupBy(_METRIC).agg(F.max(_VAL).alias("_m"))
    w = Window.orderBy(F.col("_m").desc(), F.col(_METRIC))
    ranked = totals.withColumn("series_rank", F.row_number().over(w))
    if limit is not None:
        ranked = ranked.where(F.col("series_rank") <= limit)
    return df.join(F.broadcast(ranked.select(_METRIC, "series_rank")), _METRIC)


def sort_by_minima(df: DataFrame, limit: int | None = None) -> DataFrame:
    """graphite ``sortByMinima(seriesList)`` — graphite-web first DROPS
    series whose maximum is <= 0, then orders the rest by their minimum
    value ascending (render/functions.py sortByMinima keeps
    ``max(series) > 0`` only); exposed as ``series_rank``."""
    totals = (
        df.groupBy(_METRIC)
        .agg(F.min(_VAL).alias("_m"), F.max(_VAL).alias("_mx"))
        .where(F.col("_mx") > 0)
    )
    w = Window.orderBy(F.col("_m").asc(), F.col(_METRIC))
    ranked = totals.withColumn("series_rank", F.row_number().over(w))
    if limit is not None:
        ranked = ranked.where(F.col("series_rank") <= limit)
    return df.join(F.broadcast(ranked.select(_METRIC, "series_rank")), _METRIC)


def _nist_percentile_over(df: DataFrame, val: str, keys: list[str], q: float):
    """(keys..., _p): graphite's non-interpolating NIST rank pick of the
    ``q``-th percentile of ``val`` per key group — rank = ceil(q/100 *
    (count+1)) into the sorted non-null values, clamped to [1, count]
    (render/functions.py _getPercentile, the n_percentile recipe shared
    by the three percentile-based selectors below)."""
    kcols = [F.col(k) for k in keys]
    w_sort = Window.partitionBy(*kcols).orderBy(F.col(val))
    w_all = Window.partitionBy(*kcols)
    ranked = (
        df.where(F.col(val).isNotNull())
        .select(*keys, val)
        .withColumn("_rn", F.row_number().over(w_sort))
        .withColumn("_cnt", F.count(F.lit(1)).over(w_all))
    )
    rank = F.ceil(F.lit(q / 100.0) * (F.col("_cnt") + 1))
    pick = F.least(F.greatest(rank, F.lit(1)), F.col("_cnt"))
    return ranked.where(F.col("_rn") == pick).select(
        *keys, F.col(val).alias("_p")
    )


def remove_above_percentile(df: DataFrame, q: float) -> DataFrame:
    """graphite ``removeAbovePercentile(seriesList, n)`` — per series,
    values STRICTLY above the series' n-th percentile (NIST rank pick)
    become null."""
    if not 0 < q <= 100:
        raise ValueError("q must be in (0, 100]")
    pct = _nist_percentile_over(df, _VAL, [_METRIC], q)
    return (
        df.join(F.broadcast(pct), _METRIC, "left")
        .withColumn(_VAL, F.when(F.col(_VAL) <= F.col("_p"), F.col(_VAL)))
        .drop("_p")
    )


def remove_below_percentile(df: DataFrame, q: float) -> DataFrame:
    """graphite ``removeBelowPercentile(seriesList, n)`` — per series,
    values STRICTLY below the series' n-th percentile become null."""
    if not 0 < q <= 100:
        raise ValueError("q must be in (0, 100]")
    pct = _nist_percentile_over(df, _VAL, [_METRIC], q)
    return (
        df.join(F.broadcast(pct), _METRIC, "left")
        .withColumn(_VAL, F.when(F.col(_VAL) >= F.col("_p"), F.col(_VAL)))
        .drop("_p")
    )


def average_outside_percentile(df: DataFrame, q: float) -> DataFrame:
    """graphite ``averageOutsidePercentile(seriesList, n)`` — keeps only
    the series whose AVERAGE falls outside the (100-n, n) percentile
    band of all series averages (render/functions.py: n < 50 is
    reflected to 100-n; both band edges use the NIST rank pick; the
    comparison is strict — series ON an edge are kept)."""
    if not 0 < q <= 100:
        raise ValueError("q must be in (0, 100]")
    if q < 50:
        q = 100 - q
    avgs = df.groupBy(_METRIC).agg(F.avg(_VAL).alias("_avg")).withColumn(
        "_one", F.lit(1)
    )
    hi = _nist_percentile_over(avgs, "_avg", ["_one"], q).select(
        F.col("_p").alias("_hi"), "_one"
    )
    lo = _nist_percentile_over(avgs, "_avg", ["_one"], 100 - q).select(
        F.col("_p").alias("_lo"), "_one"
    )
    keep = (
        avgs.join(F.broadcast(hi), "_one")
        .join(F.broadcast(lo), "_one")
        .where(
            ~((F.col("_avg") > F.col("_lo")) & (F.col("_avg") < F.col("_hi")))
        )
        .select(_METRIC)
    )
    return df.join(F.broadcast(keep), _METRIC)


def changed(df: DataFrame) -> DataFrame:
    """graphite ``changed(seriesList)`` — 1.0 where the value is
    non-null and DIFFERS from the last non-null value seen earlier in
    the series, else 0.0 (graphite-web's fold: the tracked `previous`
    only updates at init and on a change; runs of equal or null values
    emit 0)."""
    prev = F.last(_VAL, ignorenulls=True).over(
        _series_window().rowsBetween(Window.unboundedPreceding, -1)
    )
    return _with_value(
        df,
        F.when(
            F.col(_VAL).isNotNull()
            & prev.isNotNull()
            & (F.col(_VAL) != prev),
            F.lit(1.0),
        ).otherwise(F.lit(0.0)),
    )


def delay(df: DataFrame, steps: int) -> DataFrame:
    """graphite ``delay(seriesList, steps)`` — values shifted forward by
    ``steps`` points (negative shifts backward); vacated slots are null.
    Timestamps keep their slots — only values move, per the render API."""
    return _with_value(df, F.lag(_VAL, steps).over(_series_window()))


# -- round-8 tail, second batch ---------------------------------------------


def _series_stat_filter(df: DataFrame, stat: Column, keep) -> DataFrame:
    """Selector shape shared by the max/min/avg/current family: one
    unordered per-series window computes the statistic, a filter keeps
    whole series — no join, points stay intact."""
    w = Window.partitionBy(_METRIC)
    return (
        df.withColumn("__stat", stat.over(w))
        .filter(keep(F.col("__stat")))
        .drop("__stat")
    )


def maximum_above(df: DataFrame, threshold: float) -> DataFrame:
    """graphite ``maximumAbove(series, n)`` — keep series whose maximum
    is STRICTLY above n (render/functions.py uses ``>``)."""
    return _series_stat_filter(df, F.max(_VAL), lambda s: s > threshold)


def maximum_below(df: DataFrame, threshold: float) -> DataFrame:
    """graphite ``maximumBelow(series, n)`` — keep series whose maximum
    is at most n (graphite-web's complement uses ``<=``)."""
    return _series_stat_filter(df, F.max(_VAL), lambda s: s <= threshold)


def minimum_above(df: DataFrame, threshold: float) -> DataFrame:
    """graphite ``minimumAbove(series, n)`` — minimum strictly above n."""
    return _series_stat_filter(df, F.min(_VAL), lambda s: s > threshold)


def minimum_below(df: DataFrame, threshold: float) -> DataFrame:
    """graphite ``minimumBelow(series, n)`` — minimum at most n."""
    return _series_stat_filter(df, F.min(_VAL), lambda s: s <= threshold)


def average_below(df: DataFrame, threshold: float) -> DataFrame:
    """graphite ``averageBelow(series, n)`` — mean at most n (the
    complement of :func:`average_above`)."""
    return _series_stat_filter(df, F.avg(_VAL), lambda s: s <= threshold)


def current_below(df: DataFrame, threshold: float) -> DataFrame:
    """graphite ``currentBelow(series, n)`` — LAST value at most n."""
    w = (
        Window.partitionBy(_METRIC)
        .orderBy(_TS)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        df.withColumn("__last", F.last(_VAL, ignorenulls=True).over(w))
        .filter(F.col("__last") <= threshold)
        .drop("__last")
    )


def lowest(df: DataFrame, n: int, func: str = "min") -> DataFrame:
    """graphite ``lowestCurrent`` / ``lowestAverage`` / ``lowest(series,
    n, func)`` — keep the n series with the LOWEST per-series statistic
    (``min`` / ``avg`` / ``max`` / ``current``); the mirror of
    :func:`highest`, same broadcast-rank shape."""
    agg = {
        "min": F.min(_VAL),
        "max": F.max(_VAL),
        "avg": F.avg(_VAL),
        "current": F.max_by(F.col(_VAL), F.col(_TS)),
    }.get(func)
    if agg is None:
        raise ValueError(f"unsupported lowest func {func!r}")
    totals = df.groupBy(_METRIC).agg(agg.alias("_s"))
    w = Window.orderBy(F.col("_s").asc(), F.col(_METRIC))
    keep = (
        totals.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= n)
        .select(_METRIC)
    )
    return df.join(F.broadcast(keep), _METRIC)


def most_deviant(df: DataFrame, n: int) -> DataFrame:
    """graphite ``mostDeviant(seriesList, n)`` — the n series with the
    largest POPULATION variance (graphite computes sigma² =
    mean(x²) − mean(x)² over the non-null points), exposed with
    ``series_rank`` like the other ordering functions."""
    totals = df.groupBy(_METRIC).agg(
        (F.avg(F.col(_VAL) * F.col(_VAL)) - F.avg(_VAL) * F.avg(_VAL)).alias(
            "_var"
        )
    )
    w = Window.orderBy(F.col("_var").desc(), F.col(_METRIC))
    ranked = (
        totals.withColumn("series_rank", F.row_number().over(w))
        .where(F.col("series_rank") <= n)
        .select(_METRIC, "series_rank")
    )
    return df.join(F.broadcast(ranked), _METRIC)


def moving_sum_points(df: DataFrame, n: int) -> DataFrame:
    """graphite ``movingSum(series, N)`` (N points, trailing; partial
    leading windows emit what exists, like movingAverage here)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    w = _series_window().rowsBetween(-(n - 1), 0)
    return _with_value(df, F.sum(_VAL).over(w))


def moving_min_points(df: DataFrame, n: int) -> DataFrame:
    """graphite ``movingMin(series, N)`` (N points, trailing)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    w = _series_window().rowsBetween(-(n - 1), 0)
    return _with_value(df, F.min(_VAL).over(w))


def moving_max_points(df: DataFrame, n: int) -> DataFrame:
    """graphite ``movingMax(series, N)`` (N points, trailing)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    w = _series_window().rowsBetween(-(n - 1), 0)
    return _with_value(df, F.max(_VAL).over(w))


# -- round-8 tail, third batch ----------------------------------------------


def invert(df: DataFrame) -> DataFrame:
    """graphite ``invert(seriesList)`` — pointwise 1/x; zero becomes
    null (graphite emits None on division by zero)."""
    return _with_value(
        df, F.when(F.col(_VAL) != 0, F.lit(1.0) / F.col(_VAL))
    )


def logarithm(df: DataFrame, base: float = 10.0) -> DataFrame:
    """graphite ``logarithm(seriesList, base)`` — pointwise log;
    non-positive values become null (graphite's None)."""
    if base <= 1.0:
        raise ValueError("base must be > 1")
    return _with_value(
        df, F.when(F.col(_VAL) > 0, F.log(float(base), F.col(_VAL)))
    )


def square_root(df: DataFrame) -> DataFrame:
    """graphite ``squareRoot(seriesList)`` — pointwise sqrt; negative
    values become null."""
    return _with_value(
        df, F.when(F.col(_VAL) >= 0, F.sqrt(F.col(_VAL)))
    )


def pow_series(df: DataFrame, factor: float) -> DataFrame:
    """graphite ``pow(seriesList, factor)`` — pointwise x^factor."""
    return _with_value(df, F.pow(F.col(_VAL), F.lit(float(factor))))


def is_non_null(df: DataFrame) -> DataFrame:
    """graphite ``isNonNull(seriesList)`` — 1.0 where the slot holds a
    value, 0.0 where it is null (gap visualisation)."""
    return _with_value(
        df, F.when(F.col(_VAL).isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0))
    )


def sort_by_name(df: DataFrame) -> DataFrame:
    """graphite ``sortByName(seriesList)`` — series_rank by metric name
    ascending (the DataFrame convention for series order, as in
    sortByTotal/Maxima)."""
    totals = df.select(_METRIC).distinct()
    w = Window.orderBy(F.col(_METRIC).asc())
    ranked = totals.withColumn("series_rank", F.row_number().over(w))
    return df.join(F.broadcast(ranked), _METRIC)


def stdev_points(df: DataFrame, n: int) -> DataFrame:
    """graphite ``stdev(seriesList, points)`` — trailing N-point moving
    POPULATION standard deviation per series (graphite divides by the
    window count, not N−1)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    w = _series_window().rowsBetween(-(n - 1), 0)
    mean_sq = F.avg(F.col(_VAL) * F.col(_VAL)).over(w)
    mean = F.avg(_VAL).over(w)
    return _with_value(df, F.sqrt(F.greatest(mean_sq - mean * mean, F.lit(0.0))))


def scale_to_seconds(df: DataFrame, seconds: int, step_s: int | None = None) -> DataFrame:
    """graphite ``scaleToSeconds(seriesList, seconds)`` — rescale each
    point from per-step to per-``seconds`` units: value * seconds/step.
    ``step_s`` defaults to the per-series minimum positive timestamp
    delta (graphite reads series.step; the scan schema carries it
    implicitly, same derivation as :func:`hitcount`)."""
    if seconds < 1:
        raise ValueError("seconds must be >= 1")
    if step_s is None:
        dt = F.unix_timestamp(F.col(_TS)) - F.unix_timestamp(
            F.lag(_TS).over(_series_window())
        )
        step = F.min(dt).over(Window.partitionBy(_METRIC))
    else:
        if step_s < 1:
            raise ValueError("step_s must be >= 1")
        step = F.lit(step_s)
    return _with_value(df, F.col(_VAL) * seconds / step)


def group_by_nodes(df: DataFrame, agg: str, *node_idxs: int) -> DataFrame:
    """graphite ``groupByNodes(seriesList, callback, *nodes)`` — the
    multi-node generalisation of :func:`group_by_node`: series sharing
    ALL the named path components group together (key = the nodes
    re-joined with dots), aggregated pointwise. Same single
    (key, timestamp) exchange with map-side partial aggregation."""
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    if not node_idxs:
        raise ValueError("at least one node index required")
    key = F.concat_ws(".", *[_node(i) for i in node_idxs])
    return (
        df.groupBy(key.alias(_METRIC), F.col(_TS))
        .agg(_AGGS[agg](_VAL).alias(_VAL))
    )


def weighted_average(
    df: DataFrame, weights: DataFrame, node_idx: int
) -> DataFrame:
    """graphite ``weightedAverage(seriesListAvg, seriesListWeight,
    node)`` — pointwise Σ(value·weight)/Σ(weight) across series PAIRED
    by path node N (the SLA-weighted-mean pattern). ``weights`` shares
    the scan schema; pairs join on (node, timestamp); zero/null total
    weight yields null. One equi-join + one aggregation exchange."""
    a = df.select(
        _node(node_idx).alias("__k"), F.col(_TS), F.col(_VAL).alias("__v")
    )
    b = weights.select(
        _node(node_idx).alias("__k"),
        F.col(_TS),
        F.col(_VAL).alias("__w"),
    )
    j = a.join(b, ["__k", _TS])
    out = (
        j.groupBy(_TS)
        .agg(
            F.sum(F.col("__v") * F.col("__w")).alias("__vw"),
            F.sum("__w").alias("__sw"),
        )
        .select(
            F.lit("weightedAverage").alias(_METRIC),
            F.col(_TS),
            F.when(
                F.col("__sw") != 0, F.col("__vw") / F.col("__sw")
            ).alias(_VAL),
        )
    )
    return out


# -- round-8 tail, fourth batch ----------------------------------------------


def interpolate(df: DataFrame, limit: int | None = None) -> DataFrame:
    """graphite ``interpolate(seriesList[, limit])`` — fill null slots by
    LINEAR interpolation between the nearest non-null neighbours; runs
    longer than ``limit`` slots stay null (graphite's inf default), and
    leading/trailing nulls stay null (no extrapolation).

    One ordered per-series window pass: previous/next anchor values and
    their row distances via last/first(ignorenulls) + row-number
    arithmetic — no Python, no self-join."""
    w = _series_window()
    rn = F.row_number().over(w)
    df2 = df.withColumn("__rn", rn)
    wprev = w.rowsBetween(Window.unboundedPreceding, 0)
    # nearest-following anchors via the reversed running frame (see
    # _series_rev_window — the forward-unbounded frame is O(rows²))
    wnext_rev = _series_rev_window().rowsBetween(Window.unboundedPreceding, 0)
    prev_v = F.last(_VAL, ignorenulls=True).over(wprev)
    prev_rn = F.last(
        F.when(F.col(_VAL).isNotNull(), F.col("__rn")), ignorenulls=True
    ).over(wprev)
    next_v = F.last(_VAL, ignorenulls=True).over(wnext_rev)
    next_rn = F.last(
        F.when(F.col(_VAL).isNotNull(), F.col("__rn")), ignorenulls=True
    ).over(wnext_rev)
    gap = next_rn - prev_rn
    filled = prev_v + (next_v - prev_v) * (F.col("__rn") - prev_rn) / gap
    ok = prev_rn.isNotNull() & next_rn.isNotNull()
    if limit is not None:
        ok = ok & (gap <= limit + 1)
    out = F.when(F.col(_VAL).isNotNull(), F.col(_VAL)).otherwise(
        F.when(ok, filled)
    )
    return df2.withColumn(_VAL, out).drop("__rn")


def smart_summarize(df: DataFrame, interval_s: int, func: str = "sum") -> DataFrame:
    """graphite ``smartSummarize(series, interval, func)`` — like
    :func:`summarize` but buckets anchor at each SERIES' first timestamp
    instead of the epoch (graphite-web's "smart" alignment), so partial
    leading buckets never occur."""
    if interval_s < 1:
        raise ValueError("interval_s must be >= 1")
    if func not in _AGGS:
        raise ValueError(f"func must be one of {sorted(_AGGS)}, got {func!r}")
    t = F.unix_timestamp(F.col(_TS))
    t0 = F.min(t).over(Window.partitionBy(_METRIC))
    bucket = t0 + F.floor((t - t0) / interval_s) * interval_s
    tagged = df.withColumn("__b", F.timestamp_seconds(bucket))
    return (
        tagged.groupBy(_METRIC, F.col("__b").alias(_TS))
        .agg(_AGGS[func](_VAL).alias(_VAL))
    )


def aggregate_with_wildcards(
    df: DataFrame, agg: str, *drop_nodes: int
) -> DataFrame:
    """graphite ``sumSeriesWithWildcards`` / ``averageSeriesWithWildcards
    (seriesList, *positions)`` — group series whose paths match after
    DROPPING the named node positions (the complement of groupByNodes:
    those name the KEPT key); pointwise aggregate per remaining path."""
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    dropped = set(drop_nodes)
    parts = F.split(F.col(_METRIC), r"\.")
    kept = F.filter(parts, lambda _x, i: ~i.isin(*[F.lit(d) for d in dropped]))
    key = F.concat_ws(".", kept)
    return (
        df.groupBy(key.alias(_METRIC), F.col(_TS))
        .agg(_AGGS[agg](_VAL).alias(_VAL))
    )


def alias_by_metric(df: DataFrame) -> DataFrame:
    """graphite ``aliasByMetric(seriesList)`` — strip the path down to
    its LAST node."""
    parts = F.split(F.col(_METRIC), r"\.")
    return df.withColumn(
        _METRIC, F.element_at(parts, F.size(parts))
    )


def substr_metric(df: DataFrame, start: int, stop: int | None = None) -> DataFrame:
    """graphite ``substr(seriesList, start[, stop])`` — keep path nodes
    [start, stop) (0-based, stop exclusive; None = to the end), the
    render API's path-trimming companion to aliasByNode."""
    parts = F.split(F.col(_METRIC), r"\.")
    n = F.size(parts)
    stop_ix = F.lit(stop).cast("int") if stop is not None else n
    sliced = F.slice(
        parts, start + 1, F.greatest(stop_ix - start, F.lit(0))
    )
    return df.withColumn(_METRIC, F.concat_ws(".", sliced))


def constant_line(df: DataFrame, value: float, name: str = "constantLine") -> DataFrame:
    """graphite ``constantLine(value)`` — a flat series at ``value`` over
    the timestamps present in the frame (the render API draws it across
    the requested window; here the slot set defines the window)."""
    return (
        df.select(_TS)
        .distinct()
        .select(
            F.lit(name).alias(_METRIC),
            F.col(_TS),
            F.lit(float(value)).alias(_VAL),
        )
    )


def aggregate_line(df: DataFrame, func: str = "avg") -> DataFrame:
    """graphite ``aggregateLine(seriesList, func)`` — per series, a flat
    line at the aggregate of its values (avg/min/max), spanning the
    series' own slots."""
    if func not in ("avg", "min", "max"):
        raise ValueError(f"func must be avg|min|max, got {func!r}")
    w = Window.partitionBy(_METRIC)
    return _with_value(df, _AGGS[func](_VAL).over(w))


def remove_empty_series(df: DataFrame) -> DataFrame:
    """graphite ``removeEmptySeries(seriesList)`` — drop series whose
    every slot is null."""
    w = Window.partitionBy(_METRIC)
    return (
        df.withColumn("__n", F.count(_VAL).over(w))
        .where(F.col("__n") > 0)
        .drop("__n")
    )


def unique_series(df: DataFrame) -> DataFrame:
    """graphite ``unique(seriesList)`` — drop duplicate (metric,
    timestamp) slots, keeping the maximum value per slot (a DataFrame
    has no series-list order to keep "the first", so the deterministic
    representative is documented here)."""
    return df.groupBy(_METRIC, _TS).agg(F.max(_VAL).alias(_VAL))


# -- holtWinters* family (per-point render face) ------------------------------


def holt_winters(
    df: DataFrame,
    period: int,
    resolution: int,
    alpha: float = 0.1,
    beta: float = 0.0035,
    gamma: float = 0.1,
    m: float = 3.0,
) -> DataFrame:
    """graphite ``holtWintersForecast`` / ``holtWintersConfidenceBands``
    / ``holtWintersAberration`` in one pass: per point, the
    one-step-ahead Brutlag prediction (state BEFORE the point), the
    ±m·deviation band, and the aberration (excess beyond the band, 0
    inside it) — the published aberrant-behaviour method (Brutlag,
    LISA 2000) with graphite-web's default parameters.

    Output: (metric, timestamp, value, prediction, lower, upper,
    aberration). The horizon-forecast face of the same recursion lives
    in operators/forecast.py:holt_winters_forecast (expression fold,
    oracle-replayable); THIS per-point face needs every intermediate
    prediction, so it runs the fold in ONE Arrow ``applyInPandas`` pass
    per series — numpy per group, no shuffle beyond the series groupBy,
    identical recursion (asserted equal in tests)."""
    if period < 2 or resolution < 1:
        raise ValueError("period must be >= 2 and resolution >= 1")

    import numpy as np
    import pandas as pd

    P = period

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(_TS).reset_index(drop=True)
        t = (pdf[_TS].astype("int64") // 10**9 // resolution).to_numpy()
        x = pdf[_VAL].to_numpy(dtype=float)
        n = len(pdf)
        pred = np.full(n, np.nan)
        dev = np.full(n, np.nan)
        if n:
            l, b = x[0], 0.0
            s = np.zeros(P)
            d = np.zeros(P)
            pred[0], dev[0] = x[0], 0.0
            for i in range(1, n):
                ph = int(t[i] % P)
                p_i = l + b + s[ph]
                nl = alpha * (x[i] - s[ph]) + (1 - alpha) * (l + b)
                nb = beta * (nl - l) + (1 - beta) * b
                ns = gamma * (x[i] - nl) + (1 - gamma) * s[ph]
                nd = gamma * abs(x[i] - p_i) + (1 - gamma) * d[ph]
                pred[i], dev[i] = p_i, d[ph]
                l, b, s[ph], d[ph] = nl, nb, ns, nd
        out = pdf.copy()
        out["prediction"] = pred
        out["lower"] = pred - m * dev
        out["upper"] = pred + m * dev
        ab = np.zeros(n)
        over = x > out["upper"].to_numpy()
        under = x < out["lower"].to_numpy()
        ab[over] = (x - out["upper"].to_numpy())[over]
        ab[under] = (x - out["lower"].to_numpy())[under]
        out["aberration"] = ab
        return out

    schema = (
        f"{_METRIC} string, {_TS} timestamp, {_VAL} double, "
        "prediction double, lower double, upper double, aberration double"
    )
    return (
        df.select(_METRIC, _TS, _VAL)
        .where(F.col(_VAL).isNotNull())
        .groupBy(_METRIC)
        .applyInPandas(fold, schema)
    )


# -- round-8 tail, fifth batch -------------------------------------------------


def exponential_moving_average(df: DataFrame, n: int) -> DataFrame:
    """graphite ``exponentialMovingAverage(seriesList, windowSize)`` —
    EMA with the standard smoothing constant c = 2/(N+1); graphite
    seeds the recursion with the SIMPLE average of the first N points
    (its documented first-period behaviour), emitting values from point
    N onward (earlier slots null). Sequential per series, so it runs as
    one Arrow ``applyInPandas`` fold per series (the holtWinters-face
    pattern); null input slots emit null — matching graphite-web, which
    holds the EMA state across a gap but leaves the None slot None
    (gaps neither decay the average nor fabricate output)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    import numpy as np
    import pandas as pd

    c = 2.0 / (n + 1.0)

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(_TS).reset_index(drop=True)
        x = pdf[_VAL].to_numpy(dtype=float)
        out = np.full(len(pdf), np.nan)
        seen = 0
        acc = 0.0
        ema = None
        for i in range(len(x)):
            if np.isnan(x[i]):
                continue  # null in -> null out; EMA state held unchanged
            if ema is None:
                acc += x[i]
                seen += 1
                if seen == n:
                    ema = acc / n
                    out[i] = ema
                continue
            ema = c * x[i] + (1.0 - c) * ema
            out[i] = ema
        res = pdf.copy()
        res[_VAL] = out
        return res

    schema = f"{_METRIC} string, {_TS} timestamp, {_VAL} double"
    return (
        df.select(_METRIC, _TS, _VAL).groupBy(_METRIC).applyInPandas(fold, schema)
    )


def min_max(df: DataFrame) -> DataFrame:
    """graphite ``minMax(seriesList)`` — normalize each series to
    [0, 1] by its own min/max; a constant series maps to 0 (graphite's
    zero-range convention)."""
    w = Window.partitionBy(_METRIC)
    lo = F.min(_VAL).over(w)
    hi = F.max(_VAL).over(w)
    return _with_value(
        df,
        F.when(hi > lo, (F.col(_VAL) - lo) / (hi - lo)).otherwise(
            F.when(F.col(_VAL).isNotNull(), F.lit(0.0))
        ),
    )


def time_stack(
    df: DataFrame, shift_s: int, start: int = 0, end: int = 7
) -> DataFrame:
    """graphite ``timeStack(seriesList, shiftUnit, start, end)`` — one
    shifted copy of every series per k in [start, end): values from
    ``k * shift_s`` seconds ago placed on today's slots, metric
    suffixed ``_timeshift_-k`` (k=0 keeps the bare name) — the
    week-over-week overlay. Implemented as a sequence-explode + one
    shifted self-alignment per row: timestamps shift forward by k*shift
    so the PAST value lands on the CURRENT slot."""
    if shift_s < 1:
        raise ValueError("shift_s must be >= 1")
    if not 0 <= start < end:
        raise ValueError("need 0 <= start < end")
    k = F.col("__k")
    shifted = df.select(
        F.col(_METRIC),
        F.col(_TS),
        F.col(_VAL),
        F.explode(F.sequence(F.lit(start), F.lit(end - 1))).alias("__k"),
    ).select(
        F.when(k == 0, F.col(_METRIC))
        .otherwise(
            F.concat(F.col(_METRIC), F.lit("_timeshift_-"), k.cast("string"))
        )
        .alias(_METRIC),
        F.timestamp_seconds(
            F.unix_timestamp(F.col(_TS)) + k.cast("long") * shift_s
        ).alias(_TS),
        F.col(_VAL),
    )
    return shifted


def divide_series_lists(
    df: DataFrame, divisors: DataFrame, node_idx: int
) -> DataFrame:
    """graphite ``divideSeriesLists(dividendSeriesList,
    divisorSeriesList)`` with the practical pairing rule: series match
    by path node ``node_idx`` (graphite pairs by list position, which a
    DataFrame doesn't have; node pairing is the weightedAverage
    convention here). Pointwise dividend/divisor; zero or null divisor
    yields null. One equi-join on (node, timestamp)."""
    a = df.select(
        F.col(_METRIC),
        _node(node_idx).alias("__k"),
        F.col(_TS),
        F.col(_VAL).alias("__num"),
    )
    b = divisors.select(
        _node(node_idx).alias("__k"),
        F.col(_TS),
        F.col(_VAL).alias("__den"),
    )
    return (
        a.join(b, ["__k", _TS])
        .select(
            _METRIC,
            _TS,
            F.when(F.col("__den") != 0, F.col("__num") / F.col("__den")).alias(
                _VAL
            ),
        )
    )


# -- round-8 tail, sixth batch -------------------------------------------------


def _pointwise_series(df: DataFrame, agg: Column, name: str) -> DataFrame:
    return df.groupBy(F.col(_TS)).agg(agg.alias(_VAL)).select(
        F.lit(name).alias(_METRIC), F.col(_TS), F.col(_VAL)
    )


def multiply_series(df: DataFrame, name: str = "multiplySeries") -> DataFrame:
    """graphite ``multiplySeries(seriesList)`` — pointwise product of
    ALL series per timestamp."""
    return _pointwise_series(df, F.product(_VAL), name)


def stddev_series(df: DataFrame, name: str = "stddevSeries") -> DataFrame:
    """graphite ``stddevSeries(seriesList)`` — pointwise POPULATION
    standard deviation across series per timestamp (graphite divides by
    the count, not n-1)."""
    return _pointwise_series(df, F.stddev_pop(_VAL), name)


def median_series(df: DataFrame, name: str = "medianSeries") -> DataFrame:
    """graphite ``medianSeries(seriesList)`` — pointwise median across
    series (exact, interpolating between the two middle values for even
    counts — Spark's median == percentile(0.5))."""
    return _pointwise_series(df, F.median(_VAL), name)


def aggregate_series(df: DataFrame, func: str, name: str | None = None) -> DataFrame:
    """graphite ``aggregate(seriesList, func)`` — the generic pointwise
    cross-series aggregator behind sum/avg/min/max/count Series
    (graphite 1.1's consolidated entry point)."""
    if func not in _AGGS:
        raise ValueError(f"func must be one of {sorted(_AGGS)}, got {func!r}")
    return _pointwise_series(
        df, _AGGS[func](_VAL), name or f"{func}Series"
    )


def remove_between_percentile(df: DataFrame, q: float) -> DataFrame:
    """graphite ``removeBetweenPercentile(seriesList, n)`` — keep only
    series that have at least ONE point outside the pointwise
    [100-n, n] percentile band of all series at that timestamp
    (graphite-web: series entirely inside the band are removed; n < 50
    reflects). Both band edges use the NIST rank pick per timestamp.
    Boundary semantics match graphite-web's ``not lo < val < hi``: a
    point exactly EQUAL to either percentile edge counts as outside —
    this matters because the NIST rank pick returns an actual data
    value, so the series holding the picked value is always kept."""
    if not 0 < q <= 100:
        raise ValueError("q must be in (0, 100]")
    if q < 50:
        q = 100 - q
    hi = _nist_percentile_over(df, _VAL, [_TS], q).select(
        F.col(_TS), F.col("_p").alias("_hi")
    )
    lo = _nist_percentile_over(df, _VAL, [_TS], 100 - q).select(
        F.col(_TS), F.col("_p").alias("_lo")
    )
    tagged = (
        df.join(hi, _TS, "left")
        .join(lo, _TS, "left")
        .withColumn(
            "__out",
            F.when(
                (F.col(_VAL) >= F.col("_hi")) | (F.col(_VAL) <= F.col("_lo")),
                1,
            ).otherwise(0),
        )
    )
    keep = (
        tagged.groupBy(_METRIC)
        .agg(F.max("__out").alias("__any"))
        .where(F.col("__any") == 1)
        .select(_METRIC)
    )
    return df.join(F.broadcast(keep), _METRIC)


# -- round-9 tail, seventh batch: the last data-bearing functions -------------
# (graphite-web render/functions.py; tag-based functions — seriesByTag,
# aliasByTags, groupByTags — are OUT OF SCOPE: they need a tag store the
# Whisper format does not carry; see COVERAGE.md.)


def percentile_of_series(df: DataFrame, q: float, name: str = "percentileOfSeries") -> DataFrame:
    """graphite ``percentileOfSeries(seriesList, n)`` — ONE output series
    whose value at each timestamp is the n-th percentile of all series'
    non-null values there (non-interpolating NIST rank pick, the same
    ``_getPercentile`` recipe as nPercentile — but pointwise ACROSS
    series instead of per series).  One shuffle on timestamp; the rank
    pick is two window passes over groups whose size is the series
    count, bounded and skew-free."""
    if not 0 < q <= 100:
        raise ValueError("q must be in (0, 100]")
    return _nist_percentile_over(df, _VAL, [_TS], q).select(
        F.lit(name).alias(_METRIC), F.col(_TS), F.col("_p").alias(_VAL)
    )


def apply_by_node(
    df: DataFrame,
    node_idx: int,
    template_fn,
    new_name_node: int | None = None,
) -> DataFrame:
    """graphite ``applyByNode(seriesList, nodeNum, templateFunction)`` —
    group series by their first nodeNum+1 path nodes and apply the
    template per group.

    Spark-first formulation: instead of a driver-side loop over prefixes
    (graphite-web evaluates the template once per unique prefix), the
    metric column is REWRITTEN to the prefix and *template_fn* (any
    DataFrame -> DataFrame function from this module) runs ONCE over the
    whole frame — every cross-series aggregator here groups by (metric,
    timestamp), so collapsing metric to the prefix makes the single call
    compute all per-prefix results in one distributed pass with no
    per-group job submission.  *new_name_node* optionally re-labels the
    output to that node of the prefix (graphite's newName template)."""
    if node_idx < 0:
        raise ValueError("node_idx must be >= 0")
    prefix = F.array_join(
        F.slice(F.split(F.col(_METRIC), r"\."), 1, node_idx + 1), "."
    )
    out = template_fn(df.withColumn(_METRIC, prefix))
    if new_name_node is not None:
        out = out.withColumn(_METRIC, _node(new_name_node))
    return out


def fallback_series(df: DataFrame, fallback: DataFrame) -> DataFrame:
    """graphite ``fallbackSeries(seriesList, fallback)`` — *df* if it has
    any series, else *fallback*.  The emptiness probe is a bounded
    driver-side ``limit(1)`` scan (one row fetched, filters/limits pushed
    down) — the decision is inherently global, and a one-row probe is the
    cheapest correct formulation at any scale."""
    if df.limit(1).count() > 0:
        return df
    return fallback


_CONSOLIDATE = {
    "average": F.avg,
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "first": None,  # min_by / max_by on timestamp, built below
    "last": None,
}


def consolidate_by(df: DataFrame, interval_s: int, func: str = "average") -> DataFrame:
    """graphite ``consolidateBy(seriesList, func)`` — in graphite-web this
    TAGS a series with the consolidation function the renderer applies
    when reducing points to pixels; the data-bearing equivalent is the
    reduction itself: re-bucket each series onto an *interval_s* grid with
    the chosen function.  Superset of ``summarize``: adds graphite's
    ``first``/``last`` consolidators (min_by/max_by on the timestamp —
    single exchange, partial-agg map-side, like every rollup here)."""
    if interval_s < 1:
        raise ValueError("interval_s must be >= 1")
    if func not in _CONSOLIDATE:
        raise ValueError(
            f"func must be one of {sorted(_CONSOLIDATE)}, got {func!r}"
        )
    t = F.unix_timestamp(F.col(_TS))
    bucket = F.timestamp_seconds((t / interval_s).cast("long") * interval_s)
    nn = df.where(F.col(_VAL).isNotNull())
    if func == "first":
        agg = F.min_by(_VAL, _TS)
    elif func == "last":
        agg = F.max_by(_VAL, _TS)
    else:
        agg = _CONSOLIDATE[func](_VAL)
    return nn.groupBy(F.col(_METRIC), bucket.alias(_TS)).agg(agg.alias(_VAL))


def cumulative(df: DataFrame, interval_s: int) -> DataFrame:
    """graphite ``cumulative(seriesList)`` — alias for
    ``consolidateBy(seriesList, 'sum')`` (graphite-web defines it exactly
    so); the running-total reading is ``integral``, already separate."""
    return consolidate_by(df, interval_s, "sum")


def use_series_above(
    df: DataFrame, value: float, search: str, replace: str
) -> DataFrame:
    """graphite ``useSeriesAbove(seriesList, value, search, replace)`` —
    for each series whose MAXIMUM exceeds *value*, rewrite *search* ->
    *replace* in its name and return the data of the series that CARRY
    the rewritten names (graphite-web re-fetches the new targets from the
    store; here the frame is the store, so the rewrite is a broadcast
    semi-join of the renamed qualifier list back onto the scan).
    Typical use: metric.requests -> metric.latency for busy metrics."""
    qual = (
        df.groupBy(_METRIC)
        .agg(F.max(_VAL).alias("__mx"))
        .where(F.col("__mx") > F.lit(float(value)))
        .select(
            F.regexp_replace(F.col(_METRIC), search, replace).alias(_METRIC)
        )
        .distinct()
    )
    return df.join(F.broadcast(qual), _METRIC, "semi")


_FILTER_FUNCS = {
    "average": F.avg,
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "stddev": F.stddev_pop,
    "median": F.median,
    "last": None,  # max_by on timestamp
}

_FILTER_OPS = {
    "=": lambda s, t: s == t,
    "!=": lambda s, t: s != t,
    ">": lambda s, t: s > t,
    ">=": lambda s, t: s >= t,
    "<": lambda s, t: s < t,
    "<=": lambda s, t: s <= t,
}


def filter_series(df: DataFrame, func: str, op: str, threshold: float) -> DataFrame:
    """graphite ``filterSeries(seriesList, func, operator, threshold)`` —
    the 1.1 generalization of the {average,current,maximum,minimum} x
    {Above,Below} selector family: keep whole series where
    ``func(series) op threshold``.  Same single-window shape as
    ``_series_stat_filter`` — no join, points stay intact."""
    if func not in _FILTER_FUNCS:
        raise ValueError(
            f"func must be one of {sorted(_FILTER_FUNCS)}, got {func!r}"
        )
    if op not in _FILTER_OPS:
        raise ValueError(f"op must be one of {sorted(_FILTER_OPS)}, got {op!r}")
    stat = F.max_by(_VAL, _TS) if func == "last" else _FILTER_FUNCS[func](_VAL)
    t = F.lit(float(threshold))
    return _series_stat_filter(df, stat, lambda s: _FILTER_OPS[op](s, t))


def round_series(df: DataFrame, precision: int = 0) -> DataFrame:
    """graphite ``round(seriesList, precision)`` — round every value to
    *precision* decimal places with HALF_EVEN (banker's) rounding:
    graphite-web calls Python 3's built-in ``round``, which is
    round-half-to-even, so Spark's ``bround`` (not ``round``, which is
    HALF_UP) is the matching kernel.  One documented edge: for decimals a
    double can't represent exactly, ``bround`` rounds the SHORTEST
    DECIMAL representation (2.675 -> 2.68) while CPython rounds the
    underlying binary value (2.675 is stored as 2.67499.. -> 2.67);
    ties that doubles DO represent exactly (x.5 at precision 0) agree on
    both engines."""
    return _with_value(df, F.bround(F.col(_VAL), int(precision)))


# -- tag functions (graphite 1.1 tagdb, over an explicit tag table) --------
#
# The Whisper file format carries no tag store: graphite-web keeps tags
# in a separate TagDB keyed by series name. These functions therefore
# take the TagDB EXPLICITLY as a ``(metric, tag, tag_value)`` dimension
# table — a deployment that migrated its tagdb supplies it; deployments
# without one simply have no tagged series (COVERAGE.md scope note).
# Faithful consequence of querying a tagdb: series absent from
# ``tags_df`` are invisible to seriesByTag (exactly graphite's
# behavior), and a tag a series lacks reads as the empty string for
# predicate evaluation.

import re as _re

_TAG_PRED_RE = _re.compile(r"^([A-Za-z0-9_.-]+)(!=~|=~|!=|=)(.*)$")


def _tags_wide(tags_df: DataFrame, keys: list[str]) -> DataFrame:
    """(metric, <one column per referenced tag key>) — conditional-max
    pivot, ONE exchange on metric, sized by the series count (never the
    point count)."""
    return tags_df.groupBy(F.col("metric")).agg(
        *[
            F.max(F.when(F.col("tag") == k, F.col("tag_value"))).alias(
                f"__tag_{k}"
            )
            for k in keys
        ]
    )


def _parse_tag_predicates(
    predicates: tuple[str, ...]
) -> list[tuple[str, str, str]]:
    if not predicates:
        raise ValueError("seriesByTag needs at least one tag predicate")
    parsed = []
    for p in predicates:
        m = _TAG_PRED_RE.match(p)
        if not m:
            raise ValueError(f"bad tag predicate: {p!r}")
        parsed.append((m.group(1), m.group(2), m.group(3)))
    # graphite requires at least one spec that cannot match a missing
    # tag ('=' with a non-empty value, or a regex — anchored regexes
    # against '' are almost never intended and graphite applies the
    # same rule to them)
    if not any(
        (op == "=" and val != "") or op == "=~" for _, op, val in parsed
    ):
        raise ValueError(
            "seriesByTag needs at least one '=non-empty' or '=~' predicate"
        )
    return parsed


def series_by_tag(df: DataFrame, tags_df: DataFrame, *predicates: str) -> DataFrame:
    """graphite ``seriesByTag('tag=value', ...)`` over an explicit tagdb
    table ``tags_df`` = (metric, tag, tag_value).

    Operators: ``=`` equality, ``!=`` inequality, ``=~`` regex match
    (anchored at the start, graphite-web's ``re.match`` semantics),
    ``!=~`` regex non-match. A missing tag evaluates as ``''`` — so
    ``!=`` and ``!=~`` match series lacking the tag, exactly the tagdb
    rule. ALL predicates must hold (conjunction).

    Plan: pivot the referenced tags per metric (one exchange over the
    series-sized tagdb), evaluate every predicate on that one row, then
    LEFT SEMI join the points — the matched-series set is
    series-cardinality, so AQE broadcasts it under any realistic tagdb
    size and the fact scan never shuffles."""
    parsed = _parse_tag_predicates(predicates)
    keys = sorted({k for k, _, _ in parsed})
    wide = _tags_wide(tags_df, keys)
    cond = F.lit(True)
    for k, op, val in parsed:
        v = F.coalesce(F.col(f"__tag_{k}"), F.lit(""))
        if op == "=":
            c = v == val
        elif op == "!=":
            c = v != val
        elif op == "=~":
            c = v.rlike("^(?:" + val + ")")
        else:  # '!=~'
            c = ~v.rlike("^(?:" + val + ")")
        cond = cond & c
    matched = wide.filter(cond).select("metric")
    return df.join(matched, _METRIC, "left_semi")


def group_by_tags(
    df: DataFrame, tags_df: DataFrame, agg: str, *keys: str
) -> DataFrame:
    """graphite ``groupByTags(seriesList, func, tag1, ...)``: aggregate
    pointwise across series sharing the listed tag values. Output series
    are named ``func;tag1=v1;...`` (missing tags group under and print
    as the empty value, the tagdb convention).

    Plan: tag pivot (series-sized) -> left join points on metric ->
    ONE exchange on (tag values..., timestamp) with map-side partial
    aggregation — the groupByNode shape with tagdb keys."""
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    if not keys:
        raise ValueError("groupByTags needs at least one tag key")
    wide = _tags_wide(tags_df, sorted(set(keys)))
    joined = df.join(wide, _METRIC, "left")
    vals = [F.coalesce(F.col(f"__tag_{k}"), F.lit("")) for k in keys]
    name = F.concat_ws(
        ";",
        F.lit(agg),
        *[F.concat(F.lit(f"{k}="), v) for k, v in zip(keys, vals)],
    )
    return (
        joined.groupBy(name.alias(_METRIC), F.col(_TS))
        .agg(_AGGS[agg](_VAL).alias(_VAL))
    )


def alias_by_tags(df: DataFrame, tags_df: DataFrame, *keys: str) -> DataFrame:
    """graphite ``aliasByTags(seriesList, tag1, ...)`` — rename each
    series to its tag values joined by dots (missing tags render
    empty). No aggregation; same-name collisions stay separate rows,
    like aliasByNode."""
    if not keys:
        raise ValueError("aliasByTags needs at least one tag key")
    wide = _tags_wide(tags_df, sorted(set(keys)))
    joined = df.join(wide, _METRIC, "left")
    name = F.concat_ws(
        ".",
        *[F.coalesce(F.col(f"__tag_{k}"), F.lit("")) for k in keys],
    )
    return joined.select(
        name.alias(_METRIC), F.col(_TS), F.col(_VAL)
    )
