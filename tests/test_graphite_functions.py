"""Graphite render-API function family (functions/graphite.py) vs
hand-computed expectations on small series."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whisper_pandas_spark.functions import graphite as g


@pytest.fixture(scope="module")
def series(spark):
    rows = []
    # two counters: web.host1.requests at 10s step, web.host2.requests
    # with a gap and a counter reset
    for i, v in enumerate([100.0, 110.0, 140.0, 150.0]):
        rows.append(("web.host1.requests", i * 10, v))
    for t, v in [(0, 50.0), (10, 80.0), (30, 10.0), (40, 15.0)]:
        rows.append(("web.host2.requests", t, v))
    df = spark.createDataFrame(rows, "metric string, epoch long, value double")
    return df.select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )


def _vals(df, metric):
    rows = [r for r in df.collect() if r["metric"] == metric]
    return [r["value"] for r in sorted(rows, key=lambda r: r["timestamp"])]


def test_derivative_and_non_negative(series):
    assert _vals(g.derivative(series), "web.host1.requests") == [None, 10.0, 30.0, 10.0]
    # host2: 80-50=30, 10-80=-70 (reset), 15-10=5
    assert _vals(g.derivative(series), "web.host2.requests") == [None, 30.0, -70.0, 5.0]
    assert _vals(g.non_negative_derivative(series), "web.host2.requests") == [
        None, 30.0, None, 5.0,
    ]


def test_per_second_uses_elapsed_time(series):
    # host2 gap: 10 -> 30 is 20 s; reset delta negative -> null
    assert _vals(g.per_second(series), "web.host2.requests") == [None, 3.0, None, 0.5]
    assert _vals(g.per_second(series), "web.host1.requests") == [None, 1.0, 3.0, 1.0]


def test_integral_scale_offset_absolute(series):
    assert _vals(g.integral(series), "web.host1.requests") == [100.0, 210.0, 350.0, 500.0]
    assert _vals(g.scale(series, 2.0), "web.host2.requests") == [100.0, 160.0, 20.0, 30.0]
    assert _vals(g.offset(series, -50.0), "web.host2.requests") == [0.0, 30.0, -40.0, -35.0]
    assert _vals(g.absolute(g.offset(series, -50.0)), "web.host2.requests") == [
        0.0, 30.0, 40.0, 35.0,
    ]


def test_clamp_nulls_outside_range(series):
    got = _vals(g.clamp(series, lo=20.0, hi=100.0), "web.host2.requests")
    assert got == [50.0, 80.0, None, None]  # 10 and 15 below lo


def test_moving_average_points(series):
    assert _vals(g.moving_average_points(series, 2), "web.host1.requests") == [
        100.0, 105.0, 125.0, 145.0,
    ]
    with pytest.raises(ValueError):
        g.moving_average_points(series, 0)


def _series_of(spark, vals):
    rows = [("m", 10 * i, v) for i, v in enumerate(vals)]
    return spark.createDataFrame(
        rows, "metric string, epoch long, value double"
    ).select("metric", F.timestamp_seconds("epoch").alias("timestamp"), "value")


def test_keep_last_value_whole_run_rule(spark):
    """graphite-web fills a null run only when the ENTIRE run fits the
    limit (backfilled on the next non-None; trailing runs included) —
    a longer gap stays fully null, never partially filled."""
    df = _series_of(spark, [1.0, None, None, None, 5.0])
    assert _vals(g.keep_last_value(df), "m") == [1.0, 1.0, 1.0, 1.0, 5.0]
    # 3-slot run > limit=2 -> untouched (graphite parity)
    assert _vals(g.keep_last_value(df, limit=2), "m") == [1.0, None, None, None, 5.0]
    assert _vals(g.keep_last_value(df, limit=3), "m") == [1.0, 1.0, 1.0, 1.0, 5.0]

    # short interior run fills; long trailing run does not; short does
    df2 = _series_of(spark, [1.0, None, 3.0, None, None])
    assert _vals(g.keep_last_value(df2, limit=2), "m") == [1.0, 1.0, 3.0, 3.0, 3.0]
    df3 = _series_of(spark, [1.0, None, 3.0, None, None, None])
    assert _vals(g.keep_last_value(df3, limit=2), "m") == [1.0, 1.0, 3.0, None, None, None]
    # leading nulls have no last value -> stay null
    df4 = _series_of(spark, [None, 2.0])
    assert _vals(g.keep_last_value(df4, limit=5), "m") == [None, 2.0]


def test_integral_preserves_null_slots(spark):
    df = _series_of(spark, [1.0, None, 2.0])
    assert _vals(g.integral(df), "m") == [1.0, None, 3.0]


def test_time_shift(series):
    shifted = g.time_shift(series, 60)
    t0 = sorted(
        r["timestamp"] for r in shifted.collect() if r["metric"] == "web.host1.requests"
    )[0]
    import datetime

    assert t0 == datetime.datetime(1970, 1, 1, 0, 1, 0)


def test_group_by_node_and_sum_series(series):
    byhost = g.group_by_node(series, 1, "sum")
    got = {(r["metric"], r["timestamp"].second + 60 * r["timestamp"].minute): r["value"]
           for r in byhost.collect()}
    assert got[("host1", 0)] == 100.0 and got[("host2", 0)] == 50.0
    # node 2 groups BOTH series -> pointwise sums at shared timestamps
    byname = g.group_by_node(series, 2, "sum")
    vals = {r["timestamp"].second + 60 * r["timestamp"].minute: r["value"]
            for r in byname.collect() if r["metric"] == "requests"}
    assert vals[0] == 150.0 and vals[10] == 190.0 and vals[20] == 140.0
    assert vals[30] == 160.0 and vals[40] == 15.0

    total = g.sum_series(series)
    srows = {r["timestamp"].second + 60 * r["timestamp"].minute: r["value"]
             for r in total.collect()}
    assert srows[0] == 150.0 and srows[40] == 15.0
    assert all(r["metric"] == "sumSeries" for r in total.collect())

    avg = g.average_series(series)
    arows = {r["timestamp"].second + 60 * r["timestamp"].minute: r["value"]
             for r in avg.collect()}
    assert arows[0] == 75.0 and arows[20] == 140.0

    with pytest.raises(ValueError):
        g.group_by_node(series, 1, "median")


def test_alias_by_node(series):
    a = g.alias_by_node(series, 1)
    assert {r["metric"] for r in a.collect()} == {"host1", "host2"}


def test_non_negative_derivative_counter_wrap(spark):
    """maxValue turns a counter wrap into the true rate: graphite-web
    computes delta + maxValue + 1 for negative deltas."""
    df = _series_of(spark, [250.0, 254.0, 2.0])  # 8-bit counter wraps at 255
    assert _vals(g.non_negative_derivative(df), "m") == [None, 4.0, None]
    got = _vals(g.non_negative_derivative(df, max_value=255), "m")
    assert got == [None, 4.0, 4.0]  # 2 - 254 + 255 + 1 = 4


def test_summarize_rebuckets_epoch_aligned(spark):
    rows = [("a.x", t, v) for t, v in [(0, 1.0), (15, 2.0), (30, 4.0), (65, 8.0)]]
    rows += [("a.y", 10, 100.0)]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    out = g.summarize(df, 30, "sum").collect()
    got = {(r["metric"], r["timestamp"].minute * 60 + r["timestamp"].second): r["value"]
           for r in out}
    assert got == {("a.x", 0): 3.0, ("a.x", 30): 4.0, ("a.x", 60): 8.0, ("a.y", 0): 100.0}
    assert _vals(g.summarize(df, 30, "max"), "a.x") == [2.0, 4.0, 8.0]
    with pytest.raises(ValueError):
        g.summarize(df, 30, "median")


def test_moving_median_and_offset_to_zero(series):
    # host1 values 100,110,140,150; trailing 3-point medians
    assert _vals(g.moving_median_points(series, 3), "web.host1.requests") == [
        100.0, 105.0, 110.0, 140.0,
    ]
    assert _vals(g.offset_to_zero(series), "web.host1.requests") == [
        0.0, 10.0, 40.0, 50.0,
    ]
    assert _vals(g.offset_to_zero(series), "web.host2.requests") == [
        40.0, 70.0, 0.0, 5.0,
    ]
    with pytest.raises(ValueError):
        g.moving_median_points(series, 0)


def test_as_percent_per_timestamp_totals(series):
    got = g.as_percent(series)
    # t=0: total 150 -> host1 100/150
    h1 = _vals(got, "web.host1.requests")
    assert h1[0] == pytest.approx(100 / 150 * 100)
    assert h1[1] == pytest.approx(110 / 190 * 100)
    # t=20: host1 is alone at that timestamp -> 100%
    assert h1[2] == pytest.approx(100.0)
    h2 = _vals(got, "web.host2.requests")
    assert h2[0] == pytest.approx(50 / 150 * 100)


def test_divide_series_broadcast_null_on_zero(spark):
    rows = [
        ("a.cpu", 0, 10.0), ("a.cpu", 10, 20.0), ("a.cpu", 20, 5.0),
        ("total", 0, 20.0), ("total", 10, 0.0),  # zero divisor; 20 missing
    ]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double")
    df = df.select("metric", F.timestamp_seconds("epoch").alias("timestamp"), "value")
    got = _vals(g.divide_series(df, "total"), "a.cpu")
    assert got == [0.5, None, None]


def test_highest_selects_top_series(spark):
    rows = []
    for m, base in [("m.a", 10), ("m.b", 100), ("m.c", 50)]:
        for t in range(3):
            rows.append((m, t * 10, float(base + t)))
    df = spark.createDataFrame(rows, "metric string, epoch long, value double")
    df = df.select("metric", F.timestamp_seconds("epoch").alias("timestamp"), "value")
    top2 = g.highest(df, 2, "max")
    assert {r["metric"] for r in top2.collect()} == {"m.b", "m.c"}
    assert top2.count() == 6  # full point sets survive
    top1_avg = g.highest(df, 1, "avg")
    assert {r["metric"] for r in top1_avg.collect()} == {"m.b"}
    with pytest.raises(ValueError):
        g.highest(df, 2, "bogus")


def test_moving_stddev_and_linear_regression(spark):
    from pyspark.sql import functions as F

    from whisper_pandas_spark.functions.graphite import (
        linear_regression,
        moving_stddev_points,
    )

    # exact line y = 2x + 5: regression reproduces every point; stdev of
    # a constant-difference window is the sample stddev of the values
    rows = [("m", 1_600_000_000 + 10 * i, 5.0 + 2.0 * (1_600_000_000 + 10 * i))
            for i in range(6)]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double")
    df = df.select("metric", F.timestamp_seconds("epoch").alias("timestamp"), "value")
    fit = linear_regression(df).orderBy("timestamp").collect()
    for r in fit:
        x = r["timestamp"].timestamp()
        assert abs(r["value"] - (5.0 + 2.0 * x)) < 1e-6
    sd = moving_stddev_points(df, 3).orderBy("timestamp").collect()
    # graphite divides by n (population) and renders partial head windows
    assert sd[0]["value"] == 0.0  # 1-point window
    import statistics
    vals = [r["value"] for r in df.orderBy("timestamp").collect()]
    assert abs(sd[1]["value"] - statistics.pstdev(vals[0:2])) < 1e-9
    assert abs(sd[2]["value"] - statistics.pstdev(vals[0:3])) < 1e-9
    import pytest as _pt
    with _pt.raises(ValueError):
        moving_stddev_points(df, 0)


def test_selectors_average_and_current_above(spark):
    from pyspark.sql import functions as F

    from whisper_pandas_spark.functions.graphite import (
        average_above,
        current_above,
    )

    rows = [
        ("hot", 1, 10.0), ("hot", 2, 20.0),     # avg 15, last 20
        ("cold", 1, 1.0), ("cold", 2, 2.0),     # avg 1.5, last 2
        ("spiky", 1, 100.0), ("spiky", 2, 0.0), # avg 50, last 0
    ]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double")
    df = df.select("metric", F.timestamp_seconds("epoch").alias("timestamp"), "value")
    assert sorted(
        r["metric"] for r in average_above(df, 10.0).select("metric").distinct().collect()
    ) == ["hot", "spiky"]
    assert sorted(
        r["metric"] for r in current_above(df, 1.5).select("metric").distinct().collect()
    ) == ["cold", "hot"]
    # series come back whole, not filtered per row
    assert average_above(df, 10.0).count() == 4


def test_round6_function_batch(spark):
    """transformNull / removeAbove(Below)Value / grep / aliasSub /
    diffSeries / min-max-range-countSeries / nPercentile / sortByTotal:
    golden values on a tiny two-series frame."""
    import datetime as dt

    from pyspark.sql import functions as F

    from whisper_pandas_spark.functions.graphite import (
        alias_sub,
        count_series,
        diff_series,
        grep_metrics,
        max_series,
        min_series,
        n_percentile,
        range_of_series,
        remove_above_value,
        remove_below_value,
        sort_by_total,
        transform_null,
    )

    t0 = dt.datetime(2024, 1, 1)  # naive = session TZ (UTC)

    def ts(i):
        return t0 + dt.timedelta(seconds=10 * i)

    rows = [
        ("app.a.v", ts(0), 1.0), ("app.a.v", ts(1), None), ("app.a.v", ts(2), 5.0),
        ("app.b.v", ts(0), 4.0), ("app.b.v", ts(1), 2.0),
    ]
    df = spark.createDataFrame(rows, "metric string, timestamp timestamp, value double")

    tn = {(r["metric"], r["timestamp"]): r["value"]
          for r in transform_null(df, -1.0).collect()}
    assert tn[("app.a.v", ts(1))] == -1.0 and tn[("app.a.v", ts(2))] == 5.0

    ra = {(r["metric"], r["timestamp"]): r["value"]
          for r in remove_above_value(df, 4.0).collect()}
    assert ra[("app.a.v", ts(2))] is None and ra[("app.b.v", ts(0))] == 4.0
    rb = {(r["metric"], r["timestamp"]): r["value"]
          for r in remove_below_value(df, 4.0).collect()}
    assert rb[("app.a.v", ts(0))] is None and rb[("app.a.v", ts(2))] == 5.0

    assert grep_metrics(df, r"\.a\.").select("metric").distinct().count() == 1
    assert grep_metrics(df, r"\.a\.", exclude=True).select("metric").distinct().count() == 1

    al = alias_sub(df, r"^app\.([a-z]+)\.v$", "srv_$1").select("metric").distinct()
    assert sorted(r["metric"] for r in al.collect()) == ["srv_a", "srv_b"]

    # diffSeries: a - b, nulls count as 0, full outer over timestamps
    d = {r["timestamp"]: r["value"]
         for r in diff_series(df, "app.a.v").collect()}
    assert d[ts(0)] == -3.0 and d[ts(1)] == -2.0 and d[ts(2)] == 5.0

    mn = {r["timestamp"]: r["value"] for r in min_series(df).collect()}
    mx = {r["timestamp"]: r["value"] for r in max_series(df).collect()}
    rg = {r["timestamp"]: r["value"] for r in range_of_series(df).collect()}
    ct = {r["timestamp"]: r["value"] for r in count_series(df).collect()}
    assert mn[ts(0)] == 1.0 and mx[ts(0)] == 4.0 and rg[ts(0)] == 3.0
    assert ct[ts(1)] == 1.0  # a's null point doesn't count

    # graphite _getPercentile([2,4], 50): fractionalRank 0.5*3=1.5 ->
    # rank ceils to 2 -> sorted[1] = 4.0 (NOT the interpolated 3.0 the
    # pre-r7 percentile_cont implementation produced)
    np_ = {(r["metric"], r["timestamp"]): r["value"]
           for r in n_percentile(df, 50.0).collect()}
    assert np_[("app.b.v", ts(0))] == np_[("app.b.v", ts(1))] == 4.0

    st = {(r["metric"], r["series_rank"]) for r in
          sort_by_total(df).select("metric", "series_rank").distinct().collect()}
    # totals tie at 6.0 -> lexicographic tie-break, a first
    assert st == {("app.a.v", 1), ("app.b.v", 2)}
    only = sort_by_total(df, limit=1).select("metric").distinct().collect()
    assert [r["metric"] for r in only] == ["app.a.v"]


def test_n_percentile_matches_graphite_nist_rank_pick(spark):
    """r6 advisory: graphite's _getPercentile (interpolate=False) picks
    sortedPoints[ceil(q/100*(n+1)) - 1] — a DISCRETE value, never a
    linear interpolation. points [1,2,3,4] at q=50: fractionalRank 2.5
    -> rank ceil-> 3 -> value 3.0 (percentile_cont would say 2.5)."""
    from whisper_pandas_spark.functions.graphite import n_percentile

    rows = [("m", 100 + i, float(v)) for i, v in enumerate([4, 1, 3, 2])]
    df = spark.createDataFrame(rows, "metric string, timestamp long, value double")
    got = {r["timestamp"]: r["value"] for r in n_percentile(df, 50.0).collect()}
    assert set(got.values()) == {3.0}

    # clamp edges: q tiny -> first, q=100 -> last; replays graphite's
    # rank==0 and rank-1==len branches
    assert {r["value"] for r in n_percentile(df, 1.0).collect()} == {1.0}
    assert {r["value"] for r in n_percentile(df, 100.0).collect()} == {4.0}

    # reference replay of graphite's exact algorithm on a fuzz grid
    import math
    import random

    rnd = random.Random(7)
    pts = sorted(rnd.uniform(0, 10) for _ in range(7))
    fdf = spark.createDataFrame(
        [("f", i, float(v)) for i, v in enumerate(pts)],
        "metric string, timestamp long, value double",
    )
    for q in (10, 33.3, 50, 66.6, 90, 99):
        fr = (q / 100.0) * (len(pts) + 1)
        rank = int(fr) + int(math.ceil(fr - int(fr)))
        want = pts[min(max(rank, 1), len(pts)) - 1]
        got_q = {r["value"] for r in n_percentile(fdf, q).collect()}
        assert got_q == {want}, q


# -- round-8 tail ----------------------------------------------------------


def test_hitcount_proportional_buckets(spark):
    """Rates at 10 s step: hits = value*10 per point, split across
    30 s epoch-aligned buckets; a point straddling a boundary splits
    proportionally (graphite-web hitcount semantics)."""
    rows = [("m", t, v) for t, v in [(0, 1.0), (10, 2.0), (20, 3.0), (30, 4.0)]]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    got = {
        int(r["timestamp"].timestamp()): r["value"]
        for r in g.hitcount(df, 30).collect()
    }
    # bucket 0: full points at 0,10,20 -> 10+20+30 = 60; bucket 30: 40
    assert got == {0: 60.0, 30: 40.0}

    # misaligned: point at t=25 (step inferred 10 from deltas 25,10)
    rows2 = [("m", 0, 1.0), ("m", 25, 6.0), ("m", 35, 2.0)]
    df2 = spark.createDataFrame(rows2, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    got2 = {
        int(r["timestamp"].timestamp()): r["value"]
        for r in g.hitcount(df2, 30, step_s=10).collect()
    }
    # t=25 covers [25,35): 5s in bucket0 (30), 5s in bucket30 (30)
    # t=0 covers [0,10) all bucket0; t=35 covers [35,45) all bucket30
    assert got2 == {0: 1.0 * 10 + 6.0 * 5, 30: 6.0 * 5 + 2.0 * 10}


def test_time_slice_nulls_outside(series):
    got = _vals(g.time_slice(series, 10, 30), "web.host2.requests")
    assert got == [None, 80.0, 10.0, None]  # slots kept, values nulled


def test_integral_by_interval_resets(spark):
    rows = [("m", t, v) for t, v in
            [(0, 1.0), (10, 2.0), (20, None), (30, 4.0), (40, 5.0)]]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    got = _vals(g.integral_by_interval(df, 30), "m")
    # bucket [0,30): 1, 3, None(gap visible); bucket [30,60): resets 4, 9
    assert got == [1.0, 3.0, None, 4.0, 9.0]


def test_sort_by_maxima_and_minima(spark):
    rows = [("a", 0, 5.0), ("a", 10, 1.0),
            ("b", 0, 3.0), ("b", 10, 2.0),
            ("c", 0, -4.0), ("c", 10, -1.0)]  # max <= 0: dropped by minima
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    mx = {r["metric"]: r["series_rank"] for r in g.sort_by_maxima(df).collect()}
    assert mx == {"a": 1, "b": 2, "c": 3}  # by max desc: 5, 3, -1
    mn = {r["metric"]: r["series_rank"] for r in g.sort_by_minima(df).collect()}
    assert mn == {"a": 1, "b": 2}  # c dropped (max<=0); by min asc: 1, 2
    top1 = {r["metric"] for r in g.sort_by_maxima(df, limit=1).collect()}
    assert top1 == {"a"}


def test_remove_above_below_percentile(spark):
    # 10 values 1..10; NIST rank for q=80: ceil(0.8*11)=9 -> value 9
    rows = [("m", i * 10, float(i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    above = _vals(g.remove_above_percentile(df, 80), "m")
    assert above == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, None]
    # q=20: rank ceil(0.2*11)=3 -> value 3; below-3 nulled
    below = _vals(g.remove_below_percentile(df, 20), "m")
    assert below == [None, None, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]


def test_average_outside_percentile(spark):
    # five series with averages 1..5; q=80 -> hi=rank ceil(.8*6)=4.8->5
    # -> avg 5; lo=q20 -> rank ceil(.2*6)=2 -> avg 2. Keep avg NOT strictly
    # between 2 and 5: series 1, 2, 5.
    rows = []
    for i in range(1, 6):
        rows += [(f"s{i}", 0, float(i)), (f"s{i}", 10, float(i))]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    kept = {r["metric"] for r in g.average_outside_percentile(df, 80).collect()}
    assert kept == {"s1", "s2", "s5"}
    # reflection: q=20 behaves as q=80
    kept2 = {r["metric"] for r in g.average_outside_percentile(df, 20).collect()}
    assert kept2 == kept


def test_changed_tracks_last_nonnull(spark):
    rows = [("m", t, v) for t, v in
            [(0, None), (10, 1.0), (20, 1.0), (30, 2.0), (40, None), (50, 2.0), (60, 3.0)]]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    got = _vals(g.changed(df), "m")
    # graphite fold: leading None 0, first value 0, same 0, change 1,
    # null 0, back-to-prev(2) 0, change 1
    assert got == [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0]


def test_delay_shifts_values_not_slots(series):
    got = _vals(g.delay(series, 1), "web.host1.requests")
    assert got == [None, 100.0, 110.0, 140.0]
    back = _vals(g.delay(series, -1), "web.host1.requests")
    assert back == [110.0, 140.0, 150.0, None]


def test_round8_selector_batch(spark):
    """max/min/avg/current Above/Below comparators (strict > for Above,
    <= for Below per graphite-web), lowest (min/avg/current), and
    mostDeviant variance ranking."""
    rows = [("a", 0, 1.0), ("a", 10, 9.0),    # max 9 min 1 avg 5 last 9 var 16
            ("b", 0, 4.0), ("b", 10, 4.0),    # max 4 min 4 avg 4 last 4 var 0
            ("c", 0, -2.0), ("c", 10, 6.0)]   # max 6 min -2 avg 2 last 6 var 16
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )

    def names(out):
        return {r["metric"] for r in out.collect()}

    assert names(g.maximum_above(df, 4.0)) == {"a", "c"}   # strict >
    assert names(g.maximum_below(df, 4.0)) == {"b"}        # <=
    assert names(g.minimum_above(df, 1.0)) == {"b"}        # strict >
    assert names(g.minimum_below(df, 1.0)) == {"a", "c"}   # <=
    assert names(g.average_below(df, 4.0)) == {"b", "c"}
    assert names(g.current_below(df, 6.0)) == {"b", "c"}
    assert names(g.lowest(df, 1, "min")) == {"c"}
    assert names(g.lowest(df, 2, "avg")) == {"b", "c"}
    assert names(g.lowest(df, 1, "current")) == {"b"}
    import pytest as _pt
    with _pt.raises(ValueError):
        g.lowest(df, 1, "nope")
    # mostDeviant: population variance a=16, c=16, b=0; tie by metric name
    md = {r["metric"]: r["series_rank"] for r in g.most_deviant(df, 2).collect()}
    assert md == {"a": 1, "c": 2}


def test_round8_moving_windows(series):
    assert _vals(g.moving_sum_points(series, 2), "web.host1.requests") == [
        100.0, 210.0, 250.0, 290.0,
    ]
    assert _vals(g.moving_min_points(series, 2), "web.host1.requests") == [
        100.0, 100.0, 110.0, 140.0,
    ]
    assert _vals(g.moving_max_points(series, 3), "web.host1.requests") == [
        100.0, 110.0, 140.0, 150.0,
    ]


def test_round8_batch3_pointwise(spark):
    rows = [("m", t, v) for t, v in
            [(0, 4.0), (10, 0.0), (20, -9.0), (30, None), (40, 100.0)]]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    assert _vals(g.invert(df), "m") == [0.25, None, -1.0 / 9.0, None, 0.01]
    lg = _vals(g.logarithm(df), "m")
    assert abs(lg[0] - 0.6020599913279624) < 1e-12
    assert lg[1] is None and lg[2] is None and lg[3] is None
    assert abs(lg[4] - 2.0) < 1e-12
    assert _vals(g.square_root(df), "m") == [2.0, 0.0, None, None, 10.0]
    assert _vals(g.pow_series(df, 2.0), "m") == [16.0, 0.0, 81.0, None, 10000.0]
    assert _vals(g.is_non_null(df), "m") == [1.0, 1.0, 1.0, 0.0, 1.0]


def test_round8_batch3_series_ops(spark):
    rows = [("app.db.req", 0, 2.0), ("app.db.req", 10, 4.0),
            ("app.web.req", 0, 6.0), ("app.web.req", 10, 8.0),
            ("app.db.err", 0, 1.0), ("app.db.err", 10, 1.0)]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    ranks = {r["metric"]: r["series_rank"] for r in g.sort_by_name(df).collect()}
    assert ranks == {"app.db.err": 1, "app.db.req": 2, "app.web.req": 3}

    # stdev over 2 points: population sd of (2,4) = 1
    sd = _vals(g.stdev_points(df, 2), "app.db.req")
    assert sd[0] == 0.0 and abs(sd[1] - 1.0) < 1e-9

    # scaleToSeconds(60) with derived 10s step: x * 6
    s = _vals(g.scale_to_seconds(df, 60), "app.db.req")
    assert s == [12.0, 24.0]

    # groupByNodes on (node0, node2): db.req+web.req fold per ts
    gn = {
        (r["metric"], int(r["timestamp"].timestamp())): r["value"]
        for r in g.group_by_nodes(df, "sum", 0, 2).collect()
    }
    assert gn[("app.req", 0)] == 8.0 and gn[("app.req", 10)] == 12.0
    assert gn[("app.err", 0)] == 1.0

    # weightedAverage paired on node 1 (db/web), weights = request counts
    w = spark.createDataFrame(
        [("cnt.db.x", 0, 1.0), ("cnt.web.x", 0, 3.0)],
        "metric string, epoch long, value double",
    ).select("metric", F.timestamp_seconds("epoch").alias("timestamp"), "value")
    wa = {r["timestamp"] for r in []}
    out = g.weighted_average(
        df.where(F.col("metric").contains("req")), w, 1
    ).collect()
    got = {int(r["timestamp"].timestamp()): r["value"] for r in out}
    # ts 0: (2*1 + 6*3)/(1+3) = 5.0; ts 10 has no weights -> absent
    assert got == {0: 5.0}

    import pytest as _pt
    with _pt.raises(ValueError):
        g.group_by_nodes(df, "nope", 0)
    with _pt.raises(ValueError):
        g.group_by_nodes(df, "sum")


def test_round8_batch4_interpolate_and_summarize(spark):
    rows = [("m", t, v) for t, v in
            [(0, None), (10, 10.0), (20, None), (30, None), (40, 40.0),
             (50, None), (60, 70.0), (70, None)]]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    got = _vals(g.interpolate(df), "m")
    # leading/trailing stay null; 20/30 linearly between 10 and 40;
    # 50 between 40 and 70
    assert got == [None, 10.0, 20.0, 30.0, 40.0, 55.0, 70.0, None]
    # limit=1: the 2-slot run (20,30) stays null, the 1-slot run fills
    lim = _vals(g.interpolate(df, limit=1), "m")
    assert lim == [None, 10.0, None, None, 40.0, 55.0, 70.0, None]

    # smartSummarize anchors at the series' first ts (5), not the epoch
    rows2 = [("s", 5 + 10 * i, float(i)) for i in range(6)]
    df2 = spark.createDataFrame(rows2, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    sm = {
        int(r["timestamp"].timestamp()): r["value"]
        for r in g.smart_summarize(df2, 30, "sum").collect()
    }
    assert sm == {5: 0 + 1 + 2.0, 35: 3 + 4 + 5.0}


def test_round8_batch4_path_ops(spark):
    rows = [("app.db.host1.req", 0, 1.0), ("app.db.host2.req", 0, 2.0),
            ("app.web.host1.req", 0, 4.0)]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    # drop node 2 (hostN): db series fold together
    ag = {r["metric"]: r["value"] for r in
          g.aggregate_with_wildcards(df, "sum", 2).collect()}
    assert ag == {"app.db.req": 3.0, "app.web.req": 4.0}
    assert {r["metric"] for r in g.alias_by_metric(df).collect()} == {"req"}
    assert {r["metric"] for r in g.substr_metric(df, 1, 3).collect()} == {
        "db.host1", "db.host2", "web.host1",
    }
    assert {r["metric"] for r in g.substr_metric(df, 2).collect()} == {
        "host1.req", "host2.req",
    }
    cl = g.constant_line(df, 9.5).collect()
    assert len(cl) == 1 and cl[0]["value"] == 9.5
    al = {r["metric"]: r["value"] for r in g.aggregate_line(df, "max").collect()}
    assert al["app.db.host1.req"] == 1.0

    # removeEmptySeries / unique
    rows2 = [("a", 0, None), ("a", 10, None), ("b", 0, 1.0),
             ("b", 0, 3.0)]  # duplicate slot
    df2 = spark.createDataFrame(rows2, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    assert {r["metric"] for r in g.remove_empty_series(df2).collect()} == {"b"}
    u = g.unique_series(df2.where(F.col("metric") == "b")).collect()
    assert len(u) == 1 and u[0]["value"] == 3.0


def test_holt_winters_per_point_face(spark):
    """Per-point prediction/bands/aberration replay an independent
    Python fold; the operator-face horizon forecast (tested in
    test_extensions) shares the recursion; aberration is 0 inside the
    band and the signed excess outside."""
    import numpy as np

    from whisper_pandas_spark.operators.forecast import holt_winters_forecast

    rng = np.random.default_rng(21)
    P, res, n, base = 4, 60, 24, 1_600_000_000
    vals = np.round(10 + 5 * np.sin(2 * np.pi * np.arange(n) / P)
                    + rng.normal(0, 0.3, n), 3)
    vals[17] += 30.0  # planted spike must show as positive aberration
    rows = [("m", base + res * i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    a, b_, gm, m = 0.3, 0.05, 0.4, 2.0
    got = {
        int(r["timestamp"].timestamp()): r
        for r in g.holt_winters(df, P, res, a, b_, gm, m).collect()
    }
    # independent fold
    t = [(base // res + i) for i in range(n)]
    l, b = float(vals[0]), 0.0
    s, d = [0.0] * P, [0.0] * P
    exp_pred = {t[0] * res - (base - base): (base, float(vals[0]), 0.0)}
    preds = {base: (float(vals[0]), 0.0)}
    for i in range(1, n):
        ph = t[i] % P
        p_i = l + b + s[ph]
        preds[base + res * i] = (p_i, d[ph])
        nl = a * (vals[i] - s[ph]) + (1 - a) * (l + b)
        nb = b_ * (nl - l) + (1 - b_) * b
        ns = gm * (vals[i] - nl) + (1 - gm) * s[ph]
        nd = gm * abs(vals[i] - p_i) + (1 - gm) * d[ph]
        l, b, s[ph], d[ph] = nl, nb, ns, nd
    for ts_abs, (p_i, dv) in preds.items():
        r = got[ts_abs]
        assert abs(r["prediction"] - p_i) < 1e-9
        assert abs(r["lower"] - (p_i - m * dv)) < 1e-9
        assert abs(r["upper"] - (p_i + m * dv)) < 1e-9
        x = r["value"]
        if x > r["upper"]:
            assert abs(r["aberration"] - (x - r["upper"])) < 1e-9
        elif x < r["lower"]:
            assert abs(r["aberration"] - (x - r["lower"])) < 1e-9
        else:
            assert r["aberration"] == 0.0
    spike = got[base + res * 17]
    assert spike["aberration"] > 10.0  # the planted anomaly fires


def test_round8_batch5(spark):
    rows = [("m", 10 * i, v) for i, v in
            enumerate([2.0, 4.0, 6.0, None, 10.0])]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    # EMA(window 2): seed = avg(2,4)=3 at i=1; c=2/3
    # i=2: (2/3)*6 + (1/3)*3 = 5; i=3 null in -> null out (state held);
    # i=4: (2/3)*10+(1/3)*5 — the gap neither decays nor emits
    ema = _vals(g.exponential_moving_average(df, 2), "m")
    assert ema[0] is None and ema[1] == 3.0 and abs(ema[2] - 5.0) < 1e-9
    assert ema[3] is None
    assert abs(ema[4] - (2/3*10 + 1/3*5)) < 1e-9

    mm = _vals(g.min_max(df), "m")
    assert mm == [0.0, 0.25, 0.5, None, 1.0]
    flat = spark.createDataFrame([("c", 0, 7.0), ("c", 10, 7.0)],
                                 "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value")
    assert _vals(g.min_max(flat), "c") == [0.0, 0.0]

    # timeStack: shift 20s, k in [0,2): k=1 copy lands 20s later
    ts = g.time_stack(df.where(F.col("value").isNotNull()), 20, 0, 2)
    got = {(r["metric"], int(r["timestamp"].timestamp())): r["value"]
           for r in ts.collect()}
    assert got[("m", 0)] == 2.0                       # k=0 untouched
    assert got[("m_timeshift_-1", 20)] == 2.0         # past value on later slot
    assert got[("m_timeshift_-1", 30)] == 4.0

    # divideSeriesLists paired on node 1
    num = spark.createDataFrame(
        [("err.db.x", 0, 3.0), ("err.web.x", 0, 9.0)],
        "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value")
    den = spark.createDataFrame(
        [("req.db.x", 0, 6.0), ("req.web.x", 0, 0.0)],
        "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value")
    dv = {r["metric"]: r["value"]
          for r in g.divide_series_lists(num, den, 1).collect()}
    assert dv == {"err.db.x": 0.5, "err.web.x": None}  # zero divisor -> null


def test_hitcount_spread_guard(spark):
    """A pathological derived step (sparse series) fails loudly instead
    of exploding one point into tens of thousands of buckets."""
    import pytest as _pt

    rows = [("m", 0, 1.0), ("m", 100_000_000, 2.0)]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    with _pt.raises(Exception, match="pass step_s"):
        g.hitcount(df, 30).collect()
    # explicit step keeps working
    ok = g.hitcount(df, 30, step_s=10).collect()
    assert len(ok) == 2


def test_hitcount_duplicate_timestamp_guard(spark):
    """Duplicate timestamps derive __step = 0 (min positive-delta includes
    0); that used to make F.sequence produce a descending range and a
    spurious negative-overlap bucket — now the in-plan assert fires."""
    import pytest as _pt

    rows = [("m", 0, 1.0), ("m", 0, 2.0), ("m", 10, 3.0)]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    with _pt.raises(Exception, match="pass step_s"):
        g.hitcount(df, 30).collect()
    # explicit step bypasses derivation and keeps working
    ok = g.hitcount(df, 30, step_s=10).collect()
    assert len(ok) >= 1


def test_round8_batch6_pointwise_cross_series(spark):
    rows = [("a", 0, 2.0), ("b", 0, 3.0), ("c", 0, 4.0),
            ("a", 10, 1.0), ("b", 10, 1.0), ("c", 10, 7.0)]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    mp = {int(r["timestamp"].timestamp()): r["value"]
          for r in g.multiply_series(df).collect()}
    assert mp == {0: 24.0, 10: 7.0}
    sd = {int(r["timestamp"].timestamp()): r["value"]
          for r in g.stddev_series(df).collect()}
    import math
    assert abs(sd[0] - math.sqrt(2/3)) < 1e-9   # pop sd of 2,3,4
    md = {int(r["timestamp"].timestamp()): r["value"]
          for r in g.median_series(df).collect()}
    assert md == {0: 3.0, 10: 1.0}
    ag = {int(r["timestamp"].timestamp()): r["value"]
          for r in g.aggregate_series(df, "max").collect()}
    assert ag == {0: 4.0, 10: 7.0}
    import pytest as _pt
    with _pt.raises(ValueError):
        g.aggregate_series(df, "nope")

    # removeBetweenPercentile(80): per-ts band [p20, p80] over 3 values:
    # NIST rank q80: ceil(.8*4)=4->clamp 3 -> max; q20: ceil(.2*4)=1 -> min.
    # Band covers ALL values -> nothing outside -> everything removed...
    # widen: use 5 series so the band is interior.
    # NOTE: no flat slot — a slot where all series share one value has
    # hi == lo == that value, so under graphite's inclusive-outside rule
    # (keep when NOT lo < v < hi) EVERY series is outside there and the
    # fixture stops discriminating.
    rows5 = [(f"s{i}", 0, float(i)) for i in range(1, 6)]
    d5 = spark.createDataFrame(rows5, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )
    # q80 over 5 values: rank ceil(.8*6)=5 -> value 5; q20: rank ceil(.2*6)=2 -> 2
    # graphite-web keeps when NOT (lo < v < hi), edges inclusive-outside:
    # v>=5 (s5) and v<=2 (s1, s2); s3, s4 strictly inside -> removed.
    kept = {r["metric"] for r in g.remove_between_percentile(d5, 80).collect()}
    assert kept == {"s1", "s2", "s5"}
    # reflection
    kept2 = {r["metric"] for r in g.remove_between_percentile(d5, 20).collect()}
    assert kept2 == kept


def test_round9_batch7_tail(spark):
    # five series, two slots: values 1..5 at t0, 10..50 at t10
    rows = [(f"s{i}", 0, float(i)) for i in range(1, 6)]
    rows += [(f"s{i}", 10, float(10 * i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )

    # percentileOfSeries(50): NIST rank ceil(.5*6)=3 -> 3rd of 5 sorted
    p = _vals(g.percentile_of_series(df, 50), "percentileOfSeries")
    assert p == [3.0, 30.0]
    # q=100 -> max, q tiny -> clamped to min
    assert _vals(g.percentile_of_series(df, 100), "percentileOfSeries") == [5.0, 50.0]
    assert _vals(g.percentile_of_series(df, 1), "percentileOfSeries") == [1.0, 10.0]
    import pytest as _pt
    with _pt.raises(ValueError):
        g.percentile_of_series(df, 0)

    # filterSeries: generic selector
    kept = {r["metric"] for r in g.filter_series(df, "max", ">", 30.0).collect()}
    assert kept == {"s4", "s5"}
    kept = {r["metric"] for r in g.filter_series(df, "average", "<=", 11.0).collect()}
    assert kept == {"s1", "s2"}  # avgs: 5.5, 11, 16.5, 22, 27.5
    kept = {r["metric"] for r in g.filter_series(df, "last", "=", 30.0).collect()}
    assert kept == {"s3"}
    with _pt.raises(ValueError):
        g.filter_series(df, "nope", ">", 0)
    with _pt.raises(ValueError):
        g.filter_series(df, "max", "~", 0)

    # round: banker's (HALF_EVEN) like python3 round in graphite-web
    rd = spark.createDataFrame(
        [("m", 0, 0.5), ("m", 10, 1.5), ("m", 20, 2.675), ("m", 30, None)],
        "metric string, epoch long, value double",
    ).select("metric", F.timestamp_seconds("epoch").alias("timestamp"), "value")
    assert _vals(g.round_series(rd), "m") == [0.0, 2.0, 3.0, None]
    got = _vals(g.round_series(rd, 2), "m")
    assert got[0] == 0.5 and got[1] == 1.5 and got[3] is None
    # documented deviation: bround rounds the shortest-decimal repr
    # (2.675 -> 2.68); CPython rounds the binary value (-> 2.67)
    assert abs(got[2] - 2.68) < 1e-9


def test_round9_apply_fallback_consolidate(spark):
    rows = [
        ("web.h1.req", 0, 1.0), ("web.h1.err", 0, 2.0),
        ("web.h2.req", 0, 10.0), ("web.h2.err", 0, 20.0),
        ("web.h1.req", 10, 3.0), ("web.h2.req", 10, 30.0),
    ]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double").select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )

    # applyByNode(1, sumSeries-per-prefix): prefix = web.hN
    out = g.apply_by_node(df, 1, lambda d: g.group_by_node(d, 0, "sum"))
    # group_by_node(0) over the prefix-rewritten frame groups by 'web'... use
    # the identity-style template instead: summarize keeps metric
    got = {(r["metric"], int(r["timestamp"].timestamp())): r["value"]
           for r in g.apply_by_node(df, 1, lambda d: g.summarize(d, 10, "sum")).collect()}
    assert got[("web.h1", 0)] == 3.0 and got[("web.h2", 0)] == 30.0
    assert got[("web.h1", 10)] == 3.0 and got[("web.h2", 10)] == 30.0

    # newName template: relabel output to node 1 of the prefix (hN)
    got2 = {(r["metric"], int(r["timestamp"].timestamp())): r["value"]
            for r in g.apply_by_node(
                df, 1, lambda d: g.summarize(d, 10, "sum"), new_name_node=1
            ).collect()}
    assert got2[("h1", 0)] == 3.0 and got2[("h2", 0)] == 30.0
    import pytest as _pt
    with _pt.raises(ValueError):
        g.apply_by_node(df, -1, lambda d: d)

    # fallbackSeries: non-empty primary wins; empty primary falls back
    fb = spark.createDataFrame(
        [("fallback", 0, 0.0)], "metric string, epoch long, value double"
    ).select("metric", F.timestamp_seconds("epoch").alias("timestamp"), "value")
    assert g.fallback_series(df, fb).count() == 6
    empty = df.where(F.col("value") > 1e9)
    assert [r["metric"] for r in g.fallback_series(empty, fb).collect()] == ["fallback"]

    # consolidateBy: first/last pick by timestamp inside the bucket
    got = {r["metric"]: r["value"]
           for r in g.consolidate_by(df, 60, "first").collect()}
    assert got["web.h1.req"] == 1.0 and got["web.h2.req"] == 10.0
    got = {r["metric"]: r["value"]
           for r in g.consolidate_by(df, 60, "last").collect()}
    assert got["web.h1.req"] == 3.0 and got["web.h2.req"] == 30.0
    got = {r["metric"]: r["value"]
           for r in g.consolidate_by(df, 60, "average").collect()}
    assert got["web.h1.req"] == 2.0
    # cumulative == consolidateBy sum
    got = {r["metric"]: r["value"] for r in g.cumulative(df, 60).collect()}
    assert got["web.h1.req"] == 4.0 and got["web.h2.req"] == 40.0
    import pytest as _pt
    with _pt.raises(ValueError):
        g.consolidate_by(df, 60, "nope")

    # useSeriesAbove: max(web.h2.req)=30 > 5 -> fetch web.h2.err's data
    got = {(r["metric"], int(r["timestamp"].timestamp())): r["value"]
           for r in g.use_series_above(df, 5.0, "req", "err").collect()}
    # qualifiers: h1.req(max 3) no; h1.err(2) no; h2.req(30) yes -> h2.err;
    # h2.err(20) yes -> name unchanged... regexp replaces 'req'->'err' so
    # h2.err stays h2.err; both map to web.h2.err
    assert set(got) == {("web.h2.err", 0)}
    assert got[("web.h2.err", 0)] == 20.0


# -- tag functions (seriesByTag / groupByTags / aliasByTags) ----------------


@pytest.fixture(scope="module")
def tagdb(spark):
    # host1/host2 tagged; web.host3.requests exists in the POINTS but not
    # in the tagdb (must be invisible to seriesByTag); host2 lacks 'dc'
    rows = [
        ("web.host1.requests", "host", "host1"),
        ("web.host1.requests", "dc", "east"),
        ("web.host2.requests", "host", "host2"),
    ]
    return spark.createDataFrame(rows, "metric string, tag string, tag_value string")


@pytest.fixture(scope="module")
def tagged_points(spark):
    rows = [
        ("web.host1.requests", 0, 1.0),
        ("web.host1.requests", 10, 2.0),
        ("web.host2.requests", 0, 10.0),
        ("web.host2.requests", 10, 20.0),
        ("web.host3.requests", 0, 100.0),
    ]
    df = spark.createDataFrame(rows, "metric string, epoch long, value double")
    return df.select(
        "metric", F.timestamp_seconds("epoch").alias("timestamp"), "value"
    )


def _metrics(df):
    return sorted({r["metric"] for r in df.collect()})


def test_series_by_tag_equality_and_regex(tagged_points, tagdb):
    out = g.series_by_tag(tagged_points, tagdb, "host=host1")
    assert _metrics(out) == ["web.host1.requests"]
    out = g.series_by_tag(tagged_points, tagdb, "host=~host.*")
    # host3 is NOT in the tagdb -> invisible even to a matching regex
    assert _metrics(out) == ["web.host1.requests", "web.host2.requests"]
    # anchored at the start: 'ost1' must NOT match 'host1'
    assert _metrics(g.series_by_tag(tagged_points, tagdb, "host=~ost.*")) == []


def test_series_by_tag_negation_matches_missing_tag(tagged_points, tagdb):
    # host2 has no 'dc' tag -> '' != 'east' -> matches
    out = g.series_by_tag(tagged_points, tagdb, "host=~host.*", "dc!=east")
    assert _metrics(out) == ["web.host2.requests"]
    out = g.series_by_tag(tagged_points, tagdb, "host=~host.*", "dc!=~ea.*")
    assert _metrics(out) == ["web.host2.requests"]


def test_series_by_tag_validation(tagged_points, tagdb):
    with pytest.raises(ValueError):
        g.series_by_tag(tagged_points, tagdb)  # no predicates
    with pytest.raises(ValueError):
        # every spec could match a missing tag -> rejected, like graphite
        g.series_by_tag(tagged_points, tagdb, "dc!=east")
    with pytest.raises(ValueError):
        g.series_by_tag(tagged_points, tagdb, "not a predicate!")


def test_group_by_tags_sum_missing_groups_under_empty(tagged_points, tagdb):
    out = g.group_by_tags(tagged_points, tagdb, "sum", "dc").collect()
    got = {(r["metric"], r["timestamp"].second): r["value"] for r in out}
    # host1 -> dc=east; host2 and the untagged host3 -> dc=''
    assert got[("sum;dc=east", 0)] == 1.0
    assert got[("sum;dc=east", 10)] == 2.0
    assert got[("sum;dc=", 0)] == 110.0
    assert got[("sum;dc=", 10)] == 20.0


def test_alias_by_tags(tagged_points, tagdb):
    out = g.alias_by_tags(tagged_points, tagdb, "host", "dc")
    names = _metrics(out)
    # host3 is untagged -> both tags render empty
    assert names == [".", "host1.east", "host2."]
