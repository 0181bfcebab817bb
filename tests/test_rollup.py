"""Unit tests for the rollup operator family on a hand-built frame where
every expected value is computable by eye (xFilesFactor and avg_zero
semantics are the easy-to-get-wrong parts — SURVEY.md §7)."""

from __future__ import annotations

import datetime as dt

import pytest

from whisper_pandas_spark.operators.rollup import rollup

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def points(spark):
    # metric m: fine resolution 10 s; window 60 s has 6 expected slots.
    # Window 0 (t=0..50): 6 points filled. Window 1 (t=60..110): 2 points.
    rows = []
    for i in range(6):
        rows.append(("m", dt.datetime(2021, 1, 1, 0, 0, i * 10, tzinfo=UTC), float(i + 1)))
    rows.append(("m", dt.datetime(2021, 1, 1, 0, 1, 0, tzinfo=UTC), -10.0))
    rows.append(("m", dt.datetime(2021, 1, 1, 0, 1, 30, tzinfo=UTC), 4.0))
    return spark.createDataFrame(rows, "metric string, timestamp timestamp, value double")


def _by_bucket(df):
    out = {}
    for r in df.collect():
        out[r.bucket.replace(tzinfo=UTC).timestamp() % 3600] = (r.value, r.n_points)
    return out


def test_average_and_counts(points):
    got = _by_bucket(rollup(points, 60, "average"))
    assert got[0.0] == (pytest.approx(3.5), 6)
    assert got[60.0] == (pytest.approx(-3.0), 2)


def test_avg_zero_divides_by_expected_slots(points):
    got = _by_bucket(rollup(points, 60, "avg_zero", fine_resolution_seconds=10))
    assert got[0.0][0] == pytest.approx(21 / 6)
    assert got[60.0][0] == pytest.approx(-6 / 6)  # 2 filled of 6 slots


def test_xff_gates_on_expected_not_observed(points):
    got = _by_bucket(
        rollup(points, 60, "average", x_files_factor=0.5, fine_resolution_seconds=10)
    )
    assert 0.0 in got and 60.0 not in got  # 2/6 < 0.5 → window dropped


def test_last_max_min_abs(points):
    assert _by_bucket(rollup(points, 60, "last"))[60.0][0] == 4.0
    assert _by_bucket(rollup(points, 60, "max"))[60.0][0] == 4.0
    assert _by_bucket(rollup(points, 60, "min"))[60.0][0] == -10.0
    assert _by_bucket(rollup(points, 60, "absmax"))[60.0][0] == -10.0
    assert _by_bucket(rollup(points, 60, "absmin"))[60.0][0] == 4.0


def test_bad_method_and_missing_fine_resolution(points):
    with pytest.raises(ValueError, match="unknown rollup method"):
        rollup(points, 60, "median")
    with pytest.raises(ValueError, match="fine_resolution_seconds"):
        rollup(points, 60, "avg_zero")
