"""Layout clustering (sources/clustered.py): the pruning evidence is
read back from the written files' row-group min/max statistics — the
exact stats a parquet scan consults — not just from plan text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whisper_pandas_spark.sources.clustered import (
    materialize_range_clustered,
    materialize_zorder,
    row_group_stats,
    zorder_value,
)

SF = "/root/testdata/sf0.001"


def _boxes(stats, col):
    return [s[col] for s in stats if s[col] is not None]


def test_range_clustering_tiles_leading_column(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "clustered")
    materialize_range_clustered(docs, out, ["lang", "n_chars"], num_files=4)
    stats = row_group_stats(out, ["lang"])
    boxes = _boxes(stats, "lang")
    assert len(boxes) >= 4
    # row groups tile the lang space: for any language, the row groups
    # whose [min, max] interval can contain it are a strict minority
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    for lang in langs:
        matching = [b for b in boxes if b[0] <= lang <= b[1]]
        assert len(matching) < len(boxes), lang
    # read-back equality (clustering is layout only)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.selectExpr("sum(hash(doc_id, text))").first()[0] == docs.selectExpr(
        "sum(hash(doc_id, text))"
    ).first()[0]
    # the filter still reaches the scan
    plan = back.where(F.col("lang") == "en")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan


def test_zorder_shrinks_boxes_on_both_dims(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "value", "event_type"
    )
    linear = str(tmp_path / "linear")
    zorder = str(tmp_path / "zorder")
    # baseline: clustered on user_id only -> value is unclustered
    materialize_range_clustered(ev, linear, ["user_id"], num_files=16)
    materialize_zorder(ev, zorder, ["user_id", "value"], num_files=16, bits=12)

    def mean_width(path, col):
        boxes = _boxes(row_group_stats(path, [col]), col)
        assert boxes
        return sum(float(hi) - float(lo) for lo, hi in boxes) / len(boxes)

    glob_u = ev.agg(F.max("user_id") - F.min("user_id")).first()[0]
    glob_v = ev.agg(F.max("value") - F.min("value")).first()[0]
    # z-order with 16 z-ranges: the curve's top 4 bits quarter EACH
    # dimension, so per-row-group extents sit well below the global span
    assert mean_width(zorder, "user_id") < 0.45 * glob_u
    assert mean_width(zorder, "value") < 0.45 * glob_v
    # the single-column baseline leaves the second dimension unclustered
    # (each file still spans most of the value range)
    assert mean_width(linear, "value") > 0.6 * glob_v
    assert mean_width(linear, "user_id") < 0.2 * glob_u
    # layout preserves content
    assert spark.read.parquet(zorder).count() == ev.count()


def test_zorder_value_is_monotone_in_locality(spark):
    # neighbors in space -> close z-values; distant points -> far apart
    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 1.0), (255.0, 255.0)], "x double, y double"
    )
    z = df.select(
        zorder_value([F.col("x"), F.col("y")], [0.0, 0.0], [255.0, 255.0], bits=8).alias("z")
    ).collect()
    z0, z1, z2 = (r["z"] for r in z)
    assert z0 < z1 < z2
    assert z2 - z1 > z1 - z0  # the far point is much farther in z


def test_validation_errors(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        materialize_range_clustered(docs, str(tmp_path / "x"), [])
    with pytest.raises(ValueError):
        materialize_zorder(docs, str(tmp_path / "y"), ["n_chars"])
    with pytest.raises(ValueError):
        zorder_value([F.col("a")] * 5, [0] * 5, [1] * 5, bits=16)  # > 63 bits
