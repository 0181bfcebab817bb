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


# -- bloom file index ----------------------------------------------------------


def test_bloom_index_no_false_negatives_and_prunes(spark, tmp_path):
    """Every present key's file is always admitted (no false negatives,
    exhaustively probed); absent keys prune (almost) everything; the
    Spark and driver-side hash twins agree; rebuilds are deterministic."""
    from pyspark.sql import functions as F

    from whisper_pandas_spark.sources.bloom_index import (
        _py_pos,
        _spark_pos,
        bloom_lookup,
        build_bloom_index,
        bloom_prune_files,
    )

    path = str(tmp_path / "t")
    # 8 files, keys range-clustered so each key lives in exactly one file
    df = spark.range(4000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    df.repartitionByRange(8, "k").write.parquet(path)

    M, H = 1 << 14, 7
    idx = build_bloom_index(spark, path, "k", m_bits=M, n_hashes=H)
    idx.cache()
    assert idx.count() == 8

    # hash twins agree
    probe = spark.createDataFrame([("123",), ("abc",)], "s string")
    for j in (0, 3, 6):
        got = {
            r["s"]: r["p"]
            for r in probe.select("s", _spark_pos("s", j, M).alias("p")).collect()
        }
        assert got == {s: _py_pos(s, j, M) for s in ("123", "abc")}, j

    # truth: which file holds each key
    truth = {
        r["k"]: r["f"]
        for r in spark.read.parquet(path)
        .select("k", F.input_file_name().alias("f"))
        .collect()
    }
    # no false negatives: every present key's file is admitted
    import random

    rnd = random.Random(5)
    for k in rnd.sample(range(4000), 60):
        files = bloom_prune_files(idx, [k], m_bits=M, n_hashes=H)
        assert truth[k] in files, k
    # absent keys: expected FP rate ~1%/file -> over 40 probes x 8 files,
    # admitted files stay rare
    admitted = sum(
        len(bloom_prune_files(idx, [k], m_bits=M, n_hashes=H))
        for k in range(100000, 100040)
    )
    assert admitted <= 8, admitted  # vs 320 without the index

    # end-to-end lookup: exact rows, bounded scan
    rows, scanned, total = bloom_lookup(
        spark, path, idx, "k", [17, 2999], m_bits=M, n_hashes=H
    )
    got = sorted((r["k"], r["v"]) for r in rows.collect())
    assert got == [(17, 17 % 97), (2999, 2999 % 97)]
    assert total == 8 and scanned <= 3  # 2 true files + rare FPs

    # determinism: a rebuild is bit-identical
    idx2 = build_bloom_index(spark, path, "k", m_bits=M, n_hashes=H)
    a = {r["file"]: r["words"] for r in idx.collect()}
    b = {r["file"]: r["words"] for r in idx2.collect()}
    assert a == b
    idx.unpersist()


def test_bloom_index_validates_geometry(spark, tmp_path):
    import pytest

    from whisper_pandas_spark.sources.bloom_index import build_bloom_index

    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom_index(spark, str(tmp_path), "k", m_bits=100)
    with pytest.raises(ValueError, match="n_hashes"):
        build_bloom_index(spark, str(tmp_path), "k", m_bits=64, n_hashes=0)


def test_bloom_lookup_preserves_hive_partition_columns(spark, tmp_path):
    """Regression (round-8 advisory): the pruned-file read must set
    basePath so a Hive-partitioned table keeps its partition columns —
    both bloom_lookup branches (files admitted vs none) now agree on
    schema, and a partition-column key even filters correctly."""
    from pyspark.sql import functions as F

    from whisper_pandas_spark.sources.bloom_index import (
        bloom_lookup,
        build_bloom_index,
    )

    path = str(tmp_path / "pt")
    df = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("p"),
        (F.col("id") * 3).alias("v"),
    )
    df.write.partitionBy("p").parquet(path)

    M, H = 1 << 12, 7
    idx = build_bloom_index(spark, path, "k", m_bits=M, n_hashes=H)

    rows, scanned, total = bloom_lookup(
        spark, path, idx, "k", [7, 42], m_bits=M, n_hashes=H
    )
    # partition column present in the result (used to vanish pre-fix)
    assert set(rows.columns) == {"k", "p", "v"}
    got = sorted((r["k"], r["p"], r["v"]) for r in rows.collect())
    # Hive partition-type inference reads p=2 back as int
    assert got == [(7, 3, 21), (42, 2, 126)]

    # empty-prune branch: same schema
    empty, s0, _ = bloom_lookup(
        spark, path, idx, "k", [999999], m_bits=M, n_hashes=H
    )
    assert set(empty.columns) == {"k", "p", "v"}

    # a PARTITION-column key now works end-to-end too
    idx_p = build_bloom_index(spark, path, "p", m_bits=M, n_hashes=H)
    prow, _, _ = bloom_lookup(
        spark, path, idx_p, "p", [2], m_bits=M, n_hashes=H
    )
    assert {r["p"] for r in prow.collect()} == {2}
    assert prow.count() == 100
