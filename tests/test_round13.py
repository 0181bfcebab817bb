"""Round-13 tests: ADVICE regression fixes + the round's new operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.test_round12b import _km_fixture


# ---------------------------------------------------------------------------
# ADVICE (r12, medium): the Arrow stages in kmeans/pca/randproj labeled
# the output id column with a hardcoded 'vec_id' — PySpark 4 binds Arrow
# batch columns to the declared schema BY NAME, so any other id_col
# raised KeyError despite the public id_col parameter.
# ---------------------------------------------------------------------------


def _renamed_fixture(spark, **kw):
    return _km_fixture(spark, **kw).withColumnRenamed("vec_id", "item_id")


def test_kmeans_int8_accepts_any_id_col(spark):
    from whisper_pandas_spark.operators.kmeans import kmeans_int8

    df = _renamed_fixture(spark, k=2, per=5)
    out = kmeans_int8(df, "item_id", "embedding", k=2, iters=1)
    assert out.columns[0] == "item_id"
    rows = out.collect()
    assert len(rows) == 10
    assert {r["item_id"] for r in rows} == set(range(10))


def test_rp_project_accepts_any_id_col(spark):
    from whisper_pandas_spark.operators.randproj import rp_project_int8

    df = _renamed_fixture(spark, k=2, per=5, dim=8)
    rows = rp_project_int8(df, "item_id", "embedding", 8, 4).collect()
    assert len(rows) == 10 and rows[0]["p"] is not None
    assert {r["item_id"] for r in rows} == set(range(10))


def test_pca_and_abtt_accept_any_id_col(spark):
    from whisper_pandas_spark.operators.pca import (
        abtt_correct,
        pca_top_component,
    )

    df = _renamed_fixture(spark, k=2, per=5, dim=8)
    p = pca_top_component(df, "item_id", "embedding", 8, iters=3).collect()
    assert len(p) == 10 and p[0]["eig"] > 0
    a = abtt_correct(df, "item_id", "embedding", 8, iters=3).collect()
    assert len(a) == 10 and len(a[0]["a"]) == 8


def test_same_result_under_either_id_name(spark):
    """The rename must not change values — only the label."""
    from whisper_pandas_spark.operators.kmeans import kmeans_int8

    df = _km_fixture(spark, k=2, per=5)
    base = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans_int8(df, "vec_id", "embedding", k=2, iters=2).collect()
    }
    ren = {
        r["item_id"]: (r["cluster"], r["dist"])
        for r in kmeans_int8(
            df.withColumnRenamed("vec_id", "item_id"),
            "item_id",
            "embedding",
            k=2,
            iters=2,
        ).collect()
    }
    assert base == ren


# ---------------------------------------------------------------------------
# ADVICE (r12, low): HLL NULL contract — NULLs are not sketched
# (COUNT(DISTINCT) semantics), instead of hashing the bare 'hll0' prefix.
# ---------------------------------------------------------------------------


def test_hll_ignores_null_values(spark):
    from whisper_pandas_spark.operators.hll import (
        hll_estimate,
        hll_shard_sketches,
    )

    rows = [("g", str(i)) for i in range(40)] + [("g", None)] * 25
    df = spark.createDataFrame(rows, "grp string, val string")
    with_nulls = hll_estimate(
        hll_shard_sketches(df, ("grp",), "val"), ("grp",)
    ).collect()[0]
    without = hll_estimate(
        hll_shard_sketches(df.where(F.col("val").isNotNull()), ("grp",), "val"),
        ("grp",),
    ).collect()[0]
    assert with_nulls["est"] == without["est"]


# ---------------------------------------------------------------------------
# ADVICE (r12, low): power_iterate zero-Gram guard.
# ---------------------------------------------------------------------------


def test_power_iterate_zero_gram_raises():
    from whisper_pandas_spark.operators.pca import power_iterate

    with pytest.raises(ValueError, match="power iteration collapsed"):
        power_iterate([[0, 0], [0, 0]], iters=2)


# ---------------------------------------------------------------------------
# ADVICE (r12, low): KN coverage precondition is checkable.
# ---------------------------------------------------------------------------


def test_kn_assert_counts_cover(spark):
    from whisper_pandas_spark.operators.knlm import (
        assert_counts_cover,
        trigram_stream,
    )

    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog ran")], "doc_id long, text string"
    )
    tri = trigram_stream(df, "doc_id", "text")
    full = tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c123"))
    assert_counts_cover(tri, full)  # covering counts: no raise
    lagging = full.where(F.col("w3") != "sat")
    with pytest.raises(ValueError, match="coverage violated"):
        assert_counts_cover(tri, lagging)


# ---------------------------------------------------------------------------
# Round-13 hot-path rewrite: the C4 line rules moved from an interpreted
# higher-order filter() lambda to an Arrow batch pass. The SQL form is
# kept as _c4_line_filter_expr; both must be bit-equal.
# ---------------------------------------------------------------------------


def test_c4_arrow_matches_sql_expr(spark):
    from whisper_pandas_spark.operators.cleaning import (
        _c4_line_filter_expr,
        c4_line_filter,
    )

    docs = []
    for i in range(40):
        lines = []
        for j in range(8):
            words = ["w%d" % (i * 8 + j + k) for k in range((i + j) % 9)]
            suffix = [".", "!", "?", "", ";", '"'][(i + j) % 6]
            line = " " * (j % 3) + " ".join(words) + suffix
            if (i + j) % 7 == 3:
                line += " javascript required."
            if (i + j) % 11 == 5:
                line += " see our privacy policy."
            lines.append(line)
        if i % 13 == 4:
            lines.append("lorem ipsum dolor sit amet.")
        if i % 17 == 6:
            lines.append("code { sample } block.")
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["doc_kept"], r["clean_text"])
        for r in c4_line_filter(df, "doc_id", "text").collect()
    }
    b = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["doc_kept"], r["clean_text"])
        for r in _c4_line_filter_expr(df, "doc_id", "text").collect()
    }
    assert a == b
    assert any(v[2] for v in a.values()) and not all(v[2] for v in a.values())


def test_c4_arrow_nondefault_thresholds(spark):
    from whisper_pandas_spark.operators.cleaning import (
        _c4_line_filter_expr,
        c4_line_filter,
    )

    df = spark.createDataFrame(
        [(1, "one two three.\nalpha beta gamma delta.\nshort.")],
        "doc_id long, text string",
    )
    for mw, mk in ((2, 1), (3, 2), (4, 3)):
        a = c4_line_filter(df, "doc_id", "text", mw, mk).collect()[0]
        b = _c4_line_filter_expr(df, "doc_id", "text", mw, mk).collect()[0]
        assert tuple(a) == tuple(b), (mw, mk)
