"""Tolerant JSONL/CSV ingestion (sources/ingest.py): explicit-schema
reads, corrupt-record skip/keep/fail contract, lossless round-trips."""

from __future__ import annotations

import json

import pytest

from whisper_pandas_spark.sources.ingest import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)

SCHEMA = "doc_id long, text string, score double"


@pytest.fixture()
def jsonl_dir(tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "alpha", "score": 0.5}),
        json.dumps({"doc_id": 2, "text": "beta", "score": 1.25}),
        "{ this is not json at all",
        json.dumps({"doc_id": "NOT_A_NUMBER", "text": "gamma", "score": 1.0}),
        json.dumps({"doc_id": 4, "text": None, "score": None}),
    ]
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_jsonl_skip_drops_malformed(spark, jsonl_dir):
    df = read_jsonl(spark, jsonl_dir, SCHEMA)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(rows) == {1, 2, 4}  # garbage + bad-typed lines dropped
    assert rows[1]["text"] == "alpha" and rows[2]["score"] == 1.25
    assert rows[4]["text"] is None
    assert df.columns == ["doc_id", "text", "score"]


def test_read_jsonl_keep_surfaces_corrupt(spark, jsonl_dir):
    df = read_jsonl(spark, jsonl_dir, SCHEMA, on_error="keep")
    rows = df.collect()
    assert len(rows) == 5
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert len(bad) == 2
    assert any("not json" in r["_corrupt"] for r in bad)
    assert any("NOT_A_NUMBER" in r["_corrupt"] for r in bad)


def test_read_jsonl_fail_raises(spark, jsonl_dir):
    with pytest.raises(Exception):
        read_jsonl(spark, jsonl_dir, SCHEMA, on_error="fail").collect()
    with pytest.raises(ValueError):
        read_jsonl(spark, jsonl_dir, SCHEMA, on_error="bogus")


def test_jsonl_roundtrip_lossless(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, 'quote " and \n newline', 0.125), (2, None, None), (3, "", 2.0)],
        SCHEMA,
    )
    out = str(tmp_path / "out")
    write_jsonl(src, out)
    back = read_jsonl(spark, out, SCHEMA)
    assert sorted(back.collect()) == sorted(src.collect())


def test_csv_skip_and_roundtrip(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "doc_id,text,score\n"
        "1,alpha,0.5\n"
        "oops,beta,not_a_double\n"
        "3,gamma,2.5\n"
    )
    df = read_csv(spark, str(p), SCHEMA)
    assert sorted(r["doc_id"] for r in df.collect()) == [1, 3]

    kept = read_csv(spark, str(p), SCHEMA, on_error="keep")
    assert len(kept.collect()) == 3

    src = spark.createDataFrame([(1, "comma, inside", 0.5), (2, None, 1.0)], SCHEMA)
    out = str(tmp_path / "out_csv")
    write_csv(src, out)
    back = read_csv(spark, out, SCHEMA)
    assert sorted(back.collect()) == sorted(src.collect())


def test_write_sharded_caps_rows_and_preserves_order(spark, tmp_path):
    from whisper_pandas_spark.sources.ingest import write_sharded

    df = spark.range(1000).withColumnRenamed("id", "k").repartition(3)
    out = str(tmp_path / "shards")
    manifest = write_sharded(df, out, rows_per_shard=120, order_col="k").collect()
    assert sum(r["n_rows"] for r in manifest) == 1000
    assert all(r["n_rows"] <= 120 for r in manifest)
    assert len(manifest) >= 9  # ceil(1000/120) at minimum

    # global order survives into the shard layout: per-file (min, max)
    # ranges must not interleave
    from pyspark.sql import functions as F

    back = spark.read.parquet(out)
    ranges = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    # contents are exactly the input
    assert back.count() == 1000 and back.agg(F.sum("k")).collect()[0][0] == 499500


def test_skip_mode_count_works(spark, jsonl_dir, tmp_path):
    """Regression: skip mode must survive aggressive column pruning —
    the previous corrupt-column-filter implementation made .count()
    raise (Spark disallows querying only the internal corrupt column);
    DROPMALFORMED does not. The documented flip side: under a
    zero-column count() only SYNTACTICALLY bad lines are dropped (no
    columns are parsed, so no type mismatches can be detected) — the
    count is an upper bound; reading the declared columns gives exact
    semantics (4 vs 3 below)."""
    df = read_jsonl(spark, jsonl_dir, SCHEMA)
    assert df.count() == 4          # garbage line dropped; typecheck pruned away
    assert len(df.collect()) == 3   # full-schema read: bad-typed line dropped too
    p = tmp_path / "c.csv"
    p.write_text("doc_id,text,score\n1,a,0.5\nbad,b,zzz\n")
    assert len(read_csv(spark, str(p), SCHEMA).collect()) == 1
