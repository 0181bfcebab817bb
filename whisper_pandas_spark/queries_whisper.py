"""Registry entries exercising the Whisper DataSource itself (§2.1 S1–S5).

DuckDB cannot read .wsp, so these entries use the WRITE path to close
the loop instead of going rows-only: the fixture tree is derived from
the `events` PARQUET table through df.write.format("whisper")
(queries_materialize._roundtrip_tree — deterministic points, fixed
geometry), which means a DuckDB oracle can recompute the expected
scan/fetch/meta output straight from the parquet in SQL. Every entry
here is a FULL value-hash check: scan decode, Graphite fetch semantics,
and header/metadata arithmetic are all verified against an engine that
never touches a .wsp byte. Byte-level goldens against the reference
geometry (3-archive, ring wrap, gzip) stay in tests/test_whisper_source.py
and tests/test_reference_fixture.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.registry import register
from whisper_pandas_spark.rt_fixture import RT_ARCHIVES, RT_BASE, RT_PTS_CTE

# fetch window: archive 0 (retention 80 000 s) must cover now - from
FETCH_FROM = RT_BASE + 10
FETCH_UNTIL = RT_BASE + 5000
FETCH_NOW = RT_BASE + 60_000  # span 59 990 s < 80 000 s -> finest archive


@register(
    "whisper_scan_rollup",
    oracle=f"""
{RT_PTS_CTE}
SELECT metric, epoch - (epoch % 60) AS bucket_epoch,
       avg(value) AS value, count(*) AS n_points
FROM pts GROUP BY metric, bucket_epoch
ORDER BY metric, bucket_epoch
""",
)
def whisper_scan_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1–S5 + A1 end-to-end: scan a directory of .wsp files as ONE
    DataFrame (metric column from the path), roll the finest archive up
    to 60 s averages. The tree is written from `events` by the whisper
    writer, so the oracle recomputes every bucket from parquet — a full
    value-hash check of the decode+rollup path (values are integer-valued
    doubles: sums are exact, the one closing division bit-identical)."""
    from whisper_pandas_spark.operators.rollup import rollup
    from whisper_pandas_spark.sources.whisper import register_whisper

    register_whisper(spark)
    from whisper_pandas_spark.queries_materialize import _roundtrip_tree

    d = _roundtrip_tree(spark, sf_dir)
    df = spark.read.format("whisper").option("base_dir", d).load(d)
    fine = df.filter(F.col("archive") == 0)
    return (
        rollup(fine, 60, "average")
        .select(
            "metric",
            F.unix_timestamp("bucket").alias("bucket_epoch"),
            "value",
            "n_points",
        )
        .orderBy("metric", "bucket_epoch")
    )


@register(
    "whisper_meta_table",
    oracle=f"""
WITH metrics AS (
  SELECT DISTINCT event_type FROM events
), arch(archive, "offset", seconds_per_point, points, retention, size) AS (
  VALUES (0, 40, 10, 8000, 80000, 96000),
         (1, 96040, 60, 2000, 120000, 24000)
)
SELECT event_type || '.wsp' AS path, archive, "offset",
       seconds_per_point, points, retention, size
FROM metrics CROSS JOIN arch
ORDER BY path, archive
""",
)
def whisper_meta_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S4/A10/A11: header-only metadata DataFrame (the reference's
    describe_archives surface). The tree geometry is {RT_ARCHIVES}
    (header 16 + 2×12 = 40 B; archive sizes points×12), so the oracle
    states the spec arithmetic per metric file while Spark READS it back
    from the headers the writer assembled — offset/retention/size are
    value-checked, not just counted."""
    from whisper_pandas_spark.sources.meta import archive_meta

    from whisper_pandas_spark.queries_materialize import _roundtrip_tree

    d = _roundtrip_tree(spark, sf_dir)
    meta = archive_meta(spark, d)
    # basename only: the temp-dir prefix varies per process and would make
    # the output non-deterministic across runs
    return meta.withColumn(
        "path", F.element_at(F.split("path", "/"), -1)
    ).orderBy("path", "archive")


@register(
    "whisper_fetch_range",
    oracle=f"""
{RT_PTS_CTE}
SELECT metric, epoch, value FROM pts
WHERE epoch >= {FETCH_FROM} AND epoch <= {FETCH_UNTIL}
ORDER BY metric, epoch
""",
)
def whisper_fetch_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graphite fetch semantics (sources/fetch.py): finest archive
    covering the requested span, archive + timestamp predicates pushed
    into the source (partition pruning + pre-Arrow row masking). The
    oracle replays the same time filter over the parquet-derived points,
    so the pushed-down decode window is value-checked end to end;
    plan/pushdown goldens stay in tests/test_whisper_source.py."""
    from whisper_pandas_spark.sources.fetch import fetch

    from whisper_pandas_spark.queries_materialize import _roundtrip_tree

    d = _roundtrip_tree(spark, sf_dir)
    return (
        fetch(spark, d, FETCH_FROM, FETCH_UNTIL, now_epoch=FETCH_NOW)
        .select(
            "metric",
            F.col("timestamp").cast("long").alias("epoch"),
            "value",
        )
        .orderBy("metric", "epoch")
    )
