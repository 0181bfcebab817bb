"""Registry entries exercising the Whisper DataSource itself (§2.1 S1–S5).

The driver's parquet tables can't hold a .wsp file, so these queries
generate a DETERMINISTIC fixture (fixed seed, fixed geometry) into a
temp directory once per process and scan it through
``spark.read.format("whisper")``. No DuckDB oracle can read Whisper —
the entries are rows-only in the driver gate (row count + schema), while
byte-level golden values are covered by tests/test_whisper_source.py and
the reference-fixture parity suite.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.registry import register

_FIXTURE: str | None = None


def _fixture() -> str:
    """Build (once per process) a 3-archive wsp mirroring the reference
    geometry at 1/1000 scale; deterministic seed ⇒ stable row counts."""
    global _FIXTURE
    if _FIXTURE is None:
        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
        from wsp_fixtures import build_wsp

        d = Path(tempfile.mkdtemp(prefix="wsp_registry_"))
        build_wsp(str(d / "cpu.wsp"))
        build_wsp(str(d / "mem.wsp"), seed=7)
        _FIXTURE = str(d)
    return _FIXTURE


@register("whisper_scan_rollup")
def whisper_scan_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1–S5 + A1 end-to-end: scan a directory of .wsp files as ONE
    DataFrame (metric column from the path), roll the finest archive up
    to 60 s averages. Rows-only check (no SQL engine reads Whisper)."""
    from whisper_pandas_spark.operators.rollup import rollup
    from whisper_pandas_spark.sources.whisper import register_whisper

    register_whisper(spark)
    df = spark.read.format("whisper").load(_fixture())
    fine = df.filter(F.col("archive") == 0)
    return rollup(fine, 60, "average").orderBy("metric", "bucket")


@register("whisper_meta_table")
def whisper_meta_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S4/A10/A11: header-only metadata DataFrame (the reference's
    describe_archives surface) — retention/size arithmetic included."""
    from whisper_pandas_spark.sources.meta import archive_meta

    meta = archive_meta(spark, _fixture() + "/*.wsp")
    # basename only: the temp-dir prefix varies per process and would make
    # the output non-deterministic across runs
    return meta.withColumn(
        "path", F.element_at(F.split("path", "/"), -1)
    ).orderBy("path", "archive")


@register("whisper_fetch_range")
def whisper_fetch_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graphite fetch semantics (sources/fetch.py): finest archive
    covering the requested span, archive + timestamp predicates pushed
    into the source (partition pruning + pre-Arrow row masking).
    Rows-only check (no SQL engine reads .wsp); plan/pushdown goldens in
    tests/test_whisper_source.py."""
    from whisper_pandas_spark.sources.fetch import fetch

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    from wsp_fixtures import END_TS

    d = _fixture()
    return fetch(
        spark, f"{d}/cpu.wsp", END_TS - 3000, END_TS, now_epoch=END_TS
    ).orderBy("timestamp")
