"""Parquet table loaders for the TPC-H-ish driver testdata.

One parquet file per table under ``/root/testdata/sf{0.001,0.01,0.1}/``
(see ``TESTDATA.md``). Parquet is the engine's canonical columnar scan:
column pruning and predicate pushdown reach the file scan for free
(``PushedFilters`` / ``ReadSchema`` in ``.explain("formatted")``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as LONG nanoseconds
    (``nanosAsLong``) and convert to a microsecond TIMESTAMP with integer
    division — bit-identical to DuckDB's ns→µs truncation.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Load all testdata tables; also registers each as a temp view so the
    SQL surface (``spark.sql``) sees the same relations the DuckDB oracle
    does."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
