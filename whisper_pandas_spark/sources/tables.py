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

    ``events.ts`` has shipped in two layouts across driver generations:
    parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    read as LONG nanoseconds via ``nanosAsLong`` and truncate to µs,
    bit-identical to DuckDB's ns→µs truncation) and plain TIMESTAMP(µs)
    without timezone (read natively as TIMESTAMP_NTZ). Both normalize to
    a session-zone TIMESTAMP (UTC sessions everywhere) so every
    downstream query sees one stable type.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):  # TIMESTAMP(NANOS) layout
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
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


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` as a file STREAM with the same ts normalization as
    :func:`load_table` (both driver parquet layouts: TIMESTAMP_NANOS
    stored as long, or a native timestamp column).

    The single shared reader for every availableNow replay entry — the
    driver's events layout is normalized in exactly one place, batch
    (`load_table`) and stream (here).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the file stream source requires a DIRECTORY; narrow it to the one
    # table file with a glob filter
    sdf = (
        spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(raw.schema["ts"].dataType, LongType):
        return sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return sdf.withColumn("ts", F.col("ts").cast("timestamp"))
