"""Whisper → partitioned parquet materialization (reference notebook
workflow, whisper_pandas.ipynb cells 31-37: to_frame → to_parquet →
read_parquet — here as one distributed pipeline).

At 100 TB this is the recommended first step for any tree that will be
queried more than once: parquet gives column pruning, predicate pushdown,
min/max row-group skipping and splittable compression that the .wsp
format (and especially .wsp.gz, which has no random access) cannot.
Partitioning by metric prefix keeps per-metric queries to one directory;
a date partition (derived from the timestamp) is the other common key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.sources.whisper import register_whisper


def read_whisper(
    spark: SparkSession,
    path: str,
    total_sort: bool = False,
    **options: str,
) -> DataFrame:
    """`spark.read.format("whisper")` with registration handled.

    total_sort=True returns a GLOBALLY time-ordered frame the scale-safe
    way: range-partition on (metric, timestamp) then sort within
    partitions — a distributed sort, never a single-reducer collapse.
    (The reader's own `time_sort` option already orders rows *within each
    archive chunk*, which is what the reference's per-archive
    `sort_values` gives; total order across chunks/files needs this.)
    """
    register_whisper(spark)
    reader = spark.read.format("whisper")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load(path)
    if total_sort:
        df = df.repartitionByRange("metric", "timestamp").sortWithinPartitions(
            "metric", "timestamp"
        )
    return df


def materialize_to_parquet(
    spark: SparkSession,
    whisper_path: str,
    out_dir: str,
    partition_by: tuple[str, ...] = ("metric",),
    with_date: bool = False,
    mode: str = "overwrite",
    time_sorted: bool = True,
    **options: str,
) -> DataFrame:
    """Decode a Whisper tree and write it as partitioned parquet; returns
    the reader for the written dataset.

    with_date adds a `ts_date` partition column (daily) — the layout for
    time-pruned queries: `WHERE ts_date = '2021-07-20'` prunes at the
    directory level before any I/O.

    time_sorted (default) sorts rows by timestamp within each output
    file: parquet row-group min/max statistics become tight disjoint
    ranges, so a later `WHERE timestamp BETWEEN ...` skips whole row
    groups instead of scanning them — the layout-level complement to the
    directory-level partition pruning.
    """
    df = read_whisper(spark, whisper_path, **options)
    cols = list(partition_by)
    if with_date:
        df = df.withColumn("ts_date", F.to_date("timestamp"))
        cols.append("ts_date")
    if time_sorted:
        df = df.sortWithinPartitions(*cols, "timestamp")
    (
        df.write.partitionBy(*cols)
        .mode(mode)
        .parquet(out_dir)
    )
    return spark.read.parquet(out_dir)
