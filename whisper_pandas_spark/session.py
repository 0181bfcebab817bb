"""SparkSession factory.

Pins the settings every operator in this package assumes:

- ``spark.sql.session.timeZone=UTC`` — Whisper timestamps are u32 epoch
  seconds interpreted as UTC (reference: ``whisper_pandas.py:222-223``
  converts with ``utc=True``); also required for DuckDB-oracle comparison
  (DuckDB timestamps are UTC-naive).
- AQE on — runtime coalescing, broadcast-conversion and skew-join handling
  stand in for hand-tuned shuffle planning at 100 TB.
- Arrow on — every Python<->JVM crossing (Pandas UDFs, the Whisper
  DataSource reader, createDataFrame) is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "whisper_pandas_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    Local test/bench runs use ``local[$SPARK_GRAFT_CPUS]``; on a real
    cluster the master comes from the environment and these configs are
    cluster-safe (AQE adjusts shuffle parallelism at runtime, so the static
    ``shuffle.partitions`` value is only the pre-AQE upper bound).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # allow Python DataSources (the Whisper reader) to receive filters
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
