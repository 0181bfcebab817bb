"""Registry entries: core relational surface (SURVEY.md §2.2–2.8).

Each entry pairs the engine's DataFrame implementation with a DuckDB
oracle. Timestamps: the Spark session runs with UTC session timezone, so
``TIMESTAMP`` literals agree with DuckDB's UTC-naive timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from whisper_pandas_spark.operators.relational import (
    PRICING_SUMMARY_SQL,
    pricing_summary,
)
from whisper_pandas_spark.registry import _table, register


@register("q1_pricing_summary", oracle=PRICING_SUMMARY_SQL)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: filter → groupBy(2) → 8 aggs → sort on lineitem.

    Reference-shape parity: same scan→filter→aggregate→sort dataflow as
    ``whisper_pandas.py:186-234`` (decode→mask→convert→sort), distributed.
    """
    return pricing_summary(_table(spark, sf_dir, "lineitem"))
