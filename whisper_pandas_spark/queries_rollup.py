"""Registry entries: the Whisper rollup family (SURVEY.md §2.4 A1–A9)
exercised on the ``events`` table (the driver's time-series stand-in).

Oracle notes: bucket is emitted as BIGINT epoch seconds (not TIMESTAMP) so
Spark/DuckDB type coercion can't skew the hash; float aggregates are
rounded to 6 dp identically on both sides; Spark's ``unix_timestamp``
truncates sub-second parts, so the DuckDB side uses ``floor(epoch(ts))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.operators.rollup import rollup
from whisper_pandas_spark.registry import _table, register

_RES = 3600  # 1-hour tumbling windows
_FINE = 600  # assumed fine resolution for avg_zero / xFilesFactor (6 slots/window)


def _spark_rollup(spark: SparkSession, sf_dir: str, method: str, xff: float = 0.0) -> DataFrame:
    events = _table(spark, sf_dir, "events")
    out = rollup(
        events,
        _RES,
        method,
        x_files_factor=xff,
        fine_resolution_seconds=_FINE,
        keys=("event_type",),
        ts_col="ts",
        value_col="value",
    )
    return out.select(
        "event_type",
        F.unix_timestamp("bucket").alias("bucket_epoch"),
        F.round("value", 6).alias("value"),
        "n_points",
    ).orderBy("event_type", "bucket_epoch")


def _oracle_rollup(method: str, xff: float = 0.0) -> str:
    bucket = f"(CAST(floor(epoch(ts)) AS BIGINT) // {_RES}) * {_RES}"
    slots = _RES // _FINE
    exprs = {
        "average": "avg(value)",
        "sum": "sum(value)",
        "last": "max_by(value, ts)",
        "max": "max(value)",
        "min": "min(value)",
        "avg_zero": f"sum(value) / {slots}",
        "absmax": "max_by(value, abs(value))",
        "absmin": "min_by(value, abs(value))",
    }
    sql = (
        f"SELECT event_type, {bucket} AS bucket_epoch,"
        f" round({exprs[method]}, 6) AS value, count(value) AS n_points\n"
        "FROM events\nGROUP BY event_type, bucket_epoch"
    )
    if xff > 0.0:
        sql = f"SELECT * FROM ({sql}) WHERE n_points / {float(slots)} >= {xff}"
    return sql + "\nORDER BY event_type, bucket_epoch"


def _make(method: str, xff: float = 0.0, suffix: str = ""):
    name = f"rollup_{method}{suffix}"

    @register(name, oracle=_oracle_rollup(method, xff))
    def _q(spark: SparkSession, sf_dir: str, _m=method, _x=xff) -> DataFrame:
        return _spark_rollup(spark, sf_dir, _m, _x)

    _q.__name__ = name
    return _q


for _method in ("average", "sum", "last", "max", "min", "avg_zero", "absmax", "absmin"):
    _make(_method)
# xFilesFactor gate: emit a window only when ≥ 50% of expected slots filled
# (with ~2.8 events per (type, hour) and 6 slots, windows split both ways)
_make("average", xff=0.5, suffix="_xff")
