"""Core relational queries over the TPC-H-ish testdata.

These are the engine's "query surface" counterparts to the reference's
decode→filter→convert→sort pipeline (``/root/reference/whisper_pandas.py:186-234``):
scan → pushed filter → aggregate → sort, expressed declaratively so
Catalyst handles pushdown, partial aggregation, and join selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H-Q1-style pricing summary (the flagship query).

    Shape: filter (pushed to parquet scan) → groupBy(2 keys) → 8 aggregates
    → order. At scale this is a map-side partial agg + one shuffle on two
    low-cardinality keys — the cheapest possible plan for the semantics;
    AQE coalesces the post-shuffle partitions.
    """
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  sum(l_quantity)                                           AS sum_qty,
  sum(l_extendedprice)                                      AS sum_base_price,
  sum(l_extendedprice * (1 - l_discount))                   AS sum_disc_price,
  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))     AS sum_charge,
  avg(l_quantity)                                           AS avg_qty,
  avg(l_extendedprice)                                      AS avg_price,
  avg(l_discount)                                           AS avg_disc,
  count(*)                                                  AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
