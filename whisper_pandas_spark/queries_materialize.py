"""Registry entries for the MATERIALIZATION surfaces (SURVEY §2.11 Y4 +
the whisper WRITE path).

Both entries follow the same doctrine as the salted-join family: the
materialization must be semantically INVISIBLE, so the DuckDB oracle is
the plain formulation with no bucketing / no .wsp files anywhere.

- ``join_bucketed_colocated`` — writes customer+orders as bucketed
  catalog tables (sources/bucketed.py) and joins them. At 100 TB this is
  the "materialize once, join forever" step: the sort-merge join reads
  the bucket layout from the catalog and skips both exchanges (the
  zero-Exchange plan is asserted in tests/test_plans.py); the oracle is
  the plain join, proving bucketing changes nothing but the plan.
- ``whisper_write_roundtrip`` — df.write.format("whisper") is the
  flagship beyond-parity feature (the reference leaves write TBD:
  whisper_pandas.ipynb cell 39, README.md:55-56). Deterministic points
  derived from `events` are written through the full writer (ring-buffer
  assembly, cascade rollup to the coarse archive, xFilesFactor gate) and
  scanned back; the oracle recomputes every stored point — fine slots
  verbatim, coarse slots as sum/count averages with the m >= xff*expected
  gate — so the check is value-level PER SLOT, not just an aggregate.
"""

from __future__ import annotations

import re
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whisper_pandas_spark.registry import _table, register

# ---------------------------------------------------------------------------
# Y4: bucketed co-located join
# ---------------------------------------------------------------------------

_BUCKETS = 16
_BUCKETED_DONE: set[str] = set()


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize customer+orders bucketed by custkey, once per process
    per sf_dir (table names carry the sf_dir so scales don't collide)."""
    from whisper_pandas_spark.sources.bucketed import materialize_bucketed

    tag = re.sub(r"\W+", "_", sf_dir).strip("_")
    t_cust, t_ord = f"wps_bkt_customer_{tag}", f"wps_bkt_orders_{tag}"
    if sf_dir not in _BUCKETED_DONE:
        base = tempfile.mkdtemp(prefix="wps_bucketed_")
        materialize_bucketed(
            _table(spark, sf_dir, "customer"), t_cust, "c_custkey",
            _BUCKETS, sort_cols="c_custkey", path=f"{base}/customer",
        )
        materialize_bucketed(
            _table(spark, sf_dir, "orders"), t_ord, "o_custkey",
            _BUCKETS, sort_cols="o_custkey", path=f"{base}/orders",
        )
        _BUCKETED_DONE.add(sf_dir)
    return t_cust, t_ord


@register(
    "join_bucketed_colocated",
    oracle="""
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_totalprice_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join over two tables bucketed on the join key: the merge hint
    forces SMJ, and the catalog's bucket metadata elides both shuffle
    exchanges (plan-asserted in tests/test_plans.py). Oracle is the
    PLAIN join — bucketing must be semantically invisible. totalprice in
    integer cents so the sum is exact under any partitioning."""
    t_cust, t_ord = _bucketed_tables(spark, sf_dir)
    cust = spark.table(t_cust)
    orders = spark.table(t_ord).withColumn(
        "o_totalprice_cents",
        F.round(F.col("o_totalprice") * 100).cast("bigint"),
    )
    return (
        orders.hint("merge")
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice_cents").alias("sum_totalprice_cents"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Y25: Z-order clustered layout with proven row-group pruning
# ---------------------------------------------------------------------------

_ZORDER_DIR: dict[str, str] = {}
_ZBOX = (0.40, 0.50)  # box = [min + 40% span, min + 50% span] per column


def _zorder_table(spark: SparkSession, sf_dir: str) -> str:
    """Materialize orders Z-ordered on (o_custkey, o_totalprice), once
    per process per sf_dir."""
    from whisper_pandas_spark.sources.clustered import materialize_zorder

    if sf_dir not in _ZORDER_DIR:
        d = tempfile.mkdtemp(prefix="wps_zorder_")
        materialize_zorder(
            _table(spark, sf_dir, "orders"),
            d,
            ["o_custkey", "o_totalprice"],
            num_files=8,
        )
        _ZORDER_DIR[sf_dir] = d
    return _ZORDER_DIR[sf_dir]


@register(
    "layout_zorder_prune",
    oracle=f"""
WITH b AS (
  SELECT min(o_custkey) + {_ZBOX[0]} * (max(o_custkey) - min(o_custkey)) AS ck_lo,
         min(o_custkey) + {_ZBOX[1]} * (max(o_custkey) - min(o_custkey)) AS ck_hi,
         min(o_totalprice) + {_ZBOX[0]} * (max(o_totalprice) - min(o_totalprice)) AS tp_lo,
         min(o_totalprice) + {_ZBOX[1]} * (max(o_totalprice) - min(o_totalprice)) AS tp_hi
  FROM orders
)
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders, b
WHERE o_custkey >= ck_lo AND o_custkey <= ck_hi
  AND o_totalprice >= tp_lo AND o_totalprice <= tp_hi
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def layout_zorder_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y25: Z-order clustering proven end-to-end — orders materialized
    Morton-clustered on (o_custkey, o_totalprice), then a 10% x 10% box
    predicate aggregated per priority. The oracle runs the same box on
    the PLAIN table (layout must be semantically invisible; box bounds
    are the identical IEEE min + frac*span expression on both sides).
    Before returning, the entry decodes the written row-group min/max
    footers (sources/clustered.py:row_group_stats) and RAISES unless
    most row groups' bounding boxes miss the query box — so a layout
    regression that silently stops pruning turns the driver row red
    instead of just slow. totalprice summed in integer cents."""
    from whisper_pandas_spark.sources.clustered import row_group_stats

    d = _zorder_table(spark, sf_dir)
    t = spark.read.parquet(d)
    mm = t.agg(
        F.min("o_custkey").alias("ck_min"),
        F.max("o_custkey").alias("ck_max"),
        F.min("o_totalprice").alias("tp_min"),
        F.max("o_totalprice").alias("tp_max"),
    ).collect()[0]
    ck_lo = mm["ck_min"] + _ZBOX[0] * (mm["ck_max"] - mm["ck_min"])
    ck_hi = mm["ck_min"] + _ZBOX[1] * (mm["ck_max"] - mm["ck_min"])
    tp_lo = mm["tp_min"] + _ZBOX[0] * (mm["tp_max"] - mm["tp_min"])
    tp_hi = mm["tp_min"] + _ZBOX[1] * (mm["tp_max"] - mm["tp_min"])

    stats = row_group_stats(d, ["o_custkey", "o_totalprice"])
    hit = [
        g
        for g in stats
        if g["o_custkey"] is not None
        and g["o_custkey"][0] <= ck_hi
        and g["o_custkey"][1] >= ck_lo
        and g["o_totalprice"][0] <= tp_hi
        and g["o_totalprice"][1] >= tp_lo
    ]
    if len(stats) < 2 or len(hit) > len(stats) // 2:
        raise RuntimeError(
            f"z-order layout stopped pruning: {len(hit)}/{len(stats)} "
            "row groups intersect a 10%x10% box"
        )
    return (
        t.filter(
            (F.col("o_custkey") >= F.lit(ck_lo))
            & (F.col("o_custkey") <= F.lit(ck_hi))
            & (F.col("o_totalprice") >= F.lit(tp_lo))
            & (F.col("o_totalprice") <= F.lit(tp_hi))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "sum_cents"
            ),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Whisper write -> scan round trip
# ---------------------------------------------------------------------------

from whisper_pandas_spark.rt_fixture import (  # noqa: E402
    RT_ARCHIVES,
    RT_BASE,
    RT_CAP,
    RT_PTS_CTE,
    RT_XFF,
)

_ROUNDTRIP_DIR: dict[str, str] = {}


def _roundtrip_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (metric, timestamp, value) frame from `events`:
    metric = event_type, timestamps a 10 s ramp per metric in arrival
    (event_id) order, values integer-valued doubles so every stored
    float — including the cascade's sum/count averages — is exact."""
    ev = _table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    return (
        ev.select("event_type", "event_id", "user_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= RT_CAP)
        .select(
            F.col("event_type").alias("metric"),
            F.timestamp_seconds(
                F.lit(RT_BASE) + 10 * F.col("rn")
            ).alias("timestamp"),
            (F.col("user_id") % 997).cast("double").alias("value"),
        )
    )


def _roundtrip_tree(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _ROUNDTRIP_DIR:
        from whisper_pandas_spark.sources.whisper_write import write_whisper

        d = tempfile.mkdtemp(prefix="wps_roundtrip_")
        write_whisper(
            _roundtrip_points(spark, sf_dir), d,
            archives=RT_ARCHIVES, aggregation="average",
            x_files_factor=RT_XFF,
        )
        _ROUNDTRIP_DIR[sf_dir] = d
    return _ROUNDTRIP_DIR[sf_dir]


@register(
    "whisper_write_roundtrip",
    oracle=f"""
{RT_PTS_CTE}, coarse AS (
  SELECT metric, epoch - (epoch % 60) AS bepoch,
         sum(value) AS s, count(*) AS m
  FROM pts GROUP BY metric, bepoch
)
SELECT metric, 0 AS archive, epoch, value FROM pts
UNION ALL
SELECT metric, 1 AS archive, bepoch AS epoch, s / m AS value
FROM coarse WHERE m >= 3
ORDER BY metric, archive, epoch
""",
)
def whisper_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write deterministic points as .wsp (cascade + xff ON), scan them
    back, return EVERY stored point of both archives. The oracle
    recomputes the fine slots verbatim and the coarse slots as exact
    sum/count averages gated by m >= ceil(xff * 60/10) = 3 — so header
    assembly, ring-slot addressing, the rollup cascade, and the
    xFilesFactor gate are all value-checked slot by slot. Values are
    integer-valued doubles: per-bucket sums are exact in binary, and the
    single closing division is bit-identical on both engines."""
    from whisper_pandas_spark.sources.whisper import register_whisper

    register_whisper(spark)
    d = _roundtrip_tree(spark, sf_dir)
    scan = spark.read.format("whisper").option("base_dir", d).load(d)
    return scan.select(
        "metric",
        "archive",
        F.col("timestamp").cast("long").alias("epoch"),
        "value",
    ).orderBy("metric", "archive", "epoch")


# ---------------------------------------------------------------------------
# Y154: Hive-partitioned layout with proven directory-level pruning
# ---------------------------------------------------------------------------
# The third member of the layout-pruning family: zorder = row-group
# min/max skipping, bloom = file-level membership skipping, and this one
# is the cheapest tier of all — DIRECTORY pruning, where the filter
# eliminates partitions before a single byte of parquet is opened. At
# 100 TB a date-partitioned event log is the default layout; a query
# that loses its PartitionFilters silently degrades to a full scan, so
# (zorder-entry doctrine) the entry RAISES when the filter fails to
# reach the scan rather than returning slow-but-correct rows.

_PART_DIR: dict[str, str] = {}
_PART_DAY_OFFSET = 3  # min event date + 3 — present at every SF (30-day span)


def _partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Materialize events as ts_date=YYYY-MM-DD/ Hive partitions, once
    per process per sf_dir."""
    if sf_dir not in _PART_DIR:
        d = tempfile.mkdtemp(prefix="wps_hivepart_")
        (
            _table(spark, sf_dir, "events")
            .withColumn("ts_date", F.to_date("ts"))
            .write.partitionBy("ts_date")
            .mode("overwrite")
            .parquet(d)
        )
        _PART_DIR[sf_dir] = d
    return _PART_DIR[sf_dir]


@register(
    "layout_partition_prune",
    oracle=f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
WHERE CAST(ts AS DATE) =
      (SELECT min(CAST(ts AS DATE)) + {_PART_DAY_OFFSET} FROM events)
GROUP BY event_type ORDER BY event_type
""",
)
def layout_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y154: Hive partition pruning proven end-to-end — events
    materialized as ts_date= directory partitions, then a one-day
    filter aggregated per event_type. The oracle runs the same
    predicate on the PLAIN table (the layout must be semantically
    invisible — the layout-family doctrine). Before returning, the
    entry inspects the physical plan and RAISES unless the date
    equality landed in the scan's PartitionFilters (directory-level
    pruning, zero I/O on the other 29 days) — a layout regression
    turns the driver row red instead of just slow. value summed in
    integer cents."""
    from whisper_pandas_spark.plans.inspect import partition_filters

    d = _partitioned_events(spark, sf_dir)
    day = (
        _table(spark, sf_dir, "events")
        .agg(
            F.date_add(F.min(F.to_date("ts")), _PART_DAY_OFFSET).alias("d")
        )
        .collect()[0]["d"]
    )
    q = spark.read.parquet(d).filter(F.col("ts_date") == F.lit(day))
    pf = " ".join(partition_filters(q))
    if "ts_date" not in pf or str(day) not in pf:
        raise RuntimeError(
            f"partition pruning lost: PartitionFilters=[{pf}] lacks the"
            f" ts_date = {day} directory predicate"
        )
    return (
        q.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_cents"),
        )
        .orderBy("event_type")
    )
