"""Registry entries: window functions (SURVEY.md §2.6) and scalar
functions (§2.8) — ranking, analytic, frame-based moving aggregates;
string / date / math / JSON expressions.

All window orderings include a unique tiebreaker (event_id / orderkey) so
results are deterministic on both engines; RANGE frames order by epoch
seconds on both sides so peer groups agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whisper_pandas_spark.registry import _table, register


@register(
    "window_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
ORDER BY o_custkey, rn
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the canonical top-k-per-group pattern
    (one shuffle on the partition key; no global sort)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        _table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_rank_dense",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal,
       rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
       dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drnk,
       ntile(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer
ORDER BY c_mktsegment, rnk
""",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over a partition."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        _table(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("c_mktsegment", "rnk")
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT event_id, user_id,
       round(value - lag(value) OVER w, 6) AS delta_prev,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics per user timeline."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta_prev"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("event_id")
    )


@register(
    "window_running_sum",
    oracle="""
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS running_total
FROM events
ORDER BY event_id
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user (ROWS frame, unique tiebreak)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _table(spark, sf_dir, "events")
        .select("event_id", "user_id", F.round(F.sum("value").over(w), 6).alias("running_total"))
        .orderBy("event_id")
    )


@register(
    "window_moving_avg_time",
    oracle="""
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id
                              ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 6)
         AS avg_1h
FROM events
ORDER BY event_id
""",
)
def window_moving_avg_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based moving average (RANGE frame over epoch seconds) — the
    natural generalization of the reference's fixed-resolution rollups to
    sliding windows."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return (
        _table(spark, sf_dir, "events")
        .select("event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("avg_1h"))
        .orderBy("event_id")
    )


@register(
    "window_first_last",
    oracle="""
SELECT user_id,
       min(ts_e) AS first_seen_epoch,
       max(ts_e) AS last_seen_epoch,
       count(*) AS n
FROM (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_e FROM events)
GROUP BY user_id
ORDER BY user_id
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last observation per key (min/max over epoch)."""
    return (
        _table(spark, sf_dir, "events")
        .select("user_id", F.unix_timestamp("ts").alias("ts_e"))
        .groupBy("user_id")
        .agg(
            F.min("ts_e").alias("first_seen_epoch"),
            F.max("ts_e").alias("last_seen_epoch"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Scalar function surface (§2.8)
# ---------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_u,
       length(p_name) AS name_len,
       regexp_replace(p_type, '[aeiou]', '', 'g') AS type_consonants,
       substring(p_name, 1, 5) AS name_head,
       concat(p_brand, ':', p_type) AS brand_type
FROM part
ORDER BY p_partkey
""",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/length/regexp_replace/substring/concat."""
    return (
        _table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.length("p_name").alias("name_len"),
            F.regexp_replace("p_type", "[aeiou]", "").alias("type_consonants"),
            F.substring("p_name", 1, 5).alias("name_head"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        )
        .orderBy("p_partkey")
    )


@register(
    "scalar_date_funcs",
    oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       count(*) AS n_orders,
       round(sum(o_totalprice), 6) AS month_total
FROM orders
GROUP BY yr, mo
ORDER BY yr, mo
""",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month extraction + monthly aggregation."""
    o = _table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            "o_totalprice",
        )
        .groupBy("yr", "mo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 6).alias("month_total"),
        )
        .orderBy("yr", "mo")
    )


@register(
    "scalar_math_funcs",
    oracle="""
SELECT l_linenumber,
       round(CAST(sum(CAST(round(abs(l_discount - 0.05), 6) AS DECIMAL(38,10))) AS DOUBLE)
             / count(*), 6) AS avg_abs_dev,
       round(CAST(sum(floor(l_quantity)) AS DOUBLE), 6) AS sum_floor_qty,
       round(CAST(sum(ceil(l_quantity)) AS DOUBLE), 6) AS sum_ceil_qty,
       round(CAST(sum(CAST(round(sqrt(l_extendedprice), 6) AS DECIMAL(38,10))) AS DOUBLE)
             / count(*), 6) AS avg_sqrt_price,
       round(CAST(sum(CAST(round(ln(l_extendedprice + 1), 6) AS DECIMAL(38,10))) AS DOUBLE)
             / count(*), 6) AS avg_log_price
FROM lineitem
GROUP BY l_linenumber
ORDER BY l_linenumber
""",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/floor/ceil/sqrt/ln inside aggregates.

    Double summation is order-dependent (Spark's partial aggregation order
    differs from a sequential oracle sum), so the hashed floats are made
    order-independent: round per-row first, sum in exact DECIMAL(38,10)
    arithmetic (associative ⇒ bit-identical under any partitioning), divide
    once, round the final result.
    """
    li = _table(spark, sf_dir, "lineitem")

    def dec_avg(col, alias):
        s = F.sum(F.round(col, 6).cast("decimal(38,10)")).cast("double")
        return F.round(s / F.count(F.lit(1)), 6).alias(alias)

    return (
        li.groupBy("l_linenumber")
        .agg(
            dec_avg(F.abs(F.col("l_discount") - 0.05), "avg_abs_dev"),
            F.round(F.sum(F.floor("l_quantity")).cast("double"), 6).alias("sum_floor_qty"),
            F.round(F.sum(F.ceil("l_quantity")).cast("double"), 6).alias("sum_ceil_qty"),
            dec_avg(F.sqrt("l_extendedprice"), "avg_sqrt_price"),
            dec_avg(F.log(F.col("l_extendedprice") + 1), "avg_log_price"),
        )
        .orderBy("l_linenumber")
    )


@register(
    "scalar_json_funcs",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
       count(*) AS n,
       round(sum(value), 6) AS total_value
FROM events
GROUP BY k_bucket
ORDER BY k_bucket
""",
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column
    (get_json_object ≡ json_extract_string)."""
    ev = _table(spark, sf_dir, "events")
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket"),
            "value",
        )
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .orderBy("k_bucket")
    )


@register(
    "scalar_case_when",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS size_class,
       o_orderstatus,
       count(*) AS n
FROM orders
GROUP BY size_class, o_orderstatus
ORDER BY size_class, o_orderstatus
""",
)
def scalar_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + two-key aggregation."""
    o = _table(spark, sf_dir, "orders")
    size_class = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("size_class")
    )
    return (
        o.select(size_class, "o_orderstatus")
        .groupBy("size_class", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("size_class", "o_orderstatus")
    )


@register(
    "window_sliding_avg",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep, value FROM events
), fanout AS (
  SELECT user_id, value, unnest(generate_series(
           CAST(ceil((ep - 3600 + 1) / 900.0) AS BIGINT) * 900,
           (ep // 900) * 900, 900)) AS win_start
  FROM e
)
SELECT to_timestamp(win_start)::TIMESTAMP AS win_start,
       count(*) AS n_events,
       round(avg(value), 6) AS avg_value
FROM fanout
GROUP BY win_start
ORDER BY win_start
""",
)
def window_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: sliding tumbling windows (1 h length, 15 min slide) over the
    event stream — ``F.window(ts, '1 hour', '15 minutes')``. Spark fans
    each row out to length/slide windows before the single groupBy
    shuffle (the oracle replicates the fan-out with generate_series)."""
    ev = _table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        ev.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "avg_value")
        .orderBy("win_start")
    )


@register(
    "window_session_agg",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0
         END AS new_session
  FROM ordered
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
)
def window_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: session windows (30 min inactivity gap) per user —
    ``F.session_window``. The oracle is the classic gaps-and-islands SQL,
    an INDEPENDENT algorithm that must agree session-for-session.
    session_start is min(ts) (engine-neutral; Spark's window.start equals
    it for event-time sessions)."""
    ev = _table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
        .orderBy("user_id", "session_start")
    )


@register(
    "window_ntile_quartiles",
    oracle="""
WITH t AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         ntile(4) OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice, o_orderkey) AS quartile
  FROM orders
)
SELECT o_orderpriority, CAST(quartile AS INT) AS quartile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents
FROM t GROUP BY o_orderpriority, quartile
ORDER BY o_orderpriority, quartile
""",
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6: ntile bucketing — per-priority price quartiles summarized.
    The tie-break on (price, orderkey) makes the ntile assignment total,
    so both engines agree row-for-row; one window exchange + one
    partial-agged rollup."""
    from pyspark.sql.window import Window

    o = _table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    t = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return (
        t.groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("o_orderpriority", "quartile")
    )
