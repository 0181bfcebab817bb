"""Registry entries: join family (SURVEY.md §2.5) — equi joins in every
flavor, multiway star join, range join, as-of join.

Scale notes: dimension sides (customer/nation/region/supplier) are
broadcast — at TPC-H shapes the fact side is 4-6 orders of magnitude
larger, so a shuffle join would move the fact table for nothing. The
range/as-of joins use the bucketed / union-window formulations from
:mod:`whisper_pandas_spark.operators.asof` — no nested-loop joins anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.operators.asof import asof_join, range_join
from whisper_pandas_spark.registry import _table, register


@register(
    "join_inner_revenue",
    oracle="""
SELECT c_name, round(sum(o_totalprice), 6) AS total_spend, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_name
ORDER BY c_name
""",
)
def join_inner_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact→dim with the dim broadcast."""
    o = _table(spark, sf_dir, "orders")
    c = F.broadcast(_table(spark, sf_dir, "customer"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 6).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_name")
    )


@register(
    "join_left_order_counts",
    oracle="""
SELECT c_custkey, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
ORDER BY c_custkey
""",
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = _table(spark, sf_dir, "customer")
    o = _table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer",
    oracle="""
SELECT coalesce(a.k, b.k) AS k, a.n_orders, b.n_events
FROM (SELECT o_custkey AS k, count(*) AS n_orders FROM orders GROUP BY 1) a
FULL OUTER JOIN
     (SELECT user_id AS k, count(*) AS n_events FROM events GROUP BY 1) b
ON a.k = b.k
ORDER BY k
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides."""
    a = (
        _table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    b = (
        _table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        a.join(b, "k", "full_outer")
        .select("k", "n_orders", "n_events")
        .orderBy("k")
    )


@register(
    "join_right_part_counts",
    oracle="""
SELECT p_partkey, count(l_orderkey) AS n_lineitems
FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey
ORDER BY p_partkey
""",
)
def join_right_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join preserving parts with zero lineitems (§2.5 right).
    The preserved side is the smaller dim — at scale Spark/AQE flips this
    to a broadcast of `part` with the fact side streamed."""
    li = _table(spark, sf_dir, "lineitem")
    p = _table(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey")
        .agg(F.count("l_orderkey").alias("n_lineitems"))
        .orderBy("p_partkey")
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
ORDER BY c_custkey
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ EXISTS (no row duplication, right side never
    materialized into output)."""
    c = _table(spark, sf_dir, "customer")
    o = _table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 150000)
ORDER BY c_custkey
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ NOT EXISTS (customers with no large order)."""
    c = _table(spark, sf_dir, "customer")
    o = _table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_star_q3ish",
    oracle="""
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       strftime(any_value(o_orderdate), '%Y-%m-%d %H:%M:%S') AS n_date
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def join_star_q3ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style multiway join: dim filter → broadcast → fact-fact
    shuffle join on the order key → agg → top-k."""
    c = F.broadcast(
        _table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    )
    o = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue"),
            F.date_format(F.any_value("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias(
                "n_date"
            ),
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "join_range_pairs",
    oracle="""
SELECT e.event_id AS error_id, count(*) AS n_clicks_next_hour
FROM events e
JOIN events c
  ON e.user_id = c.user_id
 AND c.event_type = 'click'
 AND CAST(floor(epoch(c.ts)) AS BIGINT) >= CAST(floor(epoch(e.ts)) AS BIGINT)
 AND CAST(floor(epoch(c.ts)) AS BIGINT) <= CAST(floor(epoch(e.ts)) AS BIGINT) + 3600
WHERE e.event_type = 'error'
GROUP BY e.event_id
ORDER BY e.event_id
""",
)
def join_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bucket-equi-join + refine (operators/asof.py):
    clicks within one hour after each error, same user."""
    ev = _table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("user_id").alias("eu"), F.col("ts").alias("ets")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    joined = range_join(
        errors,
        clicks,
        left_ts="ets",
        right_ts="cts",
        lower_seconds=0,
        upper_seconds=3600,
        bucket_seconds=3600,
        extra_condition=F.col("eu") == F.col("cu"),
    )
    # Exact second-level comparison to mirror the oracle's epoch() compare:
    # range_join already compares at second granularity via unix_timestamp.
    return (
        joined.groupBy("error_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_next_hour"))
        .orderBy("error_id")
    )


@register(
    "join_asof",
    oracle="""
SELECT e.event_id, e.user_id, c.value AS value_asof
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
ORDER BY e.event_id
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest click value at-or-before each error, per user —
    the idiomatic time-series alignment (pd.merge_asof / DuckDB ASOF JOIN),
    implemented as ONE window pass over a union (operators/asof.py)."""
    ev = _table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(errors, clicks, on="user_id", value_cols=("value",), suffix="_x")
    return (
        out.select("event_id", "user_id", F.col("value_x").alias("value_asof"))
        .orderBy("event_id")
    )


@register(
    "join_asof_bucketed",
    oracle="""
SELECT e.event_id, e.user_id, c.value AS value_asof
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
ORDER BY e.event_id
""",
)
def join_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of join through the skew-immune plan: the carry window
    shuffles on (user_id, time-bucket) so one hot user can never pin a
    single task, with a tiny per-(key, bucket) spine window carrying
    values across bucket edges (operators/asof.py). Identical oracle to
    join_asof — sub-bucketing must be semantically invisible."""
    ev = _table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(
        errors, clicks, on="user_id", value_cols=("value",), suffix="_x",
        time_bucket_seconds=6 * 3600,
    )
    return (
        out.select("event_id", "user_id", F.col("value_x").alias("value_asof"))
        .orderBy("event_id")
    )


@register(
    "join_star_q10ish",
    oracle="""
SELECT c_custkey, any_value(n_name) AS nation,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) + 1e-9, 4)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def join_star_q10ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style returned-item report: which customers returned
    the most revenue — fact-fact join on the order key, nation dim
    broadcast, per-customer aggregate, top-20. Revenue folds per-row
    rounded values through DECIMAL(18,4) so the sum is exact and
    partition-order independent (the 1e-9 nudge breaks half-cent
    rounding ties identically on both engines)."""
    c = _table(spark, sf_dir, "customer")
    o = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = F.broadcast(_table(spark, sf_dir, "nation"))
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) + F.lit(1e-9), 4
    ).cast("decimal(18,4)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey")
        .agg(
            F.any_value("n_name").alias("nation"),
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "join_star_q7ish",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) + 1e-9, 4)
                     AS DECIMAL(18,4))) AS DOUBLE) AS volume
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
""",
)
def join_star_q7ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style volume-shipping report: cross-nation trade flows
    per ship year. Both nation dims broadcast (aliased twice), the
    lineitem-orders fact-fact join shuffles on the order key; the
    n1 < n2 predicate keeps each unordered nation pair once. DECIMAL
    revenue fold as in Q10."""
    s = _table(spark, sf_dir, "supplier")
    li = _table(spark, sf_dir, "lineitem")
    o = _table(spark, sf_dir, "orders")
    c = _table(spark, sf_dir, "customer")
    n1 = F.broadcast(
        _table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = F.broadcast(
        _table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) + F.lit(1e-9), 4
    ).cast("decimal(18,4)")
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(F.sum(rev).cast("double").alias("volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "join_q17ish_correlated_agg",
    oracle="""
WITH lim AS (
  SELECT l_partkey AS pk,
         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE)
                / count(l_quantity)) AS qty_lim
  FROM lineitem GROUP BY l_partkey
)
SELECT any_value(1) AS grp,
       CAST(count(*) AS BIGINT) AS n_small_orders,
       CAST(sum(CAST(round(l_extendedprice + 1e-9, 4)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN lim ON pk = l_partkey
WHERE p_brand = 'Brand#4' AND l_quantity < qty_lim
""",
)
def join_q17ish_correlated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style correlated-aggregate join: lineitems whose
    quantity is below 20% of their part's average — the decorrelated
    shape (per-part average as a derived table joined back on the
    fact key), which is exactly how Catalyst rewrites the correlated
    scalar subquery. The part-brand filter broadcasts; the per-part
    averages fold through DECIMAL (exact quotient inputs) and the
    revenue through per-row-rounded DECIMAL(18,4), so both engines
    agree bit-for-bit."""
    li = _table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        _table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    )
    lim = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("decimal(38,12)")).cast(
                    "double"
                )
                / F.count("l_quantity")
            )
        ).alias("qty_lim")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(lim, li.l_partkey == lim.pk)
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            F.any_value(F.lit(1)).alias("grp"),
            F.count(F.lit(1)).alias("n_small_orders"),
            F.sum(
                F.round(F.col("l_extendedprice") + F.lit(1e-9), 4).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "join_q18ish_having_semi",
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(38,6)))
                          AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 150
)
SELECT o.o_orderkey, o.o_orderpriority, b.total_qty,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents
FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
ORDER BY b.total_qty DESC, o.o_orderkey
LIMIT 25
""",
)
def join_q18ish_having_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style large-volume-order report: aggregate-then-HAVING
    derived table joined back to the orders fact, top-25 by total
    quantity. The HAVING side aggregates BEFORE the join (one partial-
    agg exchange; the filtered winner set is small and hash-joins on
    the order key); quantity folds through DECIMAL so threshold and
    sort order are partition-independent."""
    li = _table(spark, sf_dir, "lineitem")
    o = _table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("__q")
        )
        .filter(F.col("__q") > 150)
        .select(
            "l_orderkey", F.col("__q").cast("double").alias("total_qty")
        )
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_orderpriority",
            "total_qty",
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("totalprice_cents"),
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(25)
    )
