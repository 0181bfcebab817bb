"""Round-7 third wave: TPC-H plan-shape completion.

With Q1/Q3/Q5/Q7/Q10/Q17/Q18 (earlier rounds) and Q2/Q4/Q13/Q19/Q21/Q22
(queries_round7b), these nine close out the remaining distinct TPC-H
plan families, adapted to the testdata star schema (no partsupp table;
part.p_retailprice stands in for supply cost, supplier nations come
from s_nationkey):

- join_q6ish_filter_agg     pure scan-filter-aggregate (pushdown pin)
- join_q8ish_market_share   two-level CASE-share by year (ratio of two
                            aggregates of one join tree)
- join_q9ish_profit         computed-measure star (per-row decimal
                            difference), group by nation x year
- join_q11ish_value_frac    HAVING vs a global-fraction scalar
- join_q12ish_priority_case conditional CASE aggregation
- join_q14ish_promo_share   100 * conditional / total ratio
- join_q15ish_top_supplier  aggregate -> global max -> equality pick
- join_q16ish_supplier_cnt  COUNT DISTINCT + NOT-IN-subquery exclusion
- join_q20ish_nested_agg    nested correlated-aggregate EXISTS
                            (share-of-part threshold, integer
                            cross-multiplied)

Exactness follows the registry's standard recipes: per-row rounded
DECIMAL(18,4) money folds (+1e-9 tie nudge), integer cross-multiplied
ratios where a threshold compares two aggregates, and single IEEE
divisions written in the same operation order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.registry import _table, register


def _rev(expr):
    return F.round(expr + F.lit(1e-9), 4).cast("decimal(18,4)")


# -- Q6: pure filter-aggregate -------------------------------------------------


@register(
    "join_q6ish_filter_agg",
    oracle="""
SELECT any_value(1) AS grp, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * l_discount + 1e-9, 4)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def join_q6ish_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6: the no-join baseline — every predicate must reach the
    parquet scan (date range, discount band, quantity cap), then one
    partial-aggregable fold. The pushdown pin for pure scans."""
    li = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.any_value(F.lit(1)).alias("grp"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_rev(F.col("l_extendedprice") * F.col("l_discount")))
        .cast("double")
        .alias("revenue"),
    )


# -- Q8: market share by year ---------------------------------------------------


@register(
    "join_q8ish_market_share",
    oracle="""
SELECT year(o_orderdate) AS o_year,
       CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                     THEN CAST(round(l_extendedprice * (1 - l_discount)
                                     + 1e-9, 4) AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         AS nation_rev,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) + 1e-9, 4)
                     AS DECIMAL(18,4))) AS DOUBLE) AS total_rev
FROM customer
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region ON r_regionkey = n1.n_regionkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE r_name = 'ASIA'
GROUP BY year(o_orderdate)
ORDER BY o_year
""",
)
def join_q8ish_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8: one nation's share of a region's yearly revenue — the
    ratio-of-two-aggregates-over-one-join-tree family (numerator is a
    CASE fold of the same rows as the denominator, so ONE pass, not
    two joins). The share itself is left to the reader (one division
    of the two returned columns) so the hash gate checks the exact
    decimal folds, not a rounding convention."""
    c = _table(spark, sf_dir, "customer")
    n1 = F.broadcast(_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        _table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    o = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    s = F.broadcast(_table(spark, sf_dir, "supplier"))
    n2 = F.broadcast(
        _table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("n2_name"),
        )
    )
    rev = _rev(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        c.join(n1, c.c_nationkey == n1.n_nationkey)
        .join(r, n1.n_regionkey == r.r_regionkey)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n2, s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("n2_name") == "NATION_2", rev).otherwise(zero))
            .cast("double")
            .alias("nation_rev"),
            F.sum(rev).cast("double").alias("total_rev"),
        )
        .orderBy("o_year")
    )


# -- Q9: computed profit by nation x year ----------------------------------------


@register(
    "join_q9ish_profit",
    oracle="""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) + 1e-9, 4)
                     AS DECIMAL(18,4))
                - CAST(round(0.8 * p_retailprice * l_quantity + 1e-9, 4)
                       AS DECIMAL(18,4))) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year
""",
)
def join_q9ish_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9: computed-measure star — per-row profit is a DIFFERENCE
    of two independently rounded DECIMAL(18,4) terms (revenue minus a
    retail-price cost proxy; the testdata has no partsupp.supplycost),
    summed exactly, grouped by supplier nation x order year. The part
    name LIKE filter pushes into the broadcast dim."""
    li = _table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        _table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    )
    s = F.broadcast(_table(spark, sf_dir, "supplier"))
    n = F.broadcast(_table(spark, sf_dir, "nation"))
    o = _table(spark, sf_dir, "orders")
    amount = _rev(F.col("l_extendedprice") * (1 - F.col("l_discount"))) - _rev(
        F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
        .orderBy("nation", "o_year")
    )


# -- Q11: HAVING vs a global fraction ---------------------------------------------


@register(
    "join_q11ish_value_frac",
    oracle="""
WITH pv AS (
  SELECT l_partkey, sum(CAST(round(l_extendedprice + 1e-9, 4)
                             AS DECIMAL(18,4))) AS val
  FROM lineitem GROUP BY l_partkey
), tot AS (SELECT sum(val) AS total, count(*) AS n_parts FROM pv)
SELECT l_partkey AS partkey, CAST(val AS DOUBLE) AS value
FROM pv CROSS JOIN tot
WHERE val * n_parts * 2 > total * 3
ORDER BY value DESC, partkey
""",
)
def join_q11ish_value_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11: groups whose aggregate exceeds a FRACTION of the
    global MEAN (parts worth >1.5x the average part — scale-free, so
    the report is non-empty at every SF) — the HAVING-vs-scalar-subquery
    family. The threshold compare is exact decimal arithmetic
    (val * n_parts * 2 > total * 3, decimal-times-integer on both sides), never a float fraction; the one-row total broadcasts."""
    li = _table(spark, sf_dir, "lineitem")
    pv = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(_rev(F.col("l_extendedprice"))).alias("val")
    )
    tot = pv.agg(
        F.sum("val").alias("total"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .where(F.col("val") * F.col("n_parts") * 2 > F.col("total") * 3)
        .select("partkey", F.col("val").cast("double").alias("value"))
        .orderBy(F.desc("value"), "partkey")
    )


# -- Q12: conditional CASE aggregation ---------------------------------------------


@register(
    "join_q12ish_priority_case",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def join_q12ish_priority_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12: CASE-split counting inside one aggregation (the
    shipmode report, keyed on returnflag here) — one join, one pass,
    two conditional folds; the date filter pushes to the lineitem
    scan."""
    o = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# -- Q14: promo share ----------------------------------------------------------------


@register(
    "join_q14ish_promo_share",
    oracle="""
SELECT any_value(1) AS grp,
       CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(round(l_extendedprice * (1 - l_discount)
                                     + 1e-9, 4) AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         AS promo_rev,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) + 1e-9, 4)
                     AS DECIMAL(18,4))) AS DOUBLE) AS total_rev
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
""",
)
def join_q14ish_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14: promotion revenue share for one month — the
    conditional-over-total ratio family; like Q8 the gate checks the
    two exact folds and leaves the final division to the reader."""
    li = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = F.broadcast(_table(spark, sf_dir, "part"))
    rev = _rev(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    zero = F.lit(0).cast("decimal(18,4)")
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        F.any_value(F.lit(1)).alias("grp"),
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
        .cast("double")
        .alias("promo_rev"),
        F.sum(rev).cast("double").alias("total_rev"),
    )


# -- Q15: top supplier via aggregate max ----------------------------------------------


@register(
    "join_q15ish_top_supplier",
    oracle="""
WITH sr AS (
  SELECT l_suppkey, sum(CAST(round(l_extendedprice * (1 - l_discount)
                                   + 1e-9, 4) AS DECIMAL(18,4))) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
), mx AS (SELECT max(rev) AS m FROM sr)
SELECT s_suppkey, s_name, CAST(sr.rev AS DOUBLE) AS total_rev
FROM sr JOIN supplier ON s_suppkey = l_suppkey CROSS JOIN mx
WHERE sr.rev = mx.m
ORDER BY s_suppkey
""",
)
def join_q15ish_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15: the revenue view + global-max equality pick (ties all
    returned, like the spec) — aggregate, scalar max over the
    aggregate, equality filter. The DECIMAL folds make the equality
    well-defined (identical exact values on both engines)."""
    li = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = F.broadcast(_table(spark, sf_dir, "supplier"))
    sr = li.groupBy("l_suppkey").agg(
        F.sum(_rev(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "rev"
        )
    )
    mx = sr.agg(F.max("rev").alias("m"))
    return (
        sr.crossJoin(F.broadcast(mx))
        .where(F.col("rev") == F.col("m"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("rev").cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
    )


# -- Q16: COUNT DISTINCT + NOT-IN exclusion -------------------------------------------


@register(
    "join_q16ish_supplier_cnt",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type NOT IN ('PROMO', 'ECONOMY')
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 30
""",
)
def join_q16ish_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16: supplier diversity per part spec — COUNT DISTINCT
    over a join with a NOT-IN-subquery exclusion ('complaint'
    suppliers = negative balance), which Catalyst plans as a
    null-aware anti join against the tiny exclusion list."""
    li = _table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        _table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & ~F.col("p_type").isin("PROMO", "ECONOMY")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
        )
    )
    bad = _table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_key")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == F.col("bad_key"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(30)
    )


# -- Q20: nested correlated-aggregate EXISTS ------------------------------------------


@register(
    "join_q20ish_nested_agg",
    oracle="""
WITH q AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(round(l_quantity) AS BIGINT)) AS sq
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%bolt%'
  GROUP BY l_partkey, l_suppkey
), pt AS (
  SELECT l_partkey, sum(sq) AS pq FROM q GROUP BY l_partkey
), hot AS (
  SELECT DISTINCT q.l_suppkey
  FROM q JOIN pt ON pt.l_partkey = q.l_partkey
  WHERE q.sq * 20 > pt.pq * 3
)
SELECT s_suppkey, s_name
FROM supplier JOIN hot ON l_suppkey = s_suppkey
ORDER BY s_suppkey
""",
)
def join_q20ish_nested_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20: suppliers who shipped >15% of some bolt-part's total
    quantity — the nested correlated-aggregate family (per-(part,
    supplier) aggregate compared against the per-part aggregate of the
    SAME derived table, then a semi join to the dimension). The share
    threshold cross-multiplies exact integers (sq*20 > pq*3); the
    per-part totals reuse the first aggregate, not the raw scan."""
    li = _table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        _table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    )
    s = F.broadcast(_table(spark, sf_dir, "supplier"))
    q = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("sq"))
        # (part, supplier)-sized and consumed twice (threshold join +
        # per-part totals); materialize so lineitem is scanned ONCE
        .localCheckpoint(eager=True)
    )
    pt = q.groupBy(F.col("l_partkey").alias("pk")).agg(F.sum("sq").alias("pq"))
    hot = (
        q.join(pt, q.l_partkey == pt.pk)
        .where(F.col("sq") * 20 > F.col("pq") * 3)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(hot, s.s_suppkey == hot.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# -- rolling correlation ------------------------------------------------------------


@register(
    "ts_rolling_correlation",
    oracle="""
WITH bx AS (
  SELECT date_trunc('day', ts) AS bucket_ts,
         sum(CAST(round(value * 1000) AS BIGINT)) AS x
  FROM events WHERE event_type = 'view'
    AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
), by_ AS (
  SELECT date_trunc('day', ts) AS bucket_ts,
         sum(CAST(round(value * 1000) AS BIGINT)) AS y
  FROM events WHERE event_type = 'purchase'
    AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
), j AS (
  SELECT bx.bucket_ts, x, y FROM bx JOIN by_ USING (bucket_ts)
), s AS (
  SELECT bucket_ts,
         count(*) OVER w AS w_n,
         sum(x) OVER w AS sx, sum(y) OVER w AS sy,
         sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
         sum(x * y) OVER w AS sxy
  FROM j WINDOW w AS (ORDER BY bucket_ts ROWS BETWEEN 6 PRECEDING
                      AND CURRENT ROW)
), f AS (
  SELECT bucket_ts,
         CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
         CAST(7 * sxy - sx * sy AS BIGINT) AS num,
         CAST(7 * sxx - sx * sx AS BIGINT) AS vx,
         CAST(7 * syy - sy * sy AS BIGINT) AS vy
  FROM s WHERE w_n = 7
)
SELECT bucket_ts, sum_x, sum_y,
       CASE WHEN sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)) > 0
            THEN CAST(num AS DOUBLE)
                 / sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE))
       END AS r
FROM f
ORDER BY bucket_ts
""",
)
def ts_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: rolling 7-day Pearson correlation between the view and
    purchase series (operators/decompose.py:rolling_correlation) —
    exact BIGINT windowed sufficient statistics, floating point only
    in the final fixed-order cast-multiply-sqrt-divide, full windows
    only. The windowed companion to ts_metric_correlation's single
    global coefficient."""
    from whisper_pandas_spark.operators.decompose import rolling_correlation

    ev = _table(spark, sf_dir, "events")
    return rolling_correlation(
        ev, "event_type", "ts", "value", "view", "purchase",
        bucket="day", window=7, scale=1000,
    ).orderBy("bucket_ts")


# -- streaming heavy-hitters maintenance ---------------------------------------------


@register(
    "stream_topk_replay",
    oracle="""
WITH c AS (
  SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source
), r AS (
  SELECT lang, source, n,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n DESC, source) AS rnk
  FROM c
)
SELECT lang, CAST(rnk AS INT) AS rnk, source AS item,
       CAST(n AS BIGINT) AS count_lo, CAST(n AS BIGINT) AS count_hi
FROM r WHERE rnk <= 5 ORDER BY lang, rnk
""",
)
def stream_topk_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST+: streaming heavy-hitters maintenance
    (streaming/sketches.py:stream_topk_update) replayed end to end —
    `documents` split into two change files streams through
    foreachBatch space-saving merges into the versioned top-k state
    (exactly-once batch markers; the merge is additive), then the
    merged state reads off per-lang top-5 sources via topk_rollup.
    Capacity 32 exceeds the ~20 distinct sources per lang, so the
    whole run stays in the exact regime (rest_max = 0, lo == hi ==
    true count) and the oracle is the plain relational top-k —
    completing the streaming-sketch family (additive histogram,
    idempotent KMV, merge-truncated top-k)."""
    import tempfile

    from whisper_pandas_spark.operators.merge import current_version_path
    from whisper_pandas_spark.operators.sketches import topk_rollup
    from whisper_pandas_spark.streaming.sketches import stream_topk_update

    docs = _table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    d = tempfile.mkdtemp(prefix="wps_topkstream_")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        f"{d}/changes/f1"
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        f"{d}/changes/f2"
    )
    sdf = (
        spark.readStream.schema("doc_id long, lang string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/changes/*")
    )
    q = stream_topk_update(
        sdf, f"{d}/state", ("lang",), "source", 32, checkpoint_dir=f"{d}/ckpt"
    )
    q.processAllAvailable()
    q.stop()
    state = spark.read.parquet(current_version_path(f"{d}/state"))
    return topk_rollup(state, ("lang",), 5).orderBy("lang", "rnk")
