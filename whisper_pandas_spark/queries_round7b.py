"""Round-7 second-wave registry entries.

Plan-diversity TPC-H shapes (the six analytic plan families the
registry did not yet exercise) plus two new pipeline operators:

- join_q2ish_min_cost        correlated-MIN supplier pick (TPC-H Q2
                             shape: scalar-min subquery decorrelated
                             to a derived table joined back on the key)
- join_q4ish_exists_late     EXISTS semi-join with a cross-table
                             predicate (Q4 shape)
- join_q13ish_count_dist     outer-join count distribution (Q13 shape:
                             LEFT JOIN with an ON-clause filter, then a
                             double aggregate)
- join_q19ish_disjunctive    OR-of-conjunctions join predicate (Q19
                             shape: disjunctive pushdown)
- join_q21ish_waiting        multi-correlated EXISTS + NOT EXISTS over
                             the same derived table (Q21 shape)
- join_q22ish_scalar_avg     global scalar-aggregate subquery + anti
                             join (Q22 shape), integer cross-multiplied
                             so the threshold compare is exact
- text_collocations_lift     bigram phrase mining by lift (= exp(PMI))
- ts_changepoint_cusum       CUSUM level-shift detection, exact-integer
                             argmax

Same conventions as every other queries_* module: each entry pairs a
Spark implementation with a DuckDB oracle that replays the algorithm
value-exactly at the driver's sf0.01 scale. Reference scope note:
whisper_pandas.py (1-299) delegates all querying to pandas; these
shapes are the engine's analytic surface beyond that baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisper_pandas_spark.registry import _table, register

# -- TPC-H Q2 shape: correlated-min supplier pick -----------------------------


@register(
    "join_q2ish_min_cost",
    oracle="""
WITH px AS (
  SELECT l_partkey, min(l_extendedprice) AS min_price
  FROM lineitem GROUP BY l_partkey
), best AS (
  SELECT p.p_partkey, any_value(p.p_brand) AS brand,
         min(px.min_price) AS min_price, min(l.l_suppkey) AS best_suppkey
  FROM part p
  JOIN px ON px.l_partkey = p.p_partkey
  JOIN lineitem l
    ON l.l_partkey = p.p_partkey AND l.l_extendedprice = px.min_price
  WHERE p.p_size BETWEEN 10 AND 15 AND p.p_type = 'LARGE'
  GROUP BY p.p_partkey
)
SELECT b.p_partkey, b.brand, CAST(b.min_price AS DOUBLE) AS min_price,
       CAST(b.best_suppkey AS BIGINT) AS best_suppkey, s.s_name
FROM best b JOIN supplier s ON s.s_suppkey = b.best_suppkey
ORDER BY min_price ASC, p_partkey
LIMIT 100
""",
)
def join_q2ish_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-style minimum-cost supplier: for each qualifying part,
    the supplier quoting the part's minimum price (min suppkey breaks
    price ties). This is the correlated scalar-MIN subquery shape in
    its decorrelated form — per-part minima as a derived table joined
    back on the part key with a price-equality predicate — which is
    exactly Catalyst's rewrite of `WHERE price = (SELECT min ...)`.
    The part filter and the 100-row supplier dim broadcast; price
    equality is safe because both sides compare the identical stored
    double, never an accumulated one."""
    li = _table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        _table(spark, sf_dir, "part").filter(
            F.col("p_size").between(10, 15) & (F.col("p_type") == "LARGE")
        )
    )
    s = F.broadcast(_table(spark, sf_dir, "supplier"))
    px = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    best = (
        li.join(px, (li.l_partkey == px.pk) & (li.l_extendedprice == px.min_price))
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_partkey")
        .agg(
            F.any_value("p_brand").alias("brand"),
            F.min("min_price").alias("min_price"),
            F.min("l_suppkey").alias("best_suppkey"),
        )
    )
    return (
        best.join(s, best.best_suppkey == s.s_suppkey)
        .select("p_partkey", "brand", "min_price", "best_suppkey", "s_name")
        .orderBy(F.asc("min_price"), "p_partkey")
        .limit(100)
    )


# -- TPC-H Q4 shape: EXISTS with a cross-table predicate ----------------------


@register(
    "join_q4ish_exists_late",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def join_q4ish_exists_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style priority check: orders in a two-year window with
    at least one lineitem shipped >90 days after the order date,
    counted per priority. The EXISTS compiles to a LEFT SEMI join
    whose condition references BOTH sides (orderkey equality + the
    date comparison) — the semi-join-with-residual-predicate plan
    family. The date filter pushes to the orders scan; the semi join
    shuffles both sides on the order key once."""
    o = _table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _table(spark, sf_dir, "lineitem")
    hit = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# -- TPC-H Q13 shape: outer-join count distribution ---------------------------


@register(
    "join_q13ish_count_dist",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def join_q13ish_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style customer order-count distribution: LEFT OUTER
    join with the priority filter INSIDE the join condition (so
    filtered-out customers still appear with count 0 — the semantics
    that force an outer join, not a WHERE), per-customer count, then a
    second aggregate over the counts. Two shuffles — custkey, then the
    tiny count-distribution key — both with map-side partials."""
    c = _table(spark, sf_dir, "customer")
    o = _table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# -- TPC-H Q19 shape: disjunctive join predicate -------------------------------


@register(
    "join_q19ish_disjunctive",
    oracle="""
SELECT any_value(1) AS grp, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) + 1e-9, 4)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def join_q19ish_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-style disjunctive-predicate revenue: an OR of three
    conjunction groups, each mixing part-side and lineitem-side
    columns. The plan test for predicate DECOMPOSITION: Catalyst
    extracts the per-side implied disjunctions (p_brand IN three
    brands / p_size <= 15 / l_quantity between 1 and 30) and pushes
    them below the join, keeping only the residual OR above it. Part
    broadcasts; revenue folds per-row-rounded DECIMAL(18,4) like every
    revenue aggregate in the registry."""
    li = _table(spark, sf_dir, "lineitem")
    p = F.broadcast(_table(spark, sf_dir, "part"))
    joined = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) + F.lit(1e-9), 4
    ).cast("decimal(18,4)")
    return joined.filter(cond).agg(
        F.any_value(F.lit(1)).alias("grp"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum(rev).cast("double").alias("revenue"),
    )


# -- TPC-H Q21 shape: EXISTS + NOT EXISTS over one derived table ---------------


@register(
    "join_q21ish_waiting",
    oracle="""
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  GROUP BY l_orderkey, l_suppkey
), allsup AS (
  SELECT l_orderkey, l_suppkey FROM lineitem GROUP BY l_orderkey, l_suppkey
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late t
JOIN supplier s ON s.s_suppkey = t.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM allsup a
    WHERE a.l_orderkey = t.l_orderkey AND a.l_suppkey <> t.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM late l2
    WHERE l2.l_orderkey = t.l_orderkey AND l2.l_suppkey <> t.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def join_q21ish_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style waiting-supplier report: suppliers who were the
    SOLE late shipper (>60 days after order date) in an order that
    involved at least one other supplier. The double-correlation plan
    family — one EXISTS (left-semi with an inequality residual) and
    one NOT EXISTS (left-anti, same shape) against the same derived
    late-pair table, which Spark plans without re-reading lineitem
    thanks to exchange reuse. All outputs are counts — exact."""
    li = _table(spark, sf_dir, "lineitem")
    o = _table(spark, sf_dir, "orders")
    s = F.broadcast(_table(spark, sf_dir, "supplier"))
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    allsup = li.select("l_orderkey", "l_suppkey").distinct()
    a = allsup.select(
        F.col("l_orderkey").alias("a_ok"), F.col("l_suppkey").alias("a_sk")
    )
    l2 = late.select(
        F.col("l_orderkey").alias("b_ok"), F.col("l_suppkey").alias("b_sk")
    )
    t = (
        late.join(
            a,
            (late.l_orderkey == a.a_ok) & (late.l_suppkey != a.a_sk),
            "left_semi",
        )
        .join(
            l2,
            (late.l_orderkey == l2.b_ok) & (late.l_suppkey != l2.b_sk),
            "left_anti",
        )
    )
    return (
        t.join(s, t.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# -- TPC-H Q22 shape: global scalar-aggregate subquery + anti join -------------


@register(
    "join_q22ish_scalar_avg",
    oracle="""
WITH pos AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pos,
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totbal_cents
FROM customer c CROSS JOIN pos
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * pos.n_pos > pos.sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def join_q22ish_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style lost-opportunity report: customers with no
    URGENT orders whose balance beats the average positive balance,
    grouped by market segment (the priority filter keeps the anti set
    non-empty at the dense test SFs where every customer has SOME
    order). The global-scalar-subquery + anti-join plan family.
    Exactness: balances quantize to integer cents BEFORE any
    aggregation and the `bal > avg` threshold cross-multiplies
    (cents * n_pos > sum_cents) so the whole comparison is integer —
    no double mean ever materializes. The one-row aggregate broadcasts
    (Catalyst's rewrite of the scalar subquery); the anti join on
    custkey is the only full shuffle."""
    c = _table(spark, sf_dir, "customer").withColumn(
        "cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    o = _table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"), F.sum("cents").alias("sum_cents")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .crossJoin(F.broadcast(pos))
        .filter(F.col("cents") * F.col("n_pos") > F.col("sum_cents"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("cents").alias("totbal_cents"),
        )
        .orderBy("c_mktsegment")
    )


# -- bigram collocation mining -------------------------------------------------


@register(
    "text_collocations_lift",
    oracle="""
WITH arr AS (
  SELECT list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),
           '[^a-z0-9]+', ' ', 'g')), ' '), x -> x != '') AS t
  FROM documents
), tok AS (SELECT unnest(t) AS w FROM arr),
uni AS (SELECT w, count(*) AS n_w FROM tok GROUP BY w),
tot AS (SELECT count(*) AS n_total FROM tok),
big AS (
  SELECT p[1] AS w1, p[2] AS w2
  FROM (SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p
        FROM arr WHERE len(t) >= 2)
), bc AS (
  SELECT w1, w2, count(*) AS n_ab FROM big GROUP BY 1, 2
  HAVING count(*) >= 5
)
SELECT bc.w1, bc.w2, CAST(bc.n_ab AS BIGINT) AS n_ab,
       CAST(u1.n_w AS BIGINT) AS n_a, CAST(u2.n_w AS BIGINT) AS n_b,
       CAST(tot.n_total AS BIGINT) AS n_total,
       CAST(bc.n_ab * tot.n_total AS DOUBLE)
         / CAST(u1.n_w * u2.n_w AS DOUBLE) AS lift
FROM bc JOIN uni u1 ON u1.w = bc.w1 JOIN uni u2 ON u2.w = bc.w2
CROSS JOIN tot
ORDER BY lift DESC, n_ab DESC, w1, w2
LIMIT 50
""",
)
def text_collocations_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: corpus phrase mining (operators/collocations.py:
    collocation_lift) — top-50 adjacent token pairs by lift = exp(PMI)
    (Church & Hanks 1990 association; word2vec's phrase-detection
    pass). Bigrams come from per-row array zips (no self-join);
    both aggregations are vocabulary-sized; the score is one IEEE
    division of exact integer products, so no log-parity risk."""
    from whisper_pandas_spark.operators.collocations import collocation_lift

    docs = _table(spark, sf_dir, "documents")
    return collocation_lift(docs, "text", min_count=5, k=50)


# -- CUSUM changepoint ----------------------------------------------------------


@register(
    "ts_changepoint_cusum",
    oracle="""
WITH b AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_ts,
         sum(CAST(round(value * 1000) AS BIGINT)) AS y
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), c AS (
  SELECT event_type, bucket_ts, y,
         row_number() OVER w AS t,
         sum(y) OVER w AS s_t,
         count(*) OVER (PARTITION BY event_type) AS n_buckets,
         sum(y) OVER (PARTITION BY event_type) AS s_n
  FROM b WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
), s AS (
  SELECT *, abs(n_buckets * s_t - t * s_n) AS d_abs FROM c
  WHERE n_buckets >= 3 AND t < n_buckets
), r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY d_abs DESC, t) AS rnk
  FROM s
)
SELECT event_type, CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(s_n AS BIGINT) AS s_n, bucket_ts AS cp_bucket,
       CAST(d_abs AS BIGINT) AS d_stat
FROM r WHERE rnk = 1
ORDER BY event_type
""",
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: CUSUM level-shift detection (operators/changepoint.py:
    changepoint_max_cusum, Page 1954) — per event_type, the daily
    bucket where |n*S_t - t*S_n| peaks, i.e. the maximum-likelihood
    single mean shift. Values quantize to integer micro-units before
    any sum, so bucket sums, cumulants, and the argmax are exact
    integers end to end; ties break to the earliest bucket."""
    from whisper_pandas_spark.operators.changepoint import changepoint_max_cusum

    ev = _table(spark, sf_dir, "events")
    return changepoint_max_cusum(
        ev, ["event_type"], "ts", "value", bucket="day", scale=1000
    ).orderBy("event_type")


# -- event-path transition matrix -----------------------------------------------


@register(
    "path_transition_matrix",
    oracle="""
WITH ordered AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
), tr AS (
  SELECT src, dst, count(*) AS n FROM ordered
  WHERE dst IS NOT NULL GROUP BY src, dst
), tot AS (SELECT src AS src2, sum(n) AS n_src FROM tr GROUP BY src)
SELECT tr.src, tr.dst, CAST(tr.n AS BIGINT) AS n,
       CAST(tot.n_src AS BIGINT) AS n_src,
       CAST(tr.n AS DOUBLE) / CAST(tot.n_src AS DOUBLE) AS p
FROM tr JOIN tot ON tot.src2 = tr.src
ORDER BY src, dst
""",
)
def path_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: empirical Markov transition matrix over user event streams
    (operators/paths.py:transition_matrix) — the all-paths complement
    to the prescribed-path funnel. Per-user time order with the event
    id as a total-order tie-break; counts exact, each probability one
    IEEE division of two BIGINTs."""
    from whisper_pandas_spark.operators.paths import transition_matrix

    ev = _table(spark, sf_dir, "events")
    return transition_matrix(
        ev, "user_id", "ts", "event_type", tiebreak_col="event_id"
    )


# -- robust MAD anomaly stats ----------------------------------------------------


@register(
    "anomaly_robust_mad",
    oracle="""
WITH v AS (
  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS x FROM events
  WHERE value IS NOT NULL
), cnt AS (
  SELECT event_type, x, count(*) AS c FROM v GROUP BY 1, 2
), cum AS (
  SELECT event_type, x,
         sum(c) OVER (PARTITION BY event_type ORDER BY x) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM cnt
), med AS (
  SELECT event_type, min(n) AS n,
         min(CASE WHEN cum >= ceil(0.5 * n) THEN x END) AS med
  FROM cum GROUP BY event_type
), dev AS (
  SELECT v.event_type, abs(v.x - med.med) AS d
  FROM v JOIN med USING (event_type)
), dcnt AS (SELECT event_type, d, count(*) AS c FROM dev GROUP BY 1, 2),
dcum AS (
  SELECT event_type, d,
         sum(c) OVER (PARTITION BY event_type ORDER BY d) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM dcnt
), mad AS (
  SELECT event_type, min(CASE WHEN cum >= ceil(0.5 * n) THEN d END) AS mad
  FROM dcum GROUP BY event_type
), outl AS (
  SELECT dev.event_type,
         count(*) FILTER (WHERE dev.d > 3 * mad.mad) AS n_out
  FROM dev JOIN mad USING (event_type) GROUP BY dev.event_type
)
SELECT med.event_type, CAST(med.n AS BIGINT) AS n,
       CAST(med.med AS BIGINT) AS med_micro,
       CAST(mad.mad AS BIGINT) AS mad_micro,
       CAST(outl.n_out AS BIGINT) AS n_outliers
FROM med JOIN mad USING (event_type) JOIN outl USING (event_type)
ORDER BY event_type
""",
)
def anomaly_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: median/MAD robust outlier stats (operators/robust.py:
    robust_mad_stats, breakdown point 0.5 vs the mean/stddev z-score's
    0) — per event_type over micro-unit-quantized values, medians via
    the engine's shared exact cumulative-weight quantile pick, outlier
    test |x - med| > 3 * mad entirely in integers."""
    from whisper_pandas_spark.operators.robust import robust_mad_stats

    ev = _table(spark, sf_dir, "events")
    return robust_mad_stats(
        ev, ["event_type"], "value", scale=1000, k=3
    ).orderBy("event_type")


# -- triangle counting on the co-order part graph --------------------------------


@register(
    "graph_triangle_count",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), deg AS (
  SELECT k, count(*) AS d FROM (
    SELECT u AS k FROM pairs UNION ALL SELECT v AS k FROM pairs)
  GROUP BY k
), ori AS (
  SELECT CASE WHEN (du.d, u) < (dv.d, v) THEN u ELSE v END AS s,
         CASE WHEN (du.d, u) < (dv.d, v) THEN v ELSE u END AS t
  FROM pairs JOIN deg du ON du.k = u JOIN deg dv ON dv.k = v
), tri AS (
  SELECT e1.s AS a, e1.t AS b, e2.t AS c
  FROM ori e1
  JOIN ori e2 ON e2.s = e1.t
  JOIN ori e3 ON e3.s = e1.s AND e3.t = e2.t
), corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_tri
FROM corners GROUP BY node
ORDER BY n_tri DESC, node
LIMIT 100
""",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: degree-oriented triangle counting (operators/graph.py:
    triangle_participation, Suri-Vassilvitskii node-iterator-with-
    ordering) over the co-order part graph — parts appearing in the
    same order are adjacent. The (degree, id) orientation makes every
    out-degree O(sqrt(m)), bounding the wedge join on ANY degree
    distribution — the skew guard that makes triangle counting viable
    at 100 TB. Top-100 nodes by triangle participation, exact
    integers."""
    from whisper_pandas_spark.operators.graph import triangle_participation

    li = _table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # co-order pairs without the lineitem self-join — one grouped
    # exchange + double explode; pair set identical (see
    # graph_label_propagation; round 14, guide §2.2/§3). The operator
    # dedups the canonical edge list, so pre-dedup multiplicity is moot.
    arr = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    edges = (
        arr.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .where(F.col("src") < F.col("dst"))
    )
    return (
        triangle_participation(edges)
        .orderBy(F.desc("n_tri"), "node")
        .limit(100)
    )


# -- streaming changepoint-state maintenance --------------------------------------


@register(
    "stream_changepoint_replay",
    oracle="""
WITH b AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_ts,
         sum(CAST(round(value * 1000) AS BIGINT)) AS y
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), c AS (
  SELECT event_type, bucket_ts, y,
         row_number() OVER w AS t,
         sum(y) OVER w AS s_t,
         count(*) OVER (PARTITION BY event_type) AS n_buckets,
         sum(y) OVER (PARTITION BY event_type) AS s_n
  FROM b WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
), s AS (
  SELECT *, abs(n_buckets * s_t - t * s_n) AS d_abs FROM c
  WHERE n_buckets >= 3 AND t < n_buckets
), r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY d_abs DESC, t) AS rnk
  FROM s
)
SELECT event_type, CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(s_n AS BIGINT) AS s_n, bucket_ts AS cp_bucket,
       CAST(d_abs AS BIGINT) AS d_stat
FROM r WHERE rnk = 1
ORDER BY event_type
""",
)
def stream_changepoint_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST+: streaming changepoint-state maintenance
    (streaming/changepoint.py:stream_bucket_sums_update) replayed end
    to end — `events` split into two change files streams through
    foreachBatch additive bucket-sum merges into the versioned state
    (exactly-once via checkpoint-scoped batch markers), then the shift
    detector (operators/changepoint.py:cusum_from_buckets) runs over
    the final state. Integer addition is exact, so the maintained
    state equals the batch recompute and the oracle recomputes the
    identical argmax from raw data — proving batch bucketing, additive
    merge, version flips, AND the detector in one check."""
    import tempfile

    from whisper_pandas_spark.operators.changepoint import cusum_from_buckets
    from whisper_pandas_spark.operators.merge import current_version_path
    from whisper_pandas_spark.streaming.changepoint import (
        stream_bucket_sums_update,
    )

    ev = _table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    d = tempfile.mkdtemp(prefix="wps_cpstream_")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        f"{d}/changes/f1"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        f"{d}/changes/f2"
    )
    sdf = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/changes/*")
    )
    q = stream_bucket_sums_update(
        sdf,
        f"{d}/state",
        ("event_type",),
        "ts",
        "value",
        bucket="day",
        scale=1000,
        checkpoint_dir=f"{d}/ckpt",
    )
    q.processAllAvailable()
    q.stop()
    state = spark.read.parquet(current_version_path(f"{d}/state"))
    return cusum_from_buckets(state, ["event_type"], min_buckets=3).orderBy(
        "event_type"
    )


# -- label-propagation communities -------------------------------------------------

_LPA_ROUND = """
, cnt{N} AS (
  SELECT nbr.a AS node, l.label, count(*) AS c
  FROM nbr JOIN l{P} l ON l.node = nbr.b GROUP BY 1, 2
), pick{N} AS (
  SELECT node, min(label) AS new_label FROM (
    SELECT node, label, c, max(c) OVER (PARTITION BY node) AS mx FROM cnt{N}
  ) WHERE c = mx GROUP BY node
), l{N} AS (
  SELECT l.node, coalesce(p.new_label, l.label) AS label
  FROM l{P} l LEFT JOIN pick{N} p ON p.node = l.node
)"""


@register(
    "graph_label_propagation",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), nbr AS (
  SELECT u AS a, v AS b FROM pairs UNION ALL SELECT v AS a, u AS b FROM pairs
), l0 AS (
  SELECT DISTINCT a AS node, a AS label FROM nbr
)"""
    + "".join(_LPA_ROUND.format(N=i, P=i - 1) for i in (1, 2, 3))
    + """
SELECT node, CAST(label AS BIGINT) AS label FROM l3 ORDER BY node
""",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: synchronous label-propagation communities (operators/
    graph.py:label_propagation, Raghavan 2007) over the co-order part
    graph — three rounds, most-frequent neighbor label, ties to the
    SMALLEST label (the deterministic variant of the textbook random
    tie-break), isolated nodes keep their label. The oracle unrolls
    all three rounds in SQL and replays every label bit-for-bit —
    same unrolled-recursion pattern as graph_pagerank_trade."""
    from whisper_pandas_spark.operators.graph import label_propagation

    li = _table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Co-order pairs WITHOUT the lineitem self-join (round 14, guide
    # §2.2/§3): collect the per-order distinct part set in ONE exchange,
    # then emit ordered pairs via a double explode — the self-join form
    # shuffled the 6×|orders| line table twice and re-ran per union
    # branch. Pair SET identical: {u, v} (u < v) appears iff some order
    # contains both parts — per-order duplicate partkeys only changed
    # pre-dedup multiplicity, and label_propagation dedups the
    # symmetrized set before any round.
    arr = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    edges = (
        arr.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .where(F.col("src") < F.col("dst"))
    )
    return label_propagation(edges, iters=3).orderBy("node")


# -- point-in-time (feature-store) join against SCD2 versions ----------------------


@register(
    "join_point_in_time",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_type,
         lag(event_type) OVER w AS prev_et,
         lag(ts) OVER w AS prev_ts
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
), changes AS (
  SELECT user_id, ts, event_type FROM ordered
  WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_et
), v AS (
  SELECT user_id AS key, event_type, ts AS valid_from FROM changes
), p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT p.event_id, p.user_id, max(v.valid_from) AS vf
  FROM p JOIN v ON v.key = p.user_id AND v.valid_from < p.ts
  GROUP BY 1, 2
)
SELECT m.event_id, m.user_id, v.event_type AS state_before
FROM m JOIN v ON v.key = m.user_id AND v.valid_from = m.vf
ORDER BY event_id
""",
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: point-in-time join — the feature-store primitive that keeps
    training data leak-free: each fact (purchase event) joins the SCD2
    dimension version in effect STRICTLY BEFORE its timestamp, never a
    version created at-or-after it (no label leakage). Composes two
    existing operators: scd2_from_log builds the versions, asof_join
    with allow_exact_matches=False picks the strictly-previous one
    (first-ever purchases have no prior state and drop, mirrored by the
    oracle's inner join). One key-partitioned window + one as-of
    carry — both on the user key, no new shuffle shape."""
    from whisper_pandas_spark.operators.asof import asof_join
    from whisper_pandas_spark.operators.scd import scd2_from_log

    ev = _table(spark, sf_dir, "events")
    versions = scd2_from_log(
        ev.select("user_id", "ts", "event_type"), "user_id", "ts", ["event_type"]
    )
    right = versions.select(
        F.col("key").alias("user_id"),
        F.col("valid_from").alias("ts"),
        F.col("event_type").alias("state_before"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    pit = asof_join(
        purchases,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=("state_before",),
        inner=True,
        allow_exact_matches=False,
    )
    return pit.select(
        "event_id", "user_id", F.col("state_before_asof").alias("state_before")
    ).orderBy("event_id")


# -- equi-depth feature binning ------------------------------------------------------


@register(
    "profile_equidepth_bins",
    oracle="""
WITH cnt AS (
  SELECT lang, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2
), cum AS (
  SELECT lang, v,
         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM cnt
), js AS (SELECT unnest(generate_series(1, 7)) AS j),
edges AS (
  SELECT lang, j, min(v) AS edge FROM cum CROSS JOIN js
  WHERE cum >= (j * n + 7) // 8 GROUP BY lang, j
), below AS (
  SELECT c.lang, c.v, count(e.j) AS b
  FROM (SELECT DISTINCT lang, v FROM cnt) c
  LEFT JOIN edges e ON e.lang = c.lang AND e.edge < c.v
  GROUP BY 1, 2
), lab AS (
  SELECT d.lang, d.n_chars AS v, 1 + coalesce(b.b, 0) AS bucket
  FROM documents d JOIN below b ON b.lang = d.lang AND b.v = d.n_chars
)
SELECT lang, CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi
FROM lab GROUP BY 1, 2
ORDER BY lang, bucket
""",
)
def profile_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: equi-depth (quantile) feature binning (operators/binning.py,
    the KBinsDiscretizer strategy='quantile' shape) — 8 buckets per
    lang over n_chars, edges from the engine's shared exact quantile
    pick with INTEGER rank ceil, labels = 1 + #edges strictly below.
    Per-bucket doc counts and value ranges, all exact integers."""
    from whisper_pandas_spark.operators.binning import equidepth_bins

    docs = _table(spark, sf_dir, "documents").select("lang", "n_chars")
    labeled = equidepth_bins(docs, ["lang"], "n_chars", 8)
    return (
        labeled.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
        .orderBy("lang", "bucket")
    )


# -- deterministic negative sampling -------------------------------------------------


@register(
    "sample_negative_items",
    oracle="""
WITH n AS (SELECT max(p_partkey) + 1 AS n_items FROM part),
inter AS (
  SELECT DISTINCT o_custkey AS usr, l_partkey AS item
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), users AS (SELECT DISTINCT usr FROM inter),
cand AS (
  SELECT usr, i,
         ('0x' || substr(md5('0:' || usr || ':' || i), 1, 8))::BIGINT
           % n.n_items AS item
  FROM users CROSS JOIN n
  CROSS JOIN (SELECT unnest(generate_series(1, 20)) AS i)
), dedup AS (
  SELECT usr, item, min(i) AS i FROM cand GROUP BY 1, 2
), neg AS (
  SELECT d.usr, d.item, d.i FROM dedup d
  ANTI JOIN inter ON inter.usr = d.usr AND inter.item = d.item
), ranked AS (
  SELECT usr, item, i,
         row_number() OVER (PARTITION BY usr ORDER BY i) AS rnk
  FROM neg
)
SELECT usr AS user, CAST(item AS BIGINT) AS item, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 5
ORDER BY user, rnk
""",
)
def sample_negative_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: deterministic negative sampling (operators/negatives.py, the
    BPR / word2vec implicit-feedback recipe made replayable) — 5
    non-purchased parts per customer from the cross-engine md5 family
    with rejection against the real (customer, part) interactions.
    n_items comes from the part table (one driver-side scalar, bounded
    by contract); the same (user, i) yields the same item on any
    engine and any re-run."""
    from whisper_pandas_spark.operators.negatives import negative_samples

    o = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    inter = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("usr"), F.col("l_partkey").alias("item")
    )
    n_items = (
        _table(spark, sf_dir, "part").agg(F.max("p_partkey")).collect()[0][0] + 1
    )
    out = negative_samples(
        inter, "usr", "item", int(n_items), k=5, oversample=4, seed=0
    )
    return (
        out.withColumnRenamed("user", "user")
        .select("user", "item", F.col("rnk").cast("int").alias("rnk"))
        .orderBy("user", "rnk")
    )


# -- item-item collaborative filtering ----------------------------------------------


@register(
    "rec_item_cf_topk",
    oracle="""
WITH inc AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS item FROM lineitem
), ic AS (
  SELECT item, count(*) AS c FROM inc GROUP BY item
), pairs AS (
  SELECT a.item AS i, bb.item AS j, count(*) AS c_ij
  FROM inc a JOIN inc bb ON a.b = bb.b AND a.item <> bb.item
  GROUP BY 1, 2
  HAVING count(*) >= 2
), scored AS (
  SELECT p.i, p.j, p.c_ij, ci.c AS c_i, cj.c AS c_j,
         CAST(p.c_ij AS DOUBLE)
           / sqrt(CAST(ci.c * cj.c AS DOUBLE)) AS sim
  FROM pairs p JOIN ic ci ON ci.item = p.i JOIN ic cj ON cj.item = p.j
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY i
                               ORDER BY sim DESC, c_ij DESC, j) AS rnk
  FROM scored
)
SELECT i AS item, j AS neighbor, CAST(c_ij AS BIGINT) AS c_ij,
       CAST(c_i AS BIGINT) AS c_i, CAST(c_j AS BIGINT) AS c_j, sim,
       CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 5
ORDER BY item, rnk
""",
)
def rec_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: item-item collaborative filtering (operators/itemcf.py,
    Sarwar 2001 / Amazon item-to-item) — top-5 cosine co-occurrence
    neighbors per part over order baskets, min 2 co-occurrences. The
    score is sqrt of an exact integer product + one division, so the
    full ranking replays bit-for-bit."""
    from whisper_pandas_spark.operators.itemcf import item_similarity_topk

    li = _table(spark, sf_dir, "lineitem")
    return item_similarity_topk(
        li, "l_orderkey", "l_partkey", k=5, min_pairs=2
    ).orderBy("item", "rnk")


# -- percent_rank / cume_dist window family ------------------------------------------


@register(
    "window_pct_rank_dist",
    oracle="""
SELECT c_custkey, c_mktsegment,
       CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY CAST(round(c_acctbal * 100) AS BIGINT), c_custkey)
ORDER BY c_custkey
""",
)
def window_pct_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+: relative-rank analytics — percent_rank ((rank-1)/(n-1)) and
    cume_dist (peers-or-below / n) per market segment over integer
    cents, custkey as the total-order tie-break. Both are single IEEE
    divisions of exact integers; completes the ranking window family
    (rank/dense_rank/row_number/ntile already covered)."""
    c = _table(spark, sf_dir, "customer").withColumn(
        "cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            "cents",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("c_custkey")
    )
