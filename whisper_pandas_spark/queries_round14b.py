"""Registry entries: round 14, second wave.

- er_record_linkage   Fellegi-Sunter record linkage
                      (operators/linkage.py): planted dirty source,
                      two-pass blocking, integer log-odds scoring,
                      two-threshold classification; the oracle replays
                      synthesis + corruption + blocking + scoring
- er_golden_record    survivorship over the 'match' pairs: best-match
                      entity resolution (deterministic argmax) +
                      pinned golden-attribute rules
- text_ccnet_buckets  CCNet-style per-language head/middle/tail split
                      on the KN-LM typicality signal (Wenzek et al.
                      2020) — integer rank-thirds cutoffs, so no
                      percent_rank single-row edge and no float exp
- layout_dynamic_prune  runtime Dynamic Partition Pruning pin: a dim
                      built from a SECOND scan filters the
                      Hive-partitioned fact at execution time; the
                      entry RAISES unless `dynamicpruning` landed in
                      the fact scan's PartitionFilters — the fourth
                      pruning tier next to z-order/Bloom/static-Hive

No reference-repo parity: whisper_pandas (299-line .wsp decoder) has
none of these surfaces; the rows back SURVEY.md §2.11. Registry checked
before building: no ER/linkage family exists; CCNet appears only as the
per-domain key + the raw KN signal; pruning pins cover z-order, Bloom
and static Hive but not DPP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.operators import linkage as L
from whisper_pandas_spark.registry import _table, register

# ---------------------------------------------------------------------------
# er_record_linkage / er_golden_record — shared oracle CTEs
# ---------------------------------------------------------------------------


def _cities_sql() -> str:
    return "list_value(" + ", ".join(f"'{c}'" for c in L.CITIES) + ")"


def _er_cte() -> str:
    """CTEs replaying synthesis -> corruption -> blocking -> scoring.

    Every derived byte re-derives from md5 hex exactly as the engine
    does (the span-corruption idiom); all arithmetic is BIGINT, all
    comparisons integer/string — nothing to drift."""
    return f"""
WITH hashed AS (
  SELECT c_custkey AS key, c_nationkey AS nation, c_name AS name,
    ('0x' || substr(md5('er:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
      AS h,
    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
    c_mktsegment AS seg
  FROM customer
), base AS (
  SELECT key, nation, name,
    lpad(CAST(h % 1000000000 AS VARCHAR), 9, '0') AS phone,
    CAST(h % 24 AS INT) AS city_idx, bal_cents, seg
  FROM hashed
), clean AS (
  SELECT key AS rec_id, 'clean' AS src, nation, name, phone,
    ({_cities_sql()})[city_idx + 1] AS city, bal_cents, seg
  FROM base
), dirty0 AS (
  SELECT *,
    ('0x' || substr(md5('erc:' || CAST(key AS VARCHAR)), 1, 15))::BIGINT
      AS h2
  FROM base WHERE key % {L.DIRTY_MOD} = 0
), dirty1 AS (
  SELECT *, CAST(h2 % 9 + 1 AS INT) AS p,
    CAST((h2 // 9) % 9 + 10 AS INT) AS q
  FROM dirty0
), dirty AS (
  SELECT key + {L.DIRTY_OFFSET} AS rec_id, 'dirty' AS src, nation,
    substr(name, 1, q - 1) || substr(name, q + 1, 18) AS name,
    substr(phone, 1, p - 1)
      || CAST((CAST(substr(phone, p, 1) AS INT) + 1) % 10 AS VARCHAR)
      || substr(phone, p + 1, 9) AS phone,
    ({_cities_sql()})[
      (CASE WHEN (h2 // 81) % 5 = 0 THEN (city_idx + 1) % 24
            ELSE city_idx END) + 1] AS city,
    bal_cents + ((h2 // 405) % 199 - 99) AS bal_cents, seg
  FROM dirty1
), cands AS (
  SELECT DISTINCT c.rec_id AS c_id, d.rec_id AS d_id,
    c.name AS c_name, d.name AS d_name, c.phone AS c_phone,
    d.phone AS d_phone, c.city AS c_city, d.city AS d_city,
    c.bal_cents AS c_bal, d.bal_cents AS d_bal,
    c.seg AS c_seg, d.seg AS d_seg
  FROM clean c JOIN dirty d ON c.nation = d.nation
   AND (substr(c.phone, 1, 4) = substr(d.phone, 1, 4)
        OR (c.city = d.city AND substr(c.phone, 7, 3) = substr(d.phone, 7, 3)))
), scored AS (
  SELECT c_id, d_id,
    CAST(
      (CASE WHEN c_phone = d_phone THEN {L.W_PHONE_EXACT}
            WHEN levenshtein(c_phone, d_phone) <= 1 THEN {L.W_PHONE_CLOSE}
            ELSE {L.W_PHONE_DIFF} END)
      + (CASE WHEN levenshtein(c_name, d_name) <= 2 THEN {L.W_NAME_CLOSE}
              ELSE {L.W_NAME_DIFF} END)
      + (CASE WHEN c_city = d_city THEN {L.W_CITY_EQ} ELSE {L.W_CITY_NE} END)
      + (CASE WHEN abs(c_bal - d_bal) <= 100 THEN {L.W_BAL_CLOSE}
              ELSE {L.W_BAL_FAR} END)
      + (CASE WHEN c_seg = d_seg THEN {L.W_SEG_EQ} ELSE {L.W_SEG_NE} END)
    AS INT) AS score
  FROM cands
), classed AS (
  SELECT c_id, d_id, score,
    CASE WHEN score >= {L.MATCH_T} THEN 'match'
         WHEN score >= {L.POSSIBLE_T} THEN 'possible'
         ELSE 'nonmatch' END AS cls,
    CAST(d_id - {L.DIRTY_OFFSET} = c_id AS INT) AS is_true
  FROM scored
)
"""


_ER_ORACLE = (
    _er_cte()
    + """
SELECT c_id, d_id, score, cls, is_true FROM classed
ORDER BY c_id, d_id
"""
)


@register("er_record_linkage", oracle=_ER_ORACLE)
def er_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y167: Fellegi-Sunter record linkage (operators/linkage.py) —
    two blocked equi-join passes generate candidates (never a
    cartesian), integer log-odds field weights score them (levenshtein
    / equality / cents-distance, all JVM codegen), the FS two-threshold
    rule classifies, and the planted ground truth rides along as
    is_true so blocking recall and match precision stay inside the
    hash-checked result. The oracle replays synthesis, corruption,
    blocking and scoring byte-for-byte from the same md5 arithmetic."""
    cust = _table(spark, sf_dir, "customer")
    recs = L.er_records(cust)
    scored = L.er_score_pairs(L.er_candidates(recs))
    return scored.orderBy("c_id", "d_id")


_GOLDEN_ORACLE = (
    _er_cte()
    + f"""
, best AS (
  SELECT d_id, c_id AS entity_id FROM (
    SELECT d_id, c_id, row_number() OVER (
        PARTITION BY d_id ORDER BY score DESC, c_id) AS rn
    FROM classed WHERE cls = 'match')
  WHERE rn = 1
), records AS (
  SELECT rec_id, src, name, bal_cents FROM clean
  UNION ALL
  SELECT rec_id, src, name, bal_cents FROM dirty
), members AS (
  SELECT CASE WHEN r.src = 'clean' THEN r.rec_id
              ELSE coalesce(b.entity_id, r.rec_id) END AS entity_id,
         r.name, r.bal_cents
  FROM records r LEFT JOIN best b ON r.rec_id = b.d_id
), ranked AS (
  SELECT entity_id,
    row_number() OVER (PARTITION BY entity_id
                       ORDER BY length(name) DESC, name) AS rn,
    CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT) AS n_members,
    max(bal_cents) OVER (PARTITION BY entity_id) AS golden_bal_cents,
    name AS golden_name
  FROM members
)
SELECT entity_id, n_members, golden_name, golden_bal_cents
FROM ranked WHERE rn = 1 ORDER BY entity_id
"""
)


@register("er_golden_record", oracle=_GOLDEN_ORACLE)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y168: survivorship over the linkage 'match' class
    (operators/linkage.py:er_golden_records) — every dirty record joins
    its best match (max score, min master tiebreak: a deterministic
    argmax via one row_number window), unmatched records stand alone,
    and golden attributes follow pinned rules (longest-then-min name,
    max balance). One window shuffle on entity_id resolves the whole
    corpus; payloads never fan out."""
    cust = _table(spark, sf_dir, "customer")
    recs = L.er_records(cust)
    scored = L.er_score_pairs(L.er_candidates(recs))
    return L.er_golden_records(recs, scored).orderBy("entity_id")


# ---------------------------------------------------------------------------
# text_ccnet_buckets
# ---------------------------------------------------------------------------


def _ccnet_oracle() -> str:
    from whisper_pandas_spark.queries_round12b import _kn_oracle

    return f"""
WITH kn AS ({_kn_oracle()}
), j AS (
  SELECT k.doc_id, d.lang, k.n_trigrams,
    k.logprob / CAST(k.n_trigrams AS DOUBLE) AS ratio
  FROM kn k JOIN documents d USING (doc_id)
), rnk AS (
  SELECT lang, n_trigrams,
    row_number() OVER (PARTITION BY lang ORDER BY ratio DESC, doc_id) AS r,
    count(*) OVER (PARTITION BY lang) AS n
  FROM j
)
SELECT lang,
  CASE WHEN 3 * r <= n THEN 'head'
       WHEN 3 * r <= 2 * n THEN 'middle'
       ELSE 'tail' END AS bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_trigrams) AS BIGINT) AS trigrams_total
FROM rnk GROUP BY lang, bucket ORDER BY lang, bucket
"""


@register("text_ccnet_buckets", oracle=_ccnet_oracle())
def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y169: the CCNet bucketing stage (Wenzek et al. 2020) — per
    LANGUAGE, rank documents by the KN-LM per-trigram log-probability
    (the corpus-typicality signal text_kn_trigram_score already
    hash-proves) and split into head/middle/tail thirds. Cutoffs are
    integer rank-thirds (3r<=n / 3r<=2n), so there is no percent_rank
    single-row edge case and no float exp — the perplexity ORDER is
    what CCNet buckets on, and logprob/n is monotonic in it. One
    window shuffle on lang after the LM scoring plan; the output is
    the per-(lang, bucket) census a mixture stage consumes. CCNet
    trains one LM per language; the corpus LM here is that recipe's
    single-model configuration — swapping in per-lang counts changes
    only the grouping key of the count tables, not this stage."""
    from pyspark.sql import Window

    from whisper_pandas_spark.operators.knlm import kn_trigram_score

    docs = _table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    kn = kn_trigram_score(docs, "doc_id", "text")
    j = kn.join(docs.select("doc_id", "lang"), "doc_id").select(
        "lang",
        "n_trigrams",
        "doc_id",
        (F.col("logprob") / F.col("n_trigrams").cast("double")).alias(
            "ratio"
        ),
    )
    w = Window.partitionBy("lang")
    rnk = j.select(
        "lang",
        "n_trigrams",
        F.row_number()
        .over(w.orderBy(F.col("ratio").desc(), F.col("doc_id")))
        .alias("r"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return (
        rnk.select(
            "lang",
            F.when(3 * F.col("r") <= F.col("n"), "head")
            .when(3 * F.col("r") <= 2 * F.col("n"), "middle")
            .otherwise("tail")
            .alias("bucket"),
            "n_trigrams",
        )
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_trigrams").cast("bigint").alias("trigrams_total"),
        )
        .orderBy("lang", "bucket")
    )


# ---------------------------------------------------------------------------
# layout_dynamic_prune
# ---------------------------------------------------------------------------


@register(
    "layout_dynamic_prune",
    oracle="""
WITH days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
  WHERE day(CAST(ts AS DATE)) % 7 = 3
)
SELECT CAST(e.ts AS DATE) AS ts_date, e.event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events e JOIN days ON CAST(e.ts AS DATE) = days.d
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def layout_dynamic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y170: runtime Dynamic Partition Pruning — the fourth pruning
    tier (after z-order row-groups, Bloom files, static Hive
    directories). The date dim comes from a SECOND scan with a
    computed predicate (day-of-month mod 7), so NO static rule can
    prune the Hive-partitioned fact: only Catalyst's DPP can, by
    reusing the broadcast of the dim as a directory filter at run
    time. The entry RAISES unless `dynamicpruning` landed in the fact
    scan's PartitionFilters — at 100 TB this is the difference between
    touching ~4 of 30 day-directories and scanning the whole fact.
    The oracle replays the join on the PLAIN table (layout doctrine:
    the layout must be semantically invisible)."""
    from whisper_pandas_spark.plans.inspect import partition_filters
    from whisper_pandas_spark.queries_materialize import (
        _partitioned_events,
    )

    d = _partitioned_events(spark, sf_dir)
    fact = spark.read.parquet(d)
    dim = (
        _table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .filter(F.dayofmonth("d") % 7 == 3)
    )
    q = (
        fact.join(dim, fact["ts_date"] == dim["d"])
        .groupBy("ts_date", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_cents"),
        )
        .orderBy("ts_date", "event_type")
    )
    pf = " ".join(partition_filters(q))
    if "dynamicpruning" not in pf:
        raise RuntimeError(
            "dynamic partition pruning lost: PartitionFilters="
            f"[{pf}] has no dynamicpruning subquery on ts_date"
        )
    return q


# ---------------------------------------------------------------------------
# stream_er_linkage_replay
# ---------------------------------------------------------------------------


@register("stream_er_linkage_replay", oracle=_ER_ORACLE)
def stream_er_linkage_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+/Y171: STREAMING record linkage (streaming/linkage.py) —
    dirty records arrive in 4 micro-batches and link against the
    static clean master through the SAME er_candidates/er_score_pairs
    code paths; the pairs state upserts idempotently on (c_id, d_id).
    Because blocking + scoring are pure per-pair functions, per-batch
    linkage commutes with any batching of the dirty stream — so the
    oracle is the batch entry's oracle VERBATIM, and a full reprocess
    with a fresh checkpoint (run here) provably lands in unchanged
    state. The master never enters state; pairs carry ids + score
    only."""
    import tempfile

    from whisper_pandas_spark.streaming.linkage import (
        linkage_read_off,
        stream_linkage,
    )

    cust = _table(spark, sf_dir, "customer")
    recs = L.er_records(cust).localCheckpoint(eager=True)
    clean = recs.filter(F.col("src") == "clean")
    dirty = recs.filter(F.col("src") == "dirty")
    d = tempfile.mkdtemp(prefix="wps_streamer_")
    n_hi = dirty.agg(F.max("rec_id")).collect()[0][0] - L.DIRTY_OFFSET
    step = max(1, (int(n_hi) + 4) // 4)
    for i in range(4):
        lo = L.DIRTY_OFFSET + i * step
        cond = F.col("rec_id") >= lo
        if i < 3:
            cond = cond & (F.col("rec_id") < lo + step)
        dirty.filter(cond).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/changes/f{i}"
        )

    schema = (
        "rec_id long, src string, nation int, name string, phone string,"
        " city string, bal_cents bigint, seg string"
    )

    def run_pass(ckpt: str) -> None:
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/changes/*")
        )
        q = stream_linkage(sdf, clean, f"{d}/state", checkpoint_dir=ckpt)
        q.processAllAvailable()
        q.stop()

    run_pass(f"{d}/ckpt1")
    # full reprocess, fresh checkpoint: every pair re-derives and
    # anti-joins away — state provably unchanged under the hash gate
    run_pass(f"{d}/ckpt2")
    return linkage_read_off(spark, f"{d}/state")


# ---------------------------------------------------------------------------
# join_notin_nullaware
# ---------------------------------------------------------------------------


@register(
    "join_notin_nullaware",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS price_cents
FROM orders
WHERE o_custkey NOT IN
  (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def join_notin_nullaware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y172: NOT IN as a NULL-AWARE anti join — the one anti-join
    physical family the registry lacked (join_anti and the TPC-H
    shapes all use left_anti / NOT EXISTS, which is a plain LeftAnti).
    NOT IN over a nullable key has three-valued semantics (one NULL in
    the subquery empties the result), so Catalyst cannot use a plain
    hash anti join; naively it plans a BroadcastNestedLoopJoin with a
    disjunctive condition — a scale killer. Spark's NAAJ optimization
    keeps it hash-based: the broadcast HashedRelation is built
    null-aware (`HashedRelationBroadcastMode(..,true)` in the plan —
    asserted here; the entry RAISES on regression to the
    nested-loop fallback). The oracle runs the same ANSI NOT IN."""
    from whisper_pandas_spark.plans.inspect import formatted_plan

    _table(spark, sf_dir, "orders").createOrReplaceTempView("naaj_orders")
    _table(spark, sf_dir, "customer").createOrReplaceTempView(
        "naaj_customer"
    )
    q = spark.sql(
        """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS price_cents
FROM naaj_orders
WHERE o_custkey NOT IN
  (SELECT c_custkey FROM naaj_customer WHERE c_acctbal > 5000.0)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
    )
    plan = formatted_plan(q)
    if "BroadcastNestedLoop" in plan:
        raise RuntimeError(
            "NOT IN regressed to BroadcastNestedLoopJoin — the"
            " null-aware anti join optimization is off"
        )
    if "HashedRelationBroadcastMode(List(input[0, bigint, true]),true)" not in plan:
        raise RuntimeError(
            "NOT IN lost the null-aware HashedRelation build:"
            " the broadcast mode flag is not set"
        )
    return q


# ---------------------------------------------------------------------------
# attr_multitouch_linear
# ---------------------------------------------------------------------------

#: Attribution lookback window (days before the conversion).
_ATTR_LOOKBACK_DAYS = 3
#: Credit per conversion, in parts-per-million (exact integer split).
_ATTR_PPM = 1_000_000

_ATTR_ORACLE = f"""
WITH conv AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts,
    CAST(round(value * 100) AS BIGINT) AS val_cents
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT event_id AS t_id, user_id, ts AS t_ts, event_type AS touch_type
  FROM events WHERE event_type IN ('view', 'click', 'signup')
), pairs AS (
  SELECT c.p_id, c.val_cents, t.t_id, t.touch_type,
    row_number() OVER (PARTITION BY c.p_id ORDER BY t.t_ts, t.t_id) AS rn,
    count(*) OVER (PARTITION BY c.p_id) AS n
  FROM conv c JOIN touch t ON c.user_id = t.user_id
    AND t.t_ts < c.p_ts
    AND t.t_ts >= c.p_ts - INTERVAL {_ATTR_LOOKBACK_DAYS} DAY
), credited AS (
  SELECT touch_type, p_id, val_cents,
    {_ATTR_PPM} // n
      + CASE WHEN rn = 1 THEN {_ATTR_PPM} % n ELSE 0 END AS ppm
  FROM pairs
), direct AS (
  SELECT '(none)' AS touch_type, p_id, val_cents,
    {_ATTR_PPM} AS ppm
  FROM conv WHERE p_id NOT IN (SELECT p_id FROM pairs)
), unioned AS (
  SELECT * FROM credited UNION ALL SELECT * FROM direct
)
SELECT touch_type,
  CAST(count(*) AS BIGINT) AS n_credits,
  CAST(count(DISTINCT p_id) AS BIGINT) AS n_conversions,
  CAST(sum(ppm) AS BIGINT) AS credit_ppm,
  CAST(sum(ppm * val_cents) AS BIGINT) AS rev_credit
FROM unioned GROUP BY touch_type ORDER BY touch_type
"""


@register("attr_multitouch_linear", oracle=_ATTR_ORACLE)
def attr_multitouch_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y173: multi-touch attribution — the marketing-analytics family
    the registry lacked (funnel/path entries count SEQUENCES; nothing
    distributed conversion CREDIT). Linear model with an exact integer
    split: each purchase's 10^6 ppm divide evenly over its lookback
    touches (floor), remainder to the EARLIEST touch (ts, event_id
    total order) — so credit conserves exactly: sum(ppm) = 10^6 x
    conversions, a property the hash gate re-proves every run.
    Untouched conversions credit a '(none)' direct bucket (never
    silently dropped). Revenue weighting is ppm x value_cents — all
    BIGINT. Plan: ONE user-keyed interval join (per-user blocks are
    human-bounded, the as-of doctrine) + one per-conversion window +
    one map-side-combined agg; at 100 TB shuffle keys are (user_id)
    then (p_id) — ids and cents only, never props payloads."""
    ev = _table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("bigint").alias("val_cents"),
    )
    touch = ev.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        F.col("event_id").alias("t_id"),
        F.col("user_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    from pyspark.sql import Window

    pairs = conv.join(touch, "user_id").filter(
        (F.col("t_ts") < F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts")
            - F.expr(f"INTERVAL {_ATTR_LOOKBACK_DAYS} DAY")
        )
    )
    w = Window.partitionBy("p_id")
    credited = pairs.select(
        "touch_type",
        "p_id",
        "val_cents",
        F.row_number()
        .over(w.orderBy(F.col("t_ts"), F.col("t_id")))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    ).select(
        "touch_type",
        "p_id",
        "val_cents",
        (
            F.expr(f"{_ATTR_PPM} div n")
            + F.when(
                F.col("rn") == 1, F.expr(f"{_ATTR_PPM} % n")
            ).otherwise(F.lit(0))
        ).alias("ppm"),
    )
    direct = conv.join(
        pairs.select("p_id").distinct(), "p_id", "left_anti"
    ).select(
        F.lit("(none)").alias("touch_type"),
        "p_id",
        "val_cents",
        F.lit(_ATTR_PPM).cast("bigint").alias("ppm"),
    )
    return (
        credited.unionByName(direct)
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            F.countDistinct("p_id").cast("bigint").alias("n_conversions"),
            F.sum("ppm").cast("bigint").alias("credit_ppm"),
            F.sum(F.col("ppm") * F.col("val_cents"))
            .cast("bigint")
            .alias("rev_credit"),
        )
        .orderBy("touch_type")
    )


# ---------------------------------------------------------------------------
# profile_fd_check
# ---------------------------------------------------------------------------

_FD_ORACLE = """
WITH fd AS (
  SELECT 'nation.n_nationkey->n_regionkey' AS fd,
    CAST(n_nationkey AS BIGINT) AS lhs,
    CAST(n_regionkey AS BIGINT) AS rhs FROM nation
  UNION ALL
  SELECT 'orders.o_custkey->o_orderpriority',
    CAST(o_custkey AS BIGINT),
    CAST(length(o_orderpriority) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'lineitem.l_partkey->l_suppkey',
    CAST(l_partkey AS BIGINT), CAST(l_suppkey AS BIGINT)
  FROM lineitem
), per_key AS (
  SELECT fd, lhs, count(DISTINCT rhs) AS nd FROM fd GROUP BY fd, lhs
)
SELECT fd, CAST(count(*) AS BIGINT) AS n_keys,
  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_violating_keys,
  CAST(max(nd) AS BIGINT) AS max_distinct_rhs,
  (max(nd) = 1) AS holds
FROM per_key GROUP BY fd ORDER BY fd
"""


@register("profile_fd_check", oracle=_FD_ORACLE)
def profile_fd_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y174: functional-dependency profiling (the Deequ/Metanome
    op the profiling family lacked — [[benford/histogram/equidepth]]
    describe DISTRIBUTIONS; nothing checked DEPENDENCIES): for each
    candidate FD lhs->rhs, one groupBy(lhs) countDistinct(rhs) reports
    keys, violating keys, max fan-out and a holds verdict. Three
    candidates exercise both outcomes: nation->region HOLDS by
    construction; customer->priority and part->supplier are violated
    (many orders per customer, 4 suppliers per part in TPC-H). The
    rhs for the priority FD is integerized (length) so all three
    stack in one typed frame. Scale: each FD is a map-side-combined
    two-level aggregate over (fd, lhs) — the same shape at any size;
    no row ever carries more than the two profiled columns."""
    nation = _table(spark, sf_dir, "nation").select(
        F.lit("nation.n_nationkey->n_regionkey").alias("fd"),
        F.col("n_nationkey").cast("long").alias("lhs"),
        F.col("n_regionkey").cast("long").alias("rhs"),
    )
    orders = _table(spark, sf_dir, "orders").select(
        F.lit("orders.o_custkey->o_orderpriority").alias("fd"),
        F.col("o_custkey").cast("long").alias("lhs"),
        F.length("o_orderpriority").cast("long").alias("rhs"),
    )
    lineitem = _table(spark, sf_dir, "lineitem").select(
        F.lit("lineitem.l_partkey->l_suppkey").alias("fd"),
        F.col("l_partkey").cast("long").alias("lhs"),
        F.col("l_suppkey").cast("long").alias("rhs"),
    )
    per_key = (
        nation.unionByName(orders)
        .unionByName(lineitem)
        .groupBy("fd", "lhs")
        .agg(F.countDistinct("rhs").alias("nd"))
    )
    return (
        per_key.groupBy("fd")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_keys"),
            F.max("nd").cast("bigint").alias("max_distinct_rhs"),
            (F.max("nd") == 1).alias("holds"),
        )
        .orderBy("fd")
    )


# ---------------------------------------------------------------------------
# ts_reconcile_topdown
# ---------------------------------------------------------------------------

_REC_A = 0.5  # Holt level weight (expression-identical replay, no
_REC_B = 0.25  # binary-fraction requirement — the round-6 fold doctrine)


def _reconcile_oracle() -> str:
    a = f"CAST({_REC_A} AS DOUBLE)"
    b = f"CAST({_REC_B} AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    new_l = f"{a} * cur[1] + ({one} - {a}) * (acc[1] + acc[2])"
    return f"""
WITH tot AS (
  SELECT date_trunc('month', o_orderdate) AS t,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY t
), packed AS (
  SELECT list(CAST(cents AS DOUBLE) ORDER BY t) AS xs FROM tot
), fc AS (
  SELECT CAST(round(s[1] + s[2]) AS BIGINT) AS fc_total_cents FROM (
    SELECT list_reduce(
      list_prepend(
        [xs[1]::DOUBLE, xs[2]::DOUBLE - xs[1]::DOUBLE],
        list_transform(xs[2:], x -> [x::DOUBLE, CAST(0.0 AS DOUBLE)])),
      (acc, cur) -> [{new_l},
                     {b} * ({new_l} - acc[1]) + ({one} - {b}) * acc[2]]
    ) AS s FROM packed)
), hist AS (
  SELECT c.c_nationkey AS nation,
    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS hist_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey
), quota AS (
  SELECT h.nation, h.hist_cents, f.fc_total_cents,
    CAST(CAST(f.fc_total_cents AS HUGEINT) * h.hist_cents
         // (SELECT sum(hist_cents) FROM hist) AS BIGINT) AS floor_cents,
    CAST(CAST(f.fc_total_cents AS HUGEINT) * h.hist_cents
         % (SELECT sum(hist_cents) FROM hist) AS BIGINT) AS rem
  FROM hist h CROSS JOIN fc f
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, nation) AS rn,
    (SELECT max(fc_total_cents) FROM quota)
      - (SELECT sum(floor_cents) FROM quota) AS leftover
  FROM quota
)
SELECT nation, hist_cents, floor_cents,
  CAST(floor_cents + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT)
    AS reconciled_cents,
  fc_total_cents
FROM ranked ORDER BY nation
"""


@register("ts_reconcile_topdown", oracle=_reconcile_oracle())
def ts_reconcile_topdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y175: hierarchical forecast reconciliation (Hyndman's top-down
    with historical proportions) — the coherence stage the forecasting
    family lacked (holt/holt-winters/seasonal forecast SERIES; nothing
    made a hierarchy's forecasts ADD UP). The total monthly-revenue
    series forecasts one step ahead through the existing Holt fold
    (operators/forecast.py, expression-identical oracle replay); the
    per-nation split then uses HAMILTON APPORTIONMENT in exact integer
    arithmetic — floor(fc x hist_i / hist_total) via DECIMAL(38)
    products (HUGEINT in the oracle; parity probed), remainder cents
    to the largest fractional parts ((rem, nation) total order) — so
    sum(reconciled) == fc_total EXACTLY, a conservation law the hash
    gate re-proves every run (the attribution-ppm doctrine; float
    proportions could never promise it). Plan: two aggregates (month,
    nation), a 1-row forecast broadcast, and a 25-row quota frame —
    nothing corpus-sized past the first aggregate at any scale.
    Positive-revenue domain documented: div truncation == floor."""
    from whisper_pandas_spark.operators.forecast import holt_forecast

    orders = _table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").alias("t"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    tot = (
        orders.groupBy("t")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
        .select("t", F.col("cents").cast("double").alias("v"), F.lit(1).alias("g"))
    )
    fc = (
        holt_forecast(tot, ("g",), "t", "v", _REC_A, _REC_B, 1)
        .select(
            F.round(F.col("level") + F.col("slope"))
            .cast("bigint")
            .alias("fc_total_cents")
        )
    )
    cust = _table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    hist = (
        orders.join(F.broadcast(cust), "o_custkey")
        .groupBy("nation")
        .agg(F.sum("cents").cast("bigint").alias("hist_cents"))
    )
    hist_tot = hist.agg(
        F.sum("hist_cents").cast("bigint").alias("hist_total")
    )
    quota = (
        hist.crossJoin(F.broadcast(fc))
        .crossJoin(F.broadcast(hist_tot))
        .select(
            "nation",
            "hist_cents",
            "fc_total_cents",
            F.expr(
                "CAST(CAST(fc_total_cents AS DECIMAL(38,0))"
                " * CAST(hist_cents AS DECIMAL(38,0))"
                " div CAST(hist_total AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("floor_cents"),
            F.expr(
                "CAST(CAST(fc_total_cents AS DECIMAL(38,0))"
                " * CAST(hist_cents AS DECIMAL(38,0))"
                " % CAST(hist_total AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("rem"),
        )
    )
    leftover = quota.agg(
        (F.max("fc_total_cents") - F.sum("floor_cents"))
        .cast("bigint")
        .alias("leftover")
    )
    from pyspark.sql import Window

    ranked = quota.crossJoin(F.broadcast(leftover)).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(F.lit(1)).orderBy(
                F.col("rem").desc(), F.col("nation")
            )
        ),
    )
    return ranked.select(
        "nation",
        "hist_cents",
        "floor_cents",
        (
            F.col("floor_cents")
            + F.when(F.col("rn") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("reconciled_cents"),
        "fc_total_cents",
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# crawl_robots_filter
# ---------------------------------------------------------------------------

_ROBOTS_ORACLE = """
WITH urls AS (
  SELECT doc_id,
    'site' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS domain,
    '/' || CASE doc_id % 5
      WHEN 0 THEN 'private/file' || CAST(doc_id AS VARCHAR)
      WHEN 1 THEN 'private/pub/p' || CAST(doc_id AS VARCHAR)
      WHEN 2 THEN 'tmp/t' || CAST(doc_id AS VARCHAR)
      WHEN 3 THEN 'blog/post' || CAST(doc_id AS VARCHAR)
      ELSE 'index.html' END AS path
  FROM documents
), doms AS (
  SELECT DISTINCT doc_id % 20 AS k,
    'site' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS domain
  FROM documents
), robots AS (
  SELECT domain,
    '# synthetic robots for site' || CAST(k AS VARCHAR) || chr(10)
    || 'User-agent: specialbot' || chr(10)
    || 'Disallow: /blog' || chr(10) || chr(10)
    || 'User-agent: *' || chr(10)
    || CASE k % 4
      WHEN 0 THEN 'Disallow: /private/' || chr(10)
        || 'Allow: /private/pub/' || chr(10)
        || 'Disallow: /blog/post' || chr(10)
        || 'Allow: /blog/post' || chr(10)
      WHEN 1 THEN 'disallow: /tmp' || chr(10)
      WHEN 2 THEN 'Disallow: /' || chr(10) || 'Allow: /blog' || chr(10)
      ELSE 'Disallow:' || chr(10) END AS rtext
  FROM doms
), lines0 AS (
  SELECT domain, string_split(rtext, chr(10)) AS ls FROM robots
), lines_ AS (
  SELECT domain, CAST(i AS INT) AS pos,
    trim(string_split(ls[CAST(i AS INT)], '#')[1]) AS line
  FROM lines0, unnest(range(1, len(ls) + 1)) AS t(i)
), tagged AS (
  SELECT domain, pos, line,
    last_value(CASE WHEN lower(line) LIKE 'user-agent:%'
                    THEN trim(substr(line, 12)) END IGNORE NULLS)
      OVER (PARTITION BY domain ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ua
  FROM lines_
), rules AS (
  SELECT domain, ua,
    CASE WHEN lower(line) LIKE 'allow:%' THEN trim(substr(line, 7))
         ELSE trim(substr(line, 10)) END AS prefix,
    CASE WHEN lower(line) LIKE 'allow:%' THEN 1 ELSE 0 END AS is_allow
  FROM tagged
  WHERE (lower(line) LIKE 'allow:%' OR lower(line) LIKE 'disallow:%')
    AND ua IS NOT NULL
), star_rules AS (
  SELECT * FROM rules WHERE ua = '*' AND prefix <> ''
), joined AS (
  SELECT u.doc_id AS id, u.domain, u.path, r.prefix, r.is_allow
  FROM urls u LEFT JOIN star_rules r
    ON u.domain = r.domain AND starts_with(u.path, r.prefix)
), picked AS (
  SELECT *, row_number() OVER (
      PARTITION BY id
      ORDER BY length(prefix) DESC, is_allow DESC, prefix) AS rn
  FROM joined
)
SELECT id, domain, path,
  CAST(CASE WHEN prefix IS NULL THEN 1 ELSE is_allow END AS INT)
    AS allowed,
  CASE WHEN prefix IS NOT NULL THEN
    (CASE WHEN is_allow = 1 THEN 'A:' ELSE 'D:' END) || prefix END AS rule
FROM picked WHERE rn = 1 ORDER BY id
"""


@register("crawl_robots_filter", oracle=_ROBOTS_ORACLE)
def crawl_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y176: robots.txt evaluation (RFC 9309 — operators/robots.py),
    the crawl-politeness stage the WARC/WET/WAT/CDX/ZIPNUM stack
    lacked: a selective re-crawl evaluates every candidate URL against
    its domain's robots BEFORE touching payload shards. The in-query
    corpus plants every protocol trap: a specific-agent group whose
    rules must NOT leak into '*' (group tracking is load-bearing),
    comment lines, a lowercase directive, an EMPTY Disallow (no
    restriction per RFC), an Allow overriding a longer Disallow
    (/private/pub/ inside /private/), an exact length TIE where Allow
    must win (/blog/post), and a Disallow-everything domain with one
    carve-out. Parse is split/trim/CASE codegen with a running
    last-non-null window for group membership; evaluation is one
    broadcast domain equi-join + startswith and one per-URL
    longest-match window. The oracle replays parse AND evaluation from
    the same synthesized bytes."""
    from whisper_pandas_spark.operators.robots import (
        evaluate_urls,
        parse_robots,
    )

    docs = _table(spark, sf_dir, "documents")
    nl = "\n"
    urls = docs.select(
        "doc_id",
        F.expr(
            "'site' || CAST(doc_id % 20 AS STRING) || '.example'"
        ).alias("domain"),
        F.expr(
            "'/' || CASE doc_id % 5 "
            "WHEN 0 THEN 'private/file' || CAST(doc_id AS STRING) "
            "WHEN 1 THEN 'private/pub/p' || CAST(doc_id AS STRING) "
            "WHEN 2 THEN 'tmp/t' || CAST(doc_id AS STRING) "
            "WHEN 3 THEN 'blog/post' || CAST(doc_id AS STRING) "
            "ELSE 'index.html' END"
        ).alias("path"),
    )
    doms = docs.select(
        (F.col("doc_id") % 20).alias("k"),
        F.expr(
            "'site' || CAST(doc_id % 20 AS STRING) || '.example'"
        ).alias("domain"),
    ).distinct()
    robots = doms.select(
        "domain",
        F.concat(
            F.lit("# synthetic robots for site"),
            F.col("k").cast("string"),
            F.lit(nl),
            F.lit("User-agent: specialbot" + nl),
            F.lit("Disallow: /blog" + nl + nl),
            F.lit("User-agent: *" + nl),
            F.when(
                F.col("k") % 4 == 0,
                F.lit(
                    "Disallow: /private/" + nl
                    + "Allow: /private/pub/" + nl
                    + "Disallow: /blog/post" + nl
                    + "Allow: /blog/post" + nl
                ),
            )
            .when(F.col("k") % 4 == 1, F.lit("disallow: /tmp" + nl))
            .when(
                F.col("k") % 4 == 2,
                F.lit("Disallow: /" + nl + "Allow: /blog" + nl),
            )
            .otherwise(F.lit("Disallow:" + nl)),
        ).alias("rtext"),
    )
    rules = parse_robots(robots, "domain", "rtext")
    return evaluate_urls(
        urls, rules, "doc_id", "domain", "path"
    ).orderBy("id")


# ---------------------------------------------------------------------------
# crawl_sitemap_delta
# ---------------------------------------------------------------------------

_SITEMAP_ORACLE = """
WITH urls AS (
  SELECT doc_id,
    'site' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS domain,
    'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example/'
      || CASE doc_id % 5
        WHEN 0 THEN 'private/file' || CAST(doc_id AS VARCHAR)
        WHEN 1 THEN 'private/pub/p' || CAST(doc_id AS VARCHAR)
        WHEN 2 THEN 'tmp/t' || CAST(doc_id AS VARCHAR)
        WHEN 3 THEN 'blog/post' || CAST(doc_id AS VARCHAR)
        ELSE 'page' || CAST(doc_id AS VARCHAR) || '.html' END AS url,
    '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
      AS lastmod
  FROM documents
), blocks AS (
  SELECT doc_id, domain,
    '<url><loc>' || url || '</loc><lastmod>' || lastmod
      || '</lastmod></url>' AS block
  FROM urls
), sitemaps AS (
  SELECT domain,
    '<?xml version="1.0" encoding="UTF-8"?>'
    || '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    || string_agg(block, '' ORDER BY doc_id) || '</urlset>' AS xml
  FROM blocks GROUP BY domain
), parsed0 AS (
  SELECT domain,
    unnest(regexp_extract_all(xml, '<url>(.*?)</url>', 1)) AS u
  FROM sitemaps
), parsed AS (
  SELECT domain,
    regexp_extract(u, '<loc>(.*?)</loc>', 1) AS url,
    regexp_extract(u, '<lastmod>(.*?)</lastmod>', 1) AS lastmod
  FROM parsed0
), state AS (
  SELECT url,
    '2024-01-' || lpad(CAST((doc_id * 7) % 28 + 1 AS VARCHAR), 2, '0')
      AS last_crawl
  FROM urls WHERE doc_id % 3 <> 0
)
SELECT p.url, p.domain, p.lastmod, s.last_crawl,
  CASE WHEN s.last_crawl IS NULL THEN 'new'
       WHEN p.lastmod > s.last_crawl THEN 'changed'
       ELSE 'fresh' END AS verdict
FROM parsed p LEFT JOIN state s ON p.url = s.url
ORDER BY p.url
"""


@register("crawl_sitemap_delta", oracle=_SITEMAP_ORACLE)
def crawl_sitemap_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y177: sitemap-driven incremental re-crawl planning (the
    sitemaps.org protocol next to [[Y176]]'s robots): per-domain
    sitemap XML is BUILT from the corpus (deterministic string_agg in
    doc order) and then RE-PARSED by the real extraction path —
    non-greedy regexp block split (Java regex and RE2 agree,
    parity-probed) + per-block loc/lastmod extraction — so the hash
    proves the parser, not just the plan; parsed URLs left-join the
    prior-crawl state and classify new / changed / fresh (lastmod
    vs last-crawl as ISO dates, compared lexicographically — no
    timestamp-parse drift). This is the CDX-first doctrine applied
    forward in time: the fetch list is decided from index-sized
    tables alone, payload shards untouched. Scale: sitemap build and
    parse shuffle once on domain (XML stays domain-sized, the
    protocol's own 50k-URL/file cap); the state join is URL-keyed."""
    docs = _table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.expr(
            "'site' || CAST(doc_id % 20 AS STRING) || '.example'"
        ).alias("domain"),
        F.expr(
            "'https://site' || CAST(doc_id % 20 AS STRING) || '.example/'"
            " || CASE doc_id % 5 "
            "WHEN 0 THEN 'private/file' || CAST(doc_id AS STRING) "
            "WHEN 1 THEN 'private/pub/p' || CAST(doc_id AS STRING) "
            "WHEN 2 THEN 'tmp/t' || CAST(doc_id AS STRING) "
            "WHEN 3 THEN 'blog/post' || CAST(doc_id AS STRING) "
            "ELSE 'page' || CAST(doc_id AS STRING) || '.html' END"
        ).alias("url"),
        F.expr(
            "'2024-01-' || lpad(CAST(doc_id % 28 + 1 AS STRING), 2, '0')"
        ).alias("lastmod"),
    )
    blocks = urls.select(
        "doc_id",
        "domain",
        F.concat(
            F.lit("<url><loc>"),
            F.col("url"),
            F.lit("</loc><lastmod>"),
            F.col("lastmod"),
            F.lit("</lastmod></url>"),
        ).alias("block"),
    )
    sitemaps = (
        blocks.groupBy("domain")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "block"))
            ).alias("bs")
        )
        .select(
            "domain",
            F.concat(
                F.lit(
                    '<?xml version="1.0" encoding="UTF-8"?>'
                    '<urlset xmlns='
                    '"http://www.sitemaps.org/schemas/sitemap/0.9">'
                ),
                F.concat_ws(
                    "", F.transform(F.col("bs"), lambda b: b["block"])
                ),
                F.lit("</urlset>"),
            ).alias("xml"),
        )
    )
    parsed = sitemaps.select(
        "domain",
        F.explode(
            F.expr("regexp_extract_all(xml, '<url>(.*?)</url>', 1)")
        ).alias("u"),
    ).select(
        "domain",
        F.regexp_extract("u", "<loc>(.*?)</loc>", 1).alias("url"),
        F.regexp_extract("u", "<lastmod>(.*?)</lastmod>", 1).alias(
            "lastmod"
        ),
    )
    state = urls.filter(F.col("doc_id") % 3 != 0).select(
        "url",
        F.expr(
            "'2024-01-' || lpad(CAST((doc_id * 7) % 28 + 1 AS STRING),"
            " 2, '0')"
        ).alias("last_crawl"),
    )
    return (
        parsed.join(state, "url", "left")
        .select(
            "url",
            "domain",
            "lastmod",
            "last_crawl",
            F.when(F.col("last_crawl").isNull(), "new")
            .when(F.col("lastmod") > F.col("last_crawl"), "changed")
            .otherwise("fresh")
            .alias("verdict"),
        )
        .orderBy("url")
    )


# ---------------------------------------------------------------------------
# emb_matryoshka_topk
# ---------------------------------------------------------------------------

#: Matryoshka prefix dimensionality (of the fixture's 64).
_MRL_DIM = 16
_MRL_K = 10


def _mrl_oracle() -> str:
    from whisper_pandas_spark.functions.duck import duck_cos

    pd, k = _MRL_DIM, _MRL_K
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < 5
), c AS (
  SELECT vec_id, embedding AS cv FROM embeddings
), pranked AS (
  SELECT query_id, vec_id, cos_sim, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk
  FROM (
    SELECT q.query_id, c.vec_id,
      round({duck_cos("qv[1:" + str(pd) + "]", "cv[1:" + str(pd) + "]")},
            6) AS cos_sim
    FROM c CROSS JOIN q WHERE c.vec_id != q.query_id)
), franked AS (
  SELECT query_id, vec_id, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk
  FROM (
    SELECT q.query_id, c.vec_id,
      round({duck_cos("qv", "cv")}, 6) AS cos_sim
    FROM c CROSS JOIN q WHERE c.vec_id != q.query_id)
), ftop AS (
  SELECT query_id, vec_id FROM franked WHERE rnk <= {k}
)
SELECT p.query_id, p.vec_id, p.cos_sim, p.rnk,
  CAST(f.vec_id IS NOT NULL AS INT) AS in_full
FROM pranked p LEFT JOIN ftop f
  ON p.query_id = f.query_id AND p.vec_id = f.vec_id
WHERE p.rnk <= {k}
ORDER BY p.query_id, p.rnk
"""


@register("emb_matryoshka_topk", oracle=_mrl_oracle())
def emb_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y178: Matryoshka prefix-dimension retrieval (Kusupati et al.
    2022) — MRL embeddings let the first M dims serve as a cheaper
    standalone representation: top-{_MRL_K} over the {_MRL_DIM}-dim
    PREFIX (a zero-cost F.slice — no projection matrix, unlike the
    JL/PCA rows) with the full-dim truth ranking computed in the SAME
    plan and per-row membership (`in_full`) riding the hash-checked
    output — the recall audit IS the result, the emb_ann_recall_audit
    doctrine. On the near-random fixture the prefix ranking degrades
    exactly as MRL predicts for non-MRL-trained vectors: the entry is
    the serving-path plumbing (slice -> same cosine_topk machinery ->
    membership join), which is what transfers to real MRL checkpoints.
    Scale: prefix scoring reads 4x less data per pair; both rankings
    broadcast the 5-query side, corpus stays map-side."""
    from whisper_pandas_spark.operators.similarity import cosine_topk

    emb = _table(spark, sf_dir, "embeddings")
    pref = emb.select(
        "vec_id", F.slice("embedding", 1, _MRL_DIM).alias("embedding")
    )
    q_pref = pref.filter(F.col("vec_id") < 5)
    q_full = emb.filter(F.col("vec_id") < 5)
    ptop = cosine_topk(pref, q_pref, _MRL_K)
    ftop = cosine_topk(emb, q_full, _MRL_K).select(
        F.col("query_id").alias("fq"), F.col("vec_id").alias("fv")
    )
    return (
        ptop.join(
            ftop,
            (F.col("query_id") == F.col("fq"))
            & (F.col("vec_id") == F.col("fv")),
            "left",
        )
        .select(
            "query_id",
            "vec_id",
            "cos_sim",
            "rnk",
            F.col("fv").isNotNull().cast("int").alias("in_full"),
        )
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# stream_attr_replay
# ---------------------------------------------------------------------------


@register("stream_attr_replay", oracle=_ATTR_ORACLE)
def stream_attr_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+/Y179: STREAMING attribution (streaming/attribution.py) —
    purchases arrive in 4 micro-batches and credit against the static
    touch store through the batch entry's arithmetic verbatim; the
    credits state upserts idempotently on p_id. Credit is a pure
    per-conversion function, so batching commutes and the batch
    entry's oracle checks the streaming face VERBATIM; the second
    pass (fresh checkpoint, full re-delivery) proves unchanged state.
    Credit conservation (sum ppm = 10^6 x conversions) survives the
    stream by construction — each conversion's split lands atomically
    in one batch."""
    import tempfile

    from whisper_pandas_spark.streaming.attribution import (
        attribution_read_off,
        stream_attribution,
    )

    ev = _table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("bigint").alias("val_cents"),
    )
    touch = ev.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    ).localCheckpoint(eager=True)
    d = tempfile.mkdtemp(prefix="wps_streamattr_")
    bounds = conv.agg(
        F.min("p_id").alias("lo"), F.max("p_id").alias("hi")
    ).collect()[0]
    step = max(1, (int(bounds["hi"]) - int(bounds["lo"])) // 4 + 1)
    for i in range(4):
        lo = int(bounds["lo"]) + i * step
        cond = F.col("p_id") >= lo
        if i < 3:
            cond = cond & (F.col("p_id") < lo + step)
        conv.filter(cond).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/changes/f{i}"
        )

    schema = "p_id long, user_id long, p_ts timestamp, val_cents bigint"

    def run_pass(ckpt: str) -> None:
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/changes/*")
        )
        q = stream_attribution(
            sdf,
            touch,
            f"{d}/state",
            _ATTR_LOOKBACK_DAYS,
            _ATTR_PPM,
            checkpoint_dir=ckpt,
        )
        q.processAllAvailable()
        q.stop()

    run_pass(f"{d}/ckpt1")
    run_pass(f"{d}/ckpt2")
    return attribution_read_off(spark, f"{d}/state")


# ---------------------------------------------------------------------------
# text_sft_masking
# ---------------------------------------------------------------------------

_SFT_SYS = "You are a helpful assistant."
_SFT_U2 = "Quote the opening."
_SFT_A2P = "It opens: "
_IMS = "<|im_start|>"
_IME = "<|im_end|>"


def _sft_oracle() -> str:
    ims, ime = _IMS, _IME
    # fixed template piece lengths (chars)
    return f"""
WITH conv AS (
  SELECT doc_id,
    '{_SFT_SYS}' AS sys,
    'Describe document ' || CAST(doc_id AS VARCHAR) || ' in ' || lang
      || '.' AS u1,
    text AS a1,
    '{_SFT_U2}' AS u2,
    '{_SFT_A2P}' || substr(text, 1, 40) AS a2
  FROM documents WHERE text IS NOT NULL
), rendered AS (
  SELECT doc_id, a1, a2,
    '{ims}system' || chr(10) || sys || '{ime}' || chr(10)
    || '{ims}user' || chr(10) || u1 || '{ime}' || chr(10)
    || '{ims}assistant' || chr(10) || a1 || '{ime}' || chr(10)
    || '{ims}user' || chr(10) || u2 || '{ime}' || chr(10)
    || '{ims}assistant' || chr(10) || a2 || '{ime}' || chr(10) AS r,
    length('{ims}system' || chr(10) || sys || '{ime}' || chr(10)
      || '{ims}user' || chr(10) || u1 || '{ime}' || chr(10)
      || '{ims}assistant' || chr(10)) AS s1,
    length(a1) AS l1,
    length('{ims}system' || chr(10) || sys || '{ime}' || chr(10)
      || '{ims}user' || chr(10) || u1 || '{ime}' || chr(10)
      || '{ims}assistant' || chr(10) || a1 || '{ime}' || chr(10)
      || '{ims}user' || chr(10) || u2 || '{ime}' || chr(10)
      || '{ims}assistant' || chr(10)) AS s2,
    length(a2) AS l2
  FROM conv
), spans AS (
  SELECT doc_id, 1 AS turn, s1 AS mask_start, s1 + l1 AS mask_end,
    length(r) AS total_chars, md5(r) AS rendered_md5,
    CAST(substr(r, s1 + 1, l1) = a1 AS INT) AS span_ok
  FROM rendered
  UNION ALL
  SELECT doc_id, 2, s2, s2 + l2, length(r), md5(r),
    CAST(substr(r, s2 + 1, l2) = a2 AS INT)
  FROM rendered
)
SELECT doc_id, turn, CAST(mask_start AS BIGINT) AS mask_start,
  CAST(mask_end AS BIGINT) AS mask_end,
  CAST(total_chars AS BIGINT) AS total_chars, rendered_md5, span_ok
FROM spans ORDER BY doc_id, turn
"""


@register("text_sft_masking", oracle=_sft_oracle())
def text_sft_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y180: SFT chat-template rendering + loss-mask spans — the
    training-data-prep step AFTER curation that nothing in the
    registry covered: each document becomes a pinned-template 5-turn
    conversation (system/user/assistant/user/assistant, ChatML-style
    markers), and the entry emits the per-assistant-turn CHARACTER
    span [mask_start, mask_end) where loss applies — assistant
    content only, the standard SFT masking contract. Offsets are
    computed by LENGTH ARITHMETIC over the same concat pieces (the
    WARC offset doctrine — never by searching the rendered string),
    and an in-result identity proof rides every row:
    substr(rendered, start+1, len) == content, pinned TRUE by the
    oracle; rendered_md5 proves the full rendering without hauling
    it. Pure codegen concat/length/md5 — a free rider on the corpus
    scan at any scale."""
    docs = _table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    nl = "\n"
    conv = docs.select(
        "doc_id",
        F.lit(_SFT_SYS).alias("sys"),
        F.concat(
            F.lit("Describe document "),
            F.col("doc_id").cast("string"),
            F.lit(" in "),
            F.col("lang"),
            F.lit("."),
        ).alias("u1"),
        F.col("text").alias("a1"),
        F.lit(_SFT_U2).alias("u2"),
        F.concat(
            F.lit(_SFT_A2P), F.substring("text", 1, 40)
        ).alias("a2"),
    )

    def seg(role, body):
        return F.concat(
            F.lit(_IMS + role + nl), body, F.lit(_IME + nl)
        )

    pre1 = F.concat(
        seg("system", F.col("sys")),
        seg("user", F.col("u1")),
        F.lit(_IMS + "assistant" + nl),
    )
    mid = F.concat(
        F.col("a1"),
        F.lit(_IME + nl),
        seg("user", F.col("u2")),
        F.lit(_IMS + "assistant" + nl),
    )
    r = F.concat(pre1, mid, F.col("a2"), F.lit(_IME + nl))
    rendered = conv.select(
        "doc_id",
        "a1",
        "a2",
        r.alias("r"),
        F.length(pre1).alias("s1"),
        F.length("a1").alias("l1"),
        (F.length(pre1) + F.length(mid)).alias("s2"),
        F.length("a2").alias("l2"),
    )
    spans = rendered.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("turn"),
                    F.col("s1").alias("ms"),
                    (F.col("s1") + F.col("l1")).alias("me"),
                    F.col("a1").alias("content"),
                    F.col("l1").alias("ln"),
                ),
                F.struct(
                    F.lit(2).alias("turn"),
                    F.col("s2").alias("ms"),
                    (F.col("s2") + F.col("l2")).alias("me"),
                    F.col("a2").alias("content"),
                    F.col("l2").alias("ln"),
                ),
            )
        ).alias("sp"),
        "r",
    ).select(
        "doc_id",
        F.col("sp.turn").alias("turn"),
        F.col("sp.ms").cast("bigint").alias("mask_start"),
        F.col("sp.me").cast("bigint").alias("mask_end"),
        F.length("r").cast("bigint").alias("total_chars"),
        F.md5(F.col("r")).alias("rendered_md5"),
        (
            F.expr("substr(r, sp.ms + 1, sp.ln)") == F.col("sp.content")
        )
        .cast("int")
        .alias("span_ok"),
    )
    return spans.orderBy("doc_id", "turn")


# ---------------------------------------------------------------------------
# pack_sft_spans
# ---------------------------------------------------------------------------

#: Packed sequence length (chars of rendered conversation stream).
_PSFT_B = 2048
_PSFT_SHARDS = 2

# Template piece lengths — ONE Python source feeds both engines, so
# the offset arithmetic cannot drift from the Y180 template.
_L_SYS_HDR = len(_IMS + "system\n")
_L_USER_HDR = len(_IMS + "user\n")
_L_ASST_HDR = len(_IMS + "assistant\n")
_L_END = len(_IME + "\n")
_L_SYS = len(_SFT_SYS)
_L_U1_CONST = len("Describe document ") + len(" in ") + len(".")
_L_U2 = len(_SFT_U2)
_L_A2P = len(_SFT_A2P)


def _psft_oracle() -> str:
    from whisper_pandas_spark.operators.sampling import duck_hash_bucket

    B, S = _PSFT_B, _PSFT_SHARDS
    s1 = (
        f"{_L_SYS_HDR + _L_SYS + _L_END + _L_USER_HDR + _L_U1_CONST}"
        f" + length(CAST(doc_id AS VARCHAR)) + length(lang)"
        f" + {_L_END + _L_ASST_HDR}"
    )
    return f"""
WITH lens AS (
  SELECT doc_id, lang,
    ({duck_hash_bucket("doc_id")} % {S}) AS shard,
    {s1} AS s1,
    length(text) AS l1,
    ({s1}) + length(text)
      + {_L_END + _L_USER_HDR + _L_U2 + _L_END + _L_ASST_HDR} AS s2,
    {_L_A2P} + least(length(text), 40) AS l2
  FROM documents WHERE text IS NOT NULL
), docs_g AS (
  SELECT *, s2 + l2 + {_L_END} AS total,
    CAST(coalesce(sum(s2 + l2 + {_L_END}) OVER (
      PARTITION BY lang, shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS g0
  FROM lens
), spans AS (
  SELECT doc_id, lang, shard, 1 AS turn, g0 + s1 AS gs,
    g0 + s1 + l1 AS ge FROM docs_g WHERE l1 > 0
  UNION ALL
  SELECT doc_id, lang, shard, 2, g0 + s2, g0 + s2 + l2 FROM docs_g
), frags AS (
  SELECT lang, shard, CAST(sq AS BIGINT) AS seq_id, doc_id, turn,
    CAST(greatest(gs, sq * {B}) - sq * {B} AS BIGINT) AS frag_start,
    CAST(least(ge, (sq + 1) * {B}) - sq * {B} AS BIGINT) AS frag_end
  FROM spans, unnest(range(gs // {B}, (ge - 1) // {B} + 1)) AS t(sq)
)
SELECT lang, CAST(shard AS INT) AS shard, seq_id, doc_id, turn,
  frag_start, frag_end
FROM frags
ORDER BY lang, shard, seq_id, doc_id, turn, frag_start
"""


@register("pack_sft_spans", oracle=_psft_oracle())
def pack_sft_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y181: PACKED-SFT loss-mask clipping — the composition of
    [[Y180]]'s spans with the packing stage: rendered conversations
    concatenate per (lang, shard) stream (the pack_sequences window
    cumsum), the stream chops into fixed {_PSFT_B}-char sequences,
    and every assistant span CLIPS against sequence boundaries into
    1+ (seq_id, frag_start, frag_end) fragments — the arithmetic real
    packed SFT training needs (masks must never bleed across packed
    sequence boundaries). All offsets derive from ONE Python constant
    table + length(text)/length(lang) — pure integer interval
    arithmetic, no rendered strings ever built, no search (the WARC
    offset doctrine at its purest). Empty assistant spans (l=0) carry
    no loss and are excluded, which also keeps the sequence() bounds
    ascending. Conservation (fragment lengths sum to span length) is
    pytest-pinned. Scale: one window cumsum per (lang, shard) + a
    bounded explode (span_len/{_PSFT_B} + 1 fragments)."""
    from whisper_pandas_spark.operators.sampling import hash_bucket

    B, S = _PSFT_B, _PSFT_SHARDS
    docs = _table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    s1 = (
        F.lit(_L_SYS_HDR + _L_SYS + _L_END + _L_USER_HDR + _L_U1_CONST)
        + F.length(F.col("doc_id").cast("string"))
        + F.length("lang")
        + F.lit(_L_END + _L_ASST_HDR)
    )
    lens = docs.select(
        "doc_id",
        "lang",
        (hash_bucket(F.col("doc_id")) % S).alias("shard"),
        s1.alias("s1"),
        F.length("text").alias("l1"),
        (
            s1
            + F.length("text")
            + F.lit(_L_END + _L_USER_HDR + _L_U2 + _L_END + _L_ASST_HDR)
        ).alias("s2"),
        (F.lit(_L_A2P) + F.least(F.length("text"), F.lit(40))).alias(
            "l2"
        ),
    ).withColumn("total", F.col("s2") + F.col("l2") + F.lit(_L_END))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    docs_g = lens.withColumn(
        "g0", F.coalesce(F.sum("total").over(w), F.lit(0))
    )
    span1 = docs_g.filter(F.col("l1") > 0).select(
        "doc_id",
        "lang",
        "shard",
        F.lit(1).alias("turn"),
        (F.col("g0") + F.col("s1")).alias("gs"),
        (F.col("g0") + F.col("s1") + F.col("l1")).alias("ge"),
    )
    span2 = docs_g.select(
        "doc_id",
        "lang",
        "shard",
        F.lit(2).alias("turn"),
        (F.col("g0") + F.col("s2")).alias("gs"),
        (F.col("g0") + F.col("s2") + F.col("l2")).alias("ge"),
    )
    spans = span1.unionByName(span2)
    frags = spans.select(
        "lang",
        F.col("shard").cast("int").alias("shard"),
        F.explode(
            F.sequence(
                F.expr(f"gs div {B}"), F.expr(f"(ge - 1) div {B}")
            )
        ).alias("seq_id"),
        "doc_id",
        "turn",
        "gs",
        "ge",
    ).select(
        "lang",
        "shard",
        F.col("seq_id").cast("bigint").alias("seq_id"),
        "doc_id",
        "turn",
        (
            F.greatest(F.col("gs"), F.col("seq_id") * B)
            - F.col("seq_id") * B
        )
        .cast("bigint")
        .alias("frag_start"),
        (
            F.least(F.col("ge"), (F.col("seq_id") + 1) * B)
            - F.col("seq_id") * B
        )
        .cast("bigint")
        .alias("frag_end"),
    )
    return frags.orderBy(
        "lang", "shard", "seq_id", "doc_id", "turn", "frag_start"
    )


# ---------------------------------------------------------------------------
# ab_experiment_report
# ---------------------------------------------------------------------------

_AB_SEED = 42
#: chi-square scale (statistic reported as floor(chi2 * 1e6)).
_AB_SCALE = 1_000_000
#: 3.841 * 1e6 — the 95% critical value for 1 df, in scaled units.
_AB_CRIT = 3_841_000


def _ab_oracle() -> str:
    from whisper_pandas_spark.operators.sampling import duck_hash_bucket

    return f"""
WITH users AS (
  SELECT DISTINCT user_id FROM events
), assigned AS (
  SELECT user_id,
    CASE WHEN ({duck_hash_bucket("user_id", _AB_SEED)}) % 2 = 0
         THEN 'control' ELSE 'treatment' END AS variant
  FROM users
), conv AS (
  SELECT user_id,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), per_user AS (
  SELECT a.variant, a.user_id,
    CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS converted,
    coalesce(c.rev_cents, 0) AS rev_cents
  FROM assigned a LEFT JOIN conv c ON a.user_id = c.user_id
), per_variant AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
    CAST(sum(converted) AS BIGINT) AS n_converted,
    CAST(sum(rev_cents) AS BIGINT) AS revenue_cents
  FROM per_user GROUP BY variant
), tot AS (
  SELECT CAST(sum(n_users) AS BIGINT) AS n,
    CAST(sum(CASE WHEN variant = 'control' THEN n_users ELSE 0 END)
         AS BIGINT) AS nc
  FROM per_variant
)
SELECT v.variant, v.n_users, v.n_converted,
  CAST(v.n_converted * {_AB_SCALE} // v.n_users AS BIGINT) AS conv_ppm,
  v.revenue_cents,
  CAST((2 * t.nc - t.n) * (2 * t.nc - t.n) * {_AB_SCALE} // t.n
       AS BIGINT) AS srm_chi2_x1e6,
  CAST((2 * t.nc - t.n) * (2 * t.nc - t.n) * {_AB_SCALE} // t.n
       >= {_AB_CRIT} AS INT) AS srm_flag
FROM per_variant v CROSS JOIN tot t
ORDER BY v.variant
"""


@register("ab_experiment_report", oracle=_ab_oracle())
def ab_experiment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y182: experimentation analytics — the A/B family the registry
    lacked (hash splits existed for train/test, but nothing computed
    an EXPERIMENT READOUT): deterministic 50/50 user assignment via
    the engine-portable md5 bucket, per-variant conversion and
    revenue (exact cents), conversion rate in exact ppm (floor div),
    and the sample-ratio-mismatch guardrail as an EXACT-INTEGER
    chi-square — for two buckets chi2 = (2*n_c - N)^2 / N, reported
    as floor(chi2 * 10^6) with the 1-df 95% critical value pinned as
    a literal, so the srm_flag verdict is pure BIGINT arithmetic the
    oracle replays (no float distribution code anywhere). Plan: one
    distinct, one purchase aggregate, a broadcast-sized variant
    census; nothing corpus-sized past the first aggregates."""
    from whisper_pandas_spark.operators.sampling import hash_bucket

    ev = _table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    assigned = users.select(
        "user_id",
        F.when(hash_bucket(F.col("user_id"), _AB_SEED) % 2 == 0, "control")
        .otherwise("treatment")
        .alias("variant"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    per_user = assigned.join(conv, "user_id", "left").select(
        "variant",
        F.when(F.col("rev_cents").isNull(), 0).otherwise(1).alias(
            "converted"
        ),
        F.coalesce(F.col("rev_cents"), F.lit(0)).alias("rev_cents"),
    )
    per_variant = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.sum("rev_cents").cast("bigint").alias("revenue_cents"),
    )
    tot = per_variant.agg(
        F.sum("n_users").cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("variant") == "control", F.col("n_users")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("nc"),
    )
    chi2 = F.expr(
        f"(2 * nc - n) * (2 * nc - n) * {_AB_SCALE} div n"
    ).cast("bigint")
    return (
        per_variant.crossJoin(F.broadcast(tot))
        .select(
            "variant",
            "n_users",
            "n_converted",
            F.expr(f"n_converted * {_AB_SCALE} div n_users")
            .cast("bigint")
            .alias("conv_ppm"),
            "revenue_cents",
            chi2.alias("srm_chi2_x1e6"),
            (chi2 >= _AB_CRIT).cast("int").alias("srm_flag"),
        )
        .orderBy("variant")
    )


# ---------------------------------------------------------------------------
# crawl_politeness_schedule
# ---------------------------------------------------------------------------

_POL_DEFAULT_S = 5

_POL_ORACLE = f"""
WITH urls AS (
  SELECT doc_id,
    'site' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS domain,
    '/' || CASE doc_id % 5
      WHEN 0 THEN 'private/file' || CAST(doc_id AS VARCHAR)
      WHEN 1 THEN 'private/pub/p' || CAST(doc_id AS VARCHAR)
      WHEN 2 THEN 'tmp/t' || CAST(doc_id AS VARCHAR)
      WHEN 3 THEN 'blog/post' || CAST(doc_id AS VARCHAR)
      ELSE 'index.html' END AS path
  FROM documents
), doms AS (
  SELECT DISTINCT doc_id % 20 AS k,
    'site' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS domain
  FROM documents
), robots AS (
  SELECT domain,
    '# synthetic robots for site' || CAST(k AS VARCHAR) || chr(10)
    || 'User-agent: specialbot' || chr(10)
    || 'Disallow: /blog' || chr(10)
    || 'Crawl-delay: 99' || chr(10) || chr(10)
    || 'User-agent: *' || chr(10)
    || CASE k % 4
      WHEN 0 THEN 'Disallow: /private/' || chr(10)
        || 'Allow: /private/pub/' || chr(10)
      WHEN 1 THEN 'disallow: /tmp' || chr(10)
      WHEN 2 THEN 'Disallow: /' || chr(10) || 'Allow: /blog' || chr(10)
      ELSE 'Disallow:' || chr(10) END
    || CASE k % 3
      WHEN 0 THEN 'Crawl-delay: ' || CAST(k % 7 + 1 AS VARCHAR) || chr(10)
      ELSE '' END AS rtext
  FROM doms
), lines0 AS (
  SELECT domain, string_split(rtext, chr(10)) AS ls FROM robots
), lines_ AS (
  SELECT domain, CAST(i AS INT) AS pos,
    trim(string_split(ls[CAST(i AS INT)], '#')[1]) AS line
  FROM lines0, unnest(range(1, len(ls) + 1)) AS t(i)
), tagged AS (
  SELECT domain, pos, line,
    last_value(CASE WHEN lower(line) LIKE 'user-agent:%'
                    THEN trim(substr(line, 12)) END IGNORE NULLS)
      OVER (PARTITION BY domain ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ua
  FROM lines_
), star_rules AS (
  SELECT domain,
    CASE WHEN lower(line) LIKE 'allow:%' THEN trim(substr(line, 7))
         ELSE trim(substr(line, 10)) END AS prefix,
    CASE WHEN lower(line) LIKE 'allow:%' THEN 1 ELSE 0 END AS is_allow
  FROM tagged
  WHERE (lower(line) LIKE 'allow:%' OR lower(line) LIKE 'disallow:%')
    AND ua = '*'
    AND (CASE WHEN lower(line) LIKE 'allow:%' THEN trim(substr(line, 7))
              ELSE trim(substr(line, 10)) END) <> ''
), joined AS (
  SELECT u.doc_id AS id, u.domain, r.prefix, r.is_allow
  FROM urls u LEFT JOIN star_rules r
    ON u.domain = r.domain AND starts_with(u.path, r.prefix)
), picked AS (
  SELECT *, row_number() OVER (
      PARTITION BY id
      ORDER BY length(prefix) DESC, is_allow DESC, prefix) AS rn
  FROM joined
), allowed AS (
  SELECT id, domain FROM picked
  WHERE rn = 1 AND (prefix IS NULL OR is_allow = 1)
), declared AS (
  SELECT domain, max(try_cast(trim(substr(line, 13)) AS BIGINT)) AS d
  FROM tagged
  WHERE lower(line) LIKE 'crawl-delay:%' AND ua = '*'
    AND try_cast(trim(substr(line, 13)) AS BIGINT) >= 0
  GROUP BY domain
), delays AS (
  SELECT m.domain,
    CAST(coalesce(d.d, {_POL_DEFAULT_S}) AS BIGINT) AS delay_s
  FROM (SELECT domain FROM doms) m LEFT JOIN declared d USING (domain)
), sched AS (
  SELECT a.id, a.domain,
    CAST(row_number() OVER (PARTITION BY a.domain ORDER BY a.id) - 1
         AS BIGINT) AS slot,
    dl.delay_s
  FROM allowed a JOIN delays dl USING (domain)
)
SELECT id, domain, slot, slot * delay_s AS fetch_at_s, delay_s
FROM sched ORDER BY id
"""


@register("crawl_politeness_schedule", oracle=_POL_ORACLE)
def crawl_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y183: crawl politeness planning — [[Y176]]'s robots evaluation
    composed with the de-facto Crawl-delay directive (Heritrix/Nutch
    semantics) into a per-domain fetch schedule: ONLY robots-allowed
    URLs get slots, one fetch per delay window per domain
    (fetch_at_s = slot x delay_s, makespan (n-1)·delay by
    construction). The fixture plants a POISON Crawl-delay: 99 inside
    the specialbot group — if group tracking leaked, every domain
    would schedule at 99 s; the '*' group declares its own delay for
    a third of the domains (k%7+1 s), the rest fall back to the
    {_POL_DEFAULT_S} s default; try_cast guards invalid values. The
    whole chain — parse, evaluation, delay extraction, slotting — is
    codegen + two windows; the oracle replays it end-to-end. Scale:
    the schedule is ONE window per domain over the allowed frontier;
    at web scale the frontier shards by domain hash exactly like the
    blocking families."""
    from whisper_pandas_spark.operators.robots import (
        evaluate_urls,
        parse_crawl_delay,
        parse_robots,
        politeness_schedule,
    )

    docs = _table(spark, sf_dir, "documents")
    nl = "\n"
    urls = docs.select(
        "doc_id",
        F.expr(
            "'site' || CAST(doc_id % 20 AS STRING) || '.example'"
        ).alias("domain"),
        F.expr(
            "'/' || CASE doc_id % 5 "
            "WHEN 0 THEN 'private/file' || CAST(doc_id AS STRING) "
            "WHEN 1 THEN 'private/pub/p' || CAST(doc_id AS STRING) "
            "WHEN 2 THEN 'tmp/t' || CAST(doc_id AS STRING) "
            "WHEN 3 THEN 'blog/post' || CAST(doc_id AS STRING) "
            "ELSE 'index.html' END"
        ).alias("path"),
    )
    doms = docs.select(
        (F.col("doc_id") % 20).alias("k"),
        F.expr(
            "'site' || CAST(doc_id % 20 AS STRING) || '.example'"
        ).alias("domain"),
    ).distinct()
    robots = doms.select(
        "domain",
        F.concat(
            F.lit("# synthetic robots for site"),
            F.col("k").cast("string"),
            F.lit(nl),
            F.lit("User-agent: specialbot" + nl),
            F.lit("Disallow: /blog" + nl),
            F.lit("Crawl-delay: 99" + nl + nl),
            F.lit("User-agent: *" + nl),
            F.when(
                F.col("k") % 4 == 0,
                F.lit(
                    "Disallow: /private/" + nl + "Allow: /private/pub/" + nl
                ),
            )
            .when(F.col("k") % 4 == 1, F.lit("disallow: /tmp" + nl))
            .when(
                F.col("k") % 4 == 2,
                F.lit("Disallow: /" + nl + "Allow: /blog" + nl),
            )
            .otherwise(F.lit("Disallow:" + nl)),
            F.when(
                F.col("k") % 3 == 0,
                F.concat(
                    F.lit("Crawl-delay: "),
                    (F.col("k") % 7 + 1).cast("string"),
                    F.lit(nl),
                ),
            ).otherwise(F.lit("")),
        ).alias("rtext"),
    )
    rules = parse_robots(robots, "domain", "rtext")
    verdicts = evaluate_urls(urls, rules, "doc_id", "domain", "path")
    allowed = verdicts.filter(F.col("allowed") == 1).select(
        F.col("id").alias("doc_id"), "domain"
    )
    delays = parse_crawl_delay(robots, "domain", "rtext", _POL_DEFAULT_S)
    return politeness_schedule(allowed, delays, "doc_id", "domain").orderBy(
        "id"
    )


# ---------------------------------------------------------------------------
# merge_deletion_vectors
# ---------------------------------------------------------------------------

_DV_DIR: dict[str, str] = {}
_DV_FILES = 4


@register(
    "merge_deletion_vectors",
    oracle="""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS chars_total
FROM documents
WHERE NOT (doc_id % 7 = 3 OR doc_id % 11 = 5)
GROUP BY lang ORDER BY lang
""",
)
def merge_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y184: merge-on-read deletion vectors (operators/deletevec.py)
    — the OTHER lakehouse delete paradigm next to the CoW merge
    family: two delete waves record (file_id, pos) coordinates in
    small DV tables and the read path anti-joins them out; base data
    files are NEVER rewritten, and the entry RAISES unless every base
    parquet byte-size is identical after both waves (the no-rewrite
    property IS the point of MoR — a silent rewrite turns the driver
    row red). The oracle is the plain predicate on the source table:
    the layout-family doctrine, deletes must be semantically
    invisible to the survivors. DV state is deterministic
    (id-derived positions, overwrite-idempotent versions), so
    repeated runs land in identical state."""
    import tempfile

    from whisper_pandas_spark.operators.deletevec import (
        add_deletes,
        base_file_state,
        read_with_dv,
        write_base,
    )

    key = sf_dir
    if key not in _DV_DIR:
        d = tempfile.mkdtemp(prefix="wps_dv_")
        docs = _table(spark, sf_dir, "documents")
        write_base(docs, "doc_id", d, _DV_FILES)
        _DV_DIR[key] = d
    d = _DV_DIR[key]
    before = base_file_state(d)

    data = spark.read.parquet(f"{d}/data")
    wave1 = data.filter(F.col("doc_id") % 7 == 3).select("file_id", "pos")
    wave2 = data.filter(F.col("doc_id") % 11 == 5).select("file_id", "pos")
    add_deletes(spark, d, wave1, 0)
    add_deletes(spark, d, wave2, 1)

    after = base_file_state(d)
    if before != after:
        raise RuntimeError(
            "deletion-vector contract broken: base data files changed"
            " on delete (merge-on-read must defer rewrites to"
            " compaction)"
        )
    return (
        read_with_dv(spark, d)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_total"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# merge_dv_compaction
# ---------------------------------------------------------------------------


@register(
    "merge_dv_compaction",
    oracle="""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS chars_total,
  CAST(2 AS BIGINT) AS files_rewritten,
  CAST(2 AS BIGINT) AS files_untouched
FROM documents
WHERE NOT (doc_id % 7 = 3 AND doc_id % 4 IN (0, 2))
GROUP BY lang ORDER BY lang
""",
)
def merge_dv_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y185: DV compaction — the deferred half of the merge-on-read
    lifecycle ([[Y184]] defers rewrites; this entry performs them):
    fold the recorded deletion vectors into the base by rewriting
    ONLY the files that carry deletes (file-granular — the CoW
    partitioned-manifest rewrite bound), leave the rest byte-
    identical, and clear the DV state. The delete wave targets half
    the files (doc_id%4 in (0,2)), so the entry RAISES unless exactly
    2 of 4 files were rewritten AND the 2 untouched files' bytes are
    identical — both halves of the compaction contract driver-checked.
    Survivors after compaction must equal the DV read before it (the
    oracle's plain predicate). Idempotent: a re-run finds no deleted
    rows to re-record and rewrites nothing."""
    import tempfile

    from whisper_pandas_spark.operators.deletevec import (
        add_deletes,
        base_file_state,
        compact_dv,
        read_with_dv,
        write_base,
    )

    d = tempfile.mkdtemp(prefix="wps_dvc_")
    docs = _table(spark, sf_dir, "documents")
    write_base(docs, "doc_id", d, _DV_FILES)
    data = spark.read.parquet(f"{d}/data")
    wave = data.filter(
        (F.col("doc_id") % 7 == 3) & (F.col("doc_id") % 4).isin(0, 2)
    ).select("file_id", "pos")
    add_deletes(spark, d, wave, 0)
    before = base_file_state(d)
    counts = compact_dv(spark, d)
    after = base_file_state(d)
    if counts != {"rewritten": 2, "untouched": 2}:
        raise RuntimeError(
            f"compaction rewrite bound broken: {counts} (expected"
            " exactly the 2 delete-carrying files rewritten)"
        )
    for f, sz in after.items():
        if f.startswith(("file_id=1/", "file_id=3/")) and before.get(f) != sz:
            raise RuntimeError(
                f"untouched file changed during compaction: {f}"
            )
    return (
        read_with_dv(spark, d)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_total"),
        )
        .select(
            "lang",
            "n_docs",
            "chars_total",
            F.lit(counts["rewritten"]).cast("bigint").alias(
                "files_rewritten"
            ),
            F.lit(counts["untouched"]).cast("bigint").alias(
                "files_untouched"
            ),
        )
        .orderBy("lang")
    )
