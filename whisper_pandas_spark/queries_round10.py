"""Round-10 registry entries (all NINE registered by this module).

- text_rag_chunks        sliding-window RAG chunking: overlapping
                         fixed-size word windows with stable chunk ids —
                         the generator-heavy (posexplode-of-sequence)
                         plan shape no other text entry has.
- sketch_cms_estimate    count-min sketch: per-shard sparse d x w counter
                         grids, elementwise-sum rollup, min-over-rows
                         point estimates in a collision-heavy regime —
                         approximate OVERcounts hash-gated next to the
                         exact truth column.
- graph_bfs_distances    multi-source BFS hop distances over the trade
                         graph, frontier-iterated in the engine and
                         unrolled as Bellman-Ford rounds in SQL — the
                         reachability shape pagerank/LPA don't exercise
                         (monotone min-relaxation, not mass propagation).
- ts_autocorrelation     per-series ACF at lags 1..3 from exact
                         DECIMAL(38,0) sufficient statistics over the
                         calendar-shifted self-join of the bucket grid.
- stream_cms_replay      streaming CMS maintenance: foreachBatch
                         elementwise-sum merges into versioned state with
                         exactly-once batch markers; shares the batch
                         entry's oracle (the additive merge law makes
                         state == direct build bit-for-bit).
- graph_kcore            k-core decomposition by synchronous peeling —
                         deletion-based monotone fixpoint; engine stops
                         early at convergence, oracle unrolls the full
                         budget (converged rounds are no-ops).
- window_gaps_islands    per-user consecutive-active-day streaks via the
                         date-minus-row_number island key; ONE user_id
                         exchange serves every downstream key set.
- text_rake_keywords     RAKE keyword extraction: stopword-delimited
                         token islands, word deg/freq over candidates,
                         phrase score as ONE exact rational (DECIMAL
                         positional pivot, single IEEE division).
- profile_benford        Benford first-significant-digit audit from
                         integer cents strings, observed share vs
                         log10(1+1/d) expected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.registry import _table, register

# -- RAG chunking -------------------------------------------------------------

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48


def _rag_oracle() -> str:
    # Explicit ASCII whitespace class, kept in sync with
    # operators/chunking.py WS_SPLIT_RE/WS_TRIM_RE: Java \\s includes
    # \\x0B while RE2's does not, and trim() strips only 0x20 — the
    # spelled-out class + regex trim is what makes both engines
    # tokenize identically (including tab-leading text).
    ws_cls = "[ \\t\\n\\r\\f\\x0B]+"
    ws_trim = f"^{ws_cls}|{ws_cls}$"
    s, t = _CHUNK_SIZE, _CHUNK_STRIDE
    return f"""
WITH w AS (
  SELECT doc_id,
         regexp_split_to_array(
           regexp_replace(text, '{ws_trim}', '', 'g'), '{ws_cls}') AS ws
  FROM documents
  WHERE length(regexp_replace(text, '{ws_trim}', '', 'g')) > 0
),
c AS (
  SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_words,
         CASE WHEN len(ws) <= {s} THEN 1
              ELSE 1 + (len(ws) - {s} + {t} - 1) // {t} END AS nch
  FROM w
),
g AS (
  SELECT doc_id, ws, n_words,
         unnest(generate_series(0, nch - 1)) AS i
  FROM c
)
SELECT doc_id, CAST(i AS INT) AS chunk_idx, n_words,
       CAST(least({s}, n_words - i * {t}) AS INT) AS n_chunk_words,
       array_to_string(list_slice(ws, i * {t} + 1, i * {t} + {s}), ' ')
         AS chunk_text
FROM g
ORDER BY doc_id, chunk_idx
"""


@register("text_rag_chunks", oracle=_rag_oracle())
def text_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: retrieval/context-window chunking (operators/chunking.py:
    rag_chunks) — every document split into {size}-word windows every
    {stride} words (1/4 overlap), with the document word count and the
    (possibly short) final-window length carried per chunk.  Chunk
    identity is (doc_id, chunk_idx): deterministic, append-stable, and
    replayable — which is what makes downstream embedding tables
    idempotently re-buildable.  Plan: one scan + one generator
    (posexplode of a sequence), pure whole-stage codegen (no lambda
    HOFs — the round-8 CodegenFallback lesson), ZERO shuffles before
    the presentation sort.  Scale: output bytes are ~(size/stride)x
    the corpus and each task fans out locally; nothing is keyed, so
    there is no skew surface at all."""
    from whisper_pandas_spark.operators.chunking import rag_chunks

    docs = _table(spark, sf_dir, "documents")
    return rag_chunks(
        docs, "text", ("doc_id",), size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    ).orderBy("doc_id", "chunk_idx")


# -- count-min sketch ---------------------------------------------------------

_CMS_D = 3
_CMS_W = 128
_CMS_BUCKETS = 1000  # item space: user_id % 1000 >> width, so collisions
_CMS_PROBES = 20


def _cms_duck_hash_rowvar(value_sql: str, width: int) -> str:
    """The cms_duck_hash construction with the seed taken from the
    ``rows_`` CTE's ``r.row`` column instead of a literal (seed*depth+r
    with seed=0 is just r) — same md5 input string, same collisions."""
    return (
        "CAST(('0x' || substr(md5('cms' || CAST(r.row AS VARCHAR) || ':' ||"
        f" CAST({value_sql} AS VARCHAR)), 1, 15))::BIGINT % {width} AS INT)"
    )


def _cms_oracle() -> str:
    d, w, nb, np_ = _CMS_D, _CMS_W, _CMS_BUCKETS, _CMS_PROBES
    return f"""
WITH items AS (
  SELECT user_id % {nb} AS item FROM events WHERE user_id IS NOT NULL
),
rows_ AS (SELECT CAST(i AS INT) AS row FROM generate_series(0, {d - 1}) t(i)),
cells AS (
  SELECT r.row,
         {_cms_duck_hash_rowvar("item", w)} AS col,
         count(*) AS cnt
  FROM items, rows_ r GROUP BY 1, 2
),
probes AS (
  SELECT CAST(i AS BIGINT) AS bucket FROM generate_series(0, {np_ - 1}) t(i)
),
est AS (
  SELECT p.bucket, min(coalesce(c.cnt, 0)) AS est
  FROM probes p CROSS JOIN rows_ r
  LEFT JOIN cells c ON c.row = r.row AND c.col =
    {_cms_duck_hash_rowvar("p.bucket", w)}
  GROUP BY 1
),
exact AS (SELECT item AS bucket, count(*) AS cnt FROM items GROUP BY 1)
SELECT p.bucket, e.est, coalesce(x.cnt, 0) AS exact
FROM probes p JOIN est e USING (bucket) LEFT JOIN exact x USING (bucket)
ORDER BY bucket
"""


@register("sketch_cms_estimate", oracle=_cms_oracle())
def sketch_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch family +: count-min (Cormode-Muthukrishnan 2005) point
    frequencies (operators/sketches.py:cms_*).  Per-event-type shard
    sketches over the user-bucket stream (user_id % 1000 — 1000 items
    into width 128, so collisions are GUARANTEED and some estimates
    overcount), merged to one global sketch by the elementwise-sum law,
    then probed for buckets 0..19 with the exact truth joined alongside.
    Because the hash family is the cross-engine md5 construction and
    every counter is an exact BIGINT sum, the APPROXIMATE estimates —
    overcounts included — replay bit-for-bit in the oracle; est >= exact
    holds row-for-row by the CMS one-sided-error law.  Scale: the only
    raw-data exchange is the (groups x d x w)-bounded cell aggregation
    (map-side combine absorbs hot items); rollup and probe touch sketch
    cells only."""
    from whisper_pandas_spark.operators.sketches import (
        cms_estimate,
        cms_rollup,
        cms_shard_sketches,
    )

    ev = _table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    items = ev.select(
        F.col("event_type").alias("scope"),
        (F.col("user_id") % _CMS_BUCKETS).alias("item"),
    )
    shards = cms_shard_sketches(
        items, ("scope",), "item", depth=_CMS_D, width=_CMS_W
    )
    merged = cms_rollup(
        shards.withColumn("scope", F.lit("all")), ("scope",)
    )
    probes = spark.range(_CMS_PROBES).select(F.col("id").alias("item"))
    est = cms_estimate(
        merged, ("scope",), probes, "item", depth=_CMS_D, width=_CMS_W
    ).select(F.col("item").alias("bucket"), "est")
    exact = (
        items.join(F.broadcast(probes), "item")
        .groupBy(F.col("item").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return (
        est.join(exact, "bucket", "left")
        .select(
            "bucket", "est", F.coalesce("exact", F.lit(0)).alias("exact")
        )
        .orderBy("bucket")
    )


# -- multi-source BFS ---------------------------------------------------------

_BFS_HOPS = 3
_BFS_NATION = 1


def _bfs_oracle() -> str:
    blocks = []
    for i in range(1, _BFS_HOPS + 1):
        blocks.append(f"""d{i} AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, r.dist + 1 AS dist
    FROM e JOIN d{i - 1} r ON e.src = r.node
  ) GROUP BY node
)""")
    iter_blocks = ",\n".join(blocks)
    return f"""
WITH base AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), e AS (
  SELECT src, dst FROM base UNION SELECT dst, src FROM base
), d0 AS (
  SELECT DISTINCT c_custkey * 2 AS node, 0 AS dist
  FROM customer WHERE c_nationkey = {_BFS_NATION}
),
{iter_blocks}
SELECT CASE WHEN node % 2 = 0 THEN 'c' ELSE 's' END AS kind,
       node // 2 AS key,
       CAST(dist AS INT) AS dist
FROM d{_BFS_HOPS}
ORDER BY dist, kind, key
"""


@register("graph_bfs_distances", oracle=_bfs_oracle())
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph family +: multi-source BFS (operators/graph.py:
    bfs_distances) — hop distance from ANY nation-{n} customer through
    the symmetrized customer<->supplier trade graph, bounded at 3 hops.
    The engine iterates the FRONTIER formulation (only newly-reached
    nodes join the edge list each round, anti-joined against the known
    set, checkpointed so the plan is constant in the hop bound); the
    oracle unrolls the equivalent Bellman-Ford min-relaxation — equal
    on unit weights, and all-integer, so the driver hash is exact.
    Scale: per round one src-keyed join + one map-side-combined min
    aggregate; the edge list is never re-keyed, so bucketing by src
    makes rounds exchange-free; hub skew is absorbed by the partial
    min."""
    from whisper_pandas_spark.operators.graph import bfs_distances

    o = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    cu = _table(spark, sf_dir, "customer")
    base = o.join(li, o.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    # Dedup the DIRECTED list, materialize it ONCE, then symmetrize by
    # unioning two reads of the checkpoint (round 15, guide §2.3/§2.4):
    # customers map to even ids and suppliers to odd, so forward pairs
    # can never collide with reversed ones and the union of the two
    # distinct branches IS the distinct symmetrized set — the dedup
    # exchange carries |directed| rows instead of 2x, and neither union
    # branch re-runs the orders-lineitem join (prepared=True skips the
    # operator's own distinct+persist; the checkpoint blocks are what
    # every BFS round re-reads). Union, NOT explode — measured, round
    # 14: explode(array(struct,struct)) pays row expansion, interleaved
    # A/B union 2.96/3.10 vs explode 3.71/3.83 s best/median.
    directed = (
        base.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = directed.unionByName(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sources = cu.where(F.col("c_nationkey") == _BFS_NATION).select(
        (F.col("c_custkey") * 2).alias("node")
    )
    dist = bfs_distances(edges, sources, max_hops=_BFS_HOPS, prepared=True)
    return dist.select(
        F.when(F.col("node") % 2 == 0, F.lit("c"))
        .otherwise(F.lit("s"))
        .alias("kind"),
        F.floor(F.col("node") / 2).alias("key"),
        F.col("dist").cast("int").alias("dist"),
    ).orderBy("dist", "kind", "key")


# -- per-series autocorrelation ----------------------------------------------

_ACF_MAX_LAG = 3
_ACF_SCALE = 1000


def _acf_oracle() -> str:
    k, sc = _ACF_MAX_LAG, _ACF_SCALE
    return f"""
WITH grid AS (
  SELECT event_type AS series, date_trunc('day', ts) AS bucket_ts,
         sum(CAST(round(value * {sc}) AS BIGINT)) AS x
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
lags AS (SELECT CAST(i AS INT) AS lag FROM generate_series(1, {k}) t(i)),
pairs AS (
  SELECT a.series, l.lag,
         CAST(a.x AS DECIMAL(38,0)) AS x, CAST(b.x AS DECIMAL(38,0)) AS y
  FROM grid a CROSS JOIN lags l
  JOIN grid b ON b.series = a.series
             AND b.bucket_ts = a.bucket_ts + INTERVAL (l.lag) DAY
),
sums AS (
  SELECT series, lag, count(*) AS n_pairs,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM pairs GROUP BY 1, 2
)
SELECT series, lag, n_pairs,
  CASE WHEN n_pairs >= 2
        AND CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        AND CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
  THEN (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
  END AS r
FROM sums ORDER BY series, lag
"""


@register("ts_autocorrelation", oracle=_acf_oracle())
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeseries family +: the autocorrelation function (operators/
    decompose.py:autocorrelation) — per event type, Pearson r between
    the daily micro-unit grid and itself shifted 1..3 days (calendar
    equi-join, so gaps pair nothing rather than mis-aligning).  All five
    sufficient statistics fold through DECIMAL(38,0); only the final
    fixed-order IEEE expression is floating point, so r replays
    bit-for-bit in the oracle.  Scale: ONE aggregation touches raw
    events; the lag explode and self-join run on the series x days
    grid."""
    from whisper_pandas_spark.operators.decompose import autocorrelation

    ev = _table(spark, sf_dir, "events")
    return autocorrelation(
        ev,
        "event_type",
        "ts",
        "value",
        bucket="day",
        max_lag=_ACF_MAX_LAG,
        scale=_ACF_SCALE,
    ).orderBy("series", "lag")


# -- streaming CMS maintenance -------------------------------------------------


def _stream_cms_oracle() -> str:
    # the streaming state merged over all batches equals the direct build
    # over all raw rows (CMS merge law) — so the oracle is the batch
    # recompute of the same estimates, exact truth alongside
    return _cms_oracle()


@register("stream_cms_replay", oracle=_stream_cms_oracle())
def stream_cms_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+: streaming count-min maintenance (streaming/sketches.py:
    stream_cms_update) replayed end-to-end — the user-bucket stream
    split into two change files streams through foreachBatch
    elementwise-sum merges into the versioned CMS state (exactly-once
    via checkpoint-scoped batch markers; the merge is additive, so a
    replayed batch would double-count), then point estimates for
    buckets 0..19 are read off the FINAL state with the exact truth
    joined alongside.  The CMS merge law makes state == direct build
    bit-for-bit, so this shares `sketch_cms_estimate`'s oracle — one
    hash gate proving batch sketching, additive merge, version flips,
    AND the probe readout."""
    import tempfile

    from whisper_pandas_spark.operators.merge import current_version_path
    from whisper_pandas_spark.operators.sketches import cms_estimate
    from whisper_pandas_spark.streaming.sketches import stream_cms_update

    ev = _table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    items = ev.select(
        F.lit("all").alias("scope"),
        F.col("event_id"),
        (F.col("user_id") % _CMS_BUCKETS).alias("item"),
    )
    d = tempfile.mkdtemp(prefix="wps_cmsstream_")
    items.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        f"{d}/changes/f1"
    )
    items.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        f"{d}/changes/f2"
    )
    sdf = (
        spark.readStream.schema("scope string, event_id long, item long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/changes/*")
    )
    q = stream_cms_update(
        sdf,
        f"{d}/state",
        ("scope",),
        "item",
        depth=_CMS_D,
        width=_CMS_W,
        checkpoint_dir=f"{d}/ckpt",
    )
    q.processAllAvailable()
    q.stop()
    state = spark.read.parquet(current_version_path(f"{d}/state"))
    probes = spark.range(_CMS_PROBES).select(F.col("id").alias("item"))
    est = cms_estimate(
        state, ("scope",), probes, "item", depth=_CMS_D, width=_CMS_W
    ).select(F.col("item").alias("bucket"), "est")
    exact = (
        items.join(F.broadcast(probes), "item")
        .groupBy(F.col("item").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return (
        est.join(exact, "bucket", "left")
        .select(
            "bucket", "est", F.coalesce("exact", F.lit(0)).alias("exact")
        )
        .orderBy("bucket")
    )


# -- k-core decomposition ------------------------------------------------------

_KCORE_K = 40
_KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    k, r = _KCORE_K, _KCORE_ROUNDS
    blocks = []
    for i in range(1, r):
        blocks.append(f"""e{i} AS (
  SELECT e.src, e.dst FROM e
  JOIN a{i - 1} s ON e.src = s.node JOIN a{i - 1} t ON e.dst = t.node
), a{i} AS (
  SELECT src AS node, count(*) AS deg FROM e{i}
  GROUP BY src HAVING count(*) >= {k}
)""")
    iter_blocks = ",\n".join(blocks)
    return f"""
WITH base AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), e AS (
  SELECT src, dst FROM base UNION SELECT dst, src FROM base
), a0 AS (
  SELECT src AS node, count(*) AS deg FROM e
  GROUP BY src HAVING count(*) >= {k}
),
{iter_blocks}
SELECT CASE WHEN node % 2 = 0 THEN 'c' ELSE 's' END AS kind,
       node // 2 AS key,
       CAST(deg AS INT) AS deg
FROM a{r - 1}
ORDER BY kind, key
"""


@register("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph family +: k-core decomposition (operators/graph.py:kcore) —
    synchronous peeling of the symmetrized trade graph: delete every
    node with fewer than {k} distinct surviving neighbors, recount,
    repeat.  The deletion-based monotone fixpoint is the iterative
    shape pagerank (mass propagation), LPA (label voting), and BFS
    (min relaxation) don't exercise.  The engine stops early at a
    fixpoint (survivor counts stop shrinking); the oracle unrolls the
    full round budget — equal by monotonicity, since converged rounds
    are no-ops.  All-integer, hash-exact.  Scale: each round is one
    map-side-combined degree count over the surviving edge list plus
    two semi-joins against the (shrinking, broadcastable) survivor
    table; the edge list is filtered, never re-keyed."""
    from whisper_pandas_spark.operators.graph import kcore

    o = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    base = o.join(li, o.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    # symmetrize by union, not explode (measured — see
    # graph_bfs_distances above; round 14)
    edges = base.unionByName(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    cores = kcore(edges, k=_KCORE_K, max_rounds=_KCORE_ROUNDS)
    return cores.select(
        F.when(F.col("node") % 2 == 0, F.lit("c"))
        .otherwise(F.lit("s"))
        .alias("kind"),
        F.floor(F.col("node") / 2).alias("key"),
        "deg",
    ).orderBy("kind", "key")


# -- gaps-and-islands streaks ---------------------------------------------------


@register(
    "window_gaps_islands",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
r AS (
  SELECT user_id, d,
         row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
  FROM days
),
s AS (
  SELECT user_id, d - CAST(rn AS INT) AS g, count(*) AS len,
         min(d) AS streak_start
  FROM r GROUP BY user_id, d - CAST(rn AS INT)
),
m AS (
  SELECT user_id, g, len, streak_start,
         max(len) OVER (PARTITION BY user_id) AS ml
  FROM s
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(min(ml) AS BIGINT) AS max_streak,
       min(CASE WHEN len = ml THEN streak_start END) AS max_streak_start
FROM m GROUP BY user_id
ORDER BY user_id
""",
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6+: gaps-and-islands — per-user consecutive-active-day streaks
    via the classic date-minus-row_number island key (consecutive days
    share `d - rn`), then per-user streak stats: active days, streak
    count, longest streak, and the start date of the EARLIEST longest
    streak (deterministic tie-break).  All integer/date arithmetic.
    Plan: ONE exchange on user_id serves the distinct, the row_number
    window, both group-bys, and the max window — every downstream key
    set contains user_id, so Catalyst reuses the partitioning
    end-to-end (no second shuffle at any scale)."""
    from pyspark.sql.window import Window

    ev = _table(spark, sf_dir, "events")
    days = (
        ev.where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "g", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "g").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("d").alias("streak_start"),
    )
    ml = F.max("len").over(Window.partitionBy("user_id"))
    m = streaks.withColumn("ml", ml)
    return (
        m.groupBy("user_id")
        .agg(
            F.sum("len").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.min("ml").alias("max_streak"),
            F.min(
                F.when(F.col("len") == F.col("ml"), F.col("streak_start"))
            ).alias("max_streak_start"),
        )
        .orderBy("user_id")
    )


# -- RAKE keyword extraction ---------------------------------------------------

_RAKE_TOPN = 25


def _rake_oracle() -> str:
    from whisper_pandas_spark.operators.textstats import STOPWORDS
    from whisper_pandas_spark.queries_text import _DUCK_TOKS

    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    dec = "DECIMAL(12,0)"
    picks = []
    for p in (1, 2, 3):
        picks.append(
            f"max(CASE WHEN wpos = {p} THEN CAST(freq AS {dec}) END) AS f{p},"
            f"\n    max(CASE WHEN wpos = {p} THEN CAST(deg AS {dec}) END)"
            f" AS d{p}"
        )
    pick_sql = ",\n    ".join(picks)
    return f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
),
pt AS (
  SELECT doc_id, i AS pos, t[i] AS tok
  FROM toks, unnest(generate_series(1, len(t))) AS g(i)
  WHERE t[i] != ''
),
ns AS (
  SELECT doc_id, pos, tok,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM pt WHERE tok NOT IN ({stops})
),
isl AS (
  SELECT doc_id, pos, tok, g,
         count(*) OVER (PARTITION BY doc_id, g) AS plen
  FROM ns
),
cand AS (SELECT * FROM isl WHERE plen <= 3),
ws AS (SELECT tok, count(*) AS freq, sum(plen) AS deg FROM cand GROUP BY tok),
occ AS (
  SELECT doc_id, g, plen, string_agg(tok, ' ' ORDER BY pos) AS phrase
  FROM cand GROUP BY doc_id, g, plen
),
ph AS (
  SELECT phrase, plen, count(*) AS occurrences FROM occ GROUP BY phrase, plen
),
pw AS (
  SELECT phrase, plen, occurrences, i AS wpos,
         string_split(phrase, ' ')[i] AS wtok
  FROM ph, unnest(generate_series(1, plen)) AS gg(i)
),
pv AS (
  SELECT phrase, plen, occurrences,
    {pick_sql}
  FROM pw JOIN ws ON ws.tok = pw.wtok
  GROUP BY phrase, plen, occurrences
)
SELECT phrase, CAST(plen AS INT) AS n_words,
       CAST(occurrences AS BIGINT) AS occurrences,
       CAST(d1 * coalesce(f2, 1) * coalesce(f3, 1)
            + coalesce(d2, 0) * f1 * coalesce(f3, 1)
            + coalesce(d3, 0) * f1 * coalesce(f2, 1) AS DOUBLE)
       / CAST(f1 * coalesce(f2, 1) * coalesce(f3, 1) AS DOUBLE) AS score
FROM pv
ORDER BY score DESC, phrase
LIMIT {_RAKE_TOPN}
"""


@register("text_rake_keywords", oracle=_rake_oracle())
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: RAKE keyword extraction (operators/rake.py:rake_keywords,
    Rose et al. 2010) — candidate phrases are stopword-delimited token
    islands (the same gaps-and-islands key as window_gaps_islands, on
    token positions), word score = deg/freq over candidate occurrences,
    phrase score = Σ word scores computed as ONE exact rational
    (DECIMAL positional pivot, single IEEE division) so the ranking
    replays bit-for-bit — a naive float sum would be partition-order
    dependent.  Top-{n} corpus keywords.  Scale: one per-doc window
    pass over tokens; every later aggregation is vocabulary- or
    phrase-bounded with map-side combine; word stats join back
    broadcast."""
    from whisper_pandas_spark.operators.rake import rake_keywords

    docs = _table(spark, sf_dir, "documents")
    return rake_keywords(docs, "text", "doc_id", top_n=_RAKE_TOPN)


# -- Benford first-digit profile ------------------------------------------------


@register(
    "profile_benford",
    oracle="""
WITH cents AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
d AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit,
         count(*) AS n
  FROM cents WHERE c > 0 GROUP BY 1
),
t AS (SELECT sum(n) AS total FROM d)
SELECT digit, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE) / CAST((SELECT total FROM t) AS DOUBLE)
         AS observed,
       log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS expected
FROM d ORDER BY digit
""",
)
def profile_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiling family +: Benford first-significant-digit audit over
    lineitem extended prices — the classic fraud/synthetic-data screen.
    The first digit comes from the INTEGER cents string (decimal
    formatting differences between engines can't bite), counts are
    exact, and the observed share plus the Benford expectation
    log10(1+1/d) are single fixed-order IEEE expressions.  Plan: one
    scan, one 9-group aggregate with map-side combine, one broadcast
    of the 1-row total — nothing keyed finer than the digit."""
    li = _table(spark, sf_dir, "lineitem")
    cents = li.where(F.col("l_extendedprice").isNotNull()).select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c")
    )
    d = (
        cents.where(F.col("c") > 0)
        .select(
            F.substring(F.col("c").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = d.agg(F.sum("n").alias("total"))
    return (
        d.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "observed"
            ),
            F.log10(
                F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")
            ).alias("expected"),
        )
        .orderBy("digit")
    )
