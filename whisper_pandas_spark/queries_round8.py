"""Round-8 registry entries.

- mmr_diversified_ann      the documented intended MMR usage: an IVF ANN
                           stage bounds the candidate set, THEN exact
                           greedy MMR curates it — the composition the
                           max_candidates guard (operators/diversify.py)
                           exists to enforce. Oracle replays BOTH stages:
                           the IVF cell assignment + probe + top-N
                           candidate cut, then the full unrolled greedy
                           trajectory over exactly those candidates.
- graphite_integral_by_interval  the round-8 graphite tail's windowed
                           representative: integral() resetting at every
                           epoch-aligned hour, DECIMAL-folded on both
                           sides so the running sums hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.registry import _table, register

_ANN_K_CENT = 16   # codebook: first 16 corpus vectors (offline-codebook stand-in)
_ANN_NPROBE = 4
_ANN_N_CAND = 40   # ANN candidate pool handed to MMR
_ANN_MMR_K = 8
_ANN_MMR_LAM = 0.5  # exactly representable (DuckDB bare 0.5 is DECIMAL — cast)


def _mmr_steps(k: int, lam: float, prev0: str) -> str:
    """The unrolled greedy-MMR CTE chain over a candidate CTE named
    ``prev0`` with columns (vec_id, v, rel, ms) — shared shape with
    queries_round7's _mmr_oracle, parameterized for composition."""
    from whisper_pandas_spark.functions.duck import duck_cos

    steps = []
    for i in range(1, k + 1):
        prev = prev0 if i == 1 else f"s{i - 1}"
        steps.append(f"""p{i} AS (
  SELECT vec_id AS pid, v AS pv, rel AS prel,
         CASE WHEN ms IS NULL THEN CAST({lam} AS DOUBLE) * rel
              ELSE CAST({lam} AS DOUBLE) * rel
                   - CAST({1.0 - lam} AS DOUBLE) * ms END AS psc
  FROM {prev} ORDER BY psc DESC, vec_id LIMIT 1
), s{i} AS (
  SELECT s.vec_id, s.v, s.rel,
         greatest(coalesce(s.ms, -1e18), {duck_cos("s.v", "p.pv")}) AS ms
  FROM {prev} s, p{i} p WHERE s.vec_id <> p.pid
)""")
    return ",\n".join(steps)


def _mmr_ann_oracle() -> str:
    from whisper_pandas_spark.functions.duck import duck_cos

    picks_sql = "\nUNION ALL\n".join(
        f"SELECT {j} AS rnk, pid AS vec_id, "
        f"round(prel + 1e-9, 6) AS relevance, "
        f"round(psc + 1e-9, 6) AS score FROM p{j}"
        for j in range(1, _ANN_MMR_K + 1)
    )
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS centroid FROM embeddings
  WHERE vec_id < {_ANN_K_CENT}
), qid AS (SELECT min(vec_id) AS qid FROM embeddings),
q AS (
  SELECT e.embedding::DOUBLE[] AS qv, e.vec_id AS qid
  FROM embeddings e JOIN qid ON e.vec_id = qid.qid
), corpus_scored AS (
  SELECT e.vec_id, e.embedding AS cvec, c.cid,
         {duck_cos("e.embedding", "c.centroid")} AS ccos
  FROM embeddings e CROSS JOIN cent c
), cells AS (
  SELECT vec_id, cvec, cid AS cell FROM (
    SELECT vec_id, cvec, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cid) AS rn
    FROM corpus_scored
  ) WHERE rn = 1
), probes AS (
  SELECT cid AS cell FROM (
    SELECT c.cid,
           row_number() OVER (ORDER BY {duck_cos("q.qv", "c.centroid")} DESC,
                              c.cid) AS rn
    FROM cent c CROSS JOIN q
  ) WHERE rn <= {_ANN_NPROBE}
), cand0 AS (
  SELECT s.vec_id, s.cvec::DOUBLE[] AS v,
         round({duck_cos("q.qv", "s.cvec")}, 6) AS cos_sim
  FROM cells s JOIN probes USING (cell) CROSS JOIN q
  WHERE s.vec_id <> q.qid
), cand AS (
  SELECT vec_id, v FROM (
    SELECT vec_id, v,
           row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rn
    FROM cand0
  ) WHERE rn <= {_ANN_N_CAND}
), s0 AS (
  SELECT c.vec_id, c.v,
         {duck_cos("c.v", "q.qv")} AS rel,
         CAST(NULL AS DOUBLE) AS ms
  FROM cand c CROSS JOIN q
),
{_mmr_steps(_ANN_MMR_K, _ANN_MMR_LAM, "s0")}
SELECT * FROM ({picks_sql}) ORDER BY rnk
"""


@register("mmr_diversified_ann", oracle=_mmr_ann_oracle())
def mmr_diversified_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/Y+ composition: similarity search BOUNDS the pool, MMR curates
    it — IVF-flat ANN (16 first-vector cells, nprobe=4) produces the
    top-40 candidates for the min-vec_id query, then exact greedy MMR
    (lam=0.5, k=8) runs over ONLY those 40 — inside mmr_select's
    max_candidates contract instead of fighting it. This is the 100 TB
    shape: the k*O(candidates) exact stage never sees the corpus, only
    the ANN survivors. Oracle replays the IVF assignment/probe/cut AND
    the full greedy trajectory, so a wrong candidate set or a wrong
    pick anywhere hash-mismatches."""
    from whisper_pandas_spark.operators.diversify import mmr_select
    from whisper_pandas_spark.operators.similarity import cosine_topk_ivf

    emb = _table(spark, sf_dir, "embeddings")
    qrow = emb.orderBy("vec_id").limit(1).collect()[0]
    cent = emb.filter(F.col("vec_id") < _ANN_K_CENT)
    q = emb.filter(F.col("vec_id") == qrow["vec_id"])
    cand_ids = cosine_topk_ivf(emb, q, _ANN_N_CAND, cent, _ANN_NPROBE).select(
        "vec_id"
    )
    cand = emb.join(F.broadcast(cand_ids), "vec_id")
    out = mmr_select(
        cand,
        [float(x) for x in qrow["embedding"]],
        k=_ANN_MMR_K,
        lam=_ANN_MMR_LAM,
        max_candidates=_ANN_N_CAND,
    )
    eps = F.lit(1e-9)
    return out.select(
        "rnk",
        "vec_id",
        F.round(F.col("relevance") + eps, 6).alias("relevance"),
        F.round(F.col("score") + eps, 6).alias("score"),
    ).orderBy("rnk")


# -- graphite round-8 tail: windowed representative -------------------------


def _g_int_oracle() -> str:
    from whisper_pandas_spark.queries_round6 import _METRIC_SERIES_SQL

    return f"""
WITH series AS ({_METRIC_SERIES_SQL})
SELECT metric, timestamp,
       round(CAST(sum(CAST(value AS DECIMAL(38,12))) OVER (
               PARTITION BY metric, epoch(timestamp)::BIGINT // 3600
               ORDER BY timestamp ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             + 1e-9, 6) AS value
FROM series ORDER BY metric, timestamp
"""


@register("graphite_integral_by_interval", oracle=_g_int_oracle())
def graphite_integral_by_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/Y65+: graphite ``integralByInterval(series, '1h')``
    (functions/graphite.py round-8 tail) — running sum resetting at
    every epoch-aligned hour: ONE window keyed (metric, hour bucket),
    the per-series-transform plan shape shared by the whole render
    family. Values fold through DECIMAL(38,12) on both engines so the
    cumulative sums (where DuckDB's segment-tree window could otherwise
    regroup double additions) hash-match exactly."""
    from whisper_pandas_spark.functions.graphite import integral_by_interval
    from whisper_pandas_spark.queries_round6 import _metric_series

    s = _metric_series(spark, sf_dir).withColumn(
        "value", F.col("value").cast("decimal(38,12)")
    )
    out = integral_by_interval(s, 3600)
    return out.select(
        "metric",
        "timestamp",
        F.round(F.col("value").cast("double") + 1e-9, 6).alias("value"),
    ).orderBy("metric", "timestamp")


# -- PassJoin fuzzy dedup: the lossless scale path ---------------------------


def _fuzzy_allpairs_oracle() -> str:
    from whisper_pandas_spark.queries_dedup import _DUCK_TOKS

    return f"""
WITH norm AS (
  SELECT doc_id, lang,
         substr(array_to_string({_DUCK_TOKS}, ' '), 1, 80) AS n
  FROM documents
)
SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
       levenshtein(a.n, b.n) AS edit_dist
FROM norm a JOIN norm b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE levenshtein(a.n, b.n) <= 5
ORDER BY doc_i, doc_j
"""


@register("dedup_fuzzy_passjoin", oracle=_fuzzy_allpairs_oracle())
def dedup_fuzzy_passjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/Y+ scale path: `dedup_fuzzy_pairs` semantics through PassJoin
    pigeonhole candidate generation (operators/dedup.py:
    fuzzy_pairs_passjoin) — k+1 segments indexed per doc, substring
    probes over the ±k length/shift window, exact thresholded verify.
    Shares the plain ALL-PAIRS oracle with dedup_fuzzy_pairs, so the
    driver's hash compare IS the losslessness proof: a single candidate
    the segment join fails to generate hash-mismatches. This replaces
    the Σ(block²) candidate cost that made the blocked variant 18x at
    the 10x scale step (PERF_sf0.1.md) with Σ(aligned-segment df²).
    Measured at sf0.1: 8 748 candidate pairs to verify vs the blocked
    join's 2 931 702 (335x fewer thresholded-DP calls); at THIS corpus
    size the linear probe-key generation (~3.1 M keys) still costs more
    wall-clock than the cheap 80-char DPs it saves, so the blocked
    variant stays the small-corpus default — the crossover sits just
    above this fixture (10x more docs ⇒ ~293 M DPs blocked vs ~31 M
    keys here)."""
    from whisper_pandas_spark.operators.dedup import fuzzy_pairs_passjoin

    return (
        fuzzy_pairs_passjoin(
            _table(spark, sf_dir, "documents"),
            "doc_id",
            "text",
            block_col="lang",
            max_edit=5,
            prefix_len=80,
        )
        .withColumn("edit_dist", F.col("edit_dist").cast("long"))
        .orderBy("doc_i", "doc_j")
    )


# -- graphite hitcount: proportional re-bucketing entry ----------------------


def _g_hitcount_oracle() -> str:
    from whisper_pandas_spark.queries_round6 import _METRIC_SERIES_SQL

    return f"""
WITH series AS ({_METRIC_SERIES_SQL}),
pts AS (
  SELECT metric, epoch(timestamp)::BIGINT AS t,
         CAST(value AS DECIMAL(38,12)) AS v
  FROM series WHERE value IS NOT NULL
), spread AS (
  SELECT p.metric, b.b,
         least((b.b + 1) * 900, p.t + 600) - greatest(b.b * 900, p.t)
           AS overlap,
         p.v
  FROM pts p,
       LATERAL (SELECT unnest(generate_series(p.t // 900,
                                              (p.t + 599) // 900)) AS b) b
)
SELECT metric, to_timestamp(b * 900)::TIMESTAMP AS timestamp,
       round(CAST(sum(v * overlap) AS DOUBLE) + 1e-9, 6) AS value
FROM spread GROUP BY 1, 2 ORDER BY metric, timestamp
"""


@register("graphite_hitcount", oracle=_g_hitcount_oracle())
def graphite_hitcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/Y65+: graphite ``hitcount(series, '15min')`` over the 10-min
    metric grid — the rate→count re-bucketing where points STRADDLE
    bucket boundaries (600 s steps into 900 s buckets), so the
    proportional split path is exercised, not just the aligned case.
    Values fold through DECIMAL(38,12) (integer overlaps × exact-decimal
    rates) so both engines sum exactly; one sequence-explode + one
    (metric, bucket) partial-agg exchange."""
    from whisper_pandas_spark.functions.graphite import hitcount
    from whisper_pandas_spark.queries_round6 import _metric_series

    s = _metric_series(spark, sf_dir).where(F.col("value").isNotNull())
    s = s.withColumn("value", F.col("value").cast("decimal(38,12)"))
    out = hitcount(s, 900, step_s=600)
    return out.select(
        "metric",
        "timestamp",
        F.round(F.col("value").cast("double") + 1e-9, 6).alias("value"),
    ).orderBy("metric", "timestamp")


# -- graphite interpolate: gap-fill window entry ------------------------------


def _g_interp_oracle() -> str:
    from whisper_pandas_spark.queries_round6 import _METRIC_SERIES_SQL

    return f"""
WITH series AS ({_METRIC_SERIES_SQL}),
gapped AS (
  SELECT metric, timestamp,
         CASE WHEN (epoch(timestamp)::BIGINT // 600) % 7 = 3
              THEN NULL ELSE value END AS value
  FROM series
), numbered AS (
  SELECT metric, timestamp, value,
         row_number() OVER (PARTITION BY metric ORDER BY timestamp) AS r
  FROM gapped
), anchored AS (
  SELECT metric, timestamp, value, r,
         last_value(value IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN value IS NOT NULL THEN r END IGNORE NULLS)
           OVER wp AS pr,
         first_value(value IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN value IS NOT NULL THEN r END IGNORE NULLS)
           OVER wn AS nr
  FROM numbered
  WINDOW wp AS (PARTITION BY metric ORDER BY timestamp
                ROWS UNBOUNDED PRECEDING),
         wn AS (PARTITION BY metric ORDER BY timestamp
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT metric, timestamp,
       round(CASE WHEN value IS NOT NULL THEN value
                  WHEN pr IS NOT NULL AND nr IS NOT NULL
                  THEN pv + (nv - pv) * (r - pr) / (nr - pr)
             END + 1e-9, 6) AS value
FROM anchored ORDER BY metric, timestamp
"""


@register("graphite_interpolate", oracle=_g_interp_oracle())
def graphite_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/Y65+: graphite ``interpolate(seriesList)`` — every 7th grid
    slot nulled deterministically (epoch-bucket mod), then linear
    gap-fill between the nearest non-null neighbours via ONE ordered
    per-series window pass (last/first IGNORE NULLS + row-number
    arithmetic, functions/graphite.py:interpolate). The oracle replays
    the identical window formulation, fill expression in the same
    operation order, so the filled doubles hash-match."""
    from whisper_pandas_spark.functions.graphite import interpolate
    from whisper_pandas_spark.queries_round6 import _metric_series

    s = _metric_series(spark, sf_dir)
    gap = F.when(
        F.pmod((F.unix_timestamp("timestamp") / 600).cast("long"), F.lit(7))
        != 3,
        F.col("value"),
    )
    out = interpolate(s.withColumn("value", gap))
    return out.select(
        "metric",
        "timestamp",
        F.round(F.col("value") + F.lit(1e-9), 6).alias("value"),
    ).orderBy("metric", "timestamp")


# -- quality-temperature importance sampling ----------------------------------


def _qts_oracle() -> str:
    from whisper_pandas_spark.operators.sampling import duck_hash_bucket
    from whisper_pandas_spark.operators.textstats import STOPWORDS
    from whisper_pandas_spark.queries_dedup import _DUCK_TOKS

    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    u = duck_hash_bucket("doc_id", seed=0)
    return f"""
WITH base AS (
  SELECT doc_id, lang, {_DUCK_TOKS} AS t,
    length(text) AS n_chars,
    length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS punct
  FROM documents
), ratios AS (
  SELECT doc_id, lang,
    punct::DOUBLE / n_chars AS punct_ratio,
    len(list_filter(t, x -> x IN ({stop_list})))::DOUBLE / len(t)
      AS stop_ratio,
    CASE WHEN n_chars BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END AS length_ok
  FROM base
), scored AS (
  SELECT doc_id, lang,
    round(0.4 * length_ok + 0.3 * (1.0 - least(punct_ratio * 5, 1.0))
          + 0.3 * least(stop_ratio * 10, 1.0), 6) AS quality
  FROM ratios
), kept AS (
  SELECT doc_id, lang, quality FROM scored
  WHERE CAST({u} AS DECIMAL(38,0)) * CAST(1000000000000 AS DECIMAL(38,0))
      < CAST(round(quality * 1000000, 0) AS DECIMAL(38,0))
        * CAST(round(quality * 1000000, 0) AS DECIMAL(38,0))
        * CAST(4294967296 AS DECIMAL(38,0))
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
       round(sum(CAST(quality AS DECIMAL(38,12)))::DOUBLE + 1e-9, 6)
         AS sum_quality
FROM kept GROUP BY lang ORDER BY lang
"""


@register("sample_quality_temperature", oracle=_qts_oracle())
def sample_quality_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: quality-weighted importance sampling at 1/T = 2
    (operators/sampling.py:quality_temperature_sample) — every doc kept
    with probability quality², decided by its own md5 uniform: the
    no-threshold curation upsampler. The acceptance test is exact
    integer DECIMAL arithmetic (no pow/exp), so the kept SET — checked
    here via per-lang counts + id sums + quality mass — replays
    bit-for-bit in DuckDB."""
    from whisper_pandas_spark.operators.sampling import (
        quality_temperature_sample,
    )
    from whisper_pandas_spark.operators.textstats import quality_score

    docs = _table(spark, sf_dir, "documents")
    scored = quality_score(docs, "doc_id", "text").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    kept = quality_temperature_sample(scored, "doc_id", "quality", 2, seed=0)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("sum_ids"),
            F.round(
                F.sum(F.col("quality").cast("decimal(38,12)")).cast("double")
                + 1e-9,
                6,
            ).alias("sum_quality"),
        )
        .orderBy("lang")
    )


# -- Holt-Winters / Brutlag seasonal forecast ---------------------------------

_HWF_P = 24        # season = 24 slots of the 600 s grid (4 h)
_HWF_RES = 600
_HWF_H = 12
_HWF_A, _HWF_B, _HWF_G = "0.1", "0.0035", "0.1"  # graphite-web defaults
_HWF_M = "3.0"     # Brutlag band multiplier


def _hw_oracle() -> str:
    P = _HWF_P
    A = f"CAST({_HWF_A} AS DOUBLE)"
    B = f"CAST({_HWF_B} AS DOUBLE)"
    G = f"CAST({_HWF_G} AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    # flat list state [l, b, s_0..s_{P-1}, d_0..d_{P-1}] (the holt-oracle
    # lesson: DuckDB struct accumulators mis-evaluate; lists fold right).
    # Elements are [x, phase] — also LIST(DOUBLE), so types line up.
    PH = "CAST(cur[2] AS INT)"
    LS = f"acc[3 + {PH}]"
    NL = f"{A} * (cur[1] - {LS}) + ({one} - {A}) * (acc[1] + acc[2])"
    NB = f"{B} * (({NL}) - acc[1]) + ({one} - {B}) * acc[2]"
    NS = f"{G} * (cur[1] - ({NL})) + ({one} - {G}) * {LS}"
    ND = (
        f"{G} * abs(cur[1] - (acc[1] + acc[2] + {LS}))"
        f" + ({one} - {G}) * acc[3 + {P} + {PH}]"
    )
    step = (
        f"[({NL}), ({NB})]"
        f" || acc[3 : 2 + {PH}] || [({NS})] || acc[4 + {PH} : 2 + {P}]"
        f" || acc[3 + {P} : 2 + {P} + {PH}] || [({ND})]"
        f" || acc[4 + {P} + {PH} : 2 + 2 * {P}]"
    )
    zeros = ", ".join(["CAST(0.0 AS DOUBLE)"] * (2 * P))
    return f"""
WITH series AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) // {_HWF_RES}) AS t,
         round(avg(value), 6) AS value
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY event_type, t
), packed AS (
  SELECT event_type,
         list([value::DOUBLE, (t % {P})::DOUBLE] ORDER BY t) AS es,
         list(t ORDER BY t) AS ts,
         count(*) AS n_points
  FROM series GROUP BY event_type
), st AS (
  SELECT event_type, n_points, ts[len(ts)] AS tn,
    list_reduce(
      list_prepend([es[1][1], CAST(0.0 AS DOUBLE), {zeros}], es[2:]),
      (acc, cur) -> {step}
    ) AS s
  FROM packed WHERE n_points >= 2
)
SELECT event_type, CAST(n_points AS BIGINT) AS n_points,
       CAST(h.range + 1 AS INT) AS h,
       -- double rounding mirrors the Spark side exactly: the operator
       -- rounds to 6, the entry re-rounds with the +1e-9 tie nudge
       round(round(s[1] + CAST(h.range + 1 AS DOUBLE) * s[2]
             + s[3 + CAST((tn + h.range + 1) % {P} AS INT)], 6) + 1e-9, 6)
         AS forecast,
       round(round(s[1] + CAST(h.range + 1 AS DOUBLE) * s[2]
             + s[3 + CAST((tn + h.range + 1) % {P} AS INT)]
             - CAST({_HWF_M} AS DOUBLE)
               * s[3 + {P} + CAST((tn + h.range + 1) % {P} AS INT)], 6)
             + 1e-9, 6) AS lower,
       round(round(s[1] + CAST(h.range + 1 AS DOUBLE) * s[2]
             + s[3 + CAST((tn + h.range + 1) % {P} AS INT)]
             + CAST({_HWF_M} AS DOUBLE)
               * s[3 + {P} + CAST((tn + h.range + 1) % {P} AS INT)], 6)
             + 1e-9, 6) AS upper
FROM st, range(0, {_HWF_H}) h
ORDER BY event_type, h
"""


@register("ts_holtwinters_forecast", oracle=_hw_oracle())
def ts_holtwinters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12+/S10+: Holt-Winters additive seasonal forecast with Brutlag
    confidence bands (operators/forecast.py:holt_winters_forecast — the
    recursion behind graphite's holtWinters* family, published in
    Brutlag LISA 2000; graphite's default alpha/beta/gamma and m=3).
    Per event_type over the 600 s average grid, season = 24 slots,
    12-step horizon. The oracle replays the ENTIRE (l, b, s[24], d[24])
    fold as one DuckDB list_reduce over a flat 50-double state list —
    expression-identical text, so every forecast and band hash-matches
    bit-for-bit."""
    from whisper_pandas_spark.operators.forecast import holt_winters_forecast

    ev = _table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    grid = (
        ev.groupBy(
            "event_type",
            (F.unix_timestamp("ts") / _HWF_RES).cast("long").alias("__t"),
        )
        .agg(F.round(F.avg("value"), 6).alias("value"))
        .select(
            "event_type",
            F.timestamp_seconds(F.col("__t") * _HWF_RES).alias("ts"),
            "value",
        )
    )
    out = holt_winters_forecast(
        grid,
        ("event_type",),
        "ts",
        "value",
        _HWF_P,
        _HWF_RES,
        float(_HWF_A),
        float(_HWF_B),
        float(_HWF_G),
        horizon=_HWF_H,
        m=float(_HWF_M),
    )
    eps = F.lit(1e-9)
    return out.select(
        "event_type",
        F.col("n_points").cast("long").alias("n_points"),
        "h",
        F.round(F.col("forecast") + eps, 6).alias("forecast"),
        F.round(F.col("lower") + eps, 6).alias("lower"),
        F.round(F.col("upper") + eps, 6).alias("upper"),
    ).orderBy("event_type", "h")
