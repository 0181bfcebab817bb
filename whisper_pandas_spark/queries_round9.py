"""Round-9 registry entries.

- graphite_percentile_of_series  the round-9 graphite-tail representative:
                          percentileOfSeries() — a CROSS-series NIST rank
                          pick per timestamp (one output series), a plan
                          shape no earlier graphite entry has (n_percentile
                          picks PER series; this picks ACROSS series).
- text_lang_id_trained    in-engine Cavnar–Trenkle language ID: n-gram
                          rank profiles TRAINED from the corpus's labeled
                          documents, then out-of-place rank distance
                          classifies every document — the oracle replays
                          profile building and classification in SQL.
- graphite_consolidate_last  consolidateBy's positional pick consolidator
                          (max_by on timestamp) — the one graphite
                          aggregate shape sum/avg/min/max entries don't
                          exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.registry import _table, register

_POS_Q = 65  # interior NIST pick: ceil(.65*(n+1)) is neither min nor max


def _g_pos_oracle() -> str:
    from whisper_pandas_spark.queries_round6 import _METRIC_SERIES_SQL

    return f"""
WITH series AS ({_METRIC_SERIES_SQL}),
nn AS (SELECT timestamp, value FROM series WHERE value IS NOT NULL),
ranked AS (
  SELECT timestamp, value,
         row_number() OVER (PARTITION BY timestamp ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY timestamp) AS cnt
  FROM nn
)
SELECT 'percentileOfSeries' AS metric, timestamp, value
FROM ranked
WHERE rn = least(greatest(CAST(ceil({_POS_Q / 100.0} * (cnt + 1)) AS BIGINT),
                          1), cnt)
ORDER BY timestamp
"""


@register("graphite_percentile_of_series", oracle=_g_pos_oracle())
def graphite_percentile_of_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/Y92+: graphite ``percentileOfSeries(seriesList, 65)`` over the
    10-min metric grid — one output series whose value at each timestamp
    is the 65th-percentile NIST rank pick across ALL series' non-null
    values there.  Hash-exact by construction: the rank pick returns an
    ACTUAL data value (no interpolation), the rank index is an integer
    computed from the same double product on both engines, and ties in
    the value sort are irrelevant because every tied row carries the
    picked value itself.  Plan: one shuffle on timestamp + two window
    passes over per-timestamp groups whose size is the series count —
    bounded and skew-free at any corpus scale (series count, not point
    count, bounds the group)."""
    from whisper_pandas_spark.functions.graphite import percentile_of_series
    from whisper_pandas_spark.queries_round6 import _metric_series

    s = _metric_series(spark, sf_dir)
    return percentile_of_series(s, _POS_Q).orderBy("timestamp")


# -- trained Cavnar–Trenkle language ID ---------------------------------------

_CT_NS = (2, 3)
_CT_K = 40


def _ct_oracle() -> str:
    ns_values = ", ".join(f"({n})" for n in _CT_NS)
    return f"""
WITH norm AS (
  SELECT doc_id, lang, lower(text) AS t FROM documents
),
grams AS (
  SELECT doc_id, lang, substr(t, i.i, ns.n) AS g
  FROM norm, (VALUES {ns_values}) ns(n),
       LATERAL (SELECT unnest(generate_series(1, length(t) - ns.n + 1)) AS i) i
),
lang_prof AS (
  SELECT lang, g, lr FROM (
    SELECT lang, g, count(*) AS c,
           row_number() OVER (PARTITION BY lang
                              ORDER BY count(*) DESC, g) AS lr
    FROM grams GROUP BY lang, g
  ) WHERE lr <= {_CT_K}
),
doc_prof AS (
  SELECT doc_id, g, dr FROM (
    SELECT doc_id, g, count(*) AS c,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY count(*) DESC, g) AS dr
    FROM grams GROUP BY doc_id, g
  ) WHERE dr <= {_CT_K}
),
doc_n AS (SELECT doc_id, count(*) AS nd FROM doc_prof GROUP BY doc_id),
-- candidate languages come from the TRAINED profiles (as the operator's
-- classify_language does), not from the raw labels: a language whose
-- every document is shorter than min(ns) has no profile and is never
-- predicted
langs AS (SELECT DISTINCT lang FROM lang_prof),
matched AS (
  SELECT d.doc_id, p.lang, count(*) AS m,
         CAST(sum(abs(d.dr - p.lr)) AS BIGINT) AS s
  FROM doc_prof d JOIN lang_prof p ON d.g = p.g
  GROUP BY 1, 2
),
dist AS (
  SELECT dn.doc_id, l.lang,
         coalesce(m.s, 0) + (dn.nd - coalesce(m.m, 0)) * {_CT_K} AS lang_dist
  FROM doc_n dn CROSS JOIN langs l
  LEFT JOIN matched m ON m.doc_id = dn.doc_id AND m.lang = l.lang
)
SELECT doc_id, lang AS pred_lang, lang_dist FROM (
  SELECT doc_id, lang, lang_dist,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY lang_dist, lang) AS rn
  FROM dist
) WHERE rn = 1 ORDER BY doc_id
"""


@register("text_lang_id_trained", oracle=_ct_oracle())
def text_lang_id_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: TRAINED Cavnar–Trenkle language ID (1994) — top-40 char-2/3-gram
    rank profiles trained per language from the corpus's own labels, then
    out-of-place rank distance classifies every document (penalty = profile
    size for absent n-grams, ties to the smallest language).  The in-engine
    counterpart of the fixed-profile ``text_lang_id`` heuristic; all-integer
    arithmetic so the oracle replays the argmin bit-for-bit.  Profiles are
    L x 40 rows at ANY corpus size — broadcast; the corpus shuffles only on
    (doc, ngram) for its own profile build."""
    from whisper_pandas_spark.operators.langid import train_and_classify

    docs = _table(spark, sf_dir, "documents")
    return train_and_classify(
        docs, "doc_id", "lang", "text", ns=_CT_NS, k=_CT_K
    ).orderBy("doc_id")


# -- graphite consolidateBy: first/last consolidators -------------------------


def _g_consolidate_oracle() -> str:
    from whisper_pandas_spark.queries_round6 import _METRIC_SERIES_SQL

    return f"""
WITH series AS ({_METRIC_SERIES_SQL})
SELECT metric,
       to_timestamp((epoch(timestamp)::BIGINT // 3600) * 3600)::TIMESTAMP
         AS timestamp,
       arg_max(value, timestamp) AS value
FROM series WHERE value IS NOT NULL
GROUP BY 1, 2 ORDER BY metric, timestamp
"""


@register("graphite_consolidate_last", oracle=_g_consolidate_oracle())
def graphite_consolidate_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/Y97: graphite ``consolidateBy(series, 'last')`` re-bucketing the
    10-min grid to 1-hour buckets — the max_by-on-timestamp consolidator,
    the one aggregate shape the rest of the graphite family doesn't
    exercise (sum/avg/min/max are plain aggs; first/last are positional
    picks). Hash-exact: bucket timestamps are unique within a series, so
    the pick is deterministic and returns an actual data value; a single
    (metric, bucket) partial-agg exchange (max_by is mergeable)."""
    from whisper_pandas_spark.functions.graphite import consolidate_by
    from whisper_pandas_spark.queries_round6 import _metric_series

    s = _metric_series(spark, sf_dir)
    return consolidate_by(s, 3600, "last").orderBy("metric", "timestamp")
