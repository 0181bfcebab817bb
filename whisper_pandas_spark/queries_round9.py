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
