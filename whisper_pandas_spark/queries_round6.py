"""Round-6 registry entries (staged in round 5, PROMOTED since round 6).

These were implemented and DuckDB-proven in round 5 as a staging dict
(`tests/test_round6_staged.py` value-checks every entry with the exact
driver-style comparison) while that round's new-entry budget was spent.
Since round 6 they are LIVE: `registry.py` imports this module and calls
`promote()` at import time (and the module self-promotes at its bottom
for the reverse import order), so every entry below is part of
`__spark_entry__.queries()/oracle_sql()`; also home to round-6-native
additions (`sketch_quantile_rollup`).

Entries:
- graphite_per_second      render-function family over a rollup grid
- graphite_group_by_node   cross-series pointwise aggregation by path node
- graphite_summarize       epoch-aligned re-bucketing ('1h', 'max')
- ingest_jsonl_roundtrip   documents -> JSONL -> engine, lossless
- ingest_csv_roundtrip     typed columns + text md5 through the CSV path
- mm_archive_inventory     tar-shard write -> read_archive_members round trip
- scd2_user_event_versions SCD2 dimension materialization from the event log
- funnel_view_click_purchase ordered-sequence funnel with conversion window
- merge_upsert_documents   relational MERGE (update/insert/delete) state
- snapshot_diff_keys       table_diff over deterministic mutations
- sample_shuffle_epoch     deterministic training-order permutation
- stream_session_replay    NATIVE streaming sessionization (session_window,
                           append mode, watermark-gated emission)
- text_lm_bigram_score     add-one bigram LM corpus-typicality scoring
- sample_mixture_tokens    per-domain token-budget mixture sampling
- dedup_semantic           SemDeDup (k-means-cell-blocked near-dup keep)
- graph_pagerank_trade     checkpointed PageRank, unrolled SQL recursion
- stream_merge_replay      streaming CDC apply -> final table state
- emb_pq_topk              product quantization ANN (trained, ADC)
- emb_pq_ivf_topk          IVF-PQ: both codebooks trained in-engine
- ts_seasonal_decompose    additive seasonal decomposition (2xMA trend)
- ts_holt_forecast         Holt linear smoothing, list_reduce fold oracle
- join_asof_forward        forward as-of direction (ASOF <= oracle)
- join_star_q5ish          TPC-H Q5 shape (6-table join, nation revenue)
- text_tfidf_topk          per-doc TF-IDF keywords (smoothed idf, top-5)
- ts_metric_correlation    pairwise Pearson matrix on the hourly grid
- sample_weighted_topk     Efraimidis-Spirakis weighted top-k sample
- sketch_distinct_rollup   HLL sketch tables: shard -> union -> estimate
- quality_expectations     declarative data-quality gate (5 families)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

STAGED: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str]] = {}


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Local twin of registry._table: registry imports this module (to
    # promote the entries), so importing registry here would be circular.
    from whisper_pandas_spark.sources.tables import load_table

    return load_table(spark, name, sf_dir)


def _staged(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = (fn, oracle)
        return fn

    return deco


def promote() -> None:
    """Register every staged entry in the live registry (idempotent;
    called both from registry's bottom and this module's bottom so every
    import order ends with the full STAGED dict promoted + reordered)."""
    from whisper_pandas_spark import registry

    for name, (fn, oracle) in STAGED.items():
        registry.QUERIES[name] = fn
        registry.ORACLES[name] = oracle
    registry._reorder()


# -- graphite render functions over a rollup grid --------------------------

_GRID = 600  # 10-minute buckets; coarse enough that every metric has gaps


def _metric_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> (metric, timestamp, value): dot-path metric per
    event_type, value summed on a 10-min grid (unique ts per metric, so
    window order is total and the oracle deterministic)."""
    ev = _table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.concat(F.lit("app."), F.col("event_type"), F.lit(".value")).alias(
                "metric"
            ),
            F.timestamp_seconds(
                (F.unix_timestamp("ts") / _GRID).cast("long") * _GRID
            ).alias("timestamp"),
        )
        .agg(F.round(F.sum("value"), 6).alias("value"))
    )


_METRIC_SERIES_SQL = f"""
  SELECT 'app.' || event_type || '.value' AS metric,
         to_timestamp((floor(epoch(ts))::BIGINT // {_GRID}) * {_GRID})::TIMESTAMP AS timestamp,
         round(sum(value), 6) AS value
  FROM events GROUP BY 1, 2
"""


@_staged(
    "graphite_per_second",
    oracle=f"""
WITH series AS ({_METRIC_SERIES_SQL}),
deltas AS (
  SELECT metric, timestamp, value,
         value - lag(value) OVER w AS dv,
         epoch(timestamp)::BIGINT - epoch(lag(timestamp) OVER w)::BIGINT AS dt
  FROM series
  WINDOW w AS (PARTITION BY metric ORDER BY timestamp)
)
SELECT metric, timestamp,
       round(CASE WHEN dv >= 0 AND dt > 0 THEN dv / dt END, 6) AS rate
FROM deltas ORDER BY metric, timestamp
""",
)
def graphite_per_second(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10+: graphite ``perSecond`` over the rollup grid — counter-rate
    semantics (negative delta -> null) with the elapsed-time divisor."""
    from whisper_pandas_spark.functions.graphite import per_second

    out = per_second(_metric_series(spark, sf_dir))
    return out.select(
        "metric", "timestamp", F.round("value", 6).alias("rate")
    ).orderBy("metric", "timestamp")


@_staged(
    "graphite_group_by_node",
    oracle=f"""
WITH series AS ({_METRIC_SERIES_SQL})
SELECT str_split(metric, '.')[2] AS metric_node, timestamp,
       round(sum(value), 6) AS value
FROM series GROUP BY 1, 2 ORDER BY metric_node, timestamp
""",
)
def graphite_group_by_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10+: graphite ``groupByNode(series, 1, 'sum')`` — pointwise
    cross-series aggregation keyed on a metric path component."""
    from whisper_pandas_spark.functions.graphite import group_by_node

    out = group_by_node(_metric_series(spark, sf_dir), 1, "sum")
    return out.select(
        F.col("metric").alias("metric_node"),
        "timestamp",
        F.round("value", 6).alias("value"),
    ).orderBy("metric_node", "timestamp")


@_staged(
    "graphite_summarize",
    oracle=f"""
WITH series AS ({_METRIC_SERIES_SQL})
SELECT metric,
       to_timestamp((epoch(timestamp)::BIGINT // 3600) * 3600)::TIMESTAMP AS timestamp,
       round(max(value), 6) AS value
FROM series GROUP BY 1, 2 ORDER BY metric, timestamp
""",
)
def graphite_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10+: graphite ``summarize(series, '1h', 'max')`` — epoch-aligned
    re-bucketing of every series, the render-API face of the rollup
    family (one (metric, bucket) exchange, map-side partial agg)."""
    from whisper_pandas_spark.functions.graphite import summarize

    out = summarize(_metric_series(spark, sf_dir), 3600, "max")
    return out.select(
        "metric", "timestamp", F.round("value", 6).alias("value")
    ).orderBy("metric", "timestamp")


# -- JSONL ingest round trip ----------------------------------------------


@_staged(
    "ingest_jsonl_roundtrip",
    oracle="""
SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id
""",
)
def ingest_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9+: documents -> JSONL export -> tolerant explicit-schema read.
    Losslessness IS the assertion: the oracle reads the original parquet,
    so any encode/decode drift (quoting, unicode, nulls) hash-fails."""
    import hashlib
    import tempfile
    from pathlib import Path

    from whisper_pandas_spark.sources.ingest import read_jsonl, write_jsonl

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out = Path(tempfile.gettempdir()) / f"wps_jsonl_{tag}"
    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    write_jsonl(docs, str(out))
    back = read_jsonl(
        spark,
        str(out),
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return back.orderBy("doc_id")


@_staged(
    "ingest_csv_roundtrip",
    oracle="""
SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
FROM documents ORDER BY doc_id
""",
)
def ingest_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9+: documents -> CSV export -> tolerant explicit-schema read.
    Typed columns plus an md5 text fingerprint (computed BEFORE export,
    so the quoting/escape round trip is what the hash gate checks on the
    carried-through value columns; raw multi-line text itself rides the
    JSONL twin, which is the lossless-text path)."""
    import hashlib
    import tempfile
    from pathlib import Path

    from whisper_pandas_spark.sources.ingest import read_csv, write_csv

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out = Path(tempfile.gettempdir()) / f"wps_csv_{tag}"
    docs = _table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5(F.encode("text", "utf-8")).alias("text_md5"),
    )
    write_csv(docs, str(out))
    back = read_csv(
        spark,
        str(out),
        "doc_id long, lang string, source string, n_chars long, text_md5 string",
    )
    return back.orderBy("doc_id")


@_staged(
    "mm_archive_inventory",
    oracle="""
SELECT doc_id || '.txt' AS member,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5
FROM documents WHERE doc_id % 50 < 3 ORDER BY member
""",
)
def mm_archive_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5+: archive-shard round trip — pack a deterministic documents
    slice into tar shards (one per doc_id%3), read them back with
    `read_archive_members`, emit (member, n_bytes, payload_md5). The
    oracle recomputes all three straight from the documents table, so
    the tar write + binaryFile scan + member extraction chain is
    value-checked end to end (the whisper fixture-from-parquet recipe
    applied to the WebDataset source)."""
    import hashlib
    import io
    import tarfile
    import tempfile
    from pathlib import Path

    from whisper_pandas_spark.sources.archives import read_archive_members

    docs = (
        _table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 50 < 3)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )  # small deterministic slice (~6% of docs) — fixture build only
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out = Path(tempfile.gettempdir()) / f"wps_tar_{tag}"
    out.mkdir(exist_ok=True)
    bufs = {s: io.BytesIO() for s in range(3)}
    tars = {s: tarfile.open(fileobj=b, mode="w") for s, b in bufs.items()}
    for row in docs:
        data = row["text"].encode("utf-8")
        info = tarfile.TarInfo(f"{row['doc_id']}.txt")
        info.size = len(data)
        tars[row["doc_id"] % 3].addfile(info, io.BytesIO(data))
    for s, tf in tars.items():
        tf.close()
        (out / f"shard-{s}.tar").write_bytes(bufs[s].getvalue())
    inv = read_archive_members(spark, str(out))
    return inv.select(
        "member",
        "n_bytes",
        F.md5("payload").alias("payload_md5"),
    ).orderBy("member")


# -- snapshot diff ---------------------------------------------------------


@_staged(
    "snapshot_diff_keys",
    oracle="""
WITH old AS (
  SELECT doc_id, text FROM documents
), new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 31 = 0 THEN text || '!' ELSE text END AS text
  FROM documents WHERE doc_id % 97 <> 5
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, 'fresh doc ' || doc_id AS text
  FROM documents WHERE doc_id < 3
)
SELECT coalesce(old.doc_id, new.doc_id) AS key,
       CASE WHEN old.doc_id IS NULL THEN 'added'
            WHEN new.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
WHERE old.doc_id IS NULL OR new.doc_id IS NULL OR old.text <> new.text
ORDER BY key
""",
)
def snapshot_diff_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y20: table_diff between the documents snapshot and a
    deterministically mutated successor (edits at doc_id%31, deletes at
    doc_id%97==5, three added docs)."""
    from whisper_pandas_spark.operators.diffing import table_diff

    old = _table(spark, sf_dir, "documents").select("doc_id", "text")
    base = _table(spark, sf_dir, "documents")
    new = (
        base.filter(F.col("doc_id") % 97 != 5)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 31 == 0, F.concat(F.col("text"), F.lit("!"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            base.filter(F.col("doc_id") < 3).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.concat(F.lit("fresh doc "), F.col("doc_id").cast("string")).alias(
                    "text"
                ),
            )
        )
    )
    return table_diff(old, new, "doc_id").orderBy("key")


@_staged(
    "scd2_user_event_versions",
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
  SELECT user_id AS key, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS valid_to
  FROM changes
)
SELECT key, event_type, valid_from, valid_to, (valid_to IS NULL) AS is_current
FROM v ORDER BY key, valid_from
""",
)
def scd2_user_event_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y21: SCD2 dimension materialization (operators/scd.py) — each
    user's event_type history compressed to versioned rows with
    half-open validity intervals; the oracle replays the identical
    gaps-and-islands SQL. One key-partitioned window, no second
    exchange."""
    from whisper_pandas_spark.operators.scd import scd2_from_log

    ev = _table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    out = scd2_from_log(ev, "user_id", "ts", ["event_type"])
    return out.orderBy("key", "valid_from")


@_staged(
    "funnel_view_click_purchase",
    oracle="""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL 7 DAY
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e
  JOIN s2 ON e.user_id = s2.user_id
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s1.t1 + INTERVAL 7 DAY
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1 AS step, 'view' AS step_name,
         (SELECT count(*) FROM s1) AS users_reached
  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
) ORDER BY step
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y22: ordered-sequence funnel (operators/funnel.py) — users who
    viewed, then clicked, then purchased, each step strictly after the
    previous greedy match and inside a 7-day conversion window. Spark
    runs it as chained conditional windows over ONE user_id exchange;
    the oracle replays the same greedy-earliest semantics as cascaded
    min-joins."""
    from whisper_pandas_spark.operators.funnel import funnel_counts

    ev = _table(spark, sf_dir, "events")
    return funnel_counts(
        ev, "user_id", "ts", "event_type",
        ["view", "click", "purchase"], within_seconds=7 * 86400,
    )


@_staged(
    "merge_upsert_documents",
    oracle="""
WITH changes AS (
  SELECT doc_id, text || ' [rev]' AS text, false AS is_delete
  FROM documents WHERE doc_id % 7 = 0 AND doc_id % 97 <> 2
  UNION ALL
  SELECT doc_id + 500000, 'new doc ' || doc_id, false
  FROM documents WHERE doc_id < 3
  UNION ALL
  SELECT doc_id, NULL, true FROM documents WHERE doc_id % 97 = 2
)
SELECT d.doc_id, d.text FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM changes)
UNION ALL
SELECT doc_id, text FROM changes WHERE NOT is_delete
ORDER BY doc_id
""",
)
def merge_upsert_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y23: relational MERGE (operators/merge.py) — a deterministic
    change set (updates at doc_id%7, three inserts, deletes at
    doc_id%97==2) applied to documents; the oracle recomputes the merged
    state as anti-join + union SQL. One broadcast anti-join, no
    full-table shuffle."""
    from whisper_pandas_spark.operators.merge import merge_changes

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    changes = (
        docs.where((F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 97 != 2))
        .select(
            "doc_id",
            F.concat("text", F.lit(" [rev]")).alias("text"),
            F.lit(False).alias("is_delete"),
        )
        .unionByName(
            docs.where(F.col("doc_id") < 3).select(
                (F.col("doc_id") + 500000).alias("doc_id"),
                F.concat(F.lit("new doc "), F.col("doc_id").cast("string")).alias("text"),
                F.lit(False).alias("is_delete"),
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 97 == 2).select(
                "doc_id",
                F.lit(None).cast("string").alias("text"),
                F.lit(True).alias("is_delete"),
            )
        )
    )
    out = merge_changes(docs, changes, "doc_id", "is_delete")
    return out.orderBy("doc_id")


@_staged(
    "merge_partitioned_manifest",
    """
WITH base AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 5 <> 0
), changes AS (
  SELECT doc_id, lang, n_chars + 10000 AS n_chars, false AS is_delete
  FROM documents WHERE doc_id % 5 = 0 AND lang = 'en'
  UNION ALL
  SELECT doc_id, lang, NULL, true
  FROM base WHERE lang = 'en' AND doc_id % 3 = 0
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM (
  SELECT b.doc_id, b.lang, b.n_chars FROM base b
  WHERE b.doc_id NOT IN (SELECT doc_id FROM changes)
  UNION ALL
  SELECT doc_id, lang, n_chars FROM changes WHERE NOT is_delete
)
GROUP BY lang ORDER BY lang
""",
)
def merge_partitioned_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y28+: the PARTITIONED copy-on-write MERGE
    (operators/merge.py:merge_into_parquet_partitioned) — documents
    partitioned by lang, initial load of four-fifths of the corpus,
    then one change batch touching ONLY the 'en' partition (upserts +
    deletes). The entry asserts the manifest actually bounded rewrite
    amplification (v1 wrote the 'en' partition and nothing else;
    untouched languages still serve from v0 — a regression raises, the
    zorder-entry discipline), then returns per-lang aggregates of the
    manifest-resolved live state, which the oracle recomputes
    relationally."""
    import tempfile
    from pathlib import Path

    from whisper_pandas_spark.operators.merge import (
        current_version_path,
        merge_into_parquet_partitioned,
        read_current_state_partitioned,
    )

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    base_df = docs.where(F.col("doc_id") % 5 != 0).withColumn(
        "is_delete", F.lit(False)
    )
    d = tempfile.mkdtemp(prefix="wps_pmerge_")
    t = f"{d}/table"
    merge_into_parquet_partitioned(
        spark, t, base_df, "doc_id", "lang", delete_col="is_delete"
    )
    changes = (
        docs.where((F.col("doc_id") % 5 == 0) & (F.col("lang") == "en"))
        .select(
            "doc_id",
            "lang",
            (F.col("n_chars") + 10000).alias("n_chars"),
            F.lit(False).alias("is_delete"),
        )
        .unionByName(
            docs.where(
                (F.col("doc_id") % 5 != 0)
                & (F.col("lang") == "en")
                & (F.col("doc_id") % 3 == 0)
            ).select(
                "doc_id",
                "lang",
                F.lit(None).cast("long").alias("n_chars"),
                F.lit(True).alias("is_delete"),
            )
        )
    )
    merge_into_parquet_partitioned(
        spark, t, changes, "doc_id", "lang", delete_col="is_delete"
    )
    v1 = Path(current_version_path(t))
    written = {p.name for p in (v1 / "data").glob("lang=*")}
    if v1.name != "v1" or written != {"lang=en"}:
        raise RuntimeError(
            f"manifest merge stopped bounding rewrites: {v1.name} wrote "
            f"{sorted(written)}"
        )
    state = read_current_state_partitioned(
        spark, t, "lang", delete_col="is_delete"
    )
    return (
        state.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


# -- deterministic epoch shuffle -------------------------------------------


@_staged(
    "sample_shuffle_epoch",
    oracle="""
SELECT row_number() OVER (
         ORDER BY ('0x' || substr(md5('3:' || doc_id), 1, 8))::BIGINT, doc_id
       ) AS pos,
       doc_id
FROM documents ORDER BY pos
""",
)
def sample_shuffle_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y19: the epoch-3 training permutation of documents — position is
    a pure function of (doc_id, seed), reproducible on any engine.

    The materialized ``pos`` column (global row_number) exists for the
    oracle comparison only — it funnels rows through one window
    partition and would NOT be the 100 TB shape. Production epoch
    shuffling is `deterministic_shuffle` alone: a range-partitioned
    SORT whose output order IS the permutation; shard files inherit it
    without any global rank being materialized."""
    from whisper_pandas_spark.operators.sampling import (
        deterministic_shuffle,
        hash_bucket,
    )

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    shuffled = deterministic_shuffle(docs, "doc_id", seed=3)
    w = Window.orderBy(hash_bucket(F.col("doc_id"), 3), F.col("doc_id"))
    return shuffled.select(
        F.row_number().over(w).alias("pos"), "doc_id"
    ).orderBy("pos")


# -- streaming session-window replay ---------------------------------------

_SESS_SINK = "stream_session_replay_sink"


@_staged(
    "stream_session_replay",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), grp AS (
  SELECT *, sum(new_s) OVER (
    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), sess AS (
  SELECT user_id,
         min(ts) AS session_start,
         max(ts) + INTERVAL 30 MINUTE AS session_end,
         count(*) AS n_events,
         round(sum(value), 6) AS sum_value
  FROM grp GROUP BY user_id, sid
)
SELECT user_id, session_start, session_end, n_events, sum_value
FROM sess
WHERE session_end <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
ORDER BY user_id, session_start
""",
)
def stream_session_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+: NATIVE streaming sessionization (`F.session_window`, gap
    30 min) replayed over the static events table — availableNow +
    memory sink in APPEND mode, so only sessions the final watermark
    (max ts − 1 h) has closed emit; the oracle replays the same rule as
    gaps-and-islands SQL (new session at gap ≥ 30 min — session_window's
    end is exclusive) plus the same watermark cutoff.

    Boundary note: Spark's internal watermark is ms-truncated; a session
    ending inside the sub-millisecond slice between the truncated and
    exact cutoff would diverge — impossible at the registered fixtures'
    microsecond-jittered timestamps.

    Scale: state = open sessions only (bounded by watermark); sessions
    merge map-side per user partition. The production backfill shape for
    user-journey extraction over a 100 TB event log."""
    from whisper_pandas_spark.sources.tables import stream_events

    sdf = stream_events(spark, sf_dir)
    out = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    q = (
        out.writeStream.format("memory")
        .queryName(_SESS_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return (
        spark.table(_SESS_SINK)
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


# -- bigram LM quality scoring ---------------------------------------------

_DUCK_TOKS_LM = (
    "regexp_split_to_array(trim(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g')), ' ')"
)


@_staged(
    "text_lm_bigram_score",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS_LM} AS t FROM documents
), big AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
), c12 AS (
  SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2
), c1 AS (
  SELECT w1, count(*) AS c1 FROM big GROUP BY w1
), vocab AS (
  SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM toks)
), scored AS (
  SELECT doc_id, count(*) AS n_bigrams,
         round(
           (sum(CAST(ln((c12 + 1.0) / (c1 + v)) AS DECIMAL(38,12)))::DOUBLE)
           / count(*), 6) AS lm_score
  FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab
  GROUP BY doc_id
)
SELECT toks.doc_id,
       coalesce(scored.n_bigrams, 0) AS n_bigrams,
       scored.lm_score
FROM toks LEFT JOIN scored ON toks.doc_id = scored.doc_id
ORDER BY toks.doc_id
""",
)
def text_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: add-one bigram LM self-scoring (operators/lm.py) — the
    CCNet-style corpus-typicality signal as pure relational algebra.
    DECIMAL(38,12) log-prob fold -> partition-order-independent scores;
    the oracle replays the identical counts, smoothing, and fold."""
    from whisper_pandas_spark.operators.lm import bigram_lm_score

    docs = _table(spark, sf_dir, "documents")
    return bigram_lm_score(docs, "doc_id", "text").orderBy("doc_id")


# -- data-mixture sampling (per-domain token budgets) ----------------------

_MIX_DOMS = ("src0", "src1", "src2", "src3")
_MIX_QUOTAS = {"src0": 4000, "src1": 3000, "src2": 2000, "src3": 1000}
_MIX_CASE = (
    "CASE source WHEN 'src0' THEN 4000 WHEN 'src1' THEN 3000 "
    "WHEN 'src2' THEN 2000 ELSE 1000 END"
)


@_staged(
    "sample_mixture_tokens",
    f"""
WITH cum AS (
  SELECT doc_id, source, n_chars,
         ('0x' || substr(md5('0:' || doc_id), 1, 8))::BIGINT AS h
  FROM documents WHERE source IN {_MIX_DOMS!r}
), o AS (
  SELECT doc_id, source, n_chars,
         coalesce(SUM(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM cum
)
SELECT doc_id, source, n_chars FROM o
WHERE before < {_MIX_CASE}
ORDER BY doc_id
""",
)
def sample_mixture_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y: data-mixture sampling — per-domain char budgets (web 4k /
    wiki 3k / ... here played by src0-3) filled by the deterministic
    hash-prefix greedy (operators/sampling.py:mixture_sample). The
    oracle is the NAIVE one-window-per-domain greedy; the engine runs
    the two-phase coarse-bucket form (no full-domain sort, boundary
    bucket only gets the exact window) with coarse_bits=2 so a 4-way
    bucket split and the boundary path are genuinely exercised at this
    fixture size. Both must pick the identical prefix."""
    from whisper_pandas_spark.operators.sampling import mixture_sample

    docs = _table(spark, sf_dir, "documents")
    return (
        mixture_sample(
            docs,
            "source",
            _MIX_QUOTAS,
            weight_col="n_chars",
            key_col="doc_id",
            seed=0,
            coarse_bits=2,
        )
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


# -- SemDeDup: cluster-blocked embedding near-dup removal ------------------

_SEM_T = 0.3  # same cosine bar as the sim_near_dup family


def _semantic_dedup_oracle() -> str:
    from whisper_pandas_spark.queries_similarity import (
        KM_ITERS,
        KM_K,
        _duck_cos,
        _kmeans_iter_sql,
    )

    iter_blocks = ",\n".join(
        _kmeans_iter_sql(f"cent{i}" if i else "cent0", i + 1)
        for i in range(KM_ITERS)
    )
    return f"""
WITH RECURSIVE init AS (
  SELECT vec_id, embedding, md5('0:' || vec_id) AS h
  FROM embeddings ORDER BY h LIMIT {KM_K}
), cent0 AS (
  SELECT row_number() OVER (ORDER BY h) - 1 AS cid,
         embedding::DOUBLE[] AS centroid
  FROM init
),
{iter_blocks},
scored AS (
  SELECT e.vec_id, e.embedding AS vec, c.cid,
         {_duck_cos("e.embedding", "c.centroid")} AS ccos
  FROM embeddings e CROSS JOIN cent{KM_ITERS} c
), cells AS (
  SELECT vec_id, vec, cid AS cell FROM (
    SELECT vec_id, vec, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cid) AS rn
    FROM scored
  ) WHERE rn = 1
), sim_pairs AS (
  SELECT a.vec_id AS vec_i, b.vec_id AS vec_j
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round({_duck_cos("a.vec", "b.vec")}, 6) >= {_SEM_T}
), edges AS (
  SELECT vec_i AS a, vec_j AS b FROM sim_pairs
  UNION
  SELECT vec_j AS a, vec_i AS b FROM sim_pairs
), reach AS (
  SELECT a AS node, a AS comp FROM edges
  UNION
  SELECT e.b AS node, r.comp FROM reach r JOIN edges e ON e.a = r.node
), lab AS (
  SELECT node, min(comp) AS comp FROM reach GROUP BY node
)
SELECT c.vec_id, c.cell,
       (lab.node IS NULL OR lab.comp = c.vec_id) AS keep
FROM cells c LEFT JOIN lab ON lab.node = c.vec_id
ORDER BY c.vec_id
"""


@_staged("dedup_semantic", _semantic_dedup_oracle())
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+: SemDeDup (operators/dedup.py:semantic_dedup) made fully
    self-contained — the blocking codebook comes from the in-engine
    deterministic k-means trainer (same init/iters/seed as
    sim_topk_ivf_trained), so the oracle replays training, cell
    assignment, within-cell cosine pairs, AND the recursive component
    closure in SQL. keep = min-id member of each near-dup component
    (vectors in no pair pass through)."""
    from whisper_pandas_spark.operators.dedup import (
        release_cached,
        semantic_dedup,
    )
    from whisper_pandas_spark.operators.kmeans import kmeans_cosine
    from whisper_pandas_spark.queries_similarity import KM_ITERS, KM_K

    emb = _table(spark, sf_dir, "embeddings")
    cent = kmeans_cosine(emb, KM_K, KM_ITERS, seed=0).select(
        F.col("cid").alias("vec_id"), F.col("embedding")
    )
    sem = semantic_dedup(emb, cent, _SEM_T)
    # materialize eagerly, then release the corpus-wide cell cache (same
    # _finalize discipline as queries_dedup) so repeated driver/bench
    # runs don't pin executor storage
    out = sem.localCheckpoint(eager=True)
    release_cached(sem)
    return out.orderBy("vec_id")


# -- PageRank over the customer<->supplier trade graph ---------------------

_PR_ITERS = 3
_PR_TOPN = 50


def _pagerank_oracle() -> str:
    # doubles forced explicitly: DuckDB parses 0.85 / 1.0 as DECIMAL
    # literals, and (1.0 - 0.85) in decimal is exactly 0.15 while the
    # engine computes the IEEE double 1.0 - 0.85 — cast first so both
    # run the identical float expression.
    tele = "CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)"
    it = []
    for i in range(1, _PR_ITERS + 1):
        it.append(f"""c{i} AS (
  SELECT e.dst AS node, CAST(r.rank / o.od AS DECIMAL(38,12)) AS c
  FROM e JOIN r{i - 1} r ON e.src = r.node JOIN outdeg o ON o.src = e.src
), s{i} AS (
  SELECT node, sum(c) AS s FROM c{i} GROUP BY node
), r{i} AS (
  SELECT n.node,
         ({tele}) / (SELECT n FROM nn)
         + CAST(0.85 AS DOUBLE) * coalesce(CAST(s AS DOUBLE), 0.0) AS rank
  FROM nodes n LEFT JOIN s{i} USING (node)
)""")
    iter_blocks = ",\n".join(it)
    return f"""
WITH base AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), e AS (
  SELECT src, dst FROM base UNION SELECT dst, src FROM base
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst AS node FROM e
), nn AS (SELECT count(*) AS n FROM nodes),
outdeg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
r0 AS (
  SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes
),
{iter_blocks}
SELECT CASE WHEN node % 2 = 0 THEN 'c' ELSE 's' END AS kind,
       node // 2 AS key,
       round(rank * (SELECT n FROM nn), 6) AS rank_rel
FROM r{_PR_ITERS} ORDER BY rank DESC, node LIMIT {_PR_TOPN}
"""


@_staged("graph_pagerank_trade", _pagerank_oracle())
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph analytics (operators/graph.py:pagerank): 3 power
    iterations over the symmetrized customer<->supplier trade graph
    (edge iff a customer's order has a lineitem from the supplier; ~1.6k
    nodes / ~97k directed edges at sf0.01). Checkpointed per iteration
    (plan constant in iters), DECIMAL(38,12) contribution fold so ranks
    are partition-order independent — which is what lets the oracle
    unroll the identical recursion in SQL. Top-50 by rank, normalized
    so 1.0 = uniform mass."""
    from whisper_pandas_spark.operators.graph import pagerank

    o = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    base = o.join(li, o.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    # symmetrize by union, not explode (measured on the same trade
    # graph — see graph_bfs_distances; round 14)
    edges = base.unionByName(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank(edges, iters=_PR_ITERS)
    n = F.lit(pr.count())  # node count for the 1.0-=-uniform rescale
    return (
        pr.orderBy(F.col("rank").desc(), "node")
        .limit(_PR_TOPN)
        .select(
            F.when(F.col("node") % 2 == 0, F.lit("c"))
            .otherwise(F.lit("s"))
            .alias("kind"),
            F.floor(F.col("node") / 2).alias("key"),
            F.round(F.col("rank") * n.cast("double"), 6).alias("rank_rel"),
        )
    )


# -- streaming CDC apply: change log -> copy-on-write parquet table --------


@_staged(
    "stream_merge_replay",
    """
SELECT doc_id AS k,
       CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END AS v
FROM documents
WHERE doc_id % 5 = 0 AND doc_id % 15 <> 0
ORDER BY k
""",
)
def stream_merge_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+: the streaming CDC sink (streaming/sink.py:
    stream_merge_into_parquet) replayed end-to-end — a deterministic
    change log derived from `documents` (inserts for doc_id%5==0, then
    updates for %10==0 and deletes for %15==0 at higher sequence
    numbers) streams through foreachBatch merges into a versioned
    copy-on-write parquet table; the entry returns the FINAL visible
    state (read_current_state hides tombstones + bookkeeping). Robust
    to micro-batch geometry AND order: whole-row per-key max_by(seq)
    compression plus the sequence-aware tombstone merge make any batch
    split or delivery order of the log converge to the state the
    oracle computes relationally."""
    import tempfile

    from whisper_pandas_spark.operators.merge import read_current_state
    from whisper_pandas_spark.streaming.sink import stream_merge_into_parquet

    docs = _table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    c1 = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("k"),
        F.col("n_chars").alias("v"),
        F.col("doc_id").alias("seq"),
        F.lit(False).alias("del"),
    )
    c2 = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            F.col("doc_id").alias("k"),
            (F.col("n_chars") + 1000).alias("v"),
            (F.col("doc_id") + 100000).alias("seq"),
            F.lit(False).alias("del"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 15 == 0).select(
                F.col("doc_id").alias("k"),
                F.lit(None).cast("long").alias("v"),
                (F.col("doc_id") + 200000).alias("seq"),
                F.lit(True).alias("del"),
            )
        )
    )
    d = tempfile.mkdtemp(prefix="wps_cdc_")
    c1.coalesce(1).write.parquet(f"{d}/changes/f1")
    c2.coalesce(1).write.parquet(f"{d}/changes/f2")
    sdf = (
        spark.readStream.schema("k long, v long, seq long, del boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/changes/*")
    )
    q = stream_merge_into_parquet(
        sdf, f"{d}/table", "k", "seq", delete_col="del",
        checkpoint_dir=f"{d}/ckpt",
    )
    q.processAllAvailable()
    q.stop()
    return (
        read_current_state(spark, f"{d}/table", delete_col="del", seq_col="seq")
        .select("k", "v")
        .orderBy("k")
    )


# -- product quantization ANN ----------------------------------------------

_PQ_M = 4
_PQ_K = 16
_PQ_ITERS = 2
_PQ_TOP = 10


def _pq_chain() -> str:
    """Shared CTE chain: subspace split -> trained PQ codebooks ->
    corpus codes -> per-query ADC lookup tables (queries = vec_id < 5).
    Used by both the exhaustive-PQ and the IVF-PQ oracles."""
    from whisper_pandas_spark.functions.duck import duck_l2sq
    from whisper_pandas_spark.queries_similarity import DIM

    d_sub = DIM // _PQ_M

    def iter_block(prev: str, i: int) -> str:
        return f"""pasg{i} AS (
  SELECT s.vec_id, s.sub, s.svec, c.cid,
         {duck_l2sq("s.svec", "c.centroid")} AS d
  FROM subv s JOIN {prev} c ON s.sub = c.sub
), pcell{i} AS (
  SELECT vec_id, sub, svec, cid AS cell FROM (
    SELECT vec_id, sub, svec, cid,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY d, cid) AS rn
    FROM pasg{i}
  ) WHERE rn = 1
), pmean{i} AS (
  SELECT sub, cell, r.range AS pos,
         CAST(sum(CAST(svec[r.range + 1] AS DECIMAL(38,12)))
              AS DOUBLE) / count(*) AS mval
  FROM pcell{i}, range(0, {d_sub}) r
  GROUP BY sub, cell, r.range
), pcent{i} AS (
  SELECT sub, cell AS cid, list(mval ORDER BY pos) AS centroid
  FROM pmean{i} GROUP BY sub, cell
)"""

    iters = ",\n".join(
        iter_block(f"pcent{i}" if i else "pcent0", i + 1)
        for i in range(_PQ_ITERS)
    )
    return f"""subv AS (
  SELECT vec_id, s.range AS sub,
         (embedding[s.range * {d_sub} + 1 : s.range * {d_sub} + {d_sub}])::DOUBLE[] AS svec
  FROM embeddings, range(0, {_PQ_M}) s
), pcent0 AS (
  SELECT sub, row_number() OVER (PARTITION BY sub
           ORDER BY md5('0:' || sub || ':' || vec_id)) - 1 AS cid,
         svec AS centroid
  FROM subv
  QUALIFY cid < {_PQ_K}
),
{iters},
codes AS (
  SELECT vec_id, sub, cid AS code FROM (
    SELECT s.vec_id, s.sub, c.cid,
           row_number() OVER (PARTITION BY s.vec_id, s.sub
                              ORDER BY {duck_l2sq("s.svec", "c.centroid")}, c.cid) AS rn
    FROM subv s JOIN pcent{_PQ_ITERS} c ON s.sub = c.sub
  ) WHERE rn = 1
), dtable AS (
  SELECT s.vec_id AS query_id, s.sub, c.cid AS code,
         CAST({duck_l2sq("s.svec", "c.centroid")} AS DECIMAL(38,12)) AS d
  FROM subv s JOIN pcent{_PQ_ITERS} c ON s.sub = c.sub
  WHERE s.vec_id < 5
)"""


def _pq_rank_tail() -> str:
    return f""", ranked AS (
  SELECT query_id, vec_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, vec_id) AS rnk
  FROM scored
)
SELECT query_id, vec_id, round(adc_dist, 6) AS adc_dist, rnk
FROM ranked WHERE rnk <= {_PQ_TOP}
ORDER BY query_id, rnk
"""


def _pq_oracle() -> str:
    return f"""
WITH {_pq_chain()}, scored AS (
  SELECT t.query_id, c.vec_id, CAST(sum(t.d) AS DOUBLE) AS adc_dist
  FROM codes c JOIN dtable t ON c.sub = t.sub AND c.code = t.code
  WHERE c.vec_id != t.query_id
  GROUP BY t.query_id, c.vec_id
){_pq_rank_tail()}"""


@_staged("emb_pq_topk", _pq_oracle())
def emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+: product-quantization ANN end-to-end in-engine — M=4
    per-subspace L2 codebooks trained jointly (checkpointed Lloyd,
    exact-decimal means), corpus encoded to 4 codes/vector, queries
    answered by ADC (per-query (M x k) exact lookup table broadcast,
    DECIMAL(38,12) sum of looked-up distances). The oracle replays
    training, encoding, table build, and ranking in SQL — every stage
    of the 1 B-vector compression standard value-checked."""
    from whisper_pandas_spark.operators.embeddings import (
        pq_encode,
        pq_topk,
        pq_train,
    )
    from whisper_pandas_spark.queries_similarity import DIM

    emb = _table(spark, sf_dir, "embeddings")
    cb = pq_train(emb, DIM, _PQ_M, _PQ_K, iters=_PQ_ITERS, seed=0)
    codes = pq_encode(emb, cb, DIM, _PQ_M)
    q = emb.filter(F.col("vec_id") < 5)
    return pq_topk(codes, q, cb, _PQ_TOP, DIM, _PQ_M).orderBy(
        "query_id", "rnk"
    )


_PQ_NPROBE = 2


def _pq_ivf_oracle() -> str:
    from whisper_pandas_spark.queries_similarity import (
        KM_ITERS,
        KM_K,
        _duck_cos,
        _kmeans_iter_sql,
    )

    ivf_iters = ",\n".join(
        _kmeans_iter_sql(f"cent{i}" if i else "cent0", i + 1)
        for i in range(KM_ITERS)
    )
    return f"""
WITH {_pq_chain()}, init AS (
  SELECT vec_id, embedding, md5('0:' || vec_id) AS h
  FROM embeddings ORDER BY h LIMIT {KM_K}
), cent0 AS (
  SELECT row_number() OVER (ORDER BY h) - 1 AS cid,
         embedding::DOUBLE[] AS centroid
  FROM init
),
{ivf_iters},
cellsv AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_duck_cos("e.embedding", "c.centroid")} DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN cent{KM_ITERS} c
  ) WHERE rn = 1
), probes AS (
  SELECT query_id, cid AS cell FROM (
    SELECT e.vec_id AS query_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_duck_cos("e.embedding", "c.centroid")} DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN cent{KM_ITERS} c
    WHERE e.vec_id < 5
  ) WHERE rn <= {_PQ_NPROBE}
), scored AS (
  SELECT p.query_id, c.vec_id, CAST(sum(t.d) AS DOUBLE) AS adc_dist
  FROM codes c
  JOIN cellsv v ON v.vec_id = c.vec_id
  JOIN probes p ON p.cell = v.cell
  JOIN dtable t ON t.query_id = p.query_id AND t.sub = c.sub
               AND t.code = c.code
  WHERE c.vec_id != p.query_id
  GROUP BY p.query_id, c.vec_id
){_pq_rank_tail()}"""


@_staged("emb_pq_ivf_topk", _pq_ivf_oracle())
def emb_pq_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3+: IVF-PQ — the full 1 B-vector serving shape with BOTH
    trainers in-engine: cosine-k-means IVF cells bound WHICH codes
    score, PQ/ADC lookup tables bound what each candidate costs
    (operators/embeddings.py:pq_topk_ivf). The oracle replays IVF
    training, PQ training, cell assignment, probing, encoding, and ADC
    ranking — the entire two-codebook pipeline value-checked in SQL."""
    from whisper_pandas_spark.operators.embeddings import pq_topk_ivf, pq_train
    from whisper_pandas_spark.operators.kmeans import kmeans_cosine
    from whisper_pandas_spark.queries_similarity import DIM, KM_ITERS, KM_K

    emb = _table(spark, sf_dir, "embeddings")
    cb = pq_train(emb, DIM, _PQ_M, _PQ_K, iters=_PQ_ITERS, seed=0)
    cent = kmeans_cosine(emb, KM_K, KM_ITERS, seed=0).select(
        F.col("cid").alias("vec_id"), F.col("embedding")
    )
    q = emb.filter(F.col("vec_id") < 5)
    return pq_topk_ivf(
        emb, q, cb, cent, _PQ_TOP, DIM, _PQ_M, nprobe=_PQ_NPROBE
    ).orderBy("query_id", "rnk")


# -- seasonal decomposition over the hourly rollup grid --------------------

_SD_RES = 3600
_SD_P = 24  # daily cycle on an hourly grid
_SD_HALF = _SD_P // 2


@_staged(
    "ts_seasonal_decompose",
    f"""
WITH series AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) // {_SD_RES}) AS t,
         round(avg(value) + 1e-9, 6) AS value
  FROM events GROUP BY event_type, t
), dec0 AS (
  SELECT event_type, t, t % {_SD_P} AS phase, value,
         sum(CAST(value AS DECIMAL(38,12))) OVER w_in AS inner_s,
         count(value) OVER w_full AS cnt_full,
         lag(value, {_SD_HALF}) OVER w_ord AS lagv,
         lead(value, {_SD_HALF}) OVER w_ord AS leadv
  FROM series
  WINDOW w_ord AS (PARTITION BY event_type ORDER BY t),
         w_in AS (PARTITION BY event_type ORDER BY t
                  ROWS BETWEEN {_SD_HALF - 1} PRECEDING AND {_SD_HALF - 1} FOLLOWING),
         w_full AS (PARTITION BY event_type ORDER BY t
                  ROWS BETWEEN {_SD_HALF} PRECEDING AND {_SD_HALF} FOLLOWING)
), dec1 AS (
  SELECT *, CASE WHEN cnt_full = {_SD_P + 1}
                 THEN (CAST(inner_s AS DOUBLE) + 0.5 * (lagv + leadv)) / {_SD_P}
            END AS trend
  FROM dec0
), dec2 AS (
  SELECT *, value - trend AS detr FROM dec1
), dec3 AS (
  SELECT *,
         CAST(sum(CAST(detr AS DECIMAL(38,12))) OVER wp AS DOUBLE)
           / count(detr) OVER wp AS pm,
         row_number() OVER (PARTITION BY event_type, phase ORDER BY t) AS pr
  FROM dec2
  WINDOW wp AS (PARTITION BY event_type, phase)
), dec4 AS (
  SELECT *, CASE WHEN pr = 1 THEN CAST(pm AS DECIMAL(38,12)) END AS pmf
  FROM dec3
), dec5 AS (
  SELECT *, CAST(sum(pmf) OVER wk AS DOUBLE) / count(pmf) OVER wk AS grand
  FROM dec4 WINDOW wk AS (PARTITION BY event_type)
)
SELECT event_type, t * {_SD_RES} AS bucket_epoch, phase, value,
       round(trend + 1e-9, 6) AS trend,
       round(pm - grand + 1e-9, 6) AS seasonal,
       round(value - trend - round(pm - grand + 1e-9, 6) + 1e-9, 6) AS residual
FROM dec5 ORDER BY event_type, bucket_epoch
""",
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12+: classical additive seasonal decomposition
    (operators/decompose.py) over the hourly average rollup — daily
    cycle (period 24): centered 2xMA trend (half-weighted ends, NULL at
    edges), phase-mean seasonal re-centered over the distinct phase
    means, residual = deseasonalized anomaly signal. Every mean folds
    through DECIMAL(38,12); the oracle replays the construction
    window-for-window."""
    from whisper_pandas_spark.operators.decompose import seasonal_decompose
    from whisper_pandas_spark.operators.rollup import rollup

    ev = _table(spark, sf_dir, "events")
    series = rollup(
        ev, _SD_RES, "average", keys=("event_type",), ts_col="ts",
        value_col="value",
    ).select(
        "event_type",
        "bucket",
        # + 1e-9 boundary bias on the base series, matching the oracle
        # (round 13; the output trend/seasonal/residual already bias)
        F.round(F.col("value") + F.lit(1e-9), 6).alias("value"),
    )
    out = seasonal_decompose(
        series, ("event_type",), "bucket", "value", _SD_P, _SD_RES
    )
    return out.select(
        "event_type",
        F.unix_timestamp("bucket").alias("bucket_epoch"),
        "phase",
        "value",
        "trend",
        "seasonal",
        "residual",
    ).orderBy("event_type", "bucket_epoch")


# -- Holt linear forecasting over the hourly rollup grid -------------------

_HW_A = 0.5
_HW_B = 0.3
_HW_H = 4


def _holt_oracle() -> str:
    A = f"CAST({_HW_A} AS DOUBLE)"
    B = f"CAST({_HW_B} AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    new_l = f"{A} * cur[1] + ({one} - {A}) * (acc[1] + acc[2])"
    return f"""
WITH series AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) // {_SD_RES}) AS t,
         round(avg(value) + 1e-9, 6) AS value
  FROM events GROUP BY event_type, t
), packed AS (
  SELECT event_type, list(value ORDER BY t) AS xs
  FROM series GROUP BY event_type
), st AS (
  SELECT event_type, len(xs) AS n_points,
    -- state is a 2-list [l, b], NOT a struct: DuckDB 1.0.0 mis-evaluates
    -- later fields of struct accumulators after the first list_reduce
    -- application (verified by probe); list state folds correctly
    list_reduce(
      list_prepend(
        [xs[1]::DOUBLE, xs[2]::DOUBLE - xs[1]::DOUBLE],
        list_transform(xs[2:], x -> [x::DOUBLE, CAST(0.0 AS DOUBLE)])),
      (acc, cur) -> [{new_l},
                     {B} * ({new_l} - acc[1]) + ({one} - {B}) * acc[2]]
    ) AS s
  FROM packed WHERE len(xs) >= 2
)
SELECT event_type, n_points,
       round(s[1], 6) AS level, round(s[2], 6) AS slope,
       CAST(h.range + 1 AS INT) AS h,
       round(s[1] + CAST(h.range + 1 AS DOUBLE) * s[2], 6) AS yhat
FROM st, range(0, {_HW_H}) h
ORDER BY event_type, h
"""


@_staged("ts_holt_forecast", _holt_oracle())
def ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12+: Holt's linear exponential smoothing
    (operators/forecast.py) per event_type over the hourly average
    rollup — the sequential recurrence distributed at series
    granularity: one collect_list per series (bounded by retention,
    the Whisper-ring contract), one element-order aggregate fold, no
    Python. The oracle replays the identical fold with DuckDB
    list_reduce — expression-identical text, so states match
    bit-for-bit."""
    from whisper_pandas_spark.operators.forecast import holt_forecast
    from whisper_pandas_spark.operators.rollup import rollup

    ev = _table(spark, sf_dir, "events")
    series = rollup(
        ev, _SD_RES, "average", keys=("event_type",), ts_col="ts",
        value_col="value",
    ).select(
        "event_type",
        "bucket",
        # + 1e-9 boundary bias on the base series, matching the oracle
        # (round 13; the output trend/seasonal/residual already bias)
        F.round(F.col("value") + F.lit(1e-9), 6).alias("value"),
    )
    return holt_forecast(
        series, ("event_type",), "bucket", "value", _HW_A, _HW_B, _HW_H
    ).orderBy("event_type", "h")


# -- as-of join: forward / nearest / tolerance directions ------------------


@_staged(
    "join_asof_forward",
    """
SELECT e.event_id, e.user_id, c.value AS value_next
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts <= c.ts
ORDER BY e.event_id
""",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5+: the forward as-of direction — for each error, the NEAREST
    click at-or-after it per user (pd.merge_asof direction='forward';
    DuckDB ASOF JOIN with the inequality flipped). Same one-union
    window plan as the backward join, ordered descending
    (operators/asof.py:asof_join(direction='forward')); nearest and
    tolerance ride the same machinery (property-tested vs pandas)."""
    from whisper_pandas_spark.operators.asof import asof_join

    ev = _table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        errors, clicks, on="user_id", value_cols=("value",), suffix="_x",
        direction="forward",
    )
    return out.select(
        "event_id", "user_id", F.col("value_x").alias("value_next")
    ).orderBy("event_id")


# -- TPC-H Q5-shaped multi-join aggregation --------------------------------


@_staged(
    "join_star_q5ish",
    """
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
""",
)
def join_star_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5: the TPC-H Q5 join shape — six tables, the
    customer-nation = supplier-nation co-location condition, one
    grouped revenue aggregation. Spark-first: region/nation broadcast
    (and supplier under the AQE threshold at test SF); the only big
    exchanges are the orders-customer and lineitem-orders equi-joins,
    both on their natural keys; DECIMAL revenue arithmetic is exact so
    the sum is partition-order independent."""
    c = _table(spark, sf_dir, "customer")
    o = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    s = _table(spark, sf_dir, "supplier")
    n = _table(spark, sf_dir, "nation")
    r = _table(spark, sf_dir, "region")
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "nation")
    )


# -- TF-IDF keyword extraction ---------------------------------------------


@_staged(
    "text_tfidf_topk",
    """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(regexp_replace(lower(text),
           '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term != '' GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         round(tf.tf * ln((CAST((SELECT n_docs FROM n) AS DOUBLE) + 1)
                          / (dfreq.df + 1)), 6) AS score
  FROM tf JOIN dfreq USING (term) WHERE dfreq.df >= 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, tf, df, score, rnk
FROM ranked WHERE rnk <= 5
ORDER BY doc_id, rnk
""",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: per-document TF-IDF keywords
    (operators/textrank.py:tfidf_top_terms) — top-5 terms by smoothed
    tf*idf, min_df=2, WindowGroupLimit top-k; the labeling/search
    companion to BM25 over the same tokenize family."""
    from whisper_pandas_spark.operators.textrank import tfidf_top_terms

    docs = _table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=5, min_df=2).orderBy(
        "doc_id", "rnk"
    )


# -- cross-metric correlation matrix ---------------------------------------


@_staged(
    "ts_metric_correlation",
    f"""
WITH series AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) // {_SD_RES}) AS t,
         round(avg(value) + 1e-9, 6) AS value
  FROM events GROUP BY event_type, t
)
SELECT a.event_type AS metric_a, b.event_type AS metric_b,
       count(*) AS n_points, round(corr(a.value, b.value), 6) AS corr
FROM series a JOIN series b ON a.t = b.t AND a.event_type < b.event_type
GROUP BY metric_a, metric_b
HAVING count(*) >= 2
ORDER BY metric_a, metric_b
""",
)
def ts_metric_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12+: the pairwise Pearson matrix between event-type series on
    the shared hourly grid (operators/decompose.py:metric_correlation)
    — one timestamp equi-join + one pair-keyed partial agg."""
    from whisper_pandas_spark.operators.decompose import metric_correlation
    from whisper_pandas_spark.operators.rollup import rollup

    ev = _table(spark, sf_dir, "events")
    series = rollup(
        ev, _SD_RES, "average", keys=("event_type",), ts_col="ts",
        value_col="value",
    ).select(
        "event_type",
        "bucket",
        # + 1e-9 boundary bias on the base series, matching the oracle
        # (round 13; the output trend/seasonal/residual already bias)
        F.round(F.col("value") + F.lit(1e-9), 6).alias("value"),
    )
    return metric_correlation(
        series, "event_type", "bucket", "value"
    ).orderBy("metric_a", "metric_b")


# -- deterministic weighted sampling ---------------------------------------


@_staged(
    "sample_weighted_topk",
    """
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         CASE WHEN n_chars > 0
              THEN exp(ln((('0x' || substr(md5('0:' || doc_id), 1, 8))::BIGINT + 1)
                          / 4294967296.0) / CAST(n_chars AS DOUBLE))
              ELSE CAST(0.0 AS DOUBLE) END AS rk
  FROM documents
)
SELECT doc_id, source, n_chars, round(rk, 12) AS rank_key
FROM keyed ORDER BY rk DESC, doc_id LIMIT 25
""",
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: deterministic weighted sampling without replacement
    (operators/sampling.py:weighted_sample_k) — Efraimidis-Spirakis
    keys u^(1/w) from the md5 draw, w = n_chars (longer docs
    proportionally likelier), top-25 via TakeOrderedAndProject. The
    oracle replays the identical draw and key arithmetic."""
    from whisper_pandas_spark.operators.sampling import weighted_sample_k

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return weighted_sample_k(docs, "doc_id", "n_chars", k=25).orderBy(
        F.col("rank_key").desc(), "doc_id"
    )


# -- HLL sketch-table rollup ------------------------------------------------


@_staged(
    "sketch_distinct_rollup",
    """
SELECT event_type, count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def sketch_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y44: the incremental sketch-table flow end-to-end — per-shard
    (event_type, user-bucket) HLL sketch tables unioned up to
    event_type (operators/sketches.py; raw data scanned once, the
    rollup touches only sketches). The oracle is the EXACT distinct
    count: DataSketches HLL stays in its exact sparse/coupon regime
    far above this fixture's max cardinality (1.5k at sf0.1) at
    lg_k=16, so shard->union->estimate must reproduce exact counts —
    value-checking the sketch PLUMBING; at production cardinality the
    same operator is approximate by design (pytest pins the 5% bound)."""
    from whisper_pandas_spark.operators.sketches import (
        hll_rollup_estimate,
        hll_shard_sketches,
    )

    ev = _table(spark, sf_dir, "events").withColumn(
        "__shard", F.pmod(F.col("user_id"), F.lit(8))
    )
    shards = hll_shard_sketches(
        ev, ("event_type", "__shard"), "user_id", lg_k=16
    )
    return hll_rollup_estimate(shards, ("event_type",)).orderBy("event_type")


# -- mergeable quantile sketch tables ---------------------------------------

_HQ_BINS = 1024  # width 1 over [0, 1024): exact regime for n_chars
_HQ_QS = (0.25, 0.5, 0.75, 0.9)


@_staged(
    "sketch_quantile_rollup",
    f"""
WITH cnts AS (
  SELECT lang, n_chars AS v, count(*) AS c
  FROM documents GROUP BY lang, n_chars
), cum AS (
  SELECT lang, v,
         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM cnts
), qs AS (SELECT unnest([{", ".join(str(q) for q in _HQ_QS)}]) AS q)
SELECT lang, q,
       CAST(min(n) AS BIGINT) AS n,
       CAST(min(CASE WHEN cum >= ceil(q * n) THEN v END) AS DOUBLE)
         AS quantile
FROM cum CROSS JOIN qs
GROUP BY lang, q
ORDER BY lang, q
""",
)
def sketch_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y44+: mergeable QUANTILE sketch tables (operators/sketches.py
    hist_* family) — per-(lang, shard) fixed-bin histograms over
    n_chars, merged element-wise to per-lang state, quantiles read off
    the merged counts. Bin width 1 over [0, 1024) puts integer n_chars
    in the EXACT regime, so the oracle replays the estimates
    value-for-value from raw data (smallest v with count(<= v) >=
    ceil(q·n), the sketch's own definition). The approximate-regime
    accuracy bound (error < one bin width) is pytest-pinned like the
    HLL entry."""
    from whisper_pandas_spark.operators.sketches import (
        hist_quantiles,
        hist_rollup,
        hist_shard_sketches,
    )

    docs = _table(spark, sf_dir, "documents").withColumn(
        "__shard", F.pmod(F.col("doc_id"), F.lit(4))
    )
    shards = hist_shard_sketches(
        docs, ("lang", "__shard"), "n_chars", 0.0, float(_HQ_BINS), _HQ_BINS
    )
    merged = hist_rollup(shards, ("lang",))
    return hist_quantiles(
        merged, ("lang",), _HQ_QS, 0.0, float(_HQ_BINS), _HQ_BINS
    ).orderBy("lang", "q")


# -- streaming sketch-table maintenance --------------------------------------

_SSQ = (0.1, 0.5, 0.99)


@_staged(
    "stream_sketch_replay",
    f"""
WITH cnts AS (
  SELECT lang, n_chars AS v, count(*) AS c
  FROM documents GROUP BY lang, n_chars
), cum AS (
  SELECT lang, v,
         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM cnts
), qs AS (SELECT unnest([{", ".join(str(q) for q in _SSQ)}]) AS q)
SELECT lang, q,
       CAST(min(n) AS BIGINT) AS n,
       CAST(min(CASE WHEN cum >= ceil(q * n) THEN v END) AS DOUBLE)
         AS quantile
FROM cum CROSS JOIN qs
GROUP BY lang, q
ORDER BY lang, q
""",
)
def stream_sketch_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+: streaming quantile-sketch maintenance
    (streaming/sketches.py:stream_sketch_update) replayed end-to-end —
    `documents` split into two change files streams through foreachBatch
    additive merges into the versioned sketch table (exactly-once via
    checkpoint-scoped batch markers; a replayed batch would otherwise
    double-count), then the final state is read back and quantiles
    taken off the merged counts. Exact regime (width-1 bins over
    integer n_chars), so the oracle recomputes the identical values
    from raw data — proving batch sketching, element-wise merge,
    version flips, AND the readout in one check."""
    import tempfile

    from whisper_pandas_spark.operators.merge import current_version_path
    from whisper_pandas_spark.operators.sketches import hist_quantiles
    from whisper_pandas_spark.streaming.sketches import stream_sketch_update

    docs = _table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    d = tempfile.mkdtemp(prefix="wps_sketchstream_")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        f"{d}/changes/f1"
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        f"{d}/changes/f2"
    )
    sdf = (
        spark.readStream.schema("doc_id long, lang string, n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/changes/*")
    )
    q = stream_sketch_update(
        sdf,
        f"{d}/state",
        ("lang",),
        "n_chars",
        0.0,
        float(_HQ_BINS),
        _HQ_BINS,
        checkpoint_dir=f"{d}/ckpt",
    )
    q.processAllAvailable()
    q.stop()
    state = spark.read.parquet(current_version_path(f"{d}/state"))
    return hist_quantiles(
        state, ("lang",), _SSQ, 0.0, float(_HQ_BINS), _HQ_BINS
    ).orderBy("lang", "q")


# -- mergeable heavy-hitters sketch tables -----------------------------------

_TK_K = 5


@_staged(
    "sketch_topk_rollup",
    f"""
WITH c AS (
  SELECT event_type, user_id, count(*) AS n
  FROM events GROUP BY event_type, user_id
), r AS (
  SELECT event_type, user_id, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, user_id) AS rnk
  FROM c
)
SELECT event_type, CAST(rnk AS INT) AS rnk, user_id AS item,
       CAST(n AS BIGINT) AS count_lo, CAST(n AS BIGINT) AS count_hi
FROM r WHERE rnk <= {_TK_K} ORDER BY event_type, rnk
""",
)
def sketch_topk_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y44++: mergeable HEAVY-HITTERS sketch tables
    (operators/sketches.py topk_* family) — per-(event_type, shard)
    truncated exact-count summaries over user_id, merged to per-type
    top-5 with two-sided bounds. Capacity exceeds per-shard distinct
    users here (the exact regime: rest_max = 0, lo == hi == true
    count), so the oracle is the plain relational top-k; truncated-
    regime bound correctness is pytest-pinned like the HLL/quantile
    recipes."""
    from whisper_pandas_spark.operators.sketches import (
        topk_rollup,
        topk_shard_sketches,
    )

    ev = _table(spark, sf_dir, "events").withColumn(
        "__shard", F.pmod(F.col("event_id"), F.lit(4))
    )
    sk = topk_shard_sketches(
        ev, ("event_type", "__shard"), "user_id", capacity=1 << 20
    )
    return topk_rollup(sk, ("event_type",), _TK_K).orderBy(
        "event_type", "rnk"
    )


# -- incremental aggregate maintenance ---------------------------------------


@_staged(
    "incr_agg_orders",
    """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS __n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS o_totalprice_cents_sum,
       CAST(count(*) AS BIGINT) AS o_totalprice_cents_count
FROM orders
WHERE NOT (o_orderkey % 3 <> 0 AND o_orderkey % 5 = 0)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def incr_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: incremental aggregate maintenance
    (operators/incremental.py) — the materialized-view pattern: build
    the revenue-by-priority state over two thirds of orders, then fold
    in ONE change batch (the remaining third as inserts, every fifth
    base row as a CDC retraction carrying its original values) without
    touching base rows. The oracle recomputes the aggregate over the
    equivalent final row set, so the algebra (sign-folded partial aggs,
    full-outer state merge, emptied-group drop) is value-checked
    end-to-end."""
    from whisper_pandas_spark.operators.incremental import (
        agg_apply,
        agg_state,
    )

    measures = {"o_totalprice_cents": ("sum", "count")}
    orders = _table(spark, sf_dir, "orders").withColumn(
        "o_totalprice_cents",
        F.round(F.col("o_totalprice") * 100).cast("bigint"),
    )
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    state = agg_state(base, ("o_orderpriority",), measures)
    inserts = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "__del", F.lit(False)
    )
    deletes = base.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "__del", F.lit(True)
    )
    cols = ["o_orderpriority", "o_totalprice_cents", "__del"]
    changes = inserts.select(cols).unionByName(deletes.select(cols))
    new_state = agg_apply(
        state, changes, ("o_orderpriority",), measures, delete_col="__del"
    )
    return new_state.orderBy("o_orderpriority")


# -- in-engine trainable quality classifier ----------------------------------

_CLF_ITERS = 6
_CLF_LR = 1.0
_CLF_FEATS_CTE = """feats AS (
  SELECT doc_id,
         n_chars / 400.0 AS x0,
         (length(text) - length(replace(text, ' ', ''))) / length(text) AS x1,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
)"""


def _clf_oracle() -> str:
    from whisper_pandas_spark.operators.classifier import training_replay_sql

    chain = training_replay_sql(
        _CLF_FEATS_CTE, ["x0", "x1"], "y", _CLF_ITERS, _CLF_LR
    )
    m = "w.w0 * f.x0 + w.w1 * f.x1 + w.wb"
    p = f"(0.5 * (1.0 + ({m}) / (1.0 + abs({m}))))"
    return f"""{chain}
SELECT f.doc_id,
       round(({m}) + 1e-9, 6) AS margin,
       round({p} + 1e-9, 6) AS prob,
       ({m}) >= 0 AS pred,
       f.y AS label
FROM feats f CROSS JOIN w{_CLF_ITERS}_ w
ORDER BY f.doc_id
"""


@_staged("text_quality_classifier", _clf_oracle())
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: the in-engine TRAINABLE quality gate
    (operators/classifier.py) — a softsign-link linear classifier fit
    by full-batch gradient descent on two codegen features (length
    ratio, space ratio) against an is-English label, then scored over
    the corpus. The oracle replays the ENTIRE training trajectory in
    unrolled SQL CTEs (the k-means/PQ recipe): softsign avoids exp's
    cross-libm last-ulp drift, gradient sums fold through DECIMAL, and
    the margin's addition order is part of the contract — so weights,
    margins, and probabilities agree bit-for-bit."""
    from whisper_pandas_spark.operators.classifier import (
        logreg_score,
        logreg_train,
    )

    docs = _table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        (F.col("n_chars") / F.lit(400.0)).alias("x0"),
        (
            (F.length("text") - F.length(F.expr("replace(text, ' ', '')")))
            / F.length("text")
        ).alias("x1"),
        F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0)).alias(
            "y"
        ),
    )
    w = logreg_train(feats, ["x0", "x1"], "y", iters=_CLF_ITERS, lr=_CLF_LR)
    scored = logreg_score(feats, w, ["x0", "x1"])
    eps = F.lit(1e-9)
    return scored.select(
        "doc_id",
        F.round(F.col("margin") + eps, 6).alias("margin"),
        F.round(F.col("prob") + eps, 6).alias("prob"),
        "pred",
        F.col("y").alias("label"),
    ).orderBy("doc_id")


# -- data-quality expectations report ---------------------------------------


@_staged(
    "quality_expectations",
    """
WITH t AS (SELECT count(*) AS total FROM documents)
SELECT 'in_range(n_chars,1,400)' AS "check",
       CAST((SELECT sum(CASE WHEN n_chars IS NULL OR n_chars < 1 OR n_chars > 400
                        THEN 1 ELSE 0 END) FROM documents) AS BIGINT) AS violations,
       total, FALSE AS _ph
FROM t
UNION ALL
SELECT 'in_set(lang)',
       CAST((SELECT sum(CASE WHEN lang IS NULL OR lang NOT IN ('en', 'de', 'fr')
                        THEN 1 ELSE 0 END) FROM documents) AS BIGINT), total, FALSE
FROM t
UNION ALL
SELECT 'matches(source)',
       CAST((SELECT sum(CASE WHEN source IS NULL
                        OR NOT regexp_matches(source, '^src[0-9]+$')
                        THEN 1 ELSE 0 END) FROM documents) AS BIGINT), total, FALSE
FROM t
UNION ALL
SELECT 'not_null(text)',
       CAST((SELECT sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
        FROM documents) AS BIGINT), total, FALSE
FROM t
UNION ALL
SELECT 'unique(doc_id)',
       CAST((SELECT sum(n - 1) FROM (SELECT count(*) AS n FROM documents
                                GROUP BY doc_id)) AS BIGINT), total, FALSE
FROM t
ORDER BY "check"
""",
)
def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y+: the declarative data-quality gate
    (operators/expectations.py) — five constraint families (null /
    range / set / regex / uniqueness) over `documents` in ONE scan for
    the row predicates plus one groupBy for uniqueness; the oracle
    recomputes every (violations, total) pair relationally. The regex
    stays in the Java∩RE2 subset. passed is derived client-side from
    violations=0 (the oracle's _ph placeholder keeps columns aligned)."""
    from whisper_pandas_spark.operators.expectations import (
        expect,
        in_range,
        in_set,
        matches,
        not_null,
        unique,
    )

    docs = _table(spark, sf_dir, "documents")
    rep = expect(
        docs,
        [
            not_null("text"),
            in_range("n_chars", 1, 400),
            in_set("lang", ("en", "de", "fr")),
            matches("source", "^src[0-9]+$"),
            unique("doc_id"),
        ],
    )
    return rep.select(
        "check", "violations", "total", F.lit(False).alias("_ph")
    ).orderBy("check")


# Self-promotion: if registry is already (or currently being) imported,
# promote now that STAGED is fully populated. Covers the import order where
# this module loads FIRST and an oracle builder above pulled registry in
# mid-load — registry's own promote() call then saw a partial STAGED.
import sys as _sys  # noqa: E402

if "whisper_pandas_spark.registry" in _sys.modules:
    promote()
