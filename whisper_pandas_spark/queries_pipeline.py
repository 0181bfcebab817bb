"""Registry entries: pipeline-engineering operators — deterministic
sampling / dataset splits (operators/sampling.py) and skew mitigation
(operators/skew.py).

The sampling entries verify the md5 bucket arithmetic bit-for-bit
against DuckDB (same engine-portable hash the dedup family uses). The
skew entries verify that salting is semantically invisible: the oracle
is the PLAIN formulation — same rows, same values, no salt anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.operators.sampling import (
    BUCKET_SPACE,
    duck_hash_bucket,
    hash_sample,
    split_assign,
)
from whisper_pandas_spark.operators.skew import salted_agg_count_sum, salted_join
from whisper_pandas_spark.registry import _table, register

SAMPLE_FRAC = 0.25
TEST_FRAC = 0.1
VAL_FRAC = 0.1


@register(
    "sample_hash_deterministic",
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE {duck_hash_bucket("doc_id")} < {int(SAMPLE_FRAC * BUCKET_SPACE)}
ORDER BY doc_id
""",
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-keyed ~25% sample of `documents`: each row's fate is
    md5(seed:doc_id) — reproducible across runs, engines and
    partitionings (df.sample() is none of those). Zero shuffles."""
    return hash_sample(
        _table(spark, sf_dir, "documents"), "doc_id", SAMPLE_FRAC
    ).select("doc_id", "lang").orderBy("doc_id")


@register(
    "sample_train_test_split",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id,
         CASE
           WHEN {duck_hash_bucket("doc_id")} < {int(TEST_FRAC * BUCKET_SPACE)}
             THEN 'test'
           WHEN {duck_hash_bucket("doc_id")}
                < {int(TEST_FRAC * BUCKET_SPACE) + int(VAL_FRAC * BUCKET_SPACE)}
             THEN 'val'
           ELSE 'train'
         END AS split
  FROM documents
)
SELECT split, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM assigned GROUP BY split ORDER BY split
""",
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free train/val/test assignment keyed on doc_id (a joined row
    can never straddle splits), summarized per split. The split column
    is a pure hash function — appending data never flips old rows."""
    assigned = split_assign(
        _table(spark, sf_dir, "documents"), "doc_id", TEST_FRAC, VAL_FRAC
    )
    return (
        assigned.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("sum_ids"))
        .orderBy("split")
    )


@register(
    "join_salted_skew",
    oracle="""
SELECT n_name, count(*) AS n_customers,
       CAST(sum(c_acctbal_cents) AS BIGINT) AS sum_acctbal_cents
FROM (SELECT c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents
      FROM customer) c
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators/skew.py): the hot-key mitigation for
    sort-merge joins AQE can't split. The oracle is the PLAIN join —
    salting must be semantically invisible. acctbal in integer cents so
    the sum is order-independent (exact under any partitioning)."""
    cust = _table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nkey"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("c_acctbal_cents"),
    )
    nat = _table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nkey"), "n_name"
    )
    return (
        salted_join(cust, nat, "nkey", salt_factor=8)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("c_acctbal_cents").alias("sum_acctbal_cents"),
        )
        .orderBy("n_name")
    )


@register(
    "agg_salted_twophase",
    oracle="""
SELECT event_type AS key, count(*) AS n_rows,
       CAST(sum(user_id) AS BIGINT) AS sum_value
FROM events GROUP BY event_type ORDER BY key
""",
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: partial (key, salt) combine then
    final per-key merge — the explicit hot-key split. Counts/sums of
    integers recombine exactly; oracle is the direct GROUP BY."""
    out = salted_agg_count_sum(
        _table(spark, sf_dir, "events"), "event_type", "user_id", salt_factor=8
    )
    return out.select(
        F.col("event_type").alias("key"), "n_rows", "sum_value"
    ).orderBy("key")


PACK_BUDGET = 2048
PACK_SHARDS = 4

_DUCK_TOKS = (
    "regexp_split_to_array(trim(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g')), ' ')"
)


@register(
    "pack_sequences",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, len({_DUCK_TOKS}) AS n_tok,
         ({duck_hash_bucket("doc_id")} % {PACK_SHARDS}) AS shard
  FROM documents
), binned AS (
  SELECT lang, shard, n_tok,
         CAST(floor(
           coalesce(sum(n_tok) OVER (PARTITION BY lang, shard
                                     ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING), 0)
           / {PACK_BUDGET}) AS BIGINT) AS bin_id
  FROM toks
)
SELECT lang, shard, bin_id,
       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM binned GROUP BY lang, shard, bin_id
ORDER BY lang, shard, bin_id
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (operators/packing.py): shard by the
    engine-portable md5 bucket, pack each (lang, shard) contiguously into
    PACK_BUDGET(=2048)-token bins via one window cumsum. Bin summary per
    (lang, shard, bin). Packing is the step between dedup and tokenizer
    output in a real corpus pipeline."""
    from whisper_pandas_spark.functions.text import tokenize
    from whisper_pandas_spark.operators.packing import pack_bins

    docs = _table(spark, sf_dir, "documents")
    binned = pack_bins(
        docs,
        "doc_id",
        F.size(tokenize("text")),
        "lang",
        PACK_BUDGET,
        n_shards=PACK_SHARDS,
    )
    return (
        binned.groupBy("lang", "shard", "bin_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
        .orderBy("lang", "shard", "bin_id")
    )


@register(
    "profile_documents",
    oracle="""
SELECT lang,
       count(*) AS n_docs,
       count(DISTINCT source) AS n_sources,
       CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_empty,
       min(length(text)) AS min_len,
       max(length(text)) AS max_len,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang ORDER BY lang
""",
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling — the first query any pipeline runs on a new drop:
    per-language row counts, source cardinality, empty-text rate, length
    envelope. All integer aggregates (exact under any partitioning);
    one shuffle with map-side partial agg."""
    docs = _table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum(
                F.when(
                    F.col("text").isNull() | (F.col("text") == ""), 1
                ).otherwise(0)
            ).alias("n_empty"),
            F.min(F.length("text")).alias("min_len"),
            F.max(F.length("text")).alias("max_len"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        .orderBy("lang")
    )


QUOTA_N = 25


@register(
    "sample_source_quota",
    oracle=f"""
SELECT source, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn <= {QUOTA_N}
GROUP BY source ORDER BY source
""",
)
def sample_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: cap every source at its first QUOTA_N(=25) docs by
    doc_id (operators/sampling.py per_group_quota — WindowGroupLimit
    prunes map-side, so a dominant crawl domain never floods one
    reducer). Summarized per source so the check covers both the cap and
    the membership."""
    from whisper_pandas_spark.operators.sampling import per_group_quota

    kept = per_group_quota(
        _table(spark, sf_dir, "documents"), "source", "doc_id", QUOTA_N
    )
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("sum_ids"))
        .orderBy("source")
    )


HIST_LO = 0.0
HIST_W = 10.0
HIST_BUCKETS = 10


@register(
    "profile_histogram",
    oracle=f"""
SELECT LEAST(GREATEST(CAST(floor((value - {HIST_LO}) / {HIST_W}) AS BIGINT), 0),
             {HIST_BUCKETS - 1}) AS bucket,
       count(*) AS n
FROM events GROUP BY bucket ORDER BY bucket
""",
)
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram with clamped edge buckets — the
    scale-safe profiling shape (one groupBy on a derived int key; the
    bucket arithmetic is a pure row-wise expression, exact on both
    engines)."""
    ev = _table(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(
            F.floor((F.col("value") - HIST_LO) / HIST_W).cast("bigint"), F.lit(0)
        ),
        F.lit(HIST_BUCKETS - 1),
    )
    return (
        ev.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


Z_THRESH = 3.0


@register(
    "anomaly_zscore",
    oracle=f"""
WITH us AS (
  SELECT event_id, event_type,
         CAST(floor(value * 1000000.0) AS DECIMAL(19,0)) AS v_us
  FROM events
), stats AS (
  SELECT event_type,
         count(*) AS n,
         sum(v_us) AS s1,
         sum(v_us * v_us) AS s2
  FROM us GROUP BY event_type
), scored AS (
  SELECT u.event_id, u.event_type,
         round(
           (CAST(u.v_us AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.n)
           / sqrt((CAST(s.s2 AS DOUBLE)
                   - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE) / s.n)
                  / (s.n - 1)),
           6) AS z
  FROM us u JOIN stats s USING (event_type)
)
SELECT event_id, event_type, z FROM scored
WHERE abs(z) >= {Z_THRESH}
ORDER BY event_id
""",
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier detection: per-group z-score with |z| >= Z_THRESH (3.0).

    The second moment is the order-dependence trap (sum of double
    squares differs across partitionings), so both moments are EXACT:
    values quantized to integer micros with floor (tie-free, unlike
    round), squared and summed in DECIMAL — associative, bit-identical
    under any partitioning — with the float math confined to the final
    per-row expression. Stats side is tiny (one row per group) and
    broadcast back onto the scan."""
    ev = _table(spark, sf_dir, "events")
    us = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 1000000.0).cast("decimal(19,0)").alias("v_us"),
    )
    stats = us.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_us").alias("s1"),
        F.sum(F.col("v_us") * F.col("v_us")).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    z = F.round(
        (F.col("v_us").cast("double") - s1d / F.col("n"))
        / F.sqrt(
            (F.col("s2").cast("double") - s1d * s1d / F.col("n"))
            / (F.col("n") - 1)
        ),
        6,
    )
    return (
        us.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", z.alias("z"))
        .filter(F.abs(F.col("z")) >= Z_THRESH)
        .orderBy("event_id")
    )


STRATA_FRACS = {"en": 0.5, "zh": 0.1}
STRATA_DEFAULT = 0.25


@register(
    "sample_stratified",
    oracle=f"""
SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM documents
WHERE {duck_hash_bucket("doc_id")} <
      CASE lang
        WHEN 'en' THEN {int(0.5 * BUCKET_SPACE)}
        WHEN 'zh' THEN {int(0.1 * BUCKET_SPACE)}
        ELSE {int(0.25 * BUCKET_SPACE)}
      END
GROUP BY lang ORDER BY lang
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (language rebalancing: keep
    half the English, a tenth of the Chinese, a quarter of the rest) —
    df.sampleBy's reproducible twin. Summarized per language so the
    check covers both the kept-set and its membership."""
    from whisper_pandas_spark.operators.sampling import stratified_hash_sample

    kept = stratified_hash_sample(
        _table(spark, sf_dir, "documents"),
        "doc_id",
        "lang",
        STRATA_FRACS,
        default_fraction=STRATA_DEFAULT,
    )
    return (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("sum_ids"))
        .orderBy("lang")
    )


def _e2e_oracle() -> str:
    """Full corpus-pipeline replica: every stage is the same formula an
    individual entry already proves bit-exact (gate ≡ filter_quality_gates,
    dedup ≡ dedup_exact, split ≡ sample_train_test_split, decontam ≡
    decontam_ngram_overlap, packing ≡ pack_sequences)."""
    from whisper_pandas_spark.functions.text import duck_base_hash32
    from whisper_pandas_spark.operators.textstats import (
        GATE_MAX_DUP,
        GATE_MIN_QUALITY,
        STOPWORDS,
    )

    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    raw_sh = (
        "list_transform(range(1, greatest(len(t)-2, 0)+1), "
        "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])"
    )
    t_thr = int(TEST_FRAC * BUCKET_SPACE)
    v_thr = t_thr + int(VAL_FRAC * BUCKET_SPACE)
    return f"""
WITH base AS (
  SELECT doc_id, lang, text, {_DUCK_TOKS} AS t,
         length(text) AS n_chars,
         length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS punct
  FROM documents
), scored AS (
  SELECT doc_id, lang, text, t,
    round(0.4 * (CASE WHEN n_chars BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
      + 0.3 * (1.0 - least(punct::DOUBLE / n_chars * 5, 1.0))
      + 0.3 * least(len(list_filter(t, x -> x IN ({stop_list})))::DOUBLE
                    / len(t) * 10, 1.0), 6) AS quality,
    {raw_sh} AS s
  FROM base
), gated AS (
  SELECT doc_id, lang, text, t FROM scored
  WHERE quality >= {GATE_MIN_QUALITY} AND len(s) > 0
    AND round(1.0 - len(list_distinct(s))::DOUBLE / len(s), 6) <= {GATE_MAX_DUP}
), deduped AS (
  SELECT doc_id, lang, text, t FROM gated
  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)
), assigned AS (
  SELECT doc_id, lang, t,
    CASE WHEN {duck_hash_bucket("doc_id")} < {t_thr} THEN 'test'
         WHEN {duck_hash_bucket("doc_id")} < {v_thr} THEN 'val'
         ELSE 'train' END AS split
  FROM deduped
), shf AS (
  SELECT doc_id, split,
         list_distinct(list_transform(list_distinct({raw_sh}),
                                      x -> {duck_base_hash32("x")})) AS hh
  FROM assigned WHERE len(t) >= 3
), held AS (
  SELECT DISTINCT unnest(hh) AS h FROM shf WHERE split = 'test'
), cont AS (
  SELECT DISTINCT tr.doc_id
  FROM (SELECT doc_id, unnest(hh) AS h FROM shf WHERE split = 'train') tr
  JOIN held USING (h)
), clean AS (
  SELECT doc_id, lang, split, len(t) AS n_tok,
         ({duck_hash_bucket("doc_id")} % {PACK_SHARDS}) AS shard
  FROM assigned
  WHERE split <> 'train' OR doc_id NOT IN (SELECT doc_id FROM cont)
), binned AS (
  SELECT split, lang, doc_id, n_tok, shard,
    CAST(floor(
      coalesce(sum(n_tok) OVER (PARTITION BY split, lang, shard
                                ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0)
      / {PACK_BUDGET}) AS BIGINT) AS bin_id
  FROM clean
)
SELECT split, lang,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       count(DISTINCT shard * 1000000000 + bin_id) AS n_bins
FROM binned GROUP BY split, lang ORDER BY split, lang
"""


@register("pipeline_corpus_end_to_end", oracle=_e2e_oracle())
def pipeline_corpus_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship INTEGRATED corpus pipeline — the five stages a real
    pre-training data build runs, chained end to end over `documents`:

      1. quality gate (composite score floor + repetition ceiling) —
         row-local expressions fused into the scan, zero shuffles;
      2. exact dedup — min-doc_id keeper per content digest; the window
         shuffles on sha2(text), never on the document itself;
      3. leak-free train/val/test split — md5-bucket assignment, a pure
         function of doc_id (appends never flip old rows);
      4. decontamination — train docs sharing any word-3-gram with the
         TEST split are scrubbed; the held-out shingle set is the small
         join side (broadcast-shaped at scale);
      5. sequence packing — contiguous 2048-token bins per
         (split, lang, shard) via one window cumsum, shard count is the
         parallelism/skew dial.

    Output: per (split, lang) doc/token/bin totals (+ id-sum membership
    check). Every stage reuses an operator whose own registry entry is
    independently bit-exact vs DuckDB; this entry proves the COMPOSITION
    stays exact. Shuffle budget at 100 TB: gate rides the scan; dedup,
    decontam-groupBy and packing are one hash shuffle each — no stage is
    quadratic and no key concentrates more than a shard's documents."""
    from pyspark.sql.window import Window

    from whisper_pandas_spark.functions.text import tokenize
    from whisper_pandas_spark.operators.decontam import ngram_contamination
    from whisper_pandas_spark.operators.packing import pack_bins
    from whisper_pandas_spark.operators.textstats import quality_gate_filter
    from whisper_pandas_spark.stage import stage_materialize

    docs = _table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    gated = quality_gate_filter(docs, "doc_id", "text")
    w = Window.partitionBy(F.sha2(F.col("text"), 256))
    deduped = (
        gated.withColumn("__keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__keep"))
        .drop("__keep")
    )
    # eager stage barrier, not persist: the frame feeds FOUR downstream
    # consumers in the RETURNED lazy plan (train twice, heldout, the
    # non-train union), and the caller has no handle to unpersist — a
    # persist here would pin a fresh copy in the CacheManager on every
    # bench rep / driver run (the round-11 ADVICE leak class; checkpoint
    # blocks are GC-released with the DataFrame). stage_materialize
    # binds to a RELIABLE checkpoint when the cluster configures one.
    assigned = stage_materialize(
        split_assign(deduped, "doc_id", TEST_FRAC, VAL_FRAC)
    )
    train = assigned.filter(F.col("split") == "train")
    heldout = assigned.filter(F.col("split") == "test")
    # Decontam stays the TWO-pass form after a measured round-15
    # experiment (tools/r15_decontam_probe.py, tools/r15_corpus_ab.py):
    # fusing both sides into one carry_cols shingle pass behind a
    # checkpoint was result-identical and ~parity locally (interleaved
    # full-entry A/B old 2.31/2.45 vs fused 2.19/2.49 best/median), but
    # the fused form materializes a corpus-sized (doc_id, hh) table to
    # save NO shingle compute (both forms shingle the same 90% of docs
    # exactly once) — at 100 TB that is extra executor-storage pressure
    # for one saved stage launch, so the two-pass shape wins.
    dirty = ngram_contamination(train, heldout).select("doc_id")
    corpus = train.join(dirty, "doc_id", "left_anti").unionByName(
        assigned.filter(F.col("split") != "train")
    )
    corpus = corpus.withColumn("blk", F.concat_ws("|", "split", "lang"))
    binned = pack_bins(
        corpus,
        "doc_id",
        F.size(tokenize("text")),
        "blk",
        PACK_BUDGET,
        n_shards=PACK_SHARDS,
    )
    out = (
        binned.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_ids"),
            F.sum("n_tok").alias("n_tokens"),
            F.countDistinct(
                F.col("shard").cast("bigint") * F.lit(1000000000)
                + F.col("bin_id")
            ).alias("n_bins"),
        )
        .orderBy("split", "lang")
    )
    out._wps_cached = [assigned]
    return out
