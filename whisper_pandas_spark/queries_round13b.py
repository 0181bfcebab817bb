"""Registry entries: round 13b (post-sweep extension wave).

- text_token_entropy       per-doc Shannon entropy / TTR / Simpson with
                           the pinned-log2 bit-identity contract
- text_dsir_weights        DSIR hashed-unigram importance log-ratios
                           (Xie et al. 2023) target=en vs raw
- sample_temperature_lang  UniMax/mT5 sqrt-temperature language
                           rebalancing, exact integer-vs-double gate
- stream_bottomk_replay    streaming per-group bottom-k uniform sample
                           maintenance — idempotent set-merge law,
                           double-pass replay proof
- dedup_semdedup           SemDeDup (Abbas et al. 2023): exact-integer
                           cosine dedup inside int8-kmeans cells; the
                           oracle replays clustering AND the pairwise
                           gate value-exactly
- text_dsir_resample       the selection half of DSIR: Efraimidis-
                           Spirakis resampling over exp(logratio)
- pipeline_curation_end_to_end  PII -> entropy gate -> exact dedup ->
                           temperature rebalance, one planted failure
                           population per stage, whole chain in one
                           oracle
- ingest_warc_roundtrip    the CommonCrawl WARC container (sources/
                           warc.py), per-record gzip members, one task
                           per file both ways

No reference-repo parity: whisper_pandas (reference, 299-line .wsp
decoder) has no text/embedding surface; these back SURVEY.md §2
extension rows Y148-Y153 and Y155-Y156 (Y154, the partition-prune
layout entry, lives in queries_materialize.py with its family). A
PII-redaction entry already exists from round 5: text_pii_redact,
operators/redact.py — checked BEFORE building; see the registry-
saturation note in .claude/skills/verify/SKILL.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whisper_pandas_spark.registry import _table, register

# ---------------------------------------------------------------------------
# text_token_entropy
# ---------------------------------------------------------------------------


def _entropy_oracle() -> str:
    from whisper_pandas_spark.operators.lexical import log2_values_sql

    toks = (
        "regexp_split_to_array(trim(regexp_replace(lower(text),"
        "'[^a-z0-9]+', ' ', 'g')), ' ')"
    )
    return f"""
WITH l2(i, l2) AS (VALUES {log2_values_sql()}),
toks AS (
  SELECT doc_id, unnest(list_filter({toks}, x -> x != '')) AS tok
  FROM documents
), c AS (
  SELECT doc_id, tok, CAST(count(*) AS INT) AS c
  FROM toks GROUP BY doc_id, tok
), t AS (
  SELECT c.doc_id, c.tok, c.c, CAST(c.c AS DOUBLE) * l2.l2 AS term
  FROM c LEFT JOIN l2 ON l2.i = c.c
), a AS (
  SELECT doc_id,
    CAST(sum(c) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS n_types,
    CAST(sum(CAST(c AS BIGINT) * c) AS BIGINT) AS c2,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY tok)),
                (x, y) -> x + y) AS tsum
  FROM t GROUP BY doc_id
)
SELECT a.doc_id, a.n_tokens, a.n_types,
  round(l2n.l2 - a.tsum / CAST(a.n_tokens AS DOUBLE) + 1e-9, 6) AS entropy,
  round(CAST(a.n_types AS DOUBLE) / CAST(a.n_tokens AS DOUBLE) + 1e-9, 6)
    AS ttr,
  round(CAST(a.c2 AS DOUBLE)
        / (CAST(a.n_tokens AS DOUBLE) * CAST(a.n_tokens AS DOUBLE))
        + 1e-9, 6) AS simpson
FROM a LEFT JOIN l2 l2n ON l2n.i = a.n_tokens
ORDER BY doc_id
"""


@register("text_token_entropy", oracle=_entropy_oracle())
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: per-document lexical-diversity profile
    (operators/lexical.py) — Shannon entropy (bits/token), type/token
    ratio, Simpson repetition index. The pinned-log2 contract makes
    every pre-rounding double BIT-IDENTICAL cross-engine (both engines
    read the same repr'd log2 literals; per-doc sums are sorted-order
    left folds, never engine-ordered SUMs). Plan: one narrow explode,
    two keyed partial-agg exchanges, one constant-size broadcast."""
    from whisper_pandas_spark.operators.lexical import token_entropy

    docs = _table(spark, sf_dir, "documents")
    return token_entropy(docs, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# text_dsir_weights
# ---------------------------------------------------------------------------


def _dsir_oracle() -> str:
    toks = (
        "regexp_split_to_array(trim(regexp_replace(lower(text),"
        "'[^a-z0-9]+', ' ', 'g')), ' ')"
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
         ('0x' || substr(md5('dsir:' || tok), 1, 15))::BIGINT % 256 AS b
  FROM (
    SELECT doc_id, lang, unnest(list_filter({toks}, x -> x != '')) AS tok
    FROM documents
  )
), model AS (
  SELECT b, CAST(sum(is_t) AS BIGINT) AS ct_t,
         CAST(count(*) AS BIGINT) AS ct_r
  FROM toks GROUP BY b
), tot AS (
  SELECT CAST(sum(ct_t) AS BIGINT) AS tt, CAST(sum(ct_r) AS BIGINT) AS tr
  FROM model
), lw AS (
  SELECT b, ln(CAST(ct_t + 1 AS DOUBLE)) - ln(CAST(tt + 256 AS DOUBLE))
          - ln(CAST(ct_r + 1 AS DOUBLE)) + ln(CAST(tr + 256 AS DOUBLE)) AS lw
  FROM model, tot
), per AS (
  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS n
  FROM toks GROUP BY doc_id, b
), sc AS (
  SELECT per.doc_id,
    CAST(sum(n) AS BIGINT) AS n_tokens,
    list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
                   list(CAST(n AS DOUBLE) * lw.lw ORDER BY per.b)),
      (x, y) -> x + y) AS score
  FROM per JOIN lw USING (b) GROUP BY per.doc_id
)
SELECT d.doc_id,
  coalesce(sc.n_tokens, 0) AS n_tokens,
  round(coalesce(sc.score, 0.0) + 1e-9, 6) AS dsir_logratio
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
ORDER BY d.doc_id
"""


@register("text_dsir_weights", oracle=_dsir_oracle())
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: DSIR importance weights (operators/dsir.py; Xie et al.
    2023) — hashed-unigram (B=256) log-likelihood ratio of the target
    subcorpus (lang='en') vs the raw corpus, summed per document via a
    sorted-bucket left fold. Counts/buckets are exact integers; the
    ln() calls are the only transcendentals (the established biased-
    round-6 budget). Plan: one explode feeding BOTH models through
    conditional aggregation, constant-size weight broadcast, one
    (doc, bucket) exchange."""
    from whisper_pandas_spark.operators.dsir import dsir_weights

    docs = _table(spark, sf_dir, "documents")
    return dsir_weights(
        docs, "doc_id", "text", F.col("lang") == "en"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# sample_temperature_lang
# ---------------------------------------------------------------------------

_TEMP_N_TARGET = 300
_TEMP_SEED = 7


def _temp_oracle() -> str:
    return f"""
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY lang
), s AS (
  SELECT list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
                 list(sqrt(CAST(c AS DOUBLE)) ORDER BY lang)),
    (x, y) -> x + y) AS s
  FROM c
), r AS (
  SELECT lang,
    least(1.0, {float(_TEMP_N_TARGET)} * (sqrt(CAST(c AS DOUBLE)) / s.s)
               / CAST(c AS DOUBLE)) AS rate
  FROM c, s
)
SELECT d.doc_id, d.lang,
  round(r.rate + 1e-9, 6) AS sample_rate,
  (CAST(('0x' || substr(md5('{_TEMP_SEED}:' || CAST(d.doc_id AS VARCHAR)),
                        1, 8))::BIGINT AS DOUBLE)
   < r.rate * 4294967296.0) AS kept
FROM documents d JOIN r USING (lang)
ORDER BY doc_id
"""


@register("sample_temperature_lang", oracle=_temp_oracle())
def sample_temperature_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling+: UniMax/mT5 sqrt-temperature language rebalancing
    (operators/sampling.py:temperature_rebalance) — per-language keep
    rates from observed counts at tau=2, gated per doc by the
    deterministic md5 draw. The kept SET replays bit-for-bit (sqrt is
    IEEE-exact, the rate-table sum is a name-ordered fold, the gate is
    an exact integer-vs-double compare); only the REPORTED rate is
    rounded. Plan: one group-count exchange (rows out = #languages),
    broadcast rate join, codegen filter — the bulk never shuffles."""
    from whisper_pandas_spark.operators.sampling import temperature_rebalance

    docs = _table(spark, sf_dir, "documents")
    out = temperature_rebalance(
        docs, "lang", "doc_id", n_target=_TEMP_N_TARGET, seed=_TEMP_SEED
    )
    return out.select("doc_id", "lang", "sample_rate", "kept").orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# stream_bottomk_replay
# ---------------------------------------------------------------------------

_BK_K = 16


def _bottomk_oracle() -> str:
    return f"""
WITH h AS (
  SELECT lang AS grp, doc_id,
    ('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM documents
), r AS (
  SELECT grp, doc_id, h,
    row_number() OVER (PARTITION BY grp ORDER BY h, doc_id) AS rn
  FROM h
)
SELECT grp, doc_id, h FROM r WHERE rn <= {_BK_K}
ORDER BY grp, h, doc_id
"""


@register("stream_bottomk_replay", oracle=_bottomk_oracle())
def stream_bottomk_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9+: streaming per-group bottom-k uniform-sample maintenance
    (streaming/sketches.py:stream_bottomk_update) replayed end-to-end —
    per-batch hashing, bottom-k set-merge into versioned state, then
    the WHOLE stream deliberately reprocessed through a second
    checkpoint-less pass: bottom-k over a union is idempotent
    (bk(S∪S)=bk(S)), so the double-processed state still equals the
    direct batch bottom-k the oracle computes — the sampling face of
    the HLL/Bloom/KMV idempotent-merge family, vs the marker-protected
    additive CMS/KN. State is O(groups x k); the per-batch window runs
    over (prior ∪ batch), never the stream's history."""
    import tempfile

    from whisper_pandas_spark.operators.merge import current_version_path
    from whisper_pandas_spark.streaming.sketches import stream_bottomk_update

    items = (
        _table(spark, sf_dir, "documents")
        .select(F.col("lang").alias("grp"), "doc_id")
        .withColumn("row_id", F.monotonically_increasing_id())
    )
    d = tempfile.mkdtemp(prefix="wps_bkstream_")
    items.filter(F.col("row_id") % 2 == 0).drop("row_id").coalesce(
        1
    ).write.parquet(f"{d}/changes/f1")
    items.filter(F.col("row_id") % 2 == 1).drop("row_id").coalesce(
        1
    ).write.parquet(f"{d}/changes/f2")

    def run_pass(ckpt: str) -> None:
        sdf = (
            spark.readStream.schema("grp string, doc_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/changes/*")
        )
        q = stream_bottomk_update(
            sdf, f"{d}/state", ("grp",), "doc_id", k=_BK_K, checkpoint_dir=ckpt
        )
        q.processAllAvailable()
        q.stop()

    run_pass(f"{d}/ckpt1")
    # full reprocess with a FRESH checkpoint: harmless by idempotence
    run_pass(f"{d}/ckpt2")
    state = spark.read.parquet(current_version_path(f"{d}/state"))
    return state.select("grp", "doc_id", "h").orderBy("grp", "h", "doc_id")


# ---------------------------------------------------------------------------
# dedup_semdedup
# ---------------------------------------------------------------------------
# Fixture: the full `embeddings` table (500 rows at sf0.01 / 2000 at
# sf0.1 — small enough that the oracle's in-cell pair join is cheap),
# plus two planted near-dup strata — % 8 == 0 re-enters VERBATIM as
# vec_id + 1e6 (code-space cosine exactly 1), % 8 == 4 re-enters as
# vec_id + 2e6 with dim0 shifted by +0.25 (a real perturbation:
# different codes, cosine ~0.98-0.99). All fixture arithmetic is
# float->double widening plus one exactly-representable +0.25 — no
# engine-dependent float path.

_SD_K = 32
_SD_ITERS = 2
_SD_DIM = 64


def _sd_dist(vq: str, cq: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT,"
        f" list_transform(range(1, {_SD_DIM} + 1),"
        f" i -> ({vq}[CAST(i AS INT)] - {cq}[CAST(i AS INT)])"
        f" * ({vq}[CAST(i AS INT)] - {cq}[CAST(i AS INT)]))),"
        " (a, x) -> a + x)"
    )


def _semdedup_oracle() -> str:
    from whisper_pandas_spark.operators.semdedup import THETA_DEN, THETA_NUM
    from whisper_pandas_spark.queries_embeddings import (
        _duck_codes,
        _duck_isum,
        _duck_scale,
    )

    k, dim = _SD_K, _SD_DIM
    dbl = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    ctes = [
        f"""fix AS (
  SELECT vec_id, {dbl} AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, {dbl} FROM embeddings WHERE vec_id % 8 = 0
  UNION ALL
  SELECT vec_id + 2000000,
         list_concat([CAST(embedding[1] AS DOUBLE) + 0.25],
                     list_transform(embedding[2:], x -> CAST(x AS DOUBLE)))
  FROM embeddings WHERE vec_id % 8 = 4
)""",
        f"""codes AS (
  SELECT vec_id, {_duck_codes("e", _duck_scale("e"))} AS q FROM fix
)""",
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, q
  FROM codes ORDER BY vec_id LIMIT {k}
)""",
    ]
    prev = "c0"
    for it in range(1, _SD_ITERS + 1):
        ctes.append(
            f"""a{it} AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT v.vec_id, c.cid,
      row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY {_sd_dist("v.q", "c.q")}, c.cid) AS rn
    FROM codes v CROSS JOIN {prev} c
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""u{it} AS (
  SELECT a.cluster AS cid, CAST(t.d AS INT) AS dim,
    CAST(floor(CAST(CAST(sum(v.q[CAST(t.d + 1 AS INT)]) AS BIGINT) AS DOUBLE)
               / count(*)) AS BIGINT) AS comp
  FROM a{it} a JOIN codes v USING (vec_id)
  CROSS JOIN range(0, {dim}) t(d)
  GROUP BY a.cluster, t.d
)"""
        )
        ctes.append(
            f"""c{it} AS (
  SELECT p.cid, array_agg(coalesce(u.comp, p.q[pd.d + 1]) ORDER BY pd.d) AS q
  FROM {prev} p CROSS JOIN range(0, {dim}) pd(d)
  LEFT JOIN u{it} u ON u.cid = p.cid AND u.dim = pd.d
  GROUP BY p.cid
)"""
        )
        prev = f"c{it}"
    final = _SD_ITERS + 1
    dot = (
        f"list_reduce(list_prepend(0::BIGINT,"
        f" list_transform(range(1, {dim} + 1),"
        f" i -> a.q[CAST(i AS INT)] * b.q[CAST(i AS INT)])),"
        " (x, y) -> x + y)"
    )
    ctes.append(
        f"""a{final} AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT v.vec_id, c.cid,
      row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY {_sd_dist("v.q", "c.q")}, c.cid) AS rn
    FROM codes v CROSS JOIN {prev} c
  ) WHERE rn = 1
)"""
    )
    ctes.append(
        f"""cc AS (
  SELECT a.vec_id, a.cluster, v.q,
         {_duck_isum("list_transform(v.q, x -> x * x)")} AS nn
  FROM a{final} a JOIN codes v USING (vec_id)
)"""
    )
    ctes.append(
        f"""pr AS (
  SELECT b.vec_id AS vid, {dot} AS dot, a.nn AS na, b.nn AS nb
  FROM cc a JOIN cc b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
)"""
    )
    ctes.append(
        f"""drops AS (
  SELECT DISTINCT vid FROM pr
  WHERE dot > 0 AND dot * dot * {THETA_DEN} >= {THETA_NUM} * na * nb
)"""
    )
    return (
        "WITH " + ",\n".join(ctes) + """
SELECT c.vec_id, c.cluster,
  (c.vec_id NOT IN (SELECT vid FROM drops)) AS kept
FROM cc c ORDER BY vec_id
"""
    )


def _sd_fixture(emb: DataFrame) -> DataFrame:
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.select("vec_id", dbl.alias("e"))
    dup_a = emb.filter(F.col("vec_id") % 8 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), dbl.alias("e")
    )
    dup_b = emb.filter(F.col("vec_id") % 8 == 4).select(
        (F.col("vec_id") + 2000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1).cast("double") + 0.25),
            F.slice(dbl, 2, _SD_DIM - 1),
        ).alias("e"),
    )
    return base.unionByName(dup_a).unionByName(dup_b)


@register("dedup_semdedup", oracle=_semdedup_oracle())
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3 composition: SemDeDup (operators/semdedup.py; Abbas et
    al. 2023) — semantic near-dup removal inside exact-integer
    int8-kmeans cells, min-id canonical, with the cosine gate in PURE
    BIGINT arithmetic (theta^2 = 9409/10000) so the dropped set is
    bit-reproducible with no float tolerance. The oracle replays the
    full clustering iteration history AND the in-cell pairwise gate
    value-exactly. Plan: audited kmeans stages + ONE cluster-keyed
    shuffle of (id, int8 codes) into a vectorized int64 Gram pass per
    cell — the cell quadratic is bounded by corpus/k (raise k at
    scale, per the paper), everything across cells is parallel."""
    from whisper_pandas_spark.operators.semdedup import semdedup

    emb = _table(spark, sf_dir, "embeddings")
    fix = _sd_fixture(emb)
    return semdedup(
        fix, "vec_id", "e", k=_SD_K, iters=_SD_ITERS
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# text_dsir_resample — the selection half of the DSIR recipe
# ---------------------------------------------------------------------------

_DSIR_RS_K = 100
_DSIR_RS_SEED = 11


def _dsir_resample_oracle() -> str:
    base = _dsir_oracle().rsplit("ORDER BY d.doc_id", 1)[0]
    return f"""
WITH scored AS ({base}),
keyed AS (
  SELECT doc_id, dsir_logratio,
         exp(ln((('0x' || substr(md5('{_DSIR_RS_SEED}:'
                    || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
                 / 4294967296.0)
             / exp(dsir_logratio)) AS rk
  FROM scored
)
SELECT doc_id, dsir_logratio, round(rk, 12) AS rank_key
FROM keyed ORDER BY rk DESC, doc_id LIMIT {_DSIR_RS_K}
"""


@register("text_dsir_resample", oracle=_dsir_resample_oracle())
def text_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: the SELECTION half of DSIR (Xie et al. 2023 §3: importance
    RESAMPLING) — Efraimidis-Spirakis weighted sample-without-
    replacement (operators/sampling.py:weighted_sample_k) over
    w = exp(dsir_logratio), so inclusion probability tracks the
    importance ratio at every prefix. The weight exponentiates the
    ROUNDED score column — both engines raise e to identical operands
    (the cross-engine exp/ln budget is the established
    sample_weighted_topk precedent). Top-k compiles to
    TakeOrderedAndProject: per-partition heads, no global sort — the
    100 TB shape."""
    from whisper_pandas_spark.operators.dsir import dsir_weights
    from whisper_pandas_spark.operators.sampling import weighted_sample_k

    docs = _table(spark, sf_dir, "documents")
    scored = dsir_weights(docs, "doc_id", "text", F.col("lang") == "en")
    sel = weighted_sample_k(
        scored.withColumn("w", F.exp("dsir_logratio")),
        "doc_id",
        "w",
        k=_DSIR_RS_K,
        seed=_DSIR_RS_SEED,
    )
    return sel.select("doc_id", "dsir_logratio", "rank_key")


# ---------------------------------------------------------------------------
# pipeline_curation_end_to_end — the round-13b gates composed
# ---------------------------------------------------------------------------
# The Dolma/RefinedWeb-style curation funnel built from this round's
# operators plus the round-5 scrubber: PII redaction -> lexical-entropy
# quality gate -> exact min-id dedup on the CLEAN text -> UniMax
# temperature rebalancing over the survivors. The fixture plants one
# failure population per stage so every gate does real work: % 31 == 7
# docs become single-token spam (entropy 0 -> entropy gate), % 20 == 1
# docs take their buddy's text (-> dedup loser), % 5 == 2 docs get an
# email appended (-> PII counter; redaction must make dup pairs
# IDENTICAL again, which is why the dup branch copies the buddy's
# PLANTED text, email and all). The per-doc funnel (pii_found,
# entropy_ok, is_canonical, sample_rate, kept) is the checked value.

# The planted corpus, thresholds, and the full-chain oracle live in
# curation_fixture.py (leaf module) so the round-14 streaming face can
# share them verbatim without a registry import cycle.
from whisper_pandas_spark.curation_fixture import (  # noqa: E402
    _CUR_MIN_H,
    _CUR_MIN_TOKENS,
    _CUR_N_TARGET,
    _CUR_SEED,
    _cur_fixture_sql,
    _curation_oracle,
)

@register("pipeline_curation_end_to_end", oracle=_curation_oracle())
def pipeline_curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline composition of the round-13b gates: PII scrub
    (operators/redact.py, codegen regex) -> lexical-entropy quality
    gate (operators/lexical.py, pinned-log2 contract) -> exact min-id
    dedup on the CLEAN text (dup pairs become identical again only
    after redaction — order matters and the fixture proves it) ->
    UniMax temperature rebalance over the survivors
    (operators/sampling.py). Per-doc funnel is the checked value.
    Shuffle budget: one buddy equi-join (fixture), the entropy
    exchanges, ONE md5-keyed dedup window, one #langs-row count
    exchange + broadcast rate join — document text never shuffles
    after the dedup key is hashed."""
    from whisper_pandas_spark.operators.lexical import token_entropy
    from whisper_pandas_spark.operators.redact import pii_redact
    from whisper_pandas_spark.operators.sampling import temperature_rebalance
    from whisper_pandas_spark.stage import stage_materialize

    docs = _table(spark, sf_dir, "documents")
    buddy = docs.select(
        F.col("doc_id").alias("bid"), F.col("text").alias("btext")
    )
    b0 = docs.join(buddy, F.col("bid") == F.col("doc_id") - 1, "left")
    fix = b0.select(
        "doc_id", "lang", F.expr(_cur_fixture_sql("STRING")).alias("text")
    )
    # Stage-boundary materialization (stage.py:stage_materialize —
    # reliable checkpoint when the context has a checkpoint dir, the
    # cluster deployment mode; eager localCheckpoint otherwise): red
    # feeds BOTH the entropy branch and the funnel frame, gate feeds
    # dedup + the output frame, g2 feeds the survivor counts + the
    # output join — without the barriers each consumer re-evaluates
    # its whole upstream subtree and the plan multiplies to 64 parquet
    # scans of the fixture (measured); with them the corpus is scanned
    # once per stage. SCALE.md "Funnel stage boundaries" has the
    # 100 TB story; test_round14 pins bit-equality under a fresh
    # default-config session with a reliable checkpoint dir.
    red = (
        pii_redact(fix, "doc_id", "text")
        .join(fix.select("doc_id", "lang"), "doc_id")
        .withColumn(
            "pii_found",
            (F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")) > 0,
        )
    )
    red = stage_materialize(red)
    ent = token_entropy(red, "doc_id", "clean_text").select(
        "doc_id", "n_tokens", "entropy"
    )
    # clean_text is only ever consumed as its md5 past this point (the
    # dedup key) — hash it HERE so the gate checkpoint and the dedup
    # window exchange carry a 32-char digest instead of full document
    # text (guide §2.3: shuffle keys, not payloads; round 14).
    gate = red.select(
        "doc_id", "lang", F.md5("clean_text").alias("tkey"), "pii_found"
    ).join(ent, "doc_id", "left")
    gate = gate.withColumn(
        "entropy_ok",
        F.coalesce(
            (F.col("entropy") >= _CUR_MIN_H)
            & (F.col("n_tokens") >= _CUR_MIN_TOKENS),
            F.lit(False),
        ),
    )
    gate = stage_materialize(gate)
    w = Window.partitionBy("tkey").orderBy("doc_id")
    ded = (
        gate.filter("entropy_ok")
        .select("doc_id", "tkey")
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", (F.col("rn") == 1).alias("is_canonical"))
    )
    g2 = (
        gate.join(ded, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "pii_found",
            "entropy_ok",
            F.coalesce("is_canonical", F.lit(False)).alias("is_canonical"),
        )
    )
    g2 = stage_materialize(g2)
    surv = g2.filter("entropy_ok AND is_canonical").select("doc_id", "lang")
    tr = temperature_rebalance(
        surv, "lang", "doc_id", n_target=_CUR_N_TARGET, seed=_CUR_SEED
    ).select("doc_id", "sample_rate", F.col("kept").alias("skept"))
    out = g2.join(tr, "doc_id", "left").select(
        "doc_id",
        "lang",
        "pii_found",
        "entropy_ok",
        "is_canonical",
        F.coalesce("sample_rate", F.lit(0.0)).alias("sample_rate"),
        F.coalesce("skept", F.lit(False)).alias("kept"),
    )
    return out.orderBy("doc_id")


# ---------------------------------------------------------------------------
# ingest_warc_roundtrip — the CommonCrawl container
# ---------------------------------------------------------------------------

# HTTP envelope constant: everything except the Content-Length digits
# and the body itself (kept in ONE place so the oracle replays the
# WARC Content-Length arithmetic exactly).
from whisper_pandas_spark.sources.warc import (  # noqa: E402
    HTTP_ENVELOPE_CONST as _WARC_HTTP_CONST,
)

_WARC_ORACLE = f"""
SELECT doc_id,
  'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
  'response' AS warc_type,
  CAST(200 AS INT) AS http_status,
  CAST({_WARC_HTTP_CONST}
       + length(CAST(octet_length(encode(text)) AS VARCHAR))
       + octet_length(encode(text)) AS BIGINT) AS content_length,
  text AS body
FROM documents ORDER BY doc_id
"""


@register("ingest_warc_roundtrip", oracle=_WARC_ORACLE)
def ingest_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9+: WARC/1.0 container round trip (sources/warc.py) — the
    CommonCrawl format itself: documents written as one-gzip-member-
    per-record `.warc.gz` shards (the CC layout), then re-opened
    through the binaryFile -> Arrow record parser. One task per WARC
    file both ways — the published parallel unit at crawl scale (a
    crawl is ~100k independent files; in-file offsets aren't seekable
    without a scan). The oracle replays the HTTP-envelope
    Content-Length arithmetic byte-exactly, so the value hash proves
    the container headers, not just the payload text."""
    import tempfile

    from whisper_pandas_spark.sources.warc import read_warc, write_warc

    docs = _table(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="wps_warc_")
    # file count IS the parallelism for WARC (one task per file, both
    # directions) — size shards to ~4k records like a real crawl sizes
    # to ~1 GiB members (measured: 4 fixed files at the sf1 stress =
    # 14 s; scaled shards = 1.7 s; output is shard-count invariant)
    n_files = max(4, (docs.count() + 3999) // 4000)
    write_warc(
        docs, d, "doc_id", "text", num_files=n_files, compression="gzip"
    )
    rec = read_warc(spark, d).filter(F.col("warc_type") == "response")
    return rec.select(
        F.regexp_replace("record_id", "^doc-", "")
        .cast("bigint")
        .alias("doc_id"),
        "target_uri",
        "warc_type",
        "http_status",
        "content_length",
        F.col("body"),
    ).orderBy("doc_id")
