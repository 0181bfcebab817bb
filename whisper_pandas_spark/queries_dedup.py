"""Registry entries: deduplication family over `documents` (X1/X2).

Oracle strategy per entry:

- dedup_exact        : independent SQL (GROUP BY text) — algorithm-free.
- dedup_minhash_lsh  : full algorithm replication in DuckDB SQL (LSH has
  false negatives by design, so ground-truth all-pairs would NOT match;
  the md5 hash family is engine-portable, so the replication is exact).
- dedup_simhash      : algorithm replication (60 generated bit votes).
- dedup_simhash_pairs: INDEPENDENT oracle — brute-force O(n²) hamming
  pairs. The Spark side uses pigeonhole banding, which provably has no
  false negatives at hamming ≤ 3 over 4 bands, so the two different
  algorithms must agree exactly.
- dedup_ngram_jaccard: independent oracle (same math, different join
  shape: Spark blocks by lang, oracle runs lang-partitioned all-pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisper_pandas_spark.functions.text import (
    DUCK_SHINGLES as _DUCK_SHINGLES,
    DUCK_TOKS as _DUCK_TOKS,
    HASH_HEX_CHARS,
    duck_base_hash32,
    duck_minhash_pairs_ctes,
)
from whisper_pandas_spark.operators.dedup import (
    SIMHASH_BITS,
    exact_dedup,
    lsh_pairs,
    minhash_signature_arrow,
    ngram_jaccard_pairs,
    release_cached,
    simhash_arrow,
    simhash_pairs,
)
from whisper_pandas_spark.registry import _table, register


def _finalize(df: DataFrame, *extra_cached: DataFrame) -> DataFrame:
    """Materialize the (small) pair result eagerly, then unpersist every
    cached intermediate: the signature/fingerprint caches would otherwise
    stay pinned by Spark's CacheManager for the life of the session. The
    checkpointed result blocks are GC-managed, so downstream collects
    still reuse them without a leak."""
    out = df.localCheckpoint(eager=True)
    release_cached(df)
    for c in extra_cached:
        c.unpersist()
    return out

NUM_PERM = 12
BANDS = 4
ROWS = 3
JACCARD_T = 0.8

def _minhash_pairs_ctes() -> str:
    """CTE chain ending in ``mh_pairs (doc_i, doc_j, jaccard)`` — the full
    MinHash→LSH→verify replication (functions/text.py builds it; shared
    with the streaming replay oracle), instantiated at this module's
    parameters so the pair/component/canonical oracles agree."""
    return duck_minhash_pairs_ctes(NUM_PERM, BANDS, ROWS, JACCARD_T)


def _minhash_oracle() -> str:
    return f"""
WITH {_minhash_pairs_ctes()}
SELECT doc_i, doc_j, jaccard FROM mh_pairs ORDER BY doc_i, doc_j
"""


def _components_ctes() -> str:
    """Recursive transitive closure over mh_pairs → ``comp (node, comp)``
    with comp = min reachable node id (the oracle twin of
    operators/components.py's min-label propagation)."""
    return f"""{_minhash_pairs_ctes()},
edges AS (
  SELECT doc_i AS a, doc_j AS b FROM mh_pairs
  UNION
  SELECT doc_j AS a, doc_i AS b FROM mh_pairs
), reach AS (
  SELECT a AS node, a AS comp FROM edges
  UNION
  SELECT e.b AS node, r.comp FROM reach r JOIN edges e ON e.a = r.node
), comp AS (
  SELECT node, min(comp) AS comp FROM reach GROUP BY node
)"""


def _simhash_cte() -> str:
    """CTE producing (doc_id, simhash) — 60 generated bit votes."""
    hash_expr = (
        f"list_transform(t, x -> ('0x' || substr(md5(x), 1, {HASH_HEX_CHARS}))::BIGINT)"
    )
    votes = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hashes, h -> "
        f"CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
), hashed AS (
  SELECT doc_id, {hash_expr} AS hashes FROM toks
), sh AS (
  SELECT doc_id, {votes} AS simhash FROM hashed
)"""


@register(
    "dedup_exact",
    oracle="""
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY text ORDER BY keep_id
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: content-hash exact dedup. One shuffle on a uniform sha2 key —
    skew-free at any scale; map-side partial agg halves the shuffle."""
    return exact_dedup(
        _table(spark, sf_dir, "documents"), "text", "doc_id"
    ).orderBy("keep_id")


@register("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: MinHash(12 perms) → LSH(4 bands × 3 rows) → exact-Jaccard
    verify at 0.8. Sub-quadratic: the only O(pairs) work happens inside
    hash buckets. Signatures are narrow/shuffle-free; the bucket shuffle
    carries (doc_id, band, 16-byte key) rows only."""
    # Direct pipeline (not the shared checkpoint): this entry is the
    # HEADLINE bench for MinHash-LSH, so its timing must cover signatures
    # + banding + verification, not a pair-table read. persist: the
    # signature subtree is consumed 3× downstream (buckets + both
    # verification sides); at cluster scale this materialization would be
    # a write of the signature table — the same pipeline shape.
    docs = _table(spark, sf_dir, "documents")
    sig = minhash_signature_arrow(docs, "doc_id", "text", NUM_PERM).persist()
    return _finalize(
        lsh_pairs(sig, BANDS, ROWS, JACCARD_T).orderBy("doc_i", "doc_j"), sig
    )


@register(
    "dedup_simhash",
    oracle=f"""
WITH {_simhash_cte().lstrip()}
SELECT doc_id, simhash FROM sh ORDER BY doc_id
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: 60-bit Charikar SimHash per doc — shuffle-free, Arrow-batched
    (numpy bit matrix; the expression path's 60 interpreted bit-vote folds
    are the regression-tested slow twin)."""
    return simhash_arrow(
        _table(spark, sf_dir, "documents"), "doc_id", "text"
    ).orderBy("doc_id")


@register(
    "dedup_simhash_pairs",
    oracle=f"""
WITH {_simhash_cte().lstrip()}
SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_i, doc_j
""",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: near-dup pairs at hamming ≤ 3 via 4×15-bit pigeonhole banding
    (no false negatives ⟹ equals the oracle's brute force). The banded
    join is an equi-join on a 15-bit key instead of an O(n²) cross join."""
    pairs = simhash_pairs(
        _table(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )
    # _wps_cached lives on the operator's own result, not on the orderBy
    return _finalize(pairs.orderBy("doc_i", "doc_j"), *getattr(pairs, "_wps_cached", []))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, {_DUCK_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id, lang, {_DUCK_SHINGLES} AS s FROM toks
), shf AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(s, x -> {duck_base_hash32("x")})) AS hh
  FROM sh WHERE len(s) > 0
)
SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
  round(len(list_intersect(a.hh, b.hh)) * 1.0
        / len(list_distinct(list_concat(a.hh, b.hh))), 6) AS jaccard
FROM shf a JOIN shf b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.hh, b.hh)) * 1.0
        / len(list_distinct(list_concat(a.hh, b.hh))), 6) >= 0.6
ORDER BY doc_i, doc_j
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 baseline: exact 3-gram Jaccard ≥ 0.6, lang-blocked, computed
    with an INVERTED-INDEX join (pairs materialize only when they share a
    shingle; see ngram_jaccard_pairs — the naive blocked all-pairs was
    interpreter-bound at 102 s/sf0.1, this runs ~1 s). The oracle is the
    INDEPENDENT all-pairs intersect/union formulation — two different
    algorithms, identical jaccard arithmetic over hashed shingle sets."""
    pairs = ngram_jaccard_pairs(
        _table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        block_col="lang",
        threshold=0.6,
    )
    return _finalize(pairs.orderBy("doc_i", "doc_j"), *getattr(pairs, "_wps_cached", []))


@register(
    "dedup_fuzzy_pairs",
    oracle=f"""
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
""",
)
def dedup_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: edit-distance near-dups on the 80-char normalized prefix —
    catches single-character variants that shift every shingle. Spark
    side blocks by lang with a lossless length-difference prefilter and
    a thresholded DP; the oracle is the INDEPENDENT plain all-pairs
    formulation (no prefilter, no threshold). Normalized text is pure
    ASCII, keeping Spark's char-based and DuckDB's byte-based
    levenshtein identical."""
    from whisper_pandas_spark.operators.dedup import fuzzy_pairs

    return (
        fuzzy_pairs(
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


_PAIRS_CACHE: dict[str, DataFrame] = {}


def _minhash_pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified MinHash pairs through the engine pipeline, materialized
    once per process per sf_dir — the pair/component/canonical entries
    all consume the same frame instead of re-running signatures + LSH
    (the cluster-scale twin is the written pair table every dedup stage
    reads). Checkpoint blocks are GC-managed; the signature cache is
    released eagerly."""
    if sf_dir not in _PAIRS_CACHE:
        docs = _table(spark, sf_dir, "documents")
        sig = minhash_signature_arrow(docs, "doc_id", "text", NUM_PERM).persist()
        pairs = lsh_pairs(sig, BANDS, ROWS, JACCARD_T)
        out = pairs.localCheckpoint(eager=True)
        sig.unpersist()
        for c in getattr(pairs, "_wps_cached", []):
            c.unpersist()
        _PAIRS_CACHE[sf_dir] = out
    return _PAIRS_CACHE[sf_dir]


@register(
    "dedup_components",
    oracle=f"""
WITH RECURSIVE {_components_ctes()}
SELECT node AS doc_id, comp AS component FROM comp ORDER BY doc_id
""",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 completion: near-dup PAIRS clustered into components (pairs
    chain — A~B, B~C must dedup as one group). Min-label propagation to a
    fixpoint (operators/components.py): O(diameter) rounds of two uniform
    shuffles each, over only the paired nodes. The oracle is an
    INDEPENDENT algorithm — DuckDB recursive transitive closure — over
    the same replicated MinHash pair set."""
    from whisper_pandas_spark.operators.components import connected_components

    pairs = _minhash_pairs_df(spark, sf_dir)
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    return comp.orderBy("doc_id")


@register(
    "dedup_canonical",
    oracle=f"""
WITH RECURSIVE {_components_ctes()}
SELECT d.doc_id, d.lang FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM comp WHERE node <> comp)
ORDER BY d.doc_id
""",
)
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus itself: every near-dup cluster keeps only
    its min-id member, untouched docs pass through — one left-anti join
    against the (tiny) drop list. This is the operator a training
    pipeline actually calls; components/pairs are its internals."""
    from whisper_pandas_spark.operators.components import canonical_filter

    docs = _table(spark, sf_dir, "documents")
    pairs = _minhash_pairs_df(spark, sf_dir)
    kept = canonical_filter(docs, pairs).select("doc_id", "lang")
    return kept.orderBy("doc_id")


TEST_FRAC = 0.1
VAL_FRAC = 0.1


def _split_case() -> str:
    from whisper_pandas_spark.operators.sampling import (
        BUCKET_SPACE,
        duck_hash_bucket,
    )

    t = int(TEST_FRAC * BUCKET_SPACE)
    v = int(VAL_FRAC * BUCKET_SPACE)
    return f"""CASE
    WHEN {duck_hash_bucket("doc_id")} < {t} THEN 'test'
    WHEN {duck_hash_bucket("doc_id")} < {t + v} THEN 'val'
    ELSE 'train' END"""


@register(
    "decontam_ngram_overlap",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, text, {_split_case()} AS split FROM documents
), toks AS (
  SELECT doc_id, split, {_DUCK_TOKS} AS t FROM assigned
), shing AS (
  SELECT doc_id, split, {_DUCK_SHINGLES} AS s FROM toks
), shf AS (
  SELECT doc_id, split,
         list_distinct(list_transform(s, x -> {duck_base_hash32("x")})) AS hh
  FROM shing WHERE len(s) > 0
), held AS (
  SELECT DISTINCT unnest(hh) AS h FROM shf WHERE split = 'test'
), train_h AS (
  SELECT doc_id, unnest(hh) AS h FROM shf WHERE split = 'train'
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM train_h JOIN held USING (h)
GROUP BY doc_id ORDER BY doc_id
""",
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination (operators/decontam.py) composed with
    the deterministic splitter: flag train docs sharing any 3-gram with
    the test split. The held-out shingle set is the small join side
    (broadcast-shaped at scale); the corpus side is one scan + one
    groupBy."""
    from whisper_pandas_spark.operators.decontam import ngram_contamination
    from whisper_pandas_spark.operators.sampling import split_assign

    docs = _table(spark, sf_dir, "documents")
    assigned = split_assign(docs, "doc_id", TEST_FRAC, VAL_FRAC)
    train = assigned.filter(F.col("split") == "train")
    test = assigned.filter(F.col("split") == "test")
    return ngram_contamination(train, test).orderBy("doc_id")


SPAN_K = 3
SPAN_MIN_RUN = 8
SPAN_MAX_DF = 100

_SPAN_TOKS = (
    "regexp_split_to_array(trim(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g')), ' ')"
)


@register(
    "dedup_substring_spans",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_SPAN_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id, i - 1 AS pos,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, unnest(range(1, greatest(len(t) - {SPAN_K} + 1, 0) + 1)) AS u(i)
), guarded AS (
  SELECT * FROM (
    SELECT doc_id, pos, shingle,
           count(DISTINCT doc_id) OVER (PARTITION BY shingle) AS df
    FROM sh
  ) WHERE df <= {SPAN_MAX_DF}
), anchors AS (
  SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, a.pos AS pos_i,
         a.pos - b.pos AS diag
  FROM guarded a JOIN guarded b USING (shingle)
  WHERE a.doc_id < b.doc_id
), isl AS (
  SELECT doc_i, doc_j, diag, pos_i,
         pos_i - row_number() OVER (PARTITION BY doc_i, doc_j, diag
                                    ORDER BY pos_i) AS grp
  FROM anchors
), runs AS (
  SELECT doc_i, doc_j, diag, grp, count(*) + {SPAN_K} - 1 AS run_tokens
  FROM isl GROUP BY doc_i, doc_j, diag, grp
)
SELECT doc_i, doc_j, max(run_tokens) AS max_run, count(*) AS n_runs
FROM runs GROUP BY doc_i, doc_j
HAVING max(run_tokens) >= {SPAN_MIN_RUN}
ORDER BY doc_i, doc_j
""",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+: exact cross-document substring spans — the suffix-array-style
    training-data dedup signal (longest shared run of >= {SPAN_MIN_RUN}
    consecutive tokens per doc pair), distributed as positional-shingle
    anchors + gaps-and-islands (operators/dedup.py:substring_span_pairs).
    All-integer output; stop-shingle df guard bounds the anchor join."""
    from whisper_pandas_spark.operators.dedup import substring_span_pairs

    return substring_span_pairs(
        _table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        k=SPAN_K,
        min_run=SPAN_MIN_RUN,
        max_df=SPAN_MAX_DF,
    ).orderBy("doc_i", "doc_j")
