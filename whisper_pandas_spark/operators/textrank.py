"""BM25 document ranking (X4+): lexical retrieval over the corpus.

The retrieval primitive a training-data pipeline needs beyond dedup —
ranking documents against a term query powers decontamination triage
("which training docs score highest against this benchmark question"),
targeted corpus audits, and quality-weighted sampling. Reference parity:
the reference engine (whisper_pandas.py, 299 lines) has no text surface;
this extends SURVEY.md §2.10 X4.

Spark-first shape (scales to 100 TB):

- Doc lengths + corpus stats (N, total token count) come from ONE
  scan-shaped pass; N and avgdl reach the scorer as a broadcast scalar
  row, never a driver round-trip.
- The exploded token stream is filtered to the |Q| query terms BEFORE
  any shuffle — the (doc, term) traffic is O(matching tokens), not
  O(all tokens).
- tf = groupBy(doc_id, term) with map-side partial aggregation; df per
  term is a |Q|-row frame joined back by BROADCAST.
- Per-doc scores sum ≤ |Q| contributions. The sum runs in
  DECIMAL(38,12) (associative, partition-order-independent — same
  determinism pattern as kmeans_cosine's means), so scores are
  bit-identical under any partitioning and engine-portable.
- Top-k resolves to TakeOrderedAndProject (sort-limit pushdown), then
  ranks the ≤k survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisper_pandas_spark.functions.text import tokenize

K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    topk: int = 20,
    k1: float = K1,
    b: float = B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 against a SET of query terms (duplicates
    in *query_terms* are ignored — each distinct term scores once).

    Returns (doc_id, n_terms, score, rnk): n_terms = how many distinct
    query terms the doc contains, score rounded to 6 dp, rnk 1..k with
    deterministic ties (score desc, doc_id asc).

    idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)   [Robertson/Lucene]
    w(t, d) = idf * tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("toks")
    )
    # corpus stats: exact integer sums -> avgdl is deterministic
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("total_len"),
    )
    pairs = (
        toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*query_terms))
    )
    tf = pairs.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfq"))

    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("dfq") + F.lit(0.5)) / (F.col("dfq") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfv = F.col("tf").cast("double")
    contrib = idf * (
        tfv * F.lit(k1 + 1.0)
        / (tfv + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
    )
    per_doc = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(
                F.sum(contrib.cast("decimal(38,12)")).cast("double"), 6
            ).alias("score"),
        )
    )
    top = per_doc.orderBy(F.col("score").desc(), "doc_id").limit(topk)
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "doc_id", "n_terms", "score", "rnk"
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    min_df: int = 1,
) -> DataFrame:
    """Per-document TF-IDF keyword extraction:
    (doc_id, term, tf, df, score, rnk) for each document's top-*k*
    terms by ``tf * ln((N + 1) / (df + 1))`` (the smoothed idf — never
    negative, engine-portable ln), ties by term.

    Scale shape mirrors BM25's: one (doc, term) partial-agg exchange
    for tf, one term-keyed aggregate for df (broadcast back — the
    vocabulary is Zipf-small), corpus size N is a 1-row broadcast, and
    the per-doc top-k compiles to WindowGroupLimit (map-side rank
    pruning — a hot document moves ~k rows per partition, not its
    vocabulary). ``min_df`` drops hapax noise before ranking.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # N rides as a broadcast 1-row frame (bm25_topk's form) — no eager
    # driver-side count, no extra corpus scan, the plan stays lazy
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).alias("__n_docs")
    )
    scored = (
        tf.join(F.broadcast(dfreq.filter(F.col("df") >= min_df)), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("__n_docs").cast("double") + 1)
                    / (F.col("df") + 1)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )
