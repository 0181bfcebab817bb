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
