"""RAKE keyword extraction (Rose, Engel, Cramer, Cowley 2010).

Rapid Automatic Keyword Extraction over a document corpus: candidate
phrases are the maximal runs of non-stopword tokens (islands between
stopword/punctuation delimiters), each word scores deg(w)/freq(w) where
freq counts the word's occurrences inside candidates and deg sums the
lengths of the candidate phrases containing it (the co-occurrence-graph
degree including self), and a phrase scores the sum of its words'
scores. Top phrases by score are the corpus keywords.

Determinism (oracle-parity): the naive Σ deg(w)/freq(w) is a float sum
whose order an engine is free to change — so the phrase score is
computed as ONE exact rational instead:

    score = num / den,
    den = Π freq(w_i),   num = Σ_i deg(w_i) · Π_{j≠i} freq(w_j)

with every product/sum in DECIMAL (positional pivot — phrases are
capped at ``max_phrase_len`` words, so the pivot is a fixed-width
conditional aggregation, no product() aggregate needed) and exactly one
IEEE division at the end. DECIMAL(12,0) inputs bound freq/deg at 1e12
occurrences — beyond any corpus this engine will see per vocabulary
word — keeping the widest product at precision 36 (DuckDB's
multiply-width rule caps at 38).

Scale shape: one posexplode + per-doc window pass builds the islands
(token-count bounded, partitioned by doc); every aggregation after that
is vocabulary- or phrase-bounded with map-side combine; the word-stats
table joins back BROADCAST. No row-at-a-time Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisper_pandas_spark.operators.textstats import STOPWORDS

_DEC = "decimal(12,0)"


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    stopwords: list[str] | None = None,
    max_phrase_len: int = 3,
    top_n: int = 25,
) -> DataFrame:
    """Corpus-level RAKE keywords: (phrase, n_words, occurrences, score),
    the ``top_n`` candidate phrases by score descending (phrase ascending
    tie-break). Islands longer than ``max_phrase_len`` are discarded
    entirely (they contribute neither phrases nor word statistics —
    run-on token streams would otherwise dominate deg)."""
    if not 1 <= max_phrase_len <= 3:
        raise ValueError("max_phrase_len must be in 1..3 (positional pivot)")
    sw = STOPWORDS if stopwords is None else stopwords
    from whisper_pandas_spark.functions.text import tokenize

    pt = df.select(
        F.col(doc_col).alias("doc"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "tok"),
    ).where(F.col("tok") != "")
    w = Window.partitionBy("doc").orderBy("pos")
    nonstop = (
        pt.where(~F.col("tok").isin(*sw))
        .withColumn("g", F.col("pos") - F.row_number().over(w))
    )
    wi = Window.partitionBy("doc", "g")
    isl = nonstop.withColumn("plen", F.count(F.lit(1)).over(wi)).where(
        F.col("plen") <= max_phrase_len
    )
    # word statistics over candidate OCCURRENCES: freq = appearances,
    # deg = Σ length of the containing phrase (self included)
    ws = isl.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    occ = isl.groupBy("doc", "g", "plen").agg(
        F.expr(
            "array_join(array_sort(collect_list(struct(pos, tok))).tok, ' ')"
        ).alias("phrase")
    )
    ph = occ.groupBy("phrase", "plen").agg(
        F.count(F.lit(1)).alias("occurrences")
    )
    pw = ph.select(
        "phrase",
        "plen",
        "occurrences",
        F.posexplode(F.split("phrase", " ")).alias("wpos0", "wtok"),
    ).withColumn("wpos", F.col("wpos0") + 1)
    j = pw.join(
        F.broadcast(ws.withColumnRenamed("tok", "wtok")), "wtok"
    )

    def pick(col: str, p: int):
        return F.max(
            F.when(F.col("wpos") == p, F.col(col).cast(_DEC))
        ).alias(f"{col[0]}{p}")

    pv = j.groupBy("phrase", "plen", "occurrences").agg(
        *[pick(c, p) for p in (1, 2, 3) for c in ("freq", "deg")]
    )
    one = F.lit(1).cast(_DEC)
    zero = F.lit(0).cast(_DEC)
    f1, f2, f3 = F.col("f1"), F.col("f2"), F.col("f3")
    d1 = F.col("d1")
    f2c, f3c = F.coalesce(f2, one), F.coalesce(f3, one)
    d2c, d3c = F.coalesce(F.col("d2"), zero), F.coalesce(F.col("d3"), zero)
    den = f1 * f2c * f3c
    num = d1 * f2c * f3c + d2c * f1 * f3c + d3c * f1 * f2c
    return (
        pv.select(
            "phrase",
            F.col("plen").cast("int").alias("n_words"),
            "occurrences",
            (num.cast("double") / den.cast("double")).alias("score"),
        )
        .orderBy(F.col("score").desc(), "phrase")
        .limit(top_n)
    )
