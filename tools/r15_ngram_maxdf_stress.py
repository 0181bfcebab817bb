#!/usr/bin/env python
"""VERDICT r14 #6: demonstrate the ngram_jaccard posting-list hot-key
story at sf1. Runs ngram_jaccard_pairs (lang-blocked, threshold 0.6 —
the dedup_ngram_jaccard configuration) at /tmp/testdata_sf1 with
max_df=None (the entry's exact default) vs a capped index, reporting
wall time, posting/pair fan-out, and the recall delta of the cap."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = os.environ.get("SF", "/tmp/testdata_sf1")
CAP = int(os.environ.get("CAP", "1000"))


def main() -> None:
    from pyspark.sql import functions as F

    from whisper_pandas_spark.operators.dedup import (
        ngram_jaccard_pairs,
        release_cached,
        shingle_hashes_arrow,
    )
    from whisper_pandas_spark.session import get_spark

    spark = get_spark(app_name="r15_ngram_maxdf")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    # posting-key fan-out census: how hot is the hottest shingle?
    hashed = shingle_hashes_arrow(docs, "doc_id", "text", 3, carry_cols=("lang",))
    dfreq = (
        hashed.select("lang", F.explode("hh").alias("h"))
        .groupBy("lang", "h")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    stats = dfreq.agg(
        F.count(F.lit(1)).alias("keys"),
        F.max("df").alias("max_df"),
        F.expr("percentile_approx(df, 0.999)").alias("p999"),
        F.sum(F.col("df") * F.col("df")).alias("sum_df2"),
        F.sum(
            F.when(F.col("df") > CAP, F.col("df") * F.col("df")).otherwise(0)
        ).alias("sum_df2_over_cap"),
    ).collect()[0]
    print(
        f"posting keys={stats['keys']} max_df={stats['max_df']} "
        f"p999={stats['p999']} sum_df^2={stats['sum_df2']} "
        f"share_from_keys_over_cap={stats['sum_df2_over_cap']/stats['sum_df2']:.4f}"
    )

    results = {}
    for label, cap in (("max_df=None (exact)", None), (f"max_df={CAP}", CAP)):
        ts, n = [], None
        for _ in range(2):
            t0 = time.perf_counter()
            pairs = ngram_jaccard_pairs(
                docs, "doc_id", "text", block_col="lang",
                threshold=0.6, max_df=cap,
            )
            n = pairs.count()
            release_cached(pairs)
            ts.append(round(time.perf_counter() - t0, 2))
        results[label] = (sorted(ts), n)
        print(f"{label}: times={sorted(ts)} pairs={n}")
    exact_n = results["max_df=None (exact)"][1]
    cap_n = results[f"max_df={CAP}"][1]
    print(
        f"recall of capped index vs exact: {cap_n}/{exact_n}"
        + (f" = {cap_n/exact_n:.4f}" if exact_n else " (no pairs)")
    )
    spark.stop()


if __name__ == "__main__":
    main()
