#!/usr/bin/env python
"""A/B the KN per-doc logprob fold: current collect_list+array_sort+
interpreted aggregate HOF vs a window running-sum (sequential adds in
pos order — bit-identical) finished by max_by, vs an applyInPandas
np.cumsum. Verifies exact value equality before timing."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("R15_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from whisper_pandas_spark.operators.knlm import (
        kn_score_from_counts,
        trigram_stream,
    )
    from whisper_pandas_spark.session import get_spark

    spark = get_spark(app_name="r15_knfold_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    tri = trigram_stream(docs, "doc_id", "text").localCheckpoint(eager=True)
    c123 = (
        tri.select("w1", "w2", "w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c123"))
        .localCheckpoint(eager=True)
    )
    # scored stream, materialized so the fold variants time ONLY the fold
    full = kn_score_from_counts(tri, c123, "doc_id")
    # rebuild 'scored' exactly as kn_score_from_counts does, by reaching
    # into the module for the type table — simplest: recompute scored
    # via the same function but stop before the fold. Copy of the
    # internals kept in sync with operators/knlm.py.
    import whisper_pandas_spark.operators.knlm as knlm

    d = knlm.KN_DISCOUNT
    ctx12 = c123.groupBy("w1", "w2").agg(
        F.sum("c123").alias("c12"), F.count(F.lit(1)).alias("n1p_12dot")
    )
    n1p_dot23 = c123.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("n1p_dot23"))
    mid = c123.groupBy("w2").agg(
        F.count(F.lit(1)).alias("n1p_dot2dot"),
        F.countDistinct("w3").alias("n1p_2dot"),
    )
    cont = n1p_dot23.groupBy("w3").agg(F.count(F.lit(1)).alias("n1p_dotw3"))
    n_types = n1p_dot23.agg(F.count(F.lit(1)).alias("n_bigram_types"))
    typ = (
        c123.join(ctx12, ["w1", "w2"])
        .join(n1p_dot23, ["w2", "w3"])
        .join(mid, ["w2"])
        .join(cont, ["w3"])
        .crossJoin(F.broadcast(n_types))
    )
    pc = F.col("n1p_dotw3").cast("double") / F.col("n_bigram_types").cast("double")
    p2 = (
        F.greatest(F.col("n1p_dot23").cast("double") - F.lit(d), F.lit(0.0))
        / F.col("n1p_dot2dot").cast("double")
        + F.lit(d) * F.col("n1p_2dot").cast("double")
        / F.col("n1p_dot2dot").cast("double") * pc
    )
    p3 = (
        F.greatest(F.col("c123").cast("double") - F.lit(d), F.lit(0.0))
        / F.col("c12").cast("double")
        + F.lit(d) * F.col("n1p_12dot").cast("double")
        / F.col("c12").cast("double") * p2
    )
    typ_lp = typ.select("w1", "w2", "w3", F.log(p3).alias("lp"))
    scored = (
        tri.join(typ_lp, ["w1", "w2", "w3"])
        .select(F.col("doc_id"), "pos", "lp")
        .localCheckpoint(eager=True)
    )

    def fold_hof():
        return scored.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.expr(
                "round(aggregate(array_sort(collect_list(struct(pos, lp))),"
                " cast(0.0 as double), (acc, s) -> acc + s.lp), 6)"
            ).alias("logprob"),
        )

    def fold_window():
        w = (
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = scored.select(
            "doc_id", "pos", F.sum("lp").over(w).alias("cum")
        )
        return cum.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(F.max_by("cum", "pos"), 6).alias("logprob"),
        )

    def fold_arrow():
        import numpy as np
        import pandas as pd

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("pos", kind="mergesort")
            s = np.cumsum(pdf["lp"].to_numpy(dtype=np.float64))[-1]
            return pd.DataFrame(
                {"doc_id": [pdf["doc_id"].iloc[0]], "n_trigrams": [len(pdf)],
                 "raw": [s]}
            )

        out = scored.groupBy("doc_id").applyInPandas(
            fold, "doc_id long, n_trigrams long, raw double"
        )
        return out.select(
            "doc_id", "n_trigrams", F.round("raw", 6).alias("logprob")
        )

    a = {r.doc_id: (r.n_trigrams, r.logprob) for r in fold_hof().collect()}
    b = {r.doc_id: (r.n_trigrams, r.logprob) for r in fold_window().collect()}
    c = {r.doc_id: (r.n_trigrams, r.logprob) for r in fold_arrow().collect()}
    print("window == hof:", a == b, " arrow == hof:", a == c, len(a))

    for name, fn in (("hof", fold_hof), ("window", fold_window), ("arrow", fold_arrow)):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{name}: best={ts[0]:.3f} median={ts[2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
