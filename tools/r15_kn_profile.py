#!/usr/bin/env python
"""Stage timing of the KN-LM path feeding text_ccnet_buckets (guide §1):
tri checkpoint, c123 checkpoint, type-table assembly, stream join + fold."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("R15_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from whisper_pandas_spark.operators.knlm import (
        kn_score_from_counts,
        trigram_stream,
    )
    from whisper_pandas_spark.queries_round14b import text_ccnet_buckets
    from whisper_pandas_spark.session import get_spark

    spark = get_spark(app_name="r15_kn_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()
    text_ccnet_buckets(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()  # warm

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    for rep in range(2):
        marks = {}
        t0 = time.perf_counter()
        tri = trigram_stream(docs, "doc_id", "text").localCheckpoint(
            eager=True
        )
        marks["tri ckpt"] = time.perf_counter() - t0
        t = time.perf_counter()
        c123 = (
            tri.select("w1", "w2", "w3")
            .groupBy("w1", "w2", "w3")
            .agg(F.count(F.lit(1)).alias("c123"))
            .localCheckpoint(eager=True)
        )
        marks["c123 ckpt"] = time.perf_counter() - t
        t = time.perf_counter()
        kn = kn_score_from_counts(tri, c123, "doc_id")
        kn.write.format("noop").mode("overwrite").save()
        marks["score (typ joins + stream join + fold)"] = (
            time.perf_counter() - t
        )
        t = time.perf_counter()
        text_ccnet_buckets(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        marks["full entry"] = time.perf_counter() - t
        print(f"--- rep {rep} ---")
        for k, v in marks.items():
            print(f"{v:8.3f}s  {k}")
    spark.stop()


if __name__ == "__main__":
    main()
