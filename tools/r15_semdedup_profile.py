#!/usr/bin/env python
"""Stage-level timing of dedup_semdedup's jobs at sf0.1 (guide §1):
quantize+checkpoint, init collect, per-iteration comp collect, final
assign + cell stage. Run after a warm-up rep so JVM/codegen cost does
not masquerade as stage cost."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("R15_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from whisper_pandas_spark.operators.dedup import _spread
    from whisper_pandas_spark.operators.kmeans import (
        _assign,
        int8_codes,
        kmeans_int8,
    )
    from whisper_pandas_spark.queries_round13b import _SD_ITERS, _SD_K, _sd_fixture
    from whisper_pandas_spark.session import get_spark

    spark = get_spark(app_name="r15_semdedup_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    fix = _sd_fixture(emb)

    # warm-up rep of the full entry
    from whisper_pandas_spark.operators.semdedup import semdedup

    semdedup(fix, "vec_id", "e", k=_SD_K, iters=_SD_ITERS).write.format(
        "noop"
    ).mode("overwrite").save()

    for rep in range(2):
        marks = {}
        t0 = time.perf_counter()
        codes = _spread(int8_codes(fix, "vec_id", "e")).localCheckpoint(
            eager=True
        )
        marks["quantize+ckpt"] = time.perf_counter() - t0

        t = time.perf_counter()
        init_rows = codes.orderBy("vec_id").limit(_SD_K).collect()
        marks["init collect"] = time.perf_counter() - t
        centroids = [list(r["q"]) for r in init_rows]

        for i in range(_SD_ITERS):
            t = time.perf_counter()
            assigned = _assign(codes, centroids)
            comp = (
                assigned.select("cluster", F.posexplode("q").alias("dim", "v"))
                .groupBy("cluster", "dim")
                .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
                .select(
                    "cluster",
                    "dim",
                    F.floor(F.col("s").cast("double") / F.col("n"))
                    .cast("long")
                    .alias("comp"),
                )
                .collect()
            )
            marks[f"iter{i} comp collect"] = time.perf_counter() - t
            new = [list(c) for c in centroids]
            for r in comp:
                new[r["cluster"]][r["dim"]] = r["comp"]
            centroids = new

        t = time.perf_counter()
        out = semdedup(fix, "vec_id", "e", k=_SD_K, iters=_SD_ITERS)
        out.write.format("noop").mode("overwrite").save()
        marks["full entry (all stages)"] = time.perf_counter() - t
        print(f"--- rep {rep} ---")
        for k, v in marks.items():
            print(f"{v:8.3f}s  {k}")
    spark.stop()


if __name__ == "__main__":
    main()
