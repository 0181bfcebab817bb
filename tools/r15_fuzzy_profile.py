#!/usr/bin/env python
"""Stage timing of dedup_fuzzy_passjoin at sf0.1 (guide §1): base0
barrier, candidate generation (segs/probes join), verify levenshtein,
full entry."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("R15_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from whisper_pandas_spark.registry import QUERIES, reset_result_caches
    from whisper_pandas_spark.session import get_spark

    spark = get_spark(app_name="r15_fuzzy_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    fn = QUERIES["dedup_fuzzy_passjoin"]
    # warm
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    import pyspark.sql.functions as F

    from whisper_pandas_spark.operators.dedup import (
        _spread,
        fuzzy_pairs_passjoin,
    )
    from whisper_pandas_spark.stage import stage_materialize

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from whisper_pandas_spark.functions.text import tokenize

    for rep in range(2):
        reset_result_caches()
        marks = {}
        t0 = time.perf_counter()
        norm = F.substring(F.concat_ws(" ", tokenize("text")), 1, 80)
        base0 = stage_materialize(
            _spread(
                docs.select(
                    F.col("lang").alias("block"),
                    F.col("doc_id").alias("doc_id"),
                    norm.alias("norm"),
                    F.length(norm).alias("ln"),
                )
            )
        )
        marks["base0 barrier"] = time.perf_counter() - t0

        t = time.perf_counter()
        out = fn(spark, SF_DIR)
        out.write.format("noop").mode("overwrite").save()
        marks["full entry"] = time.perf_counter() - t
        print(f"--- rep {rep} ---")
        for k, v in marks.items():
            print(f"{v:8.3f}s  {k}")
    spark.stop()


if __name__ == "__main__":
    main()
