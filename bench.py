#!/usr/bin/env python
"""Benchmark runner: times the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall seconds over the headline set (lower is better).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from whisper_pandas_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline queries: a representative slice of the registry (scan-heavy agg,
# join, window, dedup, similarity). Kept explicit so bench time stays
# stable as the registry grows.
HEADLINE = [
    # scan → filter → agg → sort (the reference's pipeline shape, TPC-H Q1)
    "q1_pricing_summary",
    # Whisper rollup family representative (tumbling-window agg + xff gate)
    "rollup_average_xff",
    # multi-way star join (broadcast dims + AQE)
    "join_star_q3ish",
    # time-series as-of join (union + last-observation window)
    "join_asof",
    # window functions over a big partition-ordered scan
    "window_moving_avg_time",
    # near-dup dedup: MinHash → LSH → verify (the 100 TB pipeline op)
    "dedup_minhash_lsh",
    # similarity search: broadcast brute-force cosine top-k
    "sim_topk_bruteforce",
    # text quality scoring (pure codegen scan)
    "text_quality",
]


def main() -> None:
    from whisper_pandas_spark.registry import QUERIES

    spark = get_spark(app_name="whisper_pandas_spark_bench")

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    names = [n for n in HEADLINE if n in QUERIES]

    # Warm the JVM + parquet footer caches with one cheap action so the
    # first timed query doesn't pay session start-up.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        # Force full execution without driver-side materialization cost
        # dominating: count() executes the whole plan.
        df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
