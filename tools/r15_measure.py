#!/usr/bin/env python
"""Round-14 optimization harness: isolate named registry queries with the
noop sink (guide §1.4), best-of-N timings, optional formatted-plan snapshot
into plans/r15/<name>_<tag>.txt (the judge's before/after evidence).

    python tools/r15_measure.py q1_pricing_summary dedup_minhash_lsh
    R15_TAG=before python tools/r15_measure.py --plans graph_label_propagation
    R15_REPS=5 R15_SF_DIR=/root/testdata/sf0.1 python tools/r15_measure.py ...

Same session geometry as bench.py (local[$SPARK_GRAFT_CPUS], shuffle 32)
so numbers compare 1:1 with the committed bench artifacts.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("R15_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("R15_REPS", "3"))
TAG = os.environ.get("R15_TAG", "")
PLANS_DIR = Path(__file__).resolve().parents[1] / "plans" / "r15"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    want_plans = "--plans" in sys.argv[1:]
    from whisper_pandas_spark.plans.inspect import formatted_plan
    from whisper_pandas_spark.registry import QUERIES, reset_result_caches
    from whisper_pandas_spark.session import get_spark

    missing = [n for n in args if n not in QUERIES]
    if missing:
        raise SystemExit(f"not in registry: {missing}")

    spark = get_spark(app_name="r15_measure")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + python workers + noop write path (bench.py protocol)
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()
    spark.read.parquet(f"{SF_DIR}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict[str, float]] = {}
    for name in args:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"r15:{name}")
        times = []
        spark._jvm.System.gc()
        for _ in range(REPS):
            reset_result_caches()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        times.sort()
        out[name] = {
            "best": round(times[0], 4),
            "median": round(times[len(times) // 2], 4),
            "max": round(times[-1], 4),
        }
        if want_plans and TAG:
            reset_result_caches()
            plan = formatted_plan(fn(spark, SF_DIR))
            PLANS_DIR.mkdir(parents=True, exist_ok=True)
            (PLANS_DIR / f"{name}_{TAG}.txt").write_text(plan + "\n")
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
