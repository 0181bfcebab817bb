"""Inspect physical plans so tests can assert scale-critical properties:
filters pushed to the parquet scan, small dimensions broadcast, whole-stage
codegen coverage — the things that decide whether a plan survives 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The plan string of ``df.explain('formatted')`` (without printing)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the data-source scan (``PushedFilters: [...]``)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    """True if the physical plan contains a BroadcastHashJoin /
    BroadcastNestedLoopJoin — i.e. the small side skipped the shuffle."""
    return "Broadcast" in formatted_plan(df)


def partition_filters(df: DataFrame) -> list[str]:
    """Filters applied at DIRECTORY level before any file I/O
    (``PartitionFilters: [...]`` on a FileSourceScan over a
    Hive-partitioned layout) — the cheapest pruning tier there is."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out
