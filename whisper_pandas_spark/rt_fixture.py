"""Roundtrip-fixture constants shared by queries_materialize and
queries_whisper.

A LEAF module on purpose: queries_whisper needs these at import time to
build its oracle SQL, but importing queries_materialize at module top
would execute that module's register() calls first and silently invert
the registry's documented insertion order (registry.py: the driver
walks entries in insertion order with a bounded budget; README
"Driver-budget machinery"). Constants live here; `_roundtrip_tree`
itself is imported lazily inside the entry functions.
"""

from __future__ import annotations

RT_BASE = 1_599_999_960  # multiple of 60: coarse buckets align at slot 0
RT_CAP = 5000  # per-metric point cap: bounds runtime + stays in retention
RT_ARCHIVES = "10:8000,60:2000"  # fine span 50 000 s < both retentions
RT_XFF = 0.5  # coarse slot kept iff >= 3 of its 6 expected fine slots

# SQL CTE recomputing the exact points the writer stored, straight from
# the `events` parquet — the shared oracle base for every entry that
# reads the roundtrip tree.
RT_PTS_CTE = f"""
WITH ranked AS (
  SELECT event_type AS metric, user_id,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
  FROM events
), pts AS (
  SELECT metric, {RT_BASE} + 10 * rn AS epoch,
         CAST(user_id % 997 AS DOUBLE) AS value
  FROM ranked WHERE rn <= {RT_CAP}
)"""
