"""Query registry: the driver-checkable artifact of SURVEY.md §2.

Every implemented operator gets a named entry here:

- ``QUERIES[name]``  — ``(spark, sf_dir) -> DataFrame`` running the operator
  through the engine's own API (DataFrame-first, Catalyst-optimized).
- ``ORACLES[name]``  — the semantically-equivalent ANSI SQL that DuckDB runs
  over the same parquet tables. Omitted only for genuinely
  non-SQL-expressible ops (the driver then records a rows-only check).

Column names are aliased identically on both sides — the driver's compare
sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(
    name: str, oracle: str | None = None
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    """Decorator registering a query (and optionally its DuckDB oracle)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from whisper_pandas_spark.sources.tables import load_table

    return load_table(spark, name, sf_dir)


def reset_result_caches() -> None:
    """Drop every per-process result materialization the registry entries
    share (MinHash pair table, whisper round-trip tree, bucketed-table
    marker). The caches make repeated driver/oracle runs cheap; the BENCH
    calls this before every timed run so a timing always covers the full
    pipeline, never a checkpoint read."""
    import sys

    mods = sys.modules
    qd = mods.get("whisper_pandas_spark.queries_dedup")
    if qd is not None:
        qd._PAIRS_CACHE.clear()
    qm = mods.get("whisper_pandas_spark.queries_materialize")
    if qm is not None:
        qm._ROUNDTRIP_DIR.clear()
        qm._BUCKETED_DONE.clear()
        qm._ZORDER_DIR.clear()
        qm._PART_DIR.clear()
    q7 = mods.get("whisper_pandas_spark.queries_round7")
    if q7 is not None:
        q7._BLOOM_DIR.clear()
    qs = mods.get("whisper_pandas_spark.queries_streaming")
    if qs is not None:
        import shutil

        for d in qs._ND_REPLAY_DIR.values():
            shutil.rmtree(d, ignore_errors=True)
        qs._ND_REPLAY_DIR.clear()
    q14 = mods.get("whisper_pandas_spark.queries_round14")
    if q14 is not None:
        import shutil

        for d, _n in q14._WARC_TREE.values():
            shutil.rmtree(d, ignore_errors=True)
        q14._WARC_TREE.clear()
    q14b = mods.get("whisper_pandas_spark.queries_round14b")
    if q14b is not None:
        import shutil

        for d in q14b._DV_DIR.values():
            shutil.rmtree(d, ignore_errors=True)
        q14b._DV_DIR.clear()
    # Also drop every leaked persistent-RDD block. Eager localCheckpoints
    # cut lineage, but their blocks outlive the query's Python objects
    # until the JVM ContextCleaner eventually notices — across a 39-query
    # bench they pile up into GB of un-evictable cache, and the resulting
    # GC/eviction churn billed multi-second (worst measured: 50 s) stalls
    # to whichever query ran next (round-14 finding; this runs OUTSIDE
    # the timed window, before t0, so timings still cover the full
    # recompute-from-parquet pipeline).
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            # py4j auto-converts the Java map: iterate the view directly
            # (a .iterator() call on the converted view raises — caught
            # and silently skipped in the first cut of this cleanup)
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
    except Exception:
        pass


# Record-derived ordering (used by _reorder below, and by
# queries_round6.promote()): the driver walks the registry in insertion
# order with a bounded budget (~50 entries per round), so ordering decides
# what gets (re-)recorded:
#
#   1. entries whose LATEST record is non-green (a fix must be re-recorded),
#   2. entries with NO record yet (new this round),
#   3. green entries, oldest record first (refresh stale rows),
#
# stable within each bucket, derived from the CORRECTNESS_r*.json records
# the driver leaves in the repo root. This self-maintains across rounds.
import glob as _glob
import json as _json
import os as _os

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_latest: dict[str, tuple[int, dict]] = {}
for _i, _path in enumerate(
    sorted(_glob.glob(_os.path.join(_ROOT, "CORRECTNESS_r*.json")))
):
    try:
        with open(_path) as _f:
            _data = _json.load(_f)
    except (OSError, ValueError):
        continue
    for _name, _rec in _data.items():
        _latest[_name] = (_i, _rec)


def _order_key(name: str) -> tuple[int, int]:
    if name not in _latest:
        return (1, 0)
    rnd, rec = _latest[name]
    if rec.get("hash_match") is True:
        return (2, rnd)
    if rec.get("err") == "no_oracle":
        # a rows-only record is green only while the entry still has no
        # oracle; once an oracle lands the entry must re-record at hash
        # level, so queue it with the never-recorded bucket
        return (2, rnd) if name not in ORACLES else (1, 0)
    return (0, 0)


def _reorder() -> None:
    """Rebuild QUERIES/ORACLES in driver-sweep priority order (in place,
    so every `from registry import QUERIES` alias sees it)."""
    final = sorted(QUERIES, key=_order_key)
    q = {n: QUERIES[n] for n in final}
    QUERIES.clear()
    QUERIES.update(q)
    o = {n: ORACLES[n] for n in final if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(o)


# Import side-effect modules that populate the registry. Kept at the bottom
# so `register` / `_table` exist when they run.
#
# ORDER MATTERS: the driver walks the registry in insertion order and has a
# bounded budget (round 1 stopped after 50 of 66 entries, leaving every
# similarity/text/multimodal/whisper entry unchecked). The extension surface
# therefore registers FIRST; the 8 near-identical rollup_* variants and the
# window_* family — all driver-green in round 1 — register last.
from whisper_pandas_spark import queries_whisper  # noqa: E402,F401
from whisper_pandas_spark import queries_materialize  # noqa: E402,F401
from whisper_pandas_spark import queries_similarity  # noqa: E402,F401
from whisper_pandas_spark import queries_embeddings  # noqa: E402,F401
from whisper_pandas_spark import queries_streaming  # noqa: E402,F401
from whisper_pandas_spark import queries_text  # noqa: E402,F401
from whisper_pandas_spark import queries_multimodal  # noqa: E402,F401
from whisper_pandas_spark import queries_pipeline  # noqa: E402,F401
from whisper_pandas_spark import queries_dedup  # noqa: E402,F401
from whisper_pandas_spark import queries_joins  # noqa: E402,F401
from whisper_pandas_spark import queries_relational  # noqa: E402,F401
from whisper_pandas_spark import queries_windows  # noqa: E402,F401
from whisper_pandas_spark import queries_rollup  # noqa: E402,F401

# Round 6: promote the formerly-staged queries_round6 entries into the live
# registry (VERDICT r5 "Next round" #1). They carry no CORRECTNESS record yet,
# so _order_key queues them first for the driver sweep. promote() is
# idempotent and ends with _reorder(); queries_round6 ALSO self-promotes at
# its module bottom, covering the import order where a test loads
# queries_round6 first (whose oracle builders pull in registry mid-load —
# promoting here alone would then see a half-populated STAGED dict).
from whisper_pandas_spark import queries_round6 as _q6  # noqa: E402

_q6.promote()

# Round 7: direct registrations (no staging needed — promote()'s final
# _reorder sorts never-recorded entries to the sweep front regardless of
# import position, and queries_round7's oracles are plain SQL strings
# with no mid-load registry dependency).
from whisper_pandas_spark import queries_round7  # noqa: E402,F401
from whisper_pandas_spark import queries_round7b  # noqa: E402,F401
from whisper_pandas_spark import queries_round7c  # noqa: E402,F401

# Round 8: same direct-registration pattern.
from whisper_pandas_spark import queries_round8  # noqa: E402,F401

# Round 9: same direct-registration pattern.
from whisper_pandas_spark import queries_round9  # noqa: E402,F401

# Round 10: same direct-registration pattern.
from whisper_pandas_spark import queries_round10  # noqa: E402,F401

# Round 11: same direct-registration pattern.
from whisper_pandas_spark import queries_round11  # noqa: E402,F401

# Round 12: same direct-registration pattern.
from whisper_pandas_spark import queries_round12  # noqa: E402,F401
from whisper_pandas_spark import queries_round12b  # noqa: E402,F401

# Round 13: same direct-registration pattern.
from whisper_pandas_spark import queries_round13  # noqa: E402,F401
from whisper_pandas_spark import queries_round13b  # noqa: E402,F401

# Round 14: same direct-registration pattern.
from whisper_pandas_spark import queries_round14  # noqa: E402,F401
from whisper_pandas_spark import queries_round14b  # noqa: E402,F401

_reorder()
