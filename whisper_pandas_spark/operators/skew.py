"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting handles MOST hot keys at runtime, but two
cases still need explicit salting at 100 TB:

- sort-merge joins where ONE key holds >> a partition's worth of rows on
  BOTH sides (AQE can split a skewed partition of one side, not
  replicate the other side against the splits for arbitrary plans);
- high-cardinality aggregations with a few pathological keys where the
  single final reducer for the hot key is the job's critical path.

Both helpers preserve exact semantics — salt is internal plumbing that
never reaches the output — so they are oracle-checkable against the
plain formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Internal plumbing column. Collision-safe: double-underscore prefix is
# outside every table's namespace, and both helpers raise if a caller's
# frame already carries it rather than silently shadowing.
_SALT = "__wps_salt"


def _uniform_salt(salt_factor: int):
    """Uniform per-row salt expression. Derived from
    ``monotonically_increasing_id`` — not from row content — so it (a)
    spreads a hot key even when its rows are byte-identical duplicates,
    and (b) never touches column values (content-derived salts fail
    analysis on array/map/struct columns). The salt only spreads rows
    across reducers; it never affects matching, so nondeterminism across
    task retries cannot change the result (Spark re-runs indeterminate
    stages whole)."""
    return F.pmod(
        F.crc32(F.monotonically_increasing_id().cast("string")),
        F.lit(salt_factor),
    ).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where each of the big side's key groups is split across
    ``salt_factor`` reducers.

    The big side gets a uniform per-row salt in 0..S-1 (any uniform
    value works — the salt only spreads rows, it never affects
    matching); the small side is replicated S× with salts 0..S-1, so
    every (key, salt) pair still meets its matches. Output ==
    ``big.join(small, key, how)`` exactly; the shuffle key becomes
    (key, salt), splitting a hot key's rows over S partitions.

    The replicated small side costs S× its size in the shuffle — use for
    a small-but-not-broadcastable side, the classic skew-join middle
    ground.

    Only join types that preserve the BIG side's row multiplicity are
    allowed: replicating the small side breaks right/full-outer
    semantics (each unmatched small row would appear S times).
    """
    if how not in ("inner", "left", "left_outer", "semi", "left_semi", "anti", "left_anti"):
        raise ValueError(f"salted_join does not preserve semantics for how={how!r}")
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(f"input already carries internal column {_SALT!r}")
    salted_big = big.withColumn(_SALT, _uniform_salt(salt_factor))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    salted_small = small.withColumn(_SALT, salts)
    return salted_big.join(salted_small, [key, _SALT], how).drop(_SALT)


def salted_agg_count_sum(
    df: DataFrame, key: str, value_col: str, salt_factor: int = 8
) -> DataFrame:
    """Two-phase aggregation: partial (key, salt) aggregate, then final
    per-key combine — explicit map-side-style splitting for aggregates
    that are NOT partial-agg friendly in one step (e.g. exact
    count-distinct pipelines) or whose hot key dominates a reducer.

    Returns (key, n_rows, sum_value). Counts and sums recombine exactly,
    so the result equals the direct groupBy.
    """
    if _SALT in df.columns:
        raise ValueError(f"input already carries internal column {_SALT!r}")
    salted = df.withColumn(_SALT, _uniform_salt(salt_factor))
    partial = salted.groupBy(key, _SALT).agg(
        F.count(F.lit(1)).alias("_n"), F.sum(value_col).alias("_s")
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n_rows"), F.sum("_s").alias("sum_value")
    )
