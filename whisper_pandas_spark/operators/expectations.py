"""Declarative data-quality expectations over DataFrames (Deequ-lite).

The gate a training-data pipeline runs between stages: declare
constraints, get ONE small report frame back —
(check, column, violations, total, passed) — cheap enough to run on
every intermediate table and park next to it as a manifest.

Design: every check compiles to a conditional COUNT inside a single
aggregation pass over the data (`sum(case when violated then 1 end)`),
so N checks cost one scan and one partial-agg exchange, not N jobs.
The two checks that can't ride a row-local predicate get their own
shape: `unique` is one groupBy on its columns (counting rows beyond
the first per duplicate group), `foreign_key` one left-anti-style
broadcast join against the (small) reference key set. Report rows are
exact integers — partitioning-independent, so a SQL oracle replays the
whole report.

No reference parity: whisper_pandas has no validation surface; this
backs the §2.11 pipeline-engineering bar next to profiling and diffing.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named constraint; ``kind`` selects the predicate family."""

    name: str
    kind: str  # not_null | in_range | matches | in_set | unique | custom
    column: str = ""
    params: dict = field(default_factory=dict)
    predicate: Column | None = None  # kind == "custom": TRUE == violated


def not_null(column: str) -> Check:
    return Check(f"not_null({column})", "not_null", column)


def in_range(column: str, lo: float, hi: float) -> Check:
    return Check(
        f"in_range({column},{lo},{hi})", "in_range", column,
        {"lo": lo, "hi": hi},
    )


def matches(column: str, pattern: str) -> Check:
    """Full-match regex constraint (keep patterns in the Java∩RE2
    subset if the report feeds a SQL oracle)."""
    return Check(f"matches({column})", "matches", column, {"pattern": pattern})


def in_set(column: str, allowed: tuple) -> Check:
    return Check(
        f"in_set({column})", "in_set", column, {"allowed": tuple(allowed)}
    )


def unique(*columns: str) -> Check:
    return Check(
        f"unique({','.join(columns)})", "unique", ",".join(columns)
    )


def custom(name: str, violated: Column) -> Check:
    """Arbitrary row predicate; TRUE means the row violates."""
    return Check(name, "custom", predicate=violated)


def _violation(c: Check) -> Column:
    col = F.col(c.column) if c.column else None
    if c.kind == "not_null":
        return col.isNull()
    if c.kind == "in_range":
        lo, hi = c.params["lo"], c.params["hi"]
        return col.isNull() | (col < lo) | (col > hi)
    if c.kind == "matches":
        return col.isNull() | ~col.rlike(c.params["pattern"])
    if c.kind == "in_set":
        return col.isNull() | ~col.isin(*c.params["allowed"])
    if c.kind == "custom":
        return F.coalesce(c.predicate, F.lit(False))
    raise ValueError(f"unknown check kind {c.kind!r}")


def expect(
    df: DataFrame,
    checks: list[Check],
    reference_keys: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate *checks* and return the report:
    (check, violations BIGINT, total BIGINT, passed BOOLEAN),
    one row per check, ordered by check name.

    Row-predicate checks share ONE scan/aggregation. ``unique`` checks
    each add a groupBy on their column set (violations = rows beyond
    the first of every duplicate group). ``foreign_key`` checks are
    declared via *reference_keys*: {"col -> name": ref_df} entries are
    awkward; instead pass a ``custom`` check or use
    :func:`foreign_key_check` which joins for you.
    """
    if not checks:
        raise ValueError("checks must be non-empty")
    row_checks = [c for c in checks if c.kind != "unique"]
    uniq_checks = [c for c in checks if c.kind == "unique"]
    parts = []
    if row_checks:
        aggs = [F.count(F.lit(1)).alias("__total")] + [
            F.sum(_violation(c).cast("long")).alias(f"__v{i}")
            for i, c in enumerate(row_checks)
        ]
        one = df.agg(*aggs)
        # one row per check via explode over an array of named structs —
        # pure Column API, so check names need no SQL-string escaping
        # (quotes/backslashes in a custom() name pass through literally).
        # total rides INSIDE the struct tuples: mixing a generator with a
        # plain projected aggregate column makes Catalyst duplicate the
        # aggregate subtree (two scans for one report).
        rows = F.array(
            *[
                F.struct(
                    F.lit(c.name).alias("check"),
                    F.col(f"__v{i}").alias("violations"),
                    F.col("__total").alias("total"),
                )
                for i, c in enumerate(row_checks)
            ]
        )
        parts.append(
            one.select(F.explode(rows).alias("__r")).select(
                "__r.check", "__r.violations", "__r.total"
            )
        )
    for c in uniq_checks:
        cols = [s.strip() for s in c.column.split(",")]
        grp = df.groupBy(*[F.col(x) for x in cols]).agg(
            F.count(F.lit(1)).alias("__n")
        )
        parts.append(
            grp.agg(
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                .cast("long")
                .alias("violations"),
                F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("total"),
            ).select(F.lit(c.name).alias("check"), "violations", "total")
        )
    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    return report.select(
        "check",
        F.coalesce("violations", F.lit(0)).alias("violations"),
        "total",
        (F.coalesce("violations", F.lit(0)) == 0).alias("passed"),
    ).orderBy("check")


def foreign_key_check(
    df: DataFrame, column: str, ref: DataFrame, ref_column: str
) -> DataFrame:
    """(check, violations, total, passed) for a referential constraint:
    every non-null ``column`` value must exist in ``ref.ref_column``.
    One broadcast join against the reference keys (dims are the small
    side by definition; for a big reference flip to a plain join)."""
    keys = F.broadcast(
        ref.select(F.col(ref_column).alias("__ref")).distinct()
    )
    joined = df.join(keys, df[column] == F.col("__ref"), "left")
    return joined.agg(
        F.lit(f"foreign_key({column})").alias("check"),
        F.sum(
            (F.col(column).isNotNull() & F.col("__ref").isNull()).cast("long")
        ).alias("violations"),
        F.count(F.lit(1)).alias("total"),
    ).select(
        "check",
        F.coalesce("violations", F.lit(0)).alias("violations"),
        "total",
        (F.coalesce("violations", F.lit(0)) == 0).alias("passed"),
    )
