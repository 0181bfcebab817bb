"""Funnel analysis: ordered event-sequence matching per entity.

The user-journey question every event table gets asked: of the users
who did step 1, how many went on to do step 2, then step 3, in order,
within a conversion window? Expressed as pure window algebra:

for each step k, the earliest timestamp of an step-k event that occurs
AFTER the user's step-(k-1) match (and within ``within_seconds`` of the
step-1 match, when given) — a per-user running computation, one shuffle
on the entity key, no joins, no UDFs (min over a conditional window per
step; steps compose left to right).

Returns per-user step timestamps; `funnel_counts` folds that into the
(step, users_reached) conversion table.

Scale: ONE exchange on user_id regardless of step count; each step adds
a window aggregate over the same partitioning (no re-shuffle). Skewed
monster users bound the partition, the same caveat as every per-entity
window — the event tables this runs on key by user/session where that
is not the shape.

No reference-repo parity: analytics extension (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-user funnel match: (user, step_1_ts, ..., step_N_ts) with
    null from the first unreached step onward. Step k matches the
    EARLIEST step-k event strictly after the step-(k-1) match (step 1:
    earliest occurrence overall; with ``within_seconds``, every later
    step must land inside the window opened by step 1)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    w = Window.partitionBy(user_col)
    ev = F.col(event_col)
    ts = F.col(ts_col)
    out = df.select(user_col, ts_col, event_col)
    prev = None
    deadline = None
    for k, step in enumerate(steps, start=1):
        col = f"step_{k}_ts"
        if prev is None:
            matched = F.min(F.when(ev == step, ts)).over(w)
        else:
            cond = (ev == step) & F.col(prev).isNotNull() & (ts > F.col(prev))
            if deadline is not None:
                cond = cond & (ts <= F.col(deadline))
            matched = F.min(F.when(cond, ts)).over(w)
        out = out.withColumn(col, matched)
        if k == 1 and within_seconds is not None:
            out = out.withColumn(
                "_deadline",
                F.timestamp_seconds(
                    F.unix_timestamp(F.col(col)) + F.lit(int(within_seconds))
                ),
            )
            deadline = "_deadline"
        prev = col
    step_cols = [f"step_{k}_ts" for k in range(1, len(steps) + 1)]
    return (
        out.select(user_col, *step_cols)
        .distinct()
        .drop("_deadline")
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """The conversion table: (step, step_name, users_reached), ordered."""
    per_user = funnel_steps(df, user_col, ts_col, event_col, steps, within_seconds)
    counts = per_user.agg(
        *[
            F.count(F.col(f"step_{k}_ts")).alias(f"step_{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).alias("step"),
                F.lit(steps[k - 1]).alias("step_name"),
                F.col(f"step_{k}").alias("users_reached"),
            )
            for k in range(1, len(steps) + 1)
        ]
    )
    return (
        counts.select(F.explode(pairs).alias("r"))
        .select("r.step", "r.step_name", "r.users_reached")
        .orderBy("step")
    )
