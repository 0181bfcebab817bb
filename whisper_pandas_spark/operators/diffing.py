"""Snapshot diffing between two table versions (LLM-pipeline; extension
beyond the reference — whisper_pandas.py has no table surface).

Corpus builds are iterative: recrawl, refilter, rededuplicate, then ask
"what changed since the last snapshot?" before committing 100 TB of
downstream recompute. `table_diff` answers that with one full outer
join keyed on the stable row key, comparing a deterministic row
fingerprint (md5 over the canonicalized value columns — the same
cross-engine hash family as operators/sampling.py).

Scale: one shuffle per side on the key (zero if both snapshots are
bucketed on it — sources/bucketed.py); the fingerprint is computed
scan-side so the join carries (key, 32-byte hash), not full rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change classes emitted in the `change` column
ADDED, REMOVED, CHANGED = "added", "removed", "changed"


def row_fingerprint(cols: list[str]) -> "F.Column":
    """md5 over '|'-joined canonicalized values (nulls -> chr(1) sentinel
    so NULL != '' != 'None'; engine-portable: DuckDB twin is
    ``md5(concat_ws('|', coalesce(c::VARCHAR, chr(1)), ...))``)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cols]
    return F.md5(F.concat_ws("|", *parts))


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """(key, change) for every row that differs between snapshots:
    ``added`` (key only in *new*), ``removed`` (only in *old*),
    ``changed`` (both, fingerprint differs). Unchanged rows are absent.

    *value_cols* defaults to the non-key columns both frames share, in
    *old*'s column order (a column present in only one frame raises —
    schema drift should be explicit, not silently ignored).
    """
    if value_cols is None:
        shared = [c for c in old.columns if c != key_col and c in new.columns]
        only_old = [c for c in old.columns if c != key_col and c not in new.columns]
        only_new = [c for c in new.columns if c != key_col and c not in old.columns]
        if only_old or only_new:
            raise ValueError(
                f"schema drift: old-only {only_old}, new-only {only_new}; "
                "pass value_cols explicitly to diff the shared subset"
            )
        value_cols = shared
    o = old.select(
        F.col(key_col).alias("key"), row_fingerprint(value_cols).alias("__fp_o")
    )
    n = new.select(
        F.col(key_col).alias("key"), row_fingerprint(value_cols).alias("__fp_n")
    )
    j = o.join(n, "key", "full_outer")
    return j.select(
        "key",
        F.when(F.col("__fp_o").isNull(), F.lit(ADDED))
        .when(F.col("__fp_n").isNull(), F.lit(REMOVED))
        .otherwise(F.lit(CHANGED))
        .alias("change"),
    ).filter(
        F.col("__fp_o").isNull()
        | F.col("__fp_n").isNull()
        | (F.col("__fp_o") != F.col("__fp_n"))
    )
