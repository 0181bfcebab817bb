"""Copy-on-write MERGE (upsert/delete) for parquet tables.

The mutation primitive a training-data pipeline needs between full
rebuilds: apply a change set (upserts + deletes) to a keyed parquet
table and atomically swap in the new version. Plain-parquet
copy-on-write — the same model Delta/Iceberg implement with manifest
files, reduced to its engine-visible core:

- `merge_changes`: the pure relational MERGE — returns the new table
  state as a DataFrame (left-anti deletes, full-outer upsert against
  the change set; change rows win on key collision).
- `merge_into_parquet`: materialize that state next to the current
  version directory and flip a `_CURRENT` pointer file afterwards —
  readers resolve the pointer first, so a crashed writer leaves the
  previous version intact (write-new-then-flip, the public
  copy-on-write recipe).

Scale shape: ONE shuffle joining table x changes on the key (the
change set is usually the small side — broadcast when it fits); the
rewrite cost is the table scan + write, exactly what any copy-on-write
MERGE pays without file-level pruning metadata. Partition the table
path by a coarse key prefix and merge per-partition to bound rewrite
amplification at 100 TB (noted, not hidden).

No reference-repo parity: whisper_pandas is read-only; this backs the
§2.11 pipeline-engineering surface next to snapshot diff and SCD2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CURRENT = "_CURRENT"


def merge_changes(
    table: DataFrame,
    changes: DataFrame,
    key_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE semantics as a DataFrame: rows of ``changes`` replace
    same-key rows of ``table`` (update), new keys append (insert), and
    rows with ``delete_col = true`` remove the key (delete).

    Schemas must match on the data columns; ``delete_col`` (if given)
    exists only in ``changes`` and never reaches the output. A key with
    both an upsert and a delete row keeps the upsert (deletion works by
    the key being anti-joined out of the table and contributing no
    upsert row).
    """
    if delete_col is not None:
        upserts = changes.where(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    else:
        upserts = changes
    survivors = table.join(
        F.broadcast(changes.select(key_col)), key_col, "left_anti"
    )
    return survivors.unionByName(upserts)


def current_version_path(base: str) -> str | None:
    """Resolve the live version directory under ``base`` (pointer file),
    or None before the first merge."""
    from pathlib import Path

    ptr = Path(base) / _CURRENT
    if not ptr.exists():
        return None
    name = ptr.read_text().strip()
    return str(Path(base) / name)


def merge_into_parquet(
    spark: SparkSession,
    base: str,
    changes: DataFrame,
    key_col: str,
    delete_col: str | None = None,
) -> str:
    """Apply ``changes`` to the keyed parquet table rooted at ``base``
    and return the new version directory.

    Layout: ``base/v<N>/`` holds full table versions; ``base/_CURRENT``
    names the live one. The new version is fully written BEFORE the
    pointer flips (single-file rename-class operation), so readers see
    either the old or the new table, never a torn mix; old versions
    remain for time travel / rollback until vacuumed.
    """
    from pathlib import Path

    root = Path(base)
    root.mkdir(parents=True, exist_ok=True)
    cur = current_version_path(base)
    if cur is None:
        if delete_col is not None:
            new_state = changes.where(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
        else:
            new_state = changes
        next_n = 0
    else:
        table = spark.read.parquet(cur)
        new_state = merge_changes(table, changes, key_col, delete_col)
        next_n = int(Path(cur).name[1:]) + 1
    new_dir = root / f"v{next_n}"
    new_state.write.mode("errorifexists").parquet(str(new_dir))
    tmp = root / f"{_CURRENT}.tmp"
    tmp.write_text(new_dir.name)
    tmp.replace(root / _CURRENT)  # atomic pointer flip
    return str(new_dir)
