#!/usr/bin/env python
"""Stale-record oracle re-check (VERDICT r8 task #2).

The driver's per-round sweep is bounded, so an entry's latest
CORRECTNESS_r*.json record can date back several rounds; a silent
regression in untouched code would hide until the sweep cycles back.
This gate re-runs `tools/oracle_check.py` (full value-level compare vs
DuckDB) over the K registry entries whose latest driver record is
OLDEST, at a geometry distinct from both main sweeps (local[5]/5), and
prints the re-checked names so the round log shows exactly what was
re-validated.

    python tools/stale_recheck.py [K]      # default K=20

Exit code is oracle_check's: non-zero if any re-checked entry fails.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def oldest_recorded(k: int) -> list[str]:
    """The k registry names with the oldest latest-driver-record round.
    Never-recorded entries are excluded: they queue FIRST for the next
    driver sweep by construction (registry._order_key) and are fully
    value-checked locally when added."""
    from whisper_pandas_spark.registry import QUERIES, _latest

    recorded = [
        (rnd, name)
        for name, (rnd, _rec) in _latest.items()
        if name in QUERIES
    ]
    recorded.sort(key=lambda t: (t[0], t[1]))
    return [name for _rnd, name in recorded[:k]]


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    names = oldest_recorded(k)
    if not names:
        print("stale_recheck: no recorded entries (nothing to re-check)")
        return 0
    print(f"stale_recheck: re-checking {len(names)} oldest-record entries:")
    for n in names:
        print(f"  {n}")
    env = dict(os.environ)
    env.setdefault("ORACLE_MASTER", "local[5]")
    env.setdefault("ORACLE_SHUFFLE", "5")
    here = Path(__file__).resolve().parent
    return subprocess.call(
        [sys.executable, str(here / "oracle_check.py"), *names], env=env
    )


if __name__ == "__main__":
    raise SystemExit(main())
