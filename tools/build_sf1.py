#!/usr/bin/env python
"""Build a 10x-scale stress dataset (~sf1) from the driver's read-only
sf0.1 parquet, for PERF stress sweeps only (VERDICT r8 task #3).

NOT a correctness fixture: the oracle gate stays at the driver-generated
sf0.01. This replicates sf0.1 ten times with key shifts that keep every
foreign key valid (customer/orders/lineitem/part/supplier copies shift by
the same stride) and perturbs payloads so text/embedding operators don't
see 10 exact clones of every row (which would turn near-dup sweeps into
a pathological all-dups workload instead of a scaled one):

- documents: per-replica token appended to text (so replicas are NEAR
  but not EXACT duplicates — the realistic shape for dedup at scale).
- embeddings: per-replica deterministic jitter on each coordinate.
- events: same time window, 10x density (event/user ids shift; growth
  in a deployment adds traffic, not calendar).

Usage: python tools/build_sf1.py [/tmp/testdata_sf1]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW reps AS SELECT unnest(range(10)) AS k")

    def build(table: str, sql: str) -> None:
        dst = out / f"{table}.parquet"
        con.execute(
            f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        print(f"{table:12s} {n:>9,} rows")

    def src(table: str) -> str:
        return f"read_parquet('{SRC}/{table}.parquet')"

    # fixed dimensions: copy as-is
    for t in ("region", "nation"):
        build(t, f"SELECT * FROM {src(t)}")

    build("customer", f"""
        SELECT c_custkey + k * {STRIDE} AS c_custkey,
               c_name || '#' || k AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')}, reps""")
    build("supplier", f"""
        SELECT s_suppkey + k * {STRIDE} AS s_suppkey,
               s_name || '#' || k AS s_name, s_nationkey, s_acctbal
        FROM {src('supplier')}, reps""")
    build("part", f"""
        SELECT p_partkey + k * {STRIDE} AS p_partkey,
               p_name || '#' || k AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM {src('part')}, reps""")
    build("orders", f"""
        SELECT o_orderkey + k * {STRIDE} AS o_orderkey,
               o_custkey + k * {STRIDE} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, reps""")
    build("lineitem", f"""
        SELECT l_orderkey + k * {STRIDE} AS l_orderkey,
               l_partkey + k * {STRIDE} AS l_partkey,
               l_suppkey + k * {STRIDE} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, reps""")
    build("events", f"""
        SELECT event_id + k * {STRIDE} AS event_id, ts,
               user_id + k * {STRIDE} AS user_id,
               event_type, value, props
        FROM {src('events')}, reps""")
    build("documents", f"""
        SELECT doc_id + k * {STRIDE} AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE text || ' rep' || k || 'tok' || (doc_id % 50) END
                 AS text,
               lang, source,
               CASE WHEN k = 0 THEN n_chars
                    ELSE n_chars + length(' rep' || k || 'tok'
                                          || (doc_id % 50)) END AS n_chars
        FROM {src('documents')}, reps""")
    build("embeddings", f"""
        SELECT vec_id + k * {STRIDE} AS vec_id,
               CASE WHEN k = 0 THEN embedding
                    ELSE list_transform(embedding,
                         x -> CAST(x + k * 0.0003 + (vec_id % 97) * 0.00001
                                   AS FLOAT)) END AS embedding,
               label
        FROM {src('embeddings')}, reps""")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
