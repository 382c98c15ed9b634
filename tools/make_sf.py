#!/usr/bin/env python
"""Synthesize a larger scale factor from the driver-generated sf0.1 tables
(VERDICT r4 #2: the sf1 cliff check — plans must not flip shape with size).

The testdata directory is read-only and sf1 doesn't exist, so sf1 is
derived DETERMINISTICALLY from sf0.1: each table is replicated
``--mult`` times with key offsets that preserve every foreign-key
relationship (dimension tables region/nation stay fixed, like TPC-H).
Both engines (Spark and DuckDB) then read the SAME files, so the oracle
comparison is exactly as strong as at sf0.01 — only 10x bigger.

Usage: python tools/make_sf.py --base /root/testdata/sf0.1 \
           --out /tmp/sf1.0 --mult 10
"""

from __future__ import annotations

import argparse
import os

import duckdb

# per-table key-offset plan: column -> stride (rows per replica at the
# base scale; offsets are rep * stride so every replica's keys are
# disjoint and FKs stay aligned across tables)
PLAN = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    # new user ids per replica: event operators group on user_id, so a
    # replica is a fresh population, not a 10x-hotter key
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1.0")
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for table, offs in PLAN.items():
        src = f"{args.base}/{table}.parquet"
        dst = f"{args.out}/{table}.parquet"
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        reps = 1 if not offs else args.mult
        selects = []
        for rep in range(reps):
            proj = ", ".join(
                f"({c} + {rep * offs[c]}) AS {c}" if c in offs else c
                for c in cols
            )
            selects.append(f"SELECT {proj} FROM read_parquet('{src}')")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{dst}' "
            f"(FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()
