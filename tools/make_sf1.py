"""Synthesize an sf1 dataset (10x sf0.1) for the out-of-driver gate sweep
(round-5 VERDICT #7; /root/testdata is read-only, so sf1 lives in /tmp).

Construction: 10 KEY-SHIFTED copies of the driver's sf0.1 tables — copy i
shifts every key/FK column by i * (table's sf0.1 key range), so all
foreign-key joins stay exact, copy 0 is byte-identical to sf0.1 (every
pinned id a gate probes, e.g. embeddings vec_id=2, still exists), and the
value distributions the driver generator produced are preserved verbatim.
Non-key columns (text, timestamps, prices, vectors) are copied unchanged;
the resulting 10x duplicate text/vector corpus is a feature, not a bug —
it is exactly the repeated-boilerplate shape a 100 TB crawl has, and the
dedup/LSH gates must agree with their oracles on it.

region/nation stay at 5/25 rows (dimension tables don't scale in TPC-H
either). The correctness gate is engine-vs-DuckDB on the SAME parquet, so
no attempt is made to reproduce the driver's generator internals.

Usage: python tools/make_sf1.py [out_dir=/tmp/sf1] [src=/root/testdata/sf0.1]
"""

from __future__ import annotations

import os
import sys

import duckdb

COPIES = 10

# table -> {column: per-copy offset}; offsets = sf0.1 key-range sizes
SHIFTS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
PASSTHROUGH = ["region", "nation"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads=4")  # stay light next to running benchmarks
    for t in PASSTHROUGH:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet'"
        )
        print(t, "copied")
    for t, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"({c} + i.i * {shifts[c]}) AS {c}" if c in shifts else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
            f"range({COPIES}) AS i(i) ORDER BY i.i, {cols[0]}) "
            f"TO '{out}/{t}.parquet'"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
