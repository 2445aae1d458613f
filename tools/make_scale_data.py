"""Scale-rehearsal data generator: replicate an existing SF dir K-fold with
key-shifted foreign keys, producing a larger SF that preserves every
relational invariant the engine's queries depend on (r5 verdict item 7: the
sf0.1 sweep caught a frame-boundary bug sf0.01 could not — rehearse one size
up and record what it finds).

Replication policy (TPC-H-style scaling, same spirit as dbgen):

- ``region``/``nation`` stay fixed (dimension tables don't grow with SF);
- every fact/entity table is unioned K times with replica r's surrogate keys
  shifted by ``r * OFFSET`` so keys stay unique and every FK points at the
  matching replica's parent (customer r <- orders r <- lineitem r, etc.);
- timestamps, measures, and text are NOT perturbed: replica r of a document
  is an exact clone, which is deliberately adversarial for the dedup stack
  (clone groups of size K are exactly what a 100 TB crawl corpus looks like)
  and keeps the data distribution otherwise identical so plan shapes are
  comparable with the source SF.

Both engines (Spark and the DuckDB oracle) read the same generated parquet,
so the oracle-parity sweep runs unchanged: ``ORACLE_PARITY_SF=/tmp/sf1
python -m pytest tests/test_oracle_parity.py``.

Usage: python tools/make_scale_data.py [src_dir] [dst_dir] [k]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1, k=10.
"""

from __future__ import annotations

import os
import sys

import duckdb

# Key shift between replicas — far above any source key (sf0.1 max keys are
# ~6e5) and small enough that r*OFFSET + key stays well inside int64 even
# for BIGINT keys packed into downstream hash math. Must ALSO clear the
# +10_000_000 band the MERGE/CDC entries use for synthetic insert keys
# (operators/merge.py): with a 10M offset, replica r's real orders collide
# with replica r-1's synthetic inserts and the CDC feed re-classifies them
# as updates (found by the r6 sf1 rehearsal — a generator bug, not an
# engine divergence). 100M keeps every replica band (width ~6e5) clear of
# every +10M synthetic band.
OFFSET = 100_000_000

# table -> {column: shift multiplier} (columns not listed are copied as-is;
# multiplier 1 means += r*OFFSET, used for every surrogate/foreign key so a
# replica is a self-consistent parallel universe of the source data).
SHIFTS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 1},
    "supplier": {"s_suppkey": 1},
    "part": {"p_partkey": 1},
    "orders": {"o_orderkey": 1, "o_custkey": 1},
    "lineitem": {"l_orderkey": 1, "l_partkey": 1, "l_suppkey": 1},
    "events": {"event_id": 1, "user_id": 1},
    "documents": {"doc_id": 1},
    "embeddings": {"vec_id": 1},
}
FIXED = ["region", "nation"]


def make(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet'"
            " (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        print(f"{t}: copied (fixed dim)")
    for t, shifts in SHIFTS.items():
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        parts = []
        for r in range(k):
            sel = ", ".join(
                f"({c} + {r * OFFSET})::BIGINT AS {c}" if c in shifts else c
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{src}/{t}.parquet'")
        union = " UNION ALL ".join(parts)
        con.sql(
            f"COPY ({union}) TO '{dst}/{t}.parquet'"
            " (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({k}x)")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make(src, dst, k)
