#!/usr/bin/env python
"""Aggregate-checksum parity for pair-enumerating entries at large SF.

Entries that enumerate near-dup PAIRS (simhash / minhash / embedding
near-dup) have outputs that grow quadratically in clone-group size BY
DEFINITION: the sf30 corpus (300 clones per base doc) contains ~224M true
doc pairs, and the standard parity harness — collect both engines' rows
into the driver and hash — becomes an output-SHUTTLING benchmark long
before either engine's plan is stressed. At 100 TB nobody collects such a
result; they compare aggregates. This tool does the scale-correct
equivalent of the value-hash check: each engine computes, INSIDE the
engine, an order-free checksum over its own result —

    n   = COUNT(*)
    chk = SUM( (sum_i int(col_i) * M_i) % 2147483647 )

with columns in sorted-name order, DOUBLE columns integerized as
ROUND(x * 1e6) (every similarity value is already rounded to 6 dp in both
engines — the D5 discipline), and fixed multipliers M_i. Equal (n, chk)
over hundreds of millions of rows is the same evidence the driver's
value-hash gives at small SF, with O(1) bytes leaving each engine.

Usage: python tools/run_pair_checksum.py [sf_dir] [out.json] [entry,...]
Defaults: /tmp/sf30, rehearsals/rehearsal_sf30_pairs_r11.json,
          dedup_simhash,dedup_minhash_lsh,embedding_near_dup
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

P = 2_147_483_647
MULTS = [1_000_003, 1_000_033, 1_000_037, 1_000_039, 1_000_081, 1_000_099]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _terms(cols: list[tuple[str, str]]) -> str:
    """The per-row polynomial, identical SQL in Spark and DuckDB: columns
    in sorted-name order, doubles integerized at 6 dp."""
    parts = []
    for (name, dtype), m in zip(sorted(cols), MULTS):
        ic = (
            f"CAST(ROUND({name} * 1000000) AS BIGINT)"
            if dtype in ("double", "float", "DOUBLE", "FLOAT")
            else f"CAST({name} AS BIGINT)"
        )
        parts.append(f"{ic} * {m}")
    return " + ".join(parts)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf30"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "rehearsals", "rehearsal_sf30_pairs_r11.json")
    )
    entries = (
        sys.argv[3].split(",")
        if len(sys.argv) > 3
        else ["dedup_simhash", "dedup_minhash_lsh", "embedding_near_dup"]
    )

    import duckdb

    import __spark_entry__ as e
    from mta_rtf_dbt_spark.session import get_spark

    qs, osql = e.queries(), e.oracle_sql()
    spark = get_spark("pair-checksum-rehearsal")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    res: dict = {
        "sf_dir": sf_dir,
        "method": "order-free aggregate checksum (see module docstring)",
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "wall_start_unix": round(time.time(), 1),
        "entries": {},
    }
    ok_all = True
    for name in entries:
        d: dict = {}
        df = qs[name](spark, sf_dir)
        cols = df.dtypes
        expr = _terms(cols)
        t0 = time.monotonic()
        row = df.selectExpr(
            "CAST(COUNT(*) AS BIGINT) AS n",
            f"CAST(SUM(({expr}) % {P}) AS BIGINT) AS chk",
        ).collect()[0]
        d["spark"] = {"n": row["n"], "chk": row["chk"], "sec": round(time.monotonic() - t0, 1)}
        t0 = time.monotonic()
        dn, dchk = con.execute(
            f"SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(({expr}) % {P}) AS BIGINT) "
            f"FROM ({osql[name]}) t"
        ).fetchone()
        d["duckdb"] = {"n": dn, "chk": dchk, "sec": round(time.monotonic() - t0, 1)}
        d["equal"] = bool(row["n"] == dn and row["chk"] == dchk)
        ok_all = ok_all and d["equal"]
        res["entries"][name] = d
        _dump(out_path, res)
        print(f"{name}: {json.dumps(d)}", flush=True)

    res["passed"] = ok_all
    res["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    res["total_sec"] = round(time.time() - res["wall_start_unix"], 1)
    _dump(out_path, res)
    print(f"done: passed={ok_all} -> {out_path}", flush=True)
    return 0 if ok_all else 1


def _dump(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(obj, fh, indent=1)


if __name__ == "__main__":
    raise SystemExit(main())
