#!/usr/bin/env python
"""Pre-warm the shared CC-chain oracle prefix cache for a scale dir.

The four CC-chain entries' DuckDB oracles share one expensive CTE prefix
(shingles -> capped posting join -> jaccard edges -> star rounds -> comp),
cached as a fingerprint-keyed parquet file by tests/oracle_harness.py so it
is derived once per (sf_dir, inputs). Inside a rehearsal, that derivation
runs while a Spark JVM co-occupies the host — at sf10 that contention is the
difference between an hour and several. This tool materializes the cache in
a STANDALONE DuckDB process (no Spark), with tunable threads/memory, so the
rehearsal's CC entries start from a warm file.

Usage: python tools/prewarm_oracle_prefix.py [sf_dir] [threads] [mem] [tmpdir]
Defaults: /tmp/sf10, 16 (the proven sf3 spill-bounded width), DuckDB's
default memory (80% of RAM — lowering it INCREASES spill; only cap it when
something else co-occupies the host), /tmp/duckdb_prewarm_spill (own dir:
max_temp_directory_size accounting is directory-wide, so sharing a spill
dir with a concurrently-running oracle suite charges its blocks against
this process's cap — found the hard way in r9).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    threads = sys.argv[2] if len(sys.argv) > 2 else "16"
    mem = sys.argv[3] if len(sys.argv) > 3 else ""
    tmpdir = sys.argv[4] if len(sys.argv) > 4 else "/tmp/duckdb_prewarm_spill"

    import duckdb

    from tests.oracle_harness import _apply_shared_prefix, register_views

    con = duckdb.connect()
    # Same spill discipline as the test fixture (tests/conftest.py), scaled
    # for a standalone run: no co-resident JVM, so full memory is safe (and
    # full memory MINIMIZES spill); the temp cap still keeps a runaway from
    # eating the host disk.
    con.execute(f"SET temp_directory='{tmpdir}'")
    con.execute("SET max_temp_directory_size='70GiB'")
    con.execute(f"SET threads={int(threads)}")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET preserve_insertion_order=false")
    register_views(con, sf_dir)

    from mta_rtf_dbt_spark.operators.graph import ORACLE_SHARED_PREFIXES

    t0 = time.monotonic()
    for prefix, cte, cols in ORACLE_SHARED_PREFIXES:
        # feeding the bare prefix + final-CTE select through the same code
        # path the tests use guarantees an identical cache key and contents
        rewritten = _apply_shared_prefix(con, f"{prefix}\nSELECT {cols} FROM {cte}")
        if "read_parquet('" not in rewritten:
            # fail with the cause, not a bare IndexError (r9 ADVICE): the
            # rewrite only fires when the query's prefix text matches
            # ORACLE_SHARED_PREFIXES verbatim
            raise RuntimeError(
                f"prefix[{cte}] did not match ORACLE_SHARED_PREFIXES — "
                "_apply_shared_prefix returned the query unrewritten; the "
                "prefix text has drifted out of sync with graph.py"
            )
        path = rewritten.split("read_parquet('")[1].split("'")[0]
        n = con.execute(f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
        sz = os.path.getsize(path)
        print(
            f"prefix[{cte}] -> {path}: {n} rows, {sz / 1e6:.1f} MB,"
            f" {time.monotonic() - t0:.1f}s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
