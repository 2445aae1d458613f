"""Local replica of the driver's correctness gate: run a Spark plan and its
DuckDB oracle over the same parquet, compare row count + column names +
order-insensitive values. Strict by default (exact equality after light
normalization) so anything that would break the driver's value hash breaks
here first."""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal


# last sf_dir registered per connection — the shared-prefix cache key needs
# it (see ORACLE_SHARED_PREFIXES in operators/graph.py: the CC-chain entries'
# oracles share an expensive identical CTE prefix)
_LAST_SF: dict[int, str] = {}


def register_views(con, sf_dir: str) -> None:
    from mta_rtf_dbt_spark.sources.registry import TESTDATA_TABLES

    _LAST_SF[id(con)] = sf_dir
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")


def _shared_prefixes():
    from mta_rtf_dbt_spark.operators.graph import ORACLE_SHARED_PREFIXES

    return ORACLE_SHARED_PREFIXES


def _apply_shared_prefix(con, sql: str) -> str:
    """If ``sql`` starts with a declared shared oracle prefix, materialize
    that prefix's final CTE ONCE as a parquet file keyed by (sf_dir, input
    parquet fingerprints, prefix text) and rewrite the query to read it —
    same rows, same hashes, the heavy chain runs once.

    The cache is a FILE (not a temp table) on purpose: the rehearsal runner
    executes every batch — and every solo replay — in a fresh pytest process
    (fresh JVM, fresh DuckDB connection) as JVM-poisoning discipline, so a
    per-connection share would re-derive the prefix per process and a
    4-heavy-entry shared-JVM batch is itself the poisoning failure mode the
    fresh-process rule exists to avoid. A fingerprint-keyed file survives
    process boundaries, solo replays, and parallel half-registry runners;
    the fingerprint (path, mtime, size of every input parquet) invalidates
    it when a scale dir is regenerated in place."""
    import hashlib
    import tempfile

    sf_dir = _LAST_SF.get(id(con), "")
    for prefix, cte, cols in _shared_prefixes():
        if not sql.startswith(prefix):
            continue
        fp = [sf_dir, prefix, cols]
        if os.path.isdir(sf_dir):
            for f in sorted(os.listdir(sf_dir)):
                if f.endswith(".parquet"):
                    st = os.stat(os.path.join(sf_dir, f))
                    fp.append(f"{f}:{st.st_mtime_ns}:{st.st_size}")
        key = hashlib.sha256("\x00".join(fp).encode()).hexdigest()[:16]
        cache = os.path.join(tempfile.gettempdir(), f"oracle_shared_{key}.parquet")
        if not os.path.exists(cache):
            tmp = f"{cache}.tmp{os.getpid()}"
            con.execute(f"COPY ({prefix}\nSELECT {cols} FROM {cte}) TO '{tmp}' (FORMAT PARQUET)")
            os.replace(tmp, cache)  # atomic: concurrent runners race safely
        return f"WITH {cte} AS (SELECT {cols} FROM read_parquet('{cache}'))" + sql[len(prefix):]
    return sql


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return float(v)
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare(name: str, spark_df, con, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    errs: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(_apply_shared_prefix(con, sql))
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        errs.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return errs
    if len(s_rows) != len(d_rows):
        errs.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")

    sc, s_sorted = _sorted_rows(s_cols, s_rows)
    dc, d_sorted = _sorted_rows(d_cols, d_rows)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        if a != b:
            n_bad += 1
            if n_bad <= 5:
                errs.append(f"{name}: row {i} spark={a!r} duck={b!r} (cols={sc})")
    if n_bad > 5:
        errs.append(f"{name}: ... {n_bad} mismatched rows total")
    return errs
