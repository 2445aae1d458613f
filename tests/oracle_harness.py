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


# per-connection shared-prefix state: id(con) -> {"sf_dir": str, "made": set}
# (see ORACLE_SHARED_PREFIXES in operators/graph.py — the CC-chain entries'
# oracles share an expensive identical CTE prefix; materialize it once per
# (connection, sf_dir) instead of re-deriving it per entry)
_SHARED: dict[int, dict] = {}


def register_views(con, sf_dir: str) -> None:
    from mta_rtf_dbt_spark.sources.registry import TESTDATA_TABLES

    st = _SHARED.setdefault(id(con), {"sf_dir": None, "made": set()})
    if st["sf_dir"] != sf_dir:
        # sf_dir switch invalidates any prefix tables built over old views
        for tbl in st["made"]:
            con.execute(f"DROP TABLE IF EXISTS {tbl}")
        st["made"].clear()
        st["sf_dir"] = sf_dir
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")


def _shared_prefixes():
    from mta_rtf_dbt_spark.operators.graph import ORACLE_SHARED_PREFIXES

    return ORACLE_SHARED_PREFIXES


def _apply_shared_prefix(con, sql: str) -> str:
    """If ``sql`` starts with a declared shared oracle prefix, materialize
    that prefix's final CTE once per (connection, sf_dir) as a temp table
    and rewrite the query to read it — same rows, same hashes, the heavy
    chain runs once per session instead of once per entry."""
    for i, (prefix, cte, cols) in enumerate(_shared_prefixes()):
        if not sql.startswith(prefix):
            continue
        tbl = f"__oracle_shared_{i}"
        st = _SHARED.setdefault(id(con), {"sf_dir": None, "made": set()})
        if tbl not in st["made"]:
            con.execute(
                f"CREATE OR REPLACE TEMP TABLE {tbl} AS {prefix}\nSELECT {cols} FROM {cte}"
            )
            st["made"].add(tbl)
        return f"WITH {cte} AS (SELECT {cols} FROM {tbl})" + sql[len(prefix):]
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
