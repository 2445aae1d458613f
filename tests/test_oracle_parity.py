"""Replicates the driver's t2 correctness gate over every queries() entry that
declares an oracle. Runs at sf0.001 by default for speed; set
ORACLE_PARITY_SF=/root/testdata/sf0.01 to mirror the driver exactly."""

from __future__ import annotations

import os

import pytest

from tests.oracle_harness import compare, register_views

SF_DIR = os.environ.get("ORACLE_PARITY_SF", "/root/testdata/sf0.001")


def _pairs():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    return [(name, fn, osql.get(name)) for name, fn in sorted(qs.items())]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_parity(spark, duck, name, fn, sql):
    register_views(duck, SF_DIR)
    df = fn(spark, SF_DIR)
    if sql is None:
        # rows-only check (driver's weaker path for non-SQL-expressible ops)
        assert df.count() >= 0
        return
    # The driver's pandas canonicalizer cannot hash container-typed result
    # columns (r4: a_array_agg_sorted red on `unhashable type: 'list'`) —
    # every oracle-backed entry must emit scalars only.
    bad = [
        f"{c}:{t}"
        for c, t in df.dtypes
        if t.startswith(("array", "map", "struct"))
    ]
    assert not bad, f"{name}: container-typed result columns {bad}"
    errs = compare(name, df, duck, sql)
    assert not errs, "\n".join(errs)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_registry_consistency():
    """Guard the driver contract: every _PRIORITY name resolves (a typo
    would silently demote an entry to the tail of the driver's check
    budget), every oracle belongs to a query, and the priority prefix is
    emitted first."""
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    missing = [n for n in e._PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    assert set(osql) <= set(qs)
    assert list(qs)[: len(e._PRIORITY)] == e._PRIORITY
    dupes = len(e._PRIORITY) != len(set(e._PRIORITY))
    assert not dupes
