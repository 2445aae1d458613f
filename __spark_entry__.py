"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` aggregates every named plan registry in the engine; each entry
has a matching DuckDB oracle in ``oracle_sql()`` unless the op is genuinely
non-SQL-expressible (those get the driver's weaker rows-only check and are
marked in their module docstrings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registries():
    """(QUERIES, ORACLE) pairs from every plan/operator module."""
    import importlib

    mods = [
        "mta_rtf_dbt_spark.plans.relational",
        "mta_rtf_dbt_spark.plans.tpch_extra",
        "mta_rtf_dbt_spark.metrics.events_analog",
        "mta_rtf_dbt_spark.operators.dedup",
        "mta_rtf_dbt_spark.operators.similarity",
        "mta_rtf_dbt_spark.operators.textops",
        "mta_rtf_dbt_spark.operators.multimodal",
        "mta_rtf_dbt_spark.streaming.jobs",
        "mta_rtf_dbt_spark.sources.ingest",
        "mta_rtf_dbt_spark.operators.quality",
        "mta_rtf_dbt_spark.operators.merge",
        "mta_rtf_dbt_spark.operators.asof",
        "mta_rtf_dbt_spark.operators.sketches",
        "mta_rtf_dbt_spark.operators.graph",
        "mta_rtf_dbt_spark.operators.sampling",
        "mta_rtf_dbt_spark.sources.formats",
        "mta_rtf_dbt_spark.operators.pyudtf",
        "mta_rtf_dbt_spark.operators.tokenize",
    ]
    out = []
    for m in mods:
        try:
            mod = importlib.import_module(m)
        except ImportError:
            continue
        out.append((getattr(mod, "QUERIES", {}), getattr(mod, "ORACLE", {})))
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary at sf0.001 (SURVEY.md §7.3)."""
    from mta_rtf_dbt_spark.plans.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for qs, _ in _registries():
        merged.update(qs)
    return merged


def oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for _, osql in _registries():
        merged.update(osql)
    return merged
