"""Model-layer parity: build the 4 MTA models in Spark over the deterministic
fixtures and compare full outputs against an independent DuckDB
re-implementation (mta_rtf_dbt_spark/plans/mta_oracle.py)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare


@pytest.fixture(scope="session")
def mta_dir():
    from mta_rtf_dbt_spark.sources.fixtures import ensure_fixtures

    return ensure_fixtures()


@pytest.fixture(scope="session")
def mta_models(spark, mta_dir):
    from mta_rtf_dbt_spark.plans.mta_models import build_all
    from mta_rtf_dbt_spark.sources.fixtures import MTA_TABLES
    from mta_rtf_dbt_spark.sources.registry import load

    src = {t: load(spark, mta_dir, t) for t in MTA_TABLES}
    return build_all(spark, src)


@pytest.fixture(scope="session")
def duck_mta(duck, mta_dir):
    from mta_rtf_dbt_spark.sources.fixtures import MTA_TABLES

    from mta_rtf_dbt_spark.plans.mta_oracle import MODEL_VIEWS

    duck.execute("SET TimeZone='UTC'")
    for t in MTA_TABLES:
        duck.execute(
            f'CREATE OR REPLACE VIEW "{t}" AS SELECT * FROM read_parquet(\'{mta_dir}/{t}.parquet\')'
        )
    for v in MODEL_VIEWS:
        duck.execute(v)
    return duck


@pytest.mark.parametrize(
    "model", ["fact_trips_stops", "fact_trips", "fact_delays", "fact_alerts"]
)
def test_model_parity(mta_models, duck_mta, model):
    errs = compare(model, mta_models[model], duck_mta, f"SELECT * FROM o_{model}")
    assert not errs, "\n".join(errs)


def test_grain_contracts(mta_models):
    """The dbt-style schema tests the reference should have had (SURVEY.md §5.3,
    grain notes metrics_guide.md:7-12)."""
    fts = mta_models["fact_trips_stops"]
    assert fts.count() == fts.select("tu_id", "stu_id").distinct().count()
    assert fts.filter(fts.trip_uid.isNull()).count() == 0
    ft = mta_models["fact_trips"]
    assert ft.count() == ft.select("trip_uid").distinct().count()
    # property: first_stop_sequence <= last_stop_sequence (fact_trips.sql:58-59)
    bad = ft.filter(ft.first_stop_sequence > ft.last_stop_sequence).count()
    assert bad == 0


def test_dedup_first_obs_positive_headway(mta_models):
    """Property check: dwell >= 0 where both ts present (SURVEY.md §5.4)."""
    from pyspark.sql import functions as F

    fts = mta_models["fact_trips_stops"]
    dwell = fts.filter(
        F.col("arrival_ts_utc").isNotNull() & F.col("departure_ts_utc").isNotNull()
    ).select(
        (F.unix_timestamp("departure_ts_utc") - F.unix_timestamp("arrival_ts_utc")).alias("d")
    )
    assert dwell.filter(F.col("d") < 0).count() == 0
