"""Driver-gated MTA model surface (VERDICT r3 item 3).

The real reference models — ``fact_trips_stops`` (the trip_uid chain,
reference ``models/fact_trips_stops.sql:96-117``), ``fact_trips`` (the
argmin/argmax rollup, ``models/fact_trips.sql:23-89``) and metric M5
headways (``docs/metrics_guide.md:168-201``) — as ``queries()`` entries the
driver can hash-check against DuckDB, not only local pytest.

There is no MTA-shaped data in ``/root/testdata``, so these entries run on
the deterministic fixture parquet from ``sources/fixtures.py`` (seeded RNG —
byte-stable across machines). The fixtures are (re)generated at *import*
time: ``_registries()`` in ``__spark_entry__.py`` imports this module before
the driver obtains either ``queries()`` or ``oracle_sql()``, so the parquet
exists no matter which engine the driver runs first. The oracle SQL reads
the same files via ``read_parquet`` CTEs and nests the independent DuckDB
model re-implementation (plans/mta_oracle.py) — the exact SQL the local
parity tests have been green against since round 1.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mta_rtf_dbt_spark.plans.mta_oracle import (
    FACT_ALERTS_BODY,
    FACT_DELAYS_BODY,
    FACT_TRIPS_BODY,
    FACT_TRIPS_STOPS_BODY,
)
from mta_rtf_dbt_spark.session import pin_session
from mta_rtf_dbt_spark.sources.fixtures import MTA_TABLES, ensure_fixtures
from mta_rtf_dbt_spark.sources.registry import load

FIX_DIR = ensure_fixtures()

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            pin_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if sql is not None:
            ORACLE[name] = sql
        return wrapped

    return deco


def _fixture_ctes(tables: list[str]) -> str:
    return ",\n".join(
        f"{t} AS (SELECT * FROM read_parquet('{FIX_DIR}/{t}.parquet'))" for t in tables
    )


_FTS_SOURCES = [
    "trip_updates",
    "trip_updates__trip_update__stop_time_update",
    "stops",
    "trips",
]

# M5 parameters — chosen so the fixture yields a non-trivial headway sequence
# (same stop/day the local metric parity test exercises).
_M5_STOP, _M5_DAY = "R14N", "2025-11-01"
_NY_CIVIL = "CAST({c} AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS TIMESTAMP)"
_TRUNC_DIV_SEC = (
    "CAST((epoch_us({a}) - epoch_us({b}) - ((epoch_us({a}) - epoch_us({b})) % 1000000))"
    " // 1000000 AS BIGINT)"
)


def _models(spark: SparkSession) -> dict[str, DataFrame]:
    from mta_rtf_dbt_spark.plans.mta_models import build_all

    src = {t: load(spark, FIX_DIR, t) for t in MTA_TABLES}
    return build_all(spark, src, register_views=False)


@q(
    "mta_fact_trips_stops",
    f"""
    WITH {_fixture_ctes(_FTS_SOURCES)},
    o_fact_trips_stops AS ({FACT_TRIPS_STOPS_BODY})
    SELECT * FROM o_fact_trips_stops
    """,
)
def mta_fact_trips_stops(spark, sf_dir):
    """The reference's core model, full width — snapshot grain, the D2/D4
    determinism policy, and the trip_uid sha256 chain
    (fact_trips_stops.sql:96-117) hash-checked end to end."""
    return _models(spark)["fact_trips_stops"]


@q(
    "mta_fact_trips",
    f"""
    WITH {_fixture_ctes(_FTS_SOURCES)},
    o_fact_trips_stops AS ({FACT_TRIPS_STOPS_BODY}),
    o_fact_trips AS ({FACT_TRIPS_BODY})
    SELECT * FROM o_fact_trips
    """,
)
def mta_fact_trips(spark, sf_dir):
    """Trip-grain rollup (fact_trips.sql:23-89): ordered-ARRAY_AGG-limit-1
    argmin/argmax with nulls-last CASE keys + the double-aliased stops dim."""
    return _models(spark)["fact_trips"]


@q(
    "mta_fact_delays",
    f"""
    WITH {_fixture_ctes(_FTS_SOURCES)},
    o_fact_trips_stops AS ({FACT_TRIPS_STOPS_BODY}),
    o_fact_delays AS ({FACT_DELAYS_BODY})
    SELECT * FROM o_fact_delays
    """,
)
def mta_fact_delays(spark, sf_dir):
    """Delay-event slice (fact_delays.sql:4-55): feed='main' filter + the
    either-delay-present OR predicate over the full stop-level model."""
    return _models(spark)["fact_delays"]


_ALERT_SOURCES = [
    "alerts",
    "alerts__alert__header_text__translation",
    "alerts__alert__description_text__translation",
    "alerts__alert__active_period",
    "alerts__alert__informed_entity",
    "stops",
    "routes",
]


@q(
    "mta_fact_alerts",
    f"""
    WITH {_fixture_ctes(_ALERT_SOURCES)},
    o_fact_alerts AS ({FACT_ALERTS_BODY})
    SELECT * FROM o_fact_alerts
    """,
)
def mta_fact_alerts(spark, sf_dir):
    """Alert star (fact_alerts.sql:3-94): per-child aggregate-then-left-join
    (J3) x4 plus the stops/routes dim lookups (J8 multi-way)."""
    return _models(spark)["fact_alerts"]


@q(
    "mta_m6_dwell",
    f"""
    WITH {_fixture_ctes(_FTS_SOURCES)},
    o_fact_trips_stops AS ({FACT_TRIPS_STOPS_BODY})
    SELECT route_id, direction_id, stop_id, trip_uid,
           CAST((epoch_us(departure_ts_utc) - epoch_us(arrival_ts_utc)
                 - ((epoch_us(departure_ts_utc) - epoch_us(arrival_ts_utc)) % 1000000))
                // 1000000 AS BIGINT) AS dwell_s
    FROM o_fact_trips_stops
    WHERE arrival_ts_utc IS NOT NULL AND departure_ts_utc IS NOT NULL
    """,
)
def mta_m6_dwell(spark, sf_dir):
    """Metric M6 (metrics_guide.md:203-214) over the fixture-built model:
    both-timestamps filter + D9 truncate-toward-zero dwell seconds."""
    from mta_rtf_dbt_spark.metrics.guide import m6_dwell_times

    return m6_dwell_times(_models(spark))


@q(
    "mta_m5_headways",
    f"""
    WITH {_fixture_ctes(_FTS_SOURCES)},
    o_fact_trips_stops AS ({FACT_TRIPS_STOPS_BODY}),
    seen AS (
      SELECT date_trunc('second', event_ts_utc) AS pass_ts, route_id, direction_id, trip_uid
      FROM o_fact_trips_stops
      WHERE stop_id = '{_M5_STOP}'
        AND CAST({_NY_CIVIL.format(c="event_ts_utc")} AS DATE) = DATE '{_M5_DAY}'
    ),
    dedup AS (SELECT * FROM seen
              QUALIFY row_number() OVER (PARTITION BY trip_uid ORDER BY pass_ts) = 1),
    ordered AS (SELECT *, row_number() OVER (ORDER BY pass_ts, trip_uid) AS rn,
                       lag(pass_ts) OVER (PARTITION BY route_id, direction_id
                                          ORDER BY pass_ts, trip_uid) AS prev_ts
                FROM dedup)
    SELECT route_id, direction_id, pass_ts,
           CASE WHEN prev_ts IS NULL THEN NULL
                ELSE {_TRUNC_DIV_SEC.format(a="pass_ts", b="prev_ts")} END AS headway_s
    FROM ordered WHERE rn > 1
    """,
)
def mta_m5_headways(spark, sf_dir):
    """Metric M5 (metrics_guide.md:168-201) over the fixture-built model:
    QUALIFY-dedup (D8 rewrite), global row_number, LAG headways, D9
    truncate-toward-zero second diffs."""
    from mta_rtf_dbt_spark.metrics.guide import m5_headways

    return m5_headways(_models(spark), _M5_STOP, _M5_DAY)
