"""M1-M12 parity: each metric runs in Spark over the fixture-built models and
is compared against an independent DuckDB implementation over the oracle
model views (o_fact_*)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare
from tests.test_mta_models import duck_mta, mta_dir, mta_models  # noqa: F401

DAY = "2025-11-01"
START = "2025-11-01 06:00:00"
END = "2025-11-02 23:00:00"
STOP_A, STOP_B = "R14N", "R16N"

NY_CIVIL = "CAST({c} AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS TIMESTAMP)"


def ny_time(c):
    return f"strftime({NY_CIVIL.format(c=c)}, '%H:%M:%S')"


TRUNC_DIV_SEC = (
    "CAST((epoch_us({a}) - epoch_us({b}) - ((epoch_us({a}) - epoch_us({b})) % 1000000))"
    " // 1000000 AS BIGINT)"
)
TRUNC_DIV_MIN = (
    "CAST((epoch_us({a}) - epoch_us({b}) - ((epoch_us({a}) - epoch_us({b})) % 60000000))"
    " // 60000000 AS BIGINT)"
)

SCHED = f"""
cal AS (
  SELECT service_id FROM calendar
  WHERE start_date <= DATE '{DAY}' AND end_date >= DATE '{DAY}'
    AND ((dayofweek(DATE '{DAY}') + 1 = 1 AND sunday = 1) OR
         (dayofweek(DATE '{DAY}') + 1 = 2 AND monday = 1) OR
         (dayofweek(DATE '{DAY}') + 1 = 3 AND tuesday = 1) OR
         (dayofweek(DATE '{DAY}') + 1 = 4 AND wednesday = 1) OR
         (dayofweek(DATE '{DAY}') + 1 = 5 AND thursday = 1) OR
         (dayofweek(DATE '{DAY}') + 1 = 6 AND friday = 1) OR
         (dayofweek(DATE '{DAY}') + 1 = 7 AND saturday = 1))
),
ta AS (SELECT t.trip_id, t.route_id, t.direction_id FROM trips t JOIN cal USING (service_id)),
fstop AS (SELECT trip_id, MIN(TRY_CAST(stop_sequence AS BIGINT)) AS min_seq
          FROM stop_times GROUP BY 1),
sched AS (
  SELECT ta.route_id, ta.direction_id, ta.trip_id,
         TIMESTAMP '{DAY} 00:00:00'
           + CAST(split_part(st.departure_time, ':', 1) AS BIGINT) * INTERVAL 1 HOUR
           + CAST(split_part(st.departure_time, ':', 2) AS BIGINT) * INTERVAL 1 MINUTE
           + CAST(split_part(st.departure_time, ':', 3) AS BIGINT) * INTERVAL 1 SECOND
         AS sched_departure_ts
  FROM ta
  JOIN fstop ON fstop.trip_id = ta.trip_id
  JOIN stop_times st ON st.trip_id = ta.trip_id
   AND CAST(st.stop_sequence AS VARCHAR) = CAST(fstop.min_seq AS VARCHAR)
),
wl AS (SELECT * FROM sched
       WHERE {ny_time('sched_departure_ts')} BETWEEN '06:00:00' AND '10:00:00'),
fe0 AS (
  SELECT route_id, direction_id, trip_uid, stop_sequence_int, stu_id,
         coalesce(departure_ts_utc, arrival_ts_utc) AS evt
  FROM o_fact_trips_stops
),
fe1 AS (
  SELECT *, row_number() OVER (
      PARTITION BY route_id, direction_id, trip_uid
      ORDER BY (CASE WHEN stop_sequence_int IS NULL THEN 0 ELSE 1 END),
               stop_sequence_int ASC, stu_id ASC) AS rn
  FROM fe0 WHERE evt IS NOT NULL
),
fe AS (SELECT route_id, direction_id, trip_uid, evt AS first_evt FROM fe1 WHERE rn = 1)
"""

CASES = {}


def case(name):
    def deco(fn):
        CASES[name] = fn
        return fn

    return deco


@case("m1")
def _m1(models, src):
    from mta_rtf_dbt_spark.metrics.guide import m1_trips_per_minute

    sql = f"""
    SELECT route_id, direction_id, date_trunc('minute', feed_ts_utc) AS ts_minute,
           count(DISTINCT trip_uid) AS trips_observed
    FROM o_fact_trips_stops
    WHERE feed_ts_utc BETWEEN TIMESTAMP '{START}' AND TIMESTAMP '{END}'
    GROUP BY 1, 2, 3
    """
    return m1_trips_per_minute(models, START, END), sql


@case("m2")
def _m2(models, src):
    from mta_rtf_dbt_spark.metrics.guide import m2_trips_per_5min

    sql = f"""
    SELECT route_id, direction_id,
           CAST(to_timestamp(300 * (CAST(floor(epoch_us(feed_ts_utc)/1000000.0) AS BIGINT) // 300)) AS TIMESTAMP) AS ts_5min,
           count(DISTINCT trip_uid) AS trips_observed
    FROM o_fact_trips_stops
    WHERE feed_ts_utc BETWEEN TIMESTAMP '{START}' AND TIMESTAMP '{END}'
    GROUP BY 1, 2, 3
    """
    return m2_trips_per_5min(models, START, END), sql


@case("m3")
def _m3(models, src):
    from mta_rtf_dbt_spark.metrics.guide import m3_service_delivered

    sql = f"""
    WITH {SCHED},
    aiw AS (SELECT route_id, direction_id, trip_uid FROM fe
            WHERE {ny_time('first_evt')} BETWEEN '06:00:00' AND '10:00:00')
    SELECT s.route_id, s.direction_id,
           count(DISTINCT s.trip_id) AS scheduled_trips,
           count(DISTINCT a.trip_uid) AS delivered_trips,
           CAST(count(DISTINCT a.trip_uid) * 1000000 // NULLIF(count(DISTINCT s.trip_id), 0) AS BIGINT) AS service_delivered_ppm
    FROM wl s LEFT JOIN aiw a USING (route_id, direction_id)
    GROUP BY 1, 2
    """
    return m3_service_delivered(models, src, DAY), sql


@case("m4")
def _m4(models, src):
    from mta_rtf_dbt_spark.metrics.guide import m4_terminal_otp

    diff = TRUNC_DIV_MIN.format(a="f.first_evt", b="s.sched_departure_ts")
    sql = f"""
    WITH {SCHED},
    fe2 AS (SELECT route_id, direction_id, first_evt FROM fe)
    SELECT s.route_id, s.direction_id,
           100 * AVG(CASE WHEN {diff} BETWEEN 0 AND 5 THEN 1 ELSE 0 END) AS otp_pct
    FROM wl s LEFT JOIN fe2 f USING (route_id, direction_id)
    GROUP BY 1, 2
    """
    return m4_terminal_otp(models, src, DAY), sql


@case("m5")
def _m5(models, src):
    from mta_rtf_dbt_spark.metrics.guide import m5_headways

    hw = TRUNC_DIV_SEC.format(a="pass_ts", b="prev_ts")
    sql = f"""
    WITH seen AS (
      SELECT date_trunc('second', event_ts_utc) AS pass_ts, route_id, direction_id, trip_uid
      FROM o_fact_trips_stops
      WHERE stop_id = '{STOP_A}'
        AND CAST({NY_CIVIL.format(c='event_ts_utc')} AS DATE) = DATE '{DAY}'
    ),
    dedup AS (SELECT * FROM seen
              QUALIFY row_number() OVER (PARTITION BY trip_uid ORDER BY pass_ts) = 1),
    ordered AS (SELECT *, row_number() OVER (ORDER BY pass_ts, trip_uid) AS rn,
                       lag(pass_ts) OVER (PARTITION BY route_id, direction_id
                                          ORDER BY pass_ts, trip_uid) AS prev_ts
                FROM dedup)
    SELECT route_id, direction_id, pass_ts,
           CASE WHEN prev_ts IS NULL THEN NULL ELSE {hw} END AS headway_s
    FROM ordered WHERE rn > 1
    """
    return m5_headways(models, STOP_A, DAY), sql


@case("m6")
def _m6(models, src):
    from mta_rtf_dbt_spark.metrics.guide import m6_dwell_times

    d = TRUNC_DIV_SEC.format(a="departure_ts_utc", b="arrival_ts_utc")
    sql = f"""
    SELECT route_id, direction_id, stop_id, trip_uid, {d} AS dwell_s
    FROM o_fact_trips_stops
    WHERE arrival_ts_utc IS NOT NULL AND departure_ts_utc IS NOT NULL
    """
    return m6_dwell_times(models), sql


@case("m7")
def _m7(models, src):
    from mta_rtf_dbt_spark.metrics.guide import m7_run_time

    rt = TRUNC_DIV_SEC.format(a="tb.ts_b", b="ta.ts_a")
    sql = f"""
    WITH a AS (SELECT trip_uid, coalesce(departure_ts_utc, arrival_ts_utc) AS ts_a
               FROM o_fact_trips_stops WHERE stop_id = '{STOP_A}'),
    b AS (SELECT trip_uid, coalesce(arrival_ts_utc, departure_ts_utc) AS ts_b
          FROM o_fact_trips_stops WHERE stop_id = '{STOP_B}')
    SELECT ta.trip_uid, {rt} AS runtime_s
    FROM a ta JOIN b tb USING (trip_uid)
    WHERE tb.ts_b >= ta.ts_a
    """
    return m7_run_time(models, STOP_A, STOP_B), sql


@case("m8")
def _m8(models, src):
    from mta_rtf_dbt_spark.metrics.guide import m8_excess_delay

    d = TRUNC_DIV_SEC.format(a="a.actual_ts", b="s.sched_departure_ts")
    sql = f"""
    WITH sched AS (
      SELECT t.route_id, t.direction_id, st.trip_id, st.stop_id,
             TIMESTAMP '{DAY} 00:00:00'
               + CAST(split_part(st.departure_time, ':', 1) AS BIGINT) * INTERVAL 1 HOUR
               + CAST(split_part(st.departure_time, ':', 2) AS BIGINT) * INTERVAL 1 MINUTE
               + CAST(split_part(st.departure_time, ':', 3) AS BIGINT) * INTERVAL 1 SECOND
             AS sched_departure_ts
      FROM stop_times st JOIN trips t USING (trip_id)
      WHERE st.stop_id = '{STOP_A}'
    ),
    actual AS (SELECT route_id, direction_id, stop_id, trip_uid,
                      coalesce(departure_ts_utc, arrival_ts_utc) AS actual_ts
               FROM o_fact_trips_stops WHERE stop_id = '{STOP_A}')
    SELECT a.route_id, a.direction_id, a.stop_id,
           ROUND(CAST(quantile_cont(CAST({d} AS DOUBLE), 0.5) AS DOUBLE), 6) AS p50_delay_s,
           ROUND(CAST(quantile_cont(CAST({d} AS DOUBLE), 0.9) AS DOUBLE), 6) AS p90_delay_s
    FROM actual a JOIN sched s USING (route_id, direction_id)
    GROUP BY 1, 2, 3
    """
    return m8_excess_delay(models, src, DAY, STOP_A), sql


@case("m9")
def _m9(models, src):
    from mta_rtf_dbt_spark.metrics.guide import m9_completeness

    sql = """
    WITH agg AS (
      SELECT trip_uid,
             count_if(coalesce(arrival_ts_utc, departure_ts_utc) IS NOT NULL) AS stops_seen
      FROM o_fact_trips_stops GROUP BY trip_uid
    )
    SELECT COUNT(*) AS trips_total,
           count_if(stops_seen >= 2) AS trips_with_start_and_end,
           CAST(count_if(stops_seen >= 2) * 1000000 // NULLIF(COUNT(*), 0) AS BIGINT) AS completeness_ppm
    FROM agg
    """
    return m9_completeness(models), sql


@case("m10")
def _m10(models, src):
    from mta_rtf_dbt_spark.metrics.guide import m10_added_canceled_share

    sql = """
    SELECT route_id, direction_id,
           100 * AVG(CASE WHEN schedule_relationship = 'ADDED' THEN 1 ELSE 0 END) AS added_pct,
           100 * AVG(CASE WHEN schedule_relationship = 'CANCELED' THEN 1 ELSE 0 END) AS canceled_pct
    FROM o_fact_trips GROUP BY 1, 2
    """
    return m10_added_canceled_share(models), sql


@case("m11")
def _m11(models, src):
    from mta_rtf_dbt_spark.metrics.guide import m11_feed_latency

    lat = TRUNC_DIV_SEC.format(
        a="CAST(CAST(first_ingest_ts AS TIMESTAMPTZ) AS TIMESTAMP)", b="first_feed_ts_utc"
    )
    sql = f"""
    SELECT route_id, direction_id, date_trunc('minute', first_feed_ts_utc) AS ts_minute,
           AVG({lat}) AS avg_latency_s
    FROM o_fact_trips GROUP BY 1, 2, 3
    """
    return m11_feed_latency(models), sql


@case("m12")
def _m12(models, src):
    from mta_rtf_dbt_spark.metrics.guide import m12_wait_assessment

    hw = TRUNC_DIV_SEC.format(a="pass_ts", b="prev_ts")
    shw = TRUNC_DIV_SEC.format(a="sched_ts", b="prev_sched")
    sql = f"""
    WITH obs AS (SELECT route_id, direction_id, date_trunc('second', event_ts_utc) AS pass_ts
                 FROM o_fact_trips_stops WHERE stop_id = '{STOP_A}'),
    obs_hw AS (SELECT route_id, direction_id,
                      CASE WHEN prev_ts IS NULL THEN NULL ELSE {hw} END AS headway_s
               FROM (SELECT *, lag(pass_ts) OVER (PARTITION BY route_id, direction_id
                                                  ORDER BY pass_ts) AS prev_ts FROM obs)),
    sch AS (SELECT t.route_id, t.direction_id,
                   TIMESTAMP '{DAY} 00:00:00'
                     + CAST(split_part(st.departure_time, ':', 1) AS BIGINT) * INTERVAL 1 HOUR
                     + CAST(split_part(st.departure_time, ':', 2) AS BIGINT) * INTERVAL 1 MINUTE
                     + CAST(split_part(st.departure_time, ':', 3) AS BIGINT) * INTERVAL 1 SECOND
                   AS sched_ts
            FROM stop_times st JOIN trips t USING (trip_id)
            WHERE st.stop_id = '{STOP_A}'),
    sch_hw AS (SELECT route_id, direction_id,
                      CASE WHEN prev_sched IS NULL THEN NULL ELSE {shw} END AS sched_headway_s
               FROM (SELECT *, lag(sched_ts) OVER (PARTITION BY route_id, direction_id
                                                   ORDER BY sched_ts) AS prev_sched FROM sch))
    SELECT o.route_id, o.direction_id,
           100 * AVG(CASE WHEN o.headway_s <= 2 * s.sched_headway_s THEN 1 ELSE 0 END) AS wait_assessment_pct
    FROM obs_hw o JOIN sch_hw s USING (route_id, direction_id)
    WHERE o.headway_s IS NOT NULL AND s.sched_headway_s IS NOT NULL
    GROUP BY 1, 2
    """
    return m12_wait_assessment(models, src, STOP_A, DAY), sql


@pytest.fixture(scope="session")
def mta_src(spark, mta_dir):  # noqa: F811
    from mta_rtf_dbt_spark.sources.fixtures import MTA_TABLES
    from mta_rtf_dbt_spark.sources.registry import load

    return {t: load(spark, mta_dir, t) for t in MTA_TABLES}


@pytest.mark.parametrize("name", sorted(CASES))
def test_metric_parity(mta_models, mta_src, duck_mta, name):  # noqa: F811
    df, sql = CASES[name](mta_models, mta_src)
    errs = compare(name, df, duck_mta, sql)
    assert not errs, "\n".join(errs)
