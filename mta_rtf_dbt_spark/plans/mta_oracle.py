"""Independent DuckDB re-implementation of the four MTA models — the oracle
for tests/test_mta_models.py AND for the driver-gated entries in
plans/mta_driver.py. Mirrors the engine's determinism policy (ANY_VALUE ->
MIN, stu_id tiebreakers) and BigQuery null-ordering semantics (ASC NULLS
FIRST / DESC NULLS LAST — DuckDB defaults differ, so orderings are explicit).

Each ``*_BODY`` constant is a bare ``WITH ... SELECT`` usable either as a
``CREATE VIEW`` body (tests) or nested inside a CTE (driver oracle SQL,
where the source tables are themselves ``read_parquet`` CTEs)."""

UID_TEXT = """
    coalesce(tu.service_date, 'UNK') || '|' ||
    coalesce(tu.route_id, 'UNK') || '|' ||
    coalesce(st.trip_headsign, 'UNK') || '|' ||
    coalesce(NULLIF(regexp_extract(tu.rt_trip_id, '^-?\\d{1,8}'), ''), tu.rt_trip_id, 'UNK')
"""

FACT_TRIPS_STOPS_BODY = f"""
WITH tu AS (
  SELECT _dlt_id AS tu_id, as_of, feed, trip_update__timestamp,
         trip_update__trip__trip_id AS rt_trip_id,
         trip_update__trip__route_id AS route_id,
         trip_update__trip__direction_id AS direction_id,
         trip_update__trip__start_date AS service_date,
         trip_update__trip__schedule_relationship AS trip_schedule_relationship
  FROM trip_updates
),
stu AS (
  SELECT _dlt_id AS stu_id, _dlt_parent_id AS tu_id, stop_id, stop_sequence,
         arrival__time, departure__time, arrival__delay, departure__delay,
         arrival__uncertainty, departure__uncertainty,
         schedule_relationship AS stu_schedule_relationship
  FROM trip_updates__trip_update__stop_time_update
),
base AS (
  SELECT
    tu.tu_id, stu.stu_id, tu.as_of, tu.feed,
    tu.rt_trip_id, tu.route_id, tu.direction_id, tu.service_date,
    tu.trip_schedule_relationship, st.trip_headsign,
    stu.stop_id, stu.stop_sequence,
    TRY_CAST(stu.stop_sequence AS BIGINT) AS stop_sequence_int,
    s.stop_name, s.parent_station, s.stop_lat, s.stop_lon,
    CAST(to_timestamp(TRY_CAST(tu.trip_update__timestamp AS BIGINT)) AS TIMESTAMP) AS feed_ts_utc,
    CASE WHEN stu.arrival__time IS NOT NULL
         THEN CAST(to_timestamp(TRY_CAST(stu.arrival__time AS BIGINT)) AS TIMESTAMP) END AS arrival_ts_utc,
    CASE WHEN stu.departure__time IS NOT NULL
         THEN CAST(to_timestamp(TRY_CAST(stu.departure__time AS BIGINT)) AS TIMESTAMP) END AS departure_ts_utc,
    stu.arrival__delay, stu.departure__delay,
    stu.arrival__uncertainty, stu.departure__uncertainty, stu.stu_schedule_relationship,
    coalesce(tu.route_id, 'UNK') || '|' || coalesce(st.trip_headsign, 'UNK') AS route_headsign_key,
    NULLIF(regexp_extract(tu.rt_trip_id, '^-?\\d{{1,8}}'), '') AS rt_origin_code_hundredths,
    {UID_TEXT} AS trip_uid_text,
    sha256({UID_TEXT}) AS trip_uid
  FROM tu
  JOIN stu ON stu.tu_id = tu.tu_id
  LEFT JOIN stops s ON s.stop_id = stu.stop_id
  LEFT JOIN trips st ON st.trip_id = tu.rt_trip_id
)
SELECT base.*,
  (arrival_ts_utc IS NOT NULL) AS has_arrival_ts,
  (departure_ts_utc IS NOT NULL) AS has_departure_ts,
  coalesce(arrival_ts_utc, departure_ts_utc) AS event_ts_utc,
  CASE WHEN arrival_ts_utc IS NOT NULL THEN 'arrival'
       WHEN departure_ts_utc IS NOT NULL THEN 'departure' END AS event_kind_primary,
  CAST(coalesce(arrival_ts_utc, departure_ts_utc) AT TIME ZONE 'UTC'
       AT TIME ZONE 'America/New_York' AS TIMESTAMP) AS event_dt_local,
  CAST(CAST(coalesce(arrival_ts_utc, departure_ts_utc) AT TIME ZONE 'UTC'
       AT TIME ZONE 'America/New_York' AS TIMESTAMP) AS DATE) AS service_day_local
FROM base
"""

FACT_TRIPS_BODY = """
WITH keyed AS (
  SELECT *,
    row_number() OVER (PARTITION BY trip_uid ORDER BY
      (CASE WHEN stop_sequence_int IS NULL THEN 1 ELSE 0 END) ASC,
      stop_sequence_int ASC, event_ts_utc ASC NULLS FIRST, stu_id ASC) AS rn_first_stop,
    row_number() OVER (PARTITION BY trip_uid ORDER BY
      (CASE WHEN stop_sequence_int IS NULL THEN 1 ELSE 0 END) ASC,
      stop_sequence_int DESC, event_ts_utc DESC NULLS LAST, stu_id DESC) AS rn_last_stop,
    row_number() OVER (PARTITION BY trip_uid ORDER BY
      stop_sequence_int ASC NULLS FIRST, stu_id ASC) AS rn_first_evt,
    row_number() OVER (PARTITION BY trip_uid ORDER BY
      stop_sequence_int DESC NULLS LAST, stu_id DESC) AS rn_last_evt
  FROM o_fact_trips_stops
),
agg AS (
  SELECT trip_uid,
    MIN(trip_uid_text) AS trip_uid_text,
    MIN(rt_trip_id) AS rt_trip_id,
    MIN(route_id) AS route_id,
    MIN(direction_id) AS direction_id,
    MIN(trip_headsign) AS trip_headsign,
    MIN(service_date) AS service_date,
    MIN(rt_origin_code_hundredths) AS rt_origin_code_hundredths,
    MIN(feed_ts_utc) AS first_feed_ts_utc,
    MAX(feed_ts_utc) AS last_feed_ts_utc,
    MIN(as_of) AS first_ingest_ts,
    MAX(as_of) AS last_ingest_ts,
    MIN(CASE WHEN rn_first_stop = 1 THEN stop_id END) AS first_stop_id,
    MIN(CASE WHEN rn_last_stop = 1 THEN stop_id END) AS last_stop_id,
    MIN(stop_sequence_int) AS first_stop_sequence,
    MAX(stop_sequence_int) AS last_stop_sequence,
    MIN(CASE WHEN rn_first_evt = 1 THEN event_ts_utc END) AS first_event_ts_utc,
    MIN(CASE WHEN rn_last_evt = 1 THEN event_ts_utc END) AS last_event_ts_utc,
    MIN(trip_schedule_relationship) AS schedule_relationship
  FROM keyed
  GROUP BY trip_uid
),
agg2 AS (
  SELECT *,
    CAST((epoch_us(last_event_ts_utc) - epoch_us(first_event_ts_utc)
          - ((epoch_us(last_event_ts_utc) - epoch_us(first_event_ts_utc)) % 1000000))
         // 1000000 AS BIGINT) AS trip_duration_s
  FROM agg
)
SELECT agg2.trip_uid, agg2.trip_uid_text, agg2.rt_trip_id, agg2.route_id,
  agg2.direction_id, agg2.trip_headsign, agg2.service_date,
  agg2.rt_origin_code_hundredths,
  agg2.first_feed_ts_utc, agg2.last_feed_ts_utc, agg2.first_ingest_ts,
  agg2.last_ingest_ts, agg2.first_stop_id, agg2.last_stop_id,
  agg2.first_stop_sequence, agg2.last_stop_sequence,
  agg2.first_event_ts_utc, agg2.last_event_ts_utc, agg2.trip_duration_s,
  agg2.schedule_relationship,
  fs.stop_name AS first_stop_name, fs.parent_station AS first_parent_station,
  fs.stop_lat AS first_stop_lat, fs.stop_lon AS first_stop_lon,
  ls.stop_name AS last_stop_name, ls.parent_station AS last_parent_station,
  ls.stop_lat AS last_stop_lat, ls.stop_lon AS last_stop_lon
FROM agg2
LEFT JOIN stops fs ON fs.stop_id = agg2.first_stop_id
LEFT JOIN stops ls ON ls.stop_id = agg2.last_stop_id
"""

FACT_DELAYS_BODY = """
SELECT trip_uid, trip_uid_text, tu_id, stu_id, as_of, feed,
       rt_trip_id, route_id, direction_id, service_date,
       trip_schedule_relationship, trip_headsign,
       stop_id, stop_name, parent_station, stop_lat, stop_lon,
       stop_sequence, stop_sequence_int,
       feed_ts_utc, arrival_ts_utc, departure_ts_utc, event_ts_utc,
       event_kind_primary, event_dt_local, service_day_local,
       arrival__delay, departure__delay,
       arrival__uncertainty, departure__uncertainty, stu_schedule_relationship,
       route_headsign_key, rt_origin_code_hundredths,
       has_arrival_ts, has_departure_ts
FROM o_fact_trips_stops
WHERE feed = 'main'
  AND (arrival__delay IS NOT NULL OR departure__delay IS NOT NULL)
"""

FACT_ALERTS_BODY = """
WITH b AS (
  SELECT feed, entity_id, as_of, _dlt_id AS alert_id, _dlt_load_id
  FROM alerts WHERE feed = 'alerts'
),
h AS (
  SELECT _dlt_parent_id AS alert_id, MIN(text) AS header_text
  FROM alerts__alert__header_text__translation GROUP BY 1
),
d AS (
  SELECT _dlt_parent_id AS alert_id, MIN(text) AS description_text
  FROM alerts__alert__description_text__translation GROUP BY 1
),
ap AS (
  SELECT _dlt_parent_id AS alert_id,
    MIN(CASE WHEN start IS NOT NULL THEN CAST(to_timestamp(TRY_CAST(start AS BIGINT)) AS TIMESTAMP) END) AS first_start_ts_utc,
    MAX(CASE WHEN "end" IS NOT NULL THEN CAST(to_timestamp(TRY_CAST("end" AS BIGINT)) AS TIMESTAMP) END) AS last_end_ts_utc
  FROM alerts__alert__active_period GROUP BY 1
),
i AS (
  SELECT _dlt_parent_id AS alert_id,
    MIN(coalesce(trip__route_id, route_id)) AS route_id,
    MIN(trip__trip_id) AS rt_trip_id,
    MIN(stop_id) AS stop_id,
    MIN(agency_id) AS agency_id
  FROM alerts__alert__informed_entity GROUP BY 1
)
SELECT b.feed, b.entity_id, b.as_of, b.alert_id,
  h.header_text, d.description_text,
  ap.first_start_ts_utc, ap.last_end_ts_utc,
  i.route_id,
  r.route_short_name, r.route_long_name, r.route_type,
  r.route_color, r.route_text_color, r.route_desc, r.agency_id,
  s.stop_name, s.parent_station, s.stop_lat, s.stop_lon
FROM b
LEFT JOIN h ON h.alert_id = b.alert_id
LEFT JOIN d ON d.alert_id = b.alert_id
LEFT JOIN ap ON ap.alert_id = b.alert_id
LEFT JOIN i ON i.alert_id = b.alert_id
LEFT JOIN stops s ON s.stop_id = i.stop_id
LEFT JOIN routes r ON r.route_id = i.route_id
"""

FACT_TRIPS_STOPS = f"CREATE OR REPLACE VIEW o_fact_trips_stops AS\n{FACT_TRIPS_STOPS_BODY}"
FACT_TRIPS = f"CREATE OR REPLACE VIEW o_fact_trips AS\n{FACT_TRIPS_BODY}"
FACT_DELAYS = f"CREATE OR REPLACE VIEW o_fact_delays AS\n{FACT_DELAYS_BODY}"
FACT_ALERTS = f"CREATE OR REPLACE VIEW o_fact_alerts AS\n{FACT_ALERTS_BODY}"

MODEL_VIEWS = [FACT_TRIPS_STOPS, FACT_TRIPS, FACT_DELAYS, FACT_ALERTS]


# ---------------------------------------------------------------------------
# M1-M12 metric oracle SQL (docs/metrics_guide.md:22-377) — written against
# the o_fact_* views/CTEs above plus the raw static tables, with the
# canonical test parameters. Single source of truth: tests/test_mta_metrics
# runs these against registered views; plans/mta_driver nests them after
# read_parquet fixture CTEs for the driver's independent hash gate.
#
# Driver-hash discipline: COUNT/count_if outputs CAST AS BIGINT (DuckDB
# count_if yields HUGEINT -> decimal128 in Arrow, which breaks the value
# hash), ratios as integer ppm or ROUND(.., 6) doubles mirrored on the Spark
# side.
# ---------------------------------------------------------------------------
DAY = "2025-11-01"
START = "2025-11-01 06:00:00"
END = "2025-11-02 23:00:00"
STOP_A, STOP_B = "R14N", "R16N"

NY_CIVIL = "CAST({c} AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS TIMESTAMP)"


def ny_time(c: str) -> str:
    return f"strftime({NY_CIVIL.format(c=c)}, '%H:%M:%S')"


TRUNC_DIV_SEC = (
    "CAST((epoch_us({a}) - epoch_us({b}) - ((epoch_us({a}) - epoch_us({b})) % 1000000))"
    " // 1000000 AS BIGINT)"
)
TRUNC_DIV_MIN = (
    "CAST((epoch_us({a}) - epoch_us({b}) - ((epoch_us({a}) - epoch_us({b})) % 60000000))"
    " // 60000000 AS BIGINT)"
)

# GTFS "HH:MM:SS" (possibly >= 24:00:00, D10) anchored to DAY — interval adds
# roll over midnight exactly like the engine's gtfs_time_to_ts.
_GTFS_TS = f"""TIMESTAMP '{DAY} 00:00:00'
               + CAST(split_part({{t}}, ':', 1) AS BIGINT) * INTERVAL 1 HOUR
               + CAST(split_part({{t}}, ':', 2) AS BIGINT) * INTERVAL 1 MINUTE
               + CAST(split_part({{t}}, ':', 3) AS BIGINT) * INTERVAL 1 SECOND"""

# Shared scheduled-side CTE chain for M3/M4 (metrics_guide.md:63-127):
# active services by calendar day flags, terminal stop per trip, scheduled
# departure window, and the argmin first-event per (route, dir, trip_uid).
SCHED_CTES = f"""
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
         {_GTFS_TS.format(t="st.departure_time")} AS sched_departure_ts
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

METRIC_SQL: dict[str, str] = {}

METRIC_SQL["m1"] = f"""
SELECT route_id, direction_id, date_trunc('minute', feed_ts_utc) AS ts_minute,
       count(DISTINCT trip_uid) AS trips_observed
FROM o_fact_trips_stops
WHERE feed_ts_utc BETWEEN TIMESTAMP '{START}' AND TIMESTAMP '{END}'
GROUP BY 1, 2, 3
"""

METRIC_SQL["m2"] = f"""
SELECT route_id, direction_id,
       CAST(to_timestamp(300 * (CAST(floor(epoch_us(feed_ts_utc)/1000000.0) AS BIGINT) // 300)) AS TIMESTAMP) AS ts_5min,
       count(DISTINCT trip_uid) AS trips_observed
FROM o_fact_trips_stops
WHERE feed_ts_utc BETWEEN TIMESTAMP '{START}' AND TIMESTAMP '{END}'
GROUP BY 1, 2, 3
"""

METRIC_SQL["m3"] = f"""
WITH {SCHED_CTES},
aiw AS (SELECT route_id, direction_id, trip_uid FROM fe
        WHERE {ny_time('first_evt')} BETWEEN '06:00:00' AND '10:00:00')
SELECT s.route_id, s.direction_id,
       count(DISTINCT s.trip_id) AS scheduled_trips,
       count(DISTINCT a.trip_uid) AS delivered_trips,
       CAST(count(DISTINCT a.trip_uid) * 1000000 // NULLIF(count(DISTINCT s.trip_id), 0) AS BIGINT) AS service_delivered_ppm
FROM wl s LEFT JOIN aiw a USING (route_id, direction_id)
GROUP BY 1, 2
"""

METRIC_SQL["m4"] = f"""
WITH {SCHED_CTES},
fe2 AS (SELECT route_id, direction_id, first_evt FROM fe)
SELECT s.route_id, s.direction_id,
       ROUND(100 * AVG(CASE WHEN {TRUNC_DIV_MIN.format(a="f.first_evt", b="s.sched_departure_ts")}
                            BETWEEN 0 AND 5 THEN 1 ELSE 0 END), 6) AS otp_pct
FROM wl s LEFT JOIN fe2 f USING (route_id, direction_id)
GROUP BY 1, 2
"""

METRIC_SQL["m5"] = f"""
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
       CASE WHEN prev_ts IS NULL THEN NULL
            ELSE {TRUNC_DIV_SEC.format(a="pass_ts", b="prev_ts")} END AS headway_s
FROM ordered WHERE rn > 1
"""

METRIC_SQL["m6"] = f"""
SELECT route_id, direction_id, stop_id, trip_uid,
       {TRUNC_DIV_SEC.format(a="departure_ts_utc", b="arrival_ts_utc")} AS dwell_s
FROM o_fact_trips_stops
WHERE arrival_ts_utc IS NOT NULL AND departure_ts_utc IS NOT NULL
"""

METRIC_SQL["m7"] = f"""
WITH a AS (SELECT trip_uid, coalesce(departure_ts_utc, arrival_ts_utc) AS ts_a
           FROM o_fact_trips_stops WHERE stop_id = '{STOP_A}'),
b AS (SELECT trip_uid, coalesce(arrival_ts_utc, departure_ts_utc) AS ts_b
      FROM o_fact_trips_stops WHERE stop_id = '{STOP_B}')
SELECT ta.trip_uid, {TRUNC_DIV_SEC.format(a="tb.ts_b", b="ta.ts_a")} AS runtime_s
FROM a ta JOIN b tb USING (trip_uid)
WHERE tb.ts_b >= ta.ts_a
"""

METRIC_SQL["m8"] = f"""
WITH sched AS (
  SELECT t.route_id, t.direction_id, st.trip_id, st.stop_id,
         {_GTFS_TS.format(t="st.departure_time")} AS sched_departure_ts
  FROM stop_times st JOIN trips t USING (trip_id)
  WHERE st.stop_id = '{STOP_A}'
),
actual AS (SELECT route_id, direction_id, stop_id, trip_uid,
                  coalesce(departure_ts_utc, arrival_ts_utc) AS actual_ts
           FROM o_fact_trips_stops WHERE stop_id = '{STOP_A}')
SELECT a.route_id, a.direction_id, a.stop_id,
       ROUND(CAST(quantile_cont(CAST({TRUNC_DIV_SEC.format(a="a.actual_ts", b="s.sched_departure_ts")} AS DOUBLE), 0.5) AS DOUBLE), 6) AS p50_delay_s,
       ROUND(CAST(quantile_cont(CAST({TRUNC_DIV_SEC.format(a="a.actual_ts", b="s.sched_departure_ts")} AS DOUBLE), 0.9) AS DOUBLE), 6) AS p90_delay_s
FROM actual a JOIN sched s USING (route_id, direction_id)
GROUP BY 1, 2, 3
"""

METRIC_SQL["m9"] = """
WITH agg AS (
  SELECT trip_uid,
         count_if(coalesce(arrival_ts_utc, departure_ts_utc) IS NOT NULL) AS stops_seen
  FROM o_fact_trips_stops GROUP BY trip_uid
)
SELECT CAST(COUNT(*) AS BIGINT) AS trips_total,
       CAST(count_if(stops_seen >= 2) AS BIGINT) AS trips_with_start_and_end,
       CAST(count_if(stops_seen >= 2) * 1000000 // NULLIF(COUNT(*), 0) AS BIGINT) AS completeness_ppm
FROM agg
"""

METRIC_SQL["m10"] = """
SELECT route_id, direction_id,
       ROUND(100 * AVG(CASE WHEN schedule_relationship = 'ADDED' THEN 1 ELSE 0 END), 6) AS added_pct,
       ROUND(100 * AVG(CASE WHEN schedule_relationship = 'CANCELED' THEN 1 ELSE 0 END), 6) AS canceled_pct
FROM o_fact_trips GROUP BY 1, 2
"""

METRIC_SQL["m11"] = f"""
SELECT route_id, direction_id, date_trunc('minute', first_feed_ts_utc) AS ts_minute,
       ROUND(AVG({TRUNC_DIV_SEC.format(
           a="CAST(CAST(first_ingest_ts AS TIMESTAMPTZ) AS TIMESTAMP)",
           b="first_feed_ts_utc")}), 6) AS avg_latency_s
FROM o_fact_trips GROUP BY 1, 2, 3
"""

METRIC_SQL["m12"] = f"""
WITH obs AS (SELECT route_id, direction_id, date_trunc('second', event_ts_utc) AS pass_ts
             FROM o_fact_trips_stops WHERE stop_id = '{STOP_A}'),
obs_hw AS (SELECT route_id, direction_id,
                  CASE WHEN prev_ts IS NULL THEN NULL
                       ELSE {TRUNC_DIV_SEC.format(a="pass_ts", b="prev_ts")} END AS headway_s
           FROM (SELECT *, lag(pass_ts) OVER (PARTITION BY route_id, direction_id
                                              ORDER BY pass_ts) AS prev_ts FROM obs)),
sch AS (SELECT t.route_id, t.direction_id,
               {_GTFS_TS.format(t="st.departure_time")} AS sched_ts
        FROM stop_times st JOIN trips t USING (trip_id)
        WHERE st.stop_id = '{STOP_A}'),
sch_hw AS (SELECT route_id, direction_id,
                  CASE WHEN prev_sched IS NULL THEN NULL
                       ELSE {TRUNC_DIV_SEC.format(a="sched_ts", b="prev_sched")} END AS sched_headway_s
           FROM (SELECT *, lag(sched_ts) OVER (PARTITION BY route_id, direction_id
                                               ORDER BY sched_ts) AS prev_sched FROM sch))
SELECT o.route_id, o.direction_id,
       ROUND(100 * AVG(CASE WHEN o.headway_s <= 2 * s.sched_headway_s THEN 1 ELSE 0 END), 6) AS wait_assessment_pct
FROM obs_hw o JOIN sch_hw s USING (route_id, direction_id)
WHERE o.headway_s IS NOT NULL AND s.sched_headway_s IS NOT NULL
GROUP BY 1, 2
"""
