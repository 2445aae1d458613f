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
