"""The four reference models as DataFrame builders + a dbt-style DAG.

Source semantics (reference, cited per builder):
  - fact_trips_stops — /root/reference/models/fact_trips_stops.sql:1-137
  - fact_trips       — /root/reference/models/fact_trips.sql:1-90
  - fact_delays      — /root/reference/models/fact_delays.sql:1-54
  - fact_alerts      — /root/reference/models/fact_alerts.sql:1-94

Determinism policy (SURVEY.md §4 D4/D5, applied consistently in the DuckDB
oracles in tests/mta_oracle_sql.py):
  - BigQuery ``ANY_VALUE`` (nondeterministic, ignores NULLs) is implemented
    as ``MIN`` (deterministic, ignores NULLs).
  - Every argmin/argmax gets a trailing unique ``stu_id`` tiebreaker.
BigQuery default null ordering is replicated exactly where the reference
relies on it: ASC → NULLS FIRST, DESC → NULLS LAST, and the explicit
CASE-WHEN-null prefix (fact_trips.sql:44-47,52-55) forces nulls-last for the
terminal-stop argmin/argmax.

Scale posture: fact_trips_stops is one fact-fact shuffle join (tu×stu on
tu_id) plus two broadcast dim joins; fact_trips is a single hash aggregate on
trip_uid (min_by/max_by — map-side combinable, no sort, no array
materialization) plus two broadcast joins; fact_alerts pre-aggregates each
child then broadcast-left-joins. All views stay lazy (dbt
materialized='view'); ``materialize`` writes partitioned parquet for the
reference's production hint (metrics_guide.md:385).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mta_rtf_dbt_spark.functions import bq

ORIGIN_RE = r"^-?\d{1,8}"


# ---------------------------------------------------------------------------
# fact_trips_stops
# ---------------------------------------------------------------------------
def fact_trips_stops(src: dict[str, DataFrame]) -> DataFrame:
    """Stop-level fact: one row per stop_time_update per snapshot
    (fact_trips_stops.sql:3-136)."""
    tu = src["trip_updates"].select(
        F.col("_dlt_id").alias("tu_id"),
        "as_of",
        "feed",
        "trip_update__timestamp",
        F.col("trip_update__trip__trip_id").alias("rt_trip_id"),
        F.col("trip_update__trip__route_id").alias("route_id"),
        F.col("trip_update__trip__direction_id").alias("direction_id"),
        F.col("trip_update__trip__start_date").alias("service_date"),
        F.col("trip_update__trip__schedule_relationship").alias("trip_schedule_relationship"),
    )
    stu = src["trip_updates__trip_update__stop_time_update"].select(
        F.col("_dlt_id").alias("stu_id"),
        F.col("_dlt_parent_id").alias("tu_id"),
        "stop_id",
        "stop_sequence",
        "arrival__time",
        "departure__time",
        "arrival__delay",
        "departure__delay",
        "arrival__uncertainty",
        "departure__uncertainty",
        F.col("schedule_relationship").alias("stu_schedule_relationship"),
    )
    stops = src["stops"].select("stop_id", "stop_name", "parent_station", "stop_lat", "stop_lon")
    static_trips = src["trips"].select(
        "trip_id",
        F.col("route_id").alias("static_route_id"),
        "service_id",
        "trip_headsign",
        F.col("direction_id").alias("static_direction_id"),
    )

    origin = bq.regexp_extract(F.col("rt_trip_id"), ORIGIN_RE)
    uid_origin = F.coalesce(origin, F.col("rt_trip_id"), F.lit("UNK"))
    uid_text = bq.concat(
        F.coalesce(F.col("service_date"), F.lit("UNK")),
        F.lit("|"),
        F.coalesce(F.col("route_id"), F.lit("UNK")),
        F.lit("|"),
        F.coalesce(F.col("trip_headsign"), F.lit("UNK")),
        F.lit("|"),
        uid_origin,
    )
    arr_ts = F.when(
        F.col("arrival__time").isNotNull(),
        bq.timestamp_seconds(bq.safe_cast(F.col("arrival__time"), "long")),
    )
    dep_ts = F.when(
        F.col("departure__time").isNotNull(),
        bq.timestamp_seconds(bq.safe_cast(F.col("departure__time"), "long")),
    )
    evt = F.coalesce(F.col("arrival_ts_utc"), F.col("departure_ts_utc"))

    base = (
        tu.join(stu, "tu_id", "inner")
        .join(F.broadcast(stops), "stop_id", "left")
        .join(
            F.broadcast(static_trips),
            F.col("trip_id") == F.col("rt_trip_id"),
            "left",
        )
        .select(
            "tu_id",
            "stu_id",
            "as_of",
            "feed",
            "rt_trip_id",
            "route_id",
            "direction_id",
            "service_date",
            "trip_schedule_relationship",
            "trip_headsign",
            "stop_id",
            "stop_sequence",
            bq.safe_cast(F.col("stop_sequence"), "long").alias("stop_sequence_int"),
            "stop_name",
            "parent_station",
            "stop_lat",
            "stop_lon",
            bq.timestamp_seconds(
                bq.safe_cast(F.col("trip_update__timestamp"), "long")
            ).alias("feed_ts_utc"),
            arr_ts.alias("arrival_ts_utc"),
            dep_ts.alias("departure_ts_utc"),
            "arrival__delay",
            "departure__delay",
            "arrival__uncertainty",
            "departure__uncertainty",
            "stu_schedule_relationship",
            bq.concat(
                F.coalesce(F.col("route_id"), F.lit("UNK")),
                F.lit("|"),
                F.coalesce(F.col("trip_headsign"), F.lit("UNK")),
            ).alias("route_headsign_key"),
            origin.alias("rt_origin_code_hundredths"),
            uid_text.alias("trip_uid_text"),
            bq.to_hex_sha256(uid_text).alias("trip_uid"),
        )
    )
    return base.select(
        "*",
        F.col("arrival_ts_utc").isNotNull().alias("has_arrival_ts"),
        F.col("departure_ts_utc").isNotNull().alias("has_departure_ts"),
        evt.alias("event_ts_utc"),
        F.when(F.col("arrival_ts_utc").isNotNull(), "arrival")
        .when(F.col("departure_ts_utc").isNotNull(), "departure")
        .alias("event_kind_primary"),
        bq.local_dt(evt).alias("event_dt_local"),
        bq.local_date(evt).alias("service_day_local"),
    )


# ---------------------------------------------------------------------------
# fact_trips
# ---------------------------------------------------------------------------
def _flag_asc_nulls_first(c: F.Column) -> F.Column:
    # BQ ASC default: NULLS FIRST — null key must WIN a min_by.
    return F.when(c.isNull(), F.lit(0)).otherwise(F.lit(1))


def _flag_asc_nulls_last(c: F.Column) -> F.Column:
    # The reference's CASE WHEN k IS NULL THEN 1 ELSE 0 prefix.
    return F.when(c.isNull(), F.lit(1)).otherwise(F.lit(0))


def _flag_desc_nulls_last(c: F.Column) -> F.Column:
    # BQ DESC default: NULLS LAST — null key must LOSE a max_by.
    return F.when(c.isNull(), F.lit(-1)).otherwise(F.lit(0))


def fact_trips(src: dict[str, DataFrame]) -> DataFrame:
    """Trip-level rollup: one row per trip_uid (fact_trips.sql:3-89).

    The reference's ordered-ARRAY_AGG-LIMIT-1 idioms (fact_trips.sql:42-68)
    become min_by/max_by over explicit null-flagged struct keys; every key
    carries the stu_id tiebreaker (D5). first/last_event_ts use BigQuery
    *default* null ordering (seq ASC nulls first / DESC nulls last) because
    the reference omits the CASE prefix there — a faithful quirk.
    """
    fts = src["fact_trips_stops"]
    seq = F.col("stop_sequence_int")
    evt = F.col("event_ts_utc")
    sid = F.col("stu_id")

    first_stop_key = F.struct(
        _flag_asc_nulls_last(seq).alias("f0"),
        F.coalesce(seq, F.lit(0)).alias("k1"),
        _flag_asc_nulls_first(evt).alias("f1"),
        F.coalesce(evt, F.lit("1970-01-01").cast("timestamp")).alias("k2"),
        sid.alias("tb"),
    )
    last_stop_key = F.struct(
        # ORDER BY flag ASC, seq DESC, evt DESC under a max_by: non-null flag
        # (0) beats null flag (-1); then larger seq/evt wins; nulls lose.
        _flag_desc_nulls_last(seq).alias("f0"),
        F.coalesce(seq, F.lit(0)).alias("k1"),
        _flag_desc_nulls_last(evt).alias("f1"),
        F.coalesce(evt, F.lit("1970-01-01").cast("timestamp")).alias("k2"),
        sid.alias("tb"),
    )
    first_evt_key = F.struct(
        _flag_asc_nulls_first(seq).alias("f0"),
        F.coalesce(seq, F.lit(0)).alias("k1"),
        sid.alias("tb"),
    )
    last_evt_key = F.struct(
        _flag_desc_nulls_last(seq).alias("f0"),
        F.coalesce(seq, F.lit(0)).alias("k1"),
        sid.alias("tb"),
    )
    first_event = F.min_by(evt, first_evt_key)
    last_event = F.max_by(evt, last_evt_key)

    agg = fts.groupBy("trip_uid").agg(
        bq.any_value_det(F.col("trip_uid_text")).alias("trip_uid_text"),
        bq.any_value_det(F.col("rt_trip_id")).alias("rt_trip_id"),
        bq.any_value_det(F.col("route_id")).alias("route_id"),
        bq.any_value_det(F.col("direction_id")).alias("direction_id"),
        bq.any_value_det(F.col("trip_headsign")).alias("trip_headsign"),
        bq.any_value_det(F.col("service_date")).alias("service_date"),
        bq.any_value_det(F.col("rt_origin_code_hundredths")).alias("rt_origin_code_hundredths"),
        F.min("feed_ts_utc").alias("first_feed_ts_utc"),
        F.max("feed_ts_utc").alias("last_feed_ts_utc"),
        F.min("as_of").alias("first_ingest_ts"),
        F.max("as_of").alias("last_ingest_ts"),
        F.min_by(F.col("stop_id"), first_stop_key).alias("first_stop_id"),
        F.max_by(F.col("stop_id"), last_stop_key).alias("last_stop_id"),
        F.min(seq).alias("first_stop_sequence"),
        F.max(seq).alias("last_stop_sequence"),
        first_event.alias("first_event_ts_utc"),
        last_event.alias("last_event_ts_utc"),
        bq.timestamp_diff(last_event, first_event, "SECOND").alias("trip_duration_s"),
        bq.any_value_det(F.col("trip_schedule_relationship")).alias("schedule_relationship"),
    )

    stops = src["stops"].select("stop_id", "stop_name", "parent_station", "stop_lat", "stop_lon")
    fs = F.broadcast(stops).alias("fs")
    ls = F.broadcast(stops).alias("ls")
    return (
        agg.join(fs, agg.first_stop_id == F.col("fs.stop_id"), "left")
        .join(ls, agg.last_stop_id == F.col("ls.stop_id"), "left")
        .select(
            agg["*"],
            F.col("fs.stop_name").alias("first_stop_name"),
            F.col("fs.parent_station").alias("first_parent_station"),
            F.col("fs.stop_lat").alias("first_stop_lat"),
            F.col("fs.stop_lon").alias("first_stop_lon"),
            F.col("ls.stop_name").alias("last_stop_name"),
            F.col("ls.parent_station").alias("last_parent_station"),
            F.col("ls.stop_lat").alias("last_stop_lat"),
            F.col("ls.stop_lon").alias("last_stop_lon"),
        )
    )


# ---------------------------------------------------------------------------
# fact_delays
# ---------------------------------------------------------------------------
_FACT_DELAYS_COLS = [
    "trip_uid", "trip_uid_text", "tu_id", "stu_id", "as_of", "feed",
    "rt_trip_id", "route_id", "direction_id", "service_date",
    "trip_schedule_relationship", "trip_headsign",
    "stop_id", "stop_name", "parent_station", "stop_lat", "stop_lon",
    "stop_sequence", "stop_sequence_int",
    "feed_ts_utc", "arrival_ts_utc", "departure_ts_utc", "event_ts_utc",
    "event_kind_primary", "event_dt_local", "service_day_local",
    "arrival__delay", "departure__delay",
    "arrival__uncertainty", "departure__uncertainty", "stu_schedule_relationship",
    "route_headsign_key", "rt_origin_code_hundredths",
    "has_arrival_ts", "has_departure_ts",
]


def fact_delays(src: dict[str, DataFrame]) -> DataFrame:
    """Stop-level delays, main feed only (fact_delays.sql:4-55). The
    feed='main' predicate pushes through the view into the trip_updates scan
    (verify with .explain — PushedFilters)."""
    return (
        src["fact_trips_stops"]
        .filter(
            (F.col("feed") == "main")
            & (F.col("arrival__delay").isNotNull() | F.col("departure__delay").isNotNull())
        )
        .select(*_FACT_DELAYS_COLS)
    )


# ---------------------------------------------------------------------------
# fact_alerts
# ---------------------------------------------------------------------------
def fact_alerts(src: dict[str, DataFrame]) -> DataFrame:
    """Alert fact: aggregate each dlt child to alert grain, then a left-join
    star (fact_alerts.sql:3-94). Children and dims are broadcast."""
    b = (
        src["alerts"]
        .filter(F.col("feed") == "alerts")
        .select(
            "feed",
            "entity_id",
            "as_of",
            F.col("_dlt_id").alias("alert_id"),
            "_dlt_load_id",
        )
    )
    hdr = (
        src["alerts__alert__header_text__translation"]
        .groupBy(F.col("_dlt_parent_id").alias("alert_id"))
        .agg(bq.any_value_det(F.col("text")).alias("header_text"))
    )
    desc = (
        src["alerts__alert__description_text__translation"]
        .groupBy(F.col("_dlt_parent_id").alias("alert_id"))
        .agg(bq.any_value_det(F.col("text")).alias("description_text"))
    )
    ap = (
        src["alerts__alert__active_period"]
        .groupBy(F.col("_dlt_parent_id").alias("alert_id"))
        .agg(
            F.min(
                F.when(
                    F.col("start").isNotNull(),
                    bq.timestamp_seconds(bq.safe_cast(F.col("start"), "long")),
                )
            ).alias("first_start_ts_utc"),
            F.max(
                F.when(
                    F.col("end").isNotNull(),
                    bq.timestamp_seconds(bq.safe_cast(F.col("end"), "long")),
                )
            ).alias("last_end_ts_utc"),
        )
    )
    ie = (
        src["alerts__alert__informed_entity"]
        .groupBy(F.col("_dlt_parent_id").alias("alert_id"))
        .agg(
            bq.any_value_det(F.coalesce(F.col("trip__route_id"), F.col("route_id"))).alias("route_id"),
            bq.any_value_det(F.col("trip__trip_id")).alias("rt_trip_id"),
            bq.any_value_det(F.col("stop_id")).alias("stop_id"),
            bq.any_value_det(F.col("agency_id")).alias("agency_id"),
        )
    )
    routes = src["routes"].select(
        "route_id", "route_short_name", "route_long_name", "route_type",
        "route_color", "route_text_color", "route_desc", "agency_id",
    )
    stops = src["stops"].select("stop_id", "stop_name", "parent_station", "stop_lat", "stop_lon")

    return (
        b.join(F.broadcast(hdr), "alert_id", "left")
        .join(F.broadcast(desc), "alert_id", "left")
        .join(F.broadcast(ap), "alert_id", "left")
        .join(F.broadcast(ie.alias("i")), "alert_id", "left")
        .join(F.broadcast(stops.alias("s")), F.col("i.stop_id") == F.col("s.stop_id"), "left")
        .join(F.broadcast(routes.alias("r")), F.col("i.route_id") == F.col("r.route_id"), "left")
        .select(
            "feed",
            "entity_id",
            "as_of",
            "alert_id",
            "header_text",
            "description_text",
            "first_start_ts_utc",
            "last_end_ts_utc",
            F.col("i.route_id").alias("route_id"),
            "route_short_name",
            "route_long_name",
            "route_type",
            "route_color",
            "route_text_color",
            "route_desc",
            F.col("r.agency_id").alias("agency_id"),
            F.col("s.stop_name").alias("stop_name"),
            F.col("s.parent_station").alias("parent_station"),
            F.col("s.stop_lat").alias("stop_lat"),
            F.col("s.stop_lon").alias("stop_lon"),
        )
    )


# ---------------------------------------------------------------------------
# DAG — dbt's manifest/topo-order lifecycle (SURVEY.md §3 EP1).
# ---------------------------------------------------------------------------
MODELS: dict[str, tuple[Callable[[dict[str, DataFrame]], DataFrame], list[str]]] = {
    "fact_trips_stops": (
        fact_trips_stops,
        ["trip_updates", "trip_updates__trip_update__stop_time_update", "stops", "trips"],
    ),
    "fact_trips": (fact_trips, ["fact_trips_stops", "stops"]),
    "fact_delays": (fact_delays, ["fact_trips_stops"]),
    "fact_alerts": (
        fact_alerts,
        [
            "alerts",
            "alerts__alert__header_text__translation",
            "alerts__alert__description_text__translation",
            "alerts__alert__active_period",
            "alerts__alert__informed_entity",
            "routes",
            "stops",
        ],
    ),
}


def build_all(
    spark: SparkSession, sources: dict[str, DataFrame], register_views: bool = True
) -> dict[str, DataFrame]:
    """Resolve the model DAG in topological order (models may depend on other
    models by name); equivalent of ``dbt run`` with materialized='view'."""
    resolved: dict[str, DataFrame] = dict(sources)
    built: dict[str, DataFrame] = {}
    remaining = dict(MODELS)
    while remaining:
        progressed = False
        for name, (builder, deps) in list(remaining.items()):
            if all(d in resolved for d in deps):
                df = builder(resolved)
                resolved[name] = df
                built[name] = df
                if register_views:
                    df.createOrReplaceTempView(name)
                del remaining[name]
                progressed = True
        if not progressed:
            raise ValueError(f"unresolvable model deps: {list(remaining)}")
    return built


def materialize(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Table materialization (S4) with the reference's production partitioning
    hint (metrics_guide.md:385): stop-level by service_day_local, trip-level
    by date of last_feed_ts_utc."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
