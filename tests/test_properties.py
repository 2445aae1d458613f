"""Property-based checks (SURVEY.md §5.4) for the BigQuery-compat functions
whose edge cases broke real queries in the reference's semantics ledger
(D2/D9/D10), plus model invariants over the MTA fixtures.

Hypothesis generates batches of values; each test runs ONE Spark job over the
whole batch (per-example Spark jobs would be prohibitively slow)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.test_mta_models import mta_dir, mta_models  # noqa: F401

_EPOCH = dt.datetime(2000, 1, 1, tzinfo=dt.timezone.utc)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.integers(min_value=0, max_value=10**9),
        ),
        min_size=1,
        max_size=200,
    )
)
def test_timestamp_diff_truncates_toward_zero(spark, pairs):
    """D9: BigQuery TIMESTAMP_DIFF(..., MINUTE) truncates toward zero —
    -90s must give -1, not floor's -2."""
    from mta_rtf_dbt_spark.functions import bq

    df = spark.createDataFrame(pairs, "a long, b long")
    got = df.select(
        bq.timestamp_diff(
            F.timestamp_seconds("a"), F.timestamp_seconds("b"), "MINUTE"
        ).alias("m"),
        bq.timestamp_diff(
            F.timestamp_seconds("a"), F.timestamp_seconds("b"), "SECOND"
        ).alias("s"),
        "a",
        "b",
    ).collect()
    for r in got:
        secs = r.a - r.b
        assert r.s == secs
        assert r.m == int(secs / 60)  # Python int() truncates toward zero


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=47),  # GTFS hour may exceed 23
            st.integers(min_value=0, max_value=59),
            st.integers(min_value=0, max_value=59),
        ),
        min_size=1,
        max_size=100,
    )
)
def test_gtfs_clock_handles_over_24h(spark, hms):
    """D10: '25:30:00' is a valid GTFS time (next-day overhang); parsing must
    be interval math from the service-day anchor, never to_timestamp."""
    from mta_rtf_dbt_spark.functions import bq

    rows = [(f"{h:02d}:{m:02d}:{s:02d}",) for h, m, s in hms]
    df = spark.createDataFrame(rows, "hms string")
    got = df.select(
        "hms",
        bq.gtfs_time_to_ts(F.lit("2025-11-01").cast("date"), F.col("hms")).alias("ts"),
    ).collect()
    anchor = dt.datetime(2025, 11, 1)
    for r in got:
        h, m, s = map(int, r.hms.split(":"))
        assert r.ts == anchor + dt.timedelta(hours=h, minutes=m, seconds=s)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127),
            max_size=12,
        ),
        min_size=1,
        max_size=100,
    )
)
def test_regexp_extract_null_on_no_match(spark, strings):
    """D2: BigQuery REGEXP_EXTRACT yields NULL on no-match; Spark's '' would
    silently satisfy downstream coalesce chains."""
    import re

    from mta_rtf_dbt_spark.functions import bq

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = df.select("s", bq.regexp_extract(F.col("s"), r"^-?\d{1,8}").alias("x")).collect()
    for r in got:
        m = re.match(r"^-?\d{1,8}", r.s)
        assert r.x == (m.group(0) if m else None)


def test_fact_trips_invariants(mta_models):  # noqa: F811
    """Grain-contract properties the reference implies but never tested:
    stop sequence ordering and feed-window sanity per trip."""
    ft = mta_models["fact_trips"]
    bad_seq = ft.filter(
        F.col("first_stop_sequence").isNotNull()
        & F.col("last_stop_sequence").isNotNull()
        & (F.col("first_stop_sequence") > F.col("last_stop_sequence"))
    )
    assert bad_seq.count() == 0
    bad_window = ft.filter(F.col("first_feed_ts_utc") > F.col("last_feed_ts_utc"))
    assert bad_window.count() == 0


def test_fact_trips_stops_dwell_nonnegative_when_ordered(mta_models):  # noqa: F811
    """Dwell (departure - arrival) is >= 0 whenever both timestamps exist and
    arrival <= departure — property M6 relies on."""
    fts = mta_models["fact_trips_stops"]
    both = fts.filter(
        F.col("arrival_ts_utc").isNotNull() & F.col("departure_ts_utc").isNotNull()
    )
    ordered = both.filter(F.col("arrival_ts_utc") <= F.col("departure_ts_utc"))
    from mta_rtf_dbt_spark.functions import bq

    neg = ordered.filter(
        bq.timestamp_diff(F.col("departure_ts_utc"), F.col("arrival_ts_utc"), "SECOND") < 0
    )
    assert neg.count() == 0


def test_materialize_partitioned_roundtrip(spark, tmp_path, mta_models):  # noqa: F811
    """S4 table materialization with the reference's partitioning hint
    (metrics_guide.md:385): write fact_trips_stops partitioned by
    service_day_local, read back identical rows, and prune partitions."""
    from mta_rtf_dbt_spark.plans.mta_models import materialize

    fts = mta_models["fact_trips_stops"]
    path = str(tmp_path / "fts")
    materialize(fts, path, partition_by=["service_day_local"])
    back = spark.read.parquet(path)
    assert back.count() == fts.count()
    days = [
        r[0]
        for r in fts.select("service_day_local").distinct().collect()
        if r[0] is not None
    ]
    one = back.filter(F.col("service_day_local") == days[0])
    # partition pruning: the day predicate must appear as a PartitionFilter
    # on the scan (not a post-scan data filter)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and str(days[0]) in plan, plan
    assert one.count() == fts.filter(F.col("service_day_local") == days[0]).count()
