"""Targeted semantics tests for the round-5 second-wave operators (the
oracle-parity hash checks cover end-to-end equality; these pin the specific
behaviors that make each operator correct-by-construction)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_retract_extremum_handover(spark):
    """Deleting a key's extremum row must hand min/max to the surviving
    runner-up (state alone can't tell — the recompute-affected-keys path);
    keys losing every row must drop out; untouched keys keep state as-is."""
    from mta_rtf_dbt_spark.operators.incremental import (
        agg_state,
        retract_agg_state,
    )

    rows = [
        ("a", 1, 10),
        ("a", 2, 50),  # the max of key a — deleted below
        ("a", 3, 20),
        ("b", 4, 7),   # key b fully deleted
        ("c", 5, 99),  # untouched key
    ]
    df = spark.createDataFrame(rows, ["k", "rid", "v"])
    deleted = F.col("rid").isin(2, 4)
    state = agg_state(df, ["k"], "v")
    out = retract_agg_state(
        state, df.filter(~deleted), df.filter(deleted), ["k"], "v"
    )
    got = {r["k"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"]) for r in out.collect()}
    assert got == {"a": (2, 30, 10, 20), "c": (1, 99, 99, 99)}


def test_equidepth_bucket_sizes(spark):
    """NTILE contract: bucket sizes differ by at most one and the larger
    buckets come first; buckets cover disjoint ascending value ranges."""
    from mta_rtf_dbt_spark.plans.relational import a_histogram_equidepth

    rows = sorted(
        (r["depth_bucket"], r["n_rows"], r["lo_value"], r["hi_value"])
        for r in a_histogram_equidepth(spark, SF).collect()
    )
    sizes = [r[1] for r in rows]
    assert len(rows) == 8 and [r[0] for r in rows] == list(range(8))
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)
    for (_, _, _, hi), (_, _, lo2, _) in zip(rows, rows[1:]):
        assert hi <= lo2


def test_compaction_groups_bounded(spark):
    """Every compaction group's total stays under target + one file (the
    straddle convention), and group ids are contiguous from 0."""
    from mta_rtf_dbt_spark.operators.layout import (
        TARGET_COMPACT_BYTES,
        layout_compaction_plan,
    )

    plan = layout_compaction_plan(spark, SF).collect()
    groups: dict[int, list[int]] = {}
    for r in plan:
        groups.setdefault(r["compact_group"], []).append(r["size_bytes"])
    assert sorted(groups) == list(range(len(groups)))
    max_file = max(r["size_bytes"] for r in plan)
    for g, sizes in groups.items():
        assert sum(sizes) <= TARGET_COMPACT_BYTES + max_file


def test_gapfill_interp_endpoints(spark):
    """Observed minutes pass through exactly (den=1, num=actors); every
    interpolated minute lies within [min, max] of its two neighbors and
    edge gaps (before first / after last observation) stay NULL."""
    from mta_rtf_dbt_spark.metrics.events_analog import m1_gapfill_interpolate

    rows = sorted(
        (r["ts_minute"], r["observed"], r["interp_num"], r["interp_den"])
        for r in m1_gapfill_interpolate(spark, SF).collect()
    )
    obs_idx = [i for i, r in enumerate(rows) if r[1]]
    assert obs_idx, "window contains no observations at sf0.001"
    first_obs, last_obs = obs_idx[0], obs_idx[-1]
    for i, (_, observed, num, den) in enumerate(rows):
        if observed:
            assert den == 1 and num is not None
        elif i < first_obs or i > last_obs:
            assert num is None and den is None
        else:
            prev_v = next(rows[j][2] for j in range(i, -1, -1) if rows[j][1])
            next_v = next(rows[j][2] for j in range(i, len(rows)) if rows[j][1])
            assert den is not None and den > 0
            assert min(prev_v, next_v) * den <= num <= max(prev_v, next_v) * den


def test_anomaly_warmup_and_consistency(spark):
    """Warmup windows (under 30 trailing observations) never flag; flagged
    rows deviate from the trailing mean in the direction above_mean says."""
    from mta_rtf_dbt_spark.metrics.events_analog import m_anomaly_rolling_zscore

    rows = m_anomaly_rolling_zscore(spark, SF).collect()
    assert rows
    for r in rows:
        if r["win_n"] < 30:
            assert not r["is_anomaly"]
        assert r["above_mean"] == (r["n_events"] * r["win_n"] > r["win_sum"])


def test_epoch_upsample_totals_exact(spark):
    """Largest-remainder contract: per-source realized repeats hit the
    integer target exactly, and every doc repeats base or base+1 times."""
    from mta_rtf_dbt_spark.operators.sampling import mix_epoch_upsample

    plan = mix_epoch_upsample(spark, SF).collect()
    per_src: dict[str, list[int]] = {}
    for r in plan:
        per_src.setdefault(r["source"], []).append(r["n_repeats"])
    for src, reps in per_src.items():
        em = 500 + (int(src[3:]) * 137) % 2000
        n = len(reps)
        target = (em // 1000) * n + ((em % 1000) * n) // 1000
        assert sum(reps) == target, (src, sum(reps), target)
        assert set(reps) <= {em // 1000, em // 1000 + 1}


def test_stream_agg_maintenance_multibatch_and_replay(spark, tmp_path):
    """Three micro-batches fold to the exact batch aggregate; a full
    redelivery (fresh checkpoint, same state) is skipped by the batch-id
    guard — SUM state stays exactly-once under at-least-once delivery."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from mta_rtf_dbt_spark.operators.incremental import finalize_agg
    from mta_rtf_dbt_spark.streaming.upsert import stream_agg_maintenance

    from mta_rtf_dbt_spark.sources.registry import load

    e = load(spark, SF, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1000, 0).cast("long").alias("value_milli"),
    )
    inc = tmp_path / "incoming"
    inc.mkdir()
    for i in range(3):
        stage = str(tmp_path / f"stage_{i}")
        e.filter(F.col("event_id") % 3 == i).coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        shutil.move(f"{stage}/{part}", str(inc / f"b{i}.parquet"))

    def run(ckpt: str):
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(inc))
        )
        q = stream_agg_maintenance(
            spark,
            stream.select("event_type", "value_milli"),
            str(tmp_path / "state"),
            ckpt,
            ["event_type"],
            "value_milli",
        )
        assert q.awaitTermination(300)

    run(str(tmp_path / "ckpt1"))
    got = {
        r["event_type"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in finalize_agg(
            spark.read.parquet(str(tmp_path / "state")), ["event_type"]
        ).collect()
    }
    exp = {
        r["event_type"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in e.groupBy("event_type")
        .agg(
            F.count("value_milli").alias("n"),
            F.sum("value_milli").alias("sum_v"),
            F.min("value_milli").alias("min_v"),
            F.max("value_milli").alias("max_v"),
        )
        .collect()
    }
    assert got == exp
    # full redelivery: fresh checkpoint replays batches 0..2; the marker
    # (last applied = 2) must skip every one — state unchanged, not doubled
    run(str(tmp_path / "ckpt2"))
    again = {
        r["event_type"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in finalize_agg(
            spark.read.parquet(str(tmp_path / "state")), ["event_type"]
        ).collect()
    }
    assert again == exp


def test_geohash_matches_published_algorithm(spark):
    """Anchor check against the standard geohash: NYC-area coordinates
    encode with the well-known 'dr5' prefix, and co-located platform
    records share identical hashes."""
    from mta_rtf_dbt_spark.operators.geo import geo_geohash_stops

    rows = geo_geohash_stops(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["geohash8"].startswith("dr5"), r
    by_coord: dict[tuple, set] = {}
    for r in rows:
        by_coord.setdefault((r["stop_lat"], r["stop_lon"]), set()).add(r["geohash8"])
    assert all(len(s) == 1 for s in by_coord.values())


def test_nearest_stop_distances(spark):
    """Every stop gets a neighbor, distances are non-negative, co-located
    platform families (N/S/parent share coordinates) pair at distance 0,
    and a neighbor's own nearest distance never exceeds the distance of
    the pair that nominated it (min property)."""
    from mta_rtf_dbt_spark.operators.geo import geo_nearest_stop

    rows = {r["stop_id"]: r for r in geo_nearest_stop(spark, SF).collect()}
    assert rows
    assert any(r["d2_micro2"] == 0 for r in rows.values())
    for r in rows.values():
        assert r["d2_micro2"] >= 0
        other = rows.get(r["nearest_stop_id"])
        assert other is not None
        assert other["d2_micro2"] <= r["d2_micro2"]
