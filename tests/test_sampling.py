"""Deterministic sampling invariants: stability, disjointness, stratum rates."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def test_split_stable_and_exhaustive(spark):
    from mta_rtf_dbt_spark.operators.sampling import train_test_split
    from mta_rtf_dbt_spark.sources.registry import load

    docs = load(spark, SF, "documents")
    s1 = train_test_split(docs, "doc_id").select("doc_id", "split")
    s2 = train_test_split(docs.repartition(7), "doc_id").select("doc_id", "split")
    # same membership regardless of partitioning/run
    assert s1.subtract(s2).count() == 0 and s2.subtract(s1).count() == 0
    # exhaustive + disjoint: every doc in exactly one split
    assert s1.count() == docs.count()
    assert s1.select("doc_id").distinct().count() == docs.count()
    dist = dict(s1.groupBy("split").count().collect())
    n = docs.count()
    assert abs(dist["train"] / n - 0.8) < 0.05
    assert abs(dist["val"] / n - 0.1) < 0.04
    assert abs(dist["test"] / n - 0.1) < 0.04


def test_stratified_rate_per_stratum(spark):
    from mta_rtf_dbt_spark.operators.sampling import stratified_sample
    from mta_rtf_dbt_spark.sources.registry import load

    e = load(spark, SF, "events")
    samp = stratified_sample(e, "event_id", 10, seed=7)
    rates = (
        e.groupBy("event_type").count()
        .join(samp.groupBy("event_type").agg(F.count(F.lit(1)).alias("k")), "event_type")
        .select("event_type", (F.col("k") / F.col("count")).alias("rate"))
    )
    for r in rates.collect():
        assert 0.05 < r.rate < 0.15, (r.event_type, r.rate)


def test_weighted_sample_deterministic_and_correct(spark):
    """Weighted sample membership must be stable under repartitioning and
    equal a driver-side recomputation of the Efraimidis-Spirakis keys."""
    import math

    import pyspark.sql.functions as F

    from mta_rtf_dbt_spark.operators.sampling import _M, weighted_sample_topk
    from mta_rtf_dbt_spark.sources.registry import load

    docs = (
        load(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", F.length("text").cast("long").alias("w"))
    )
    got = [r.doc_id for r in weighted_sample_topk(docs, "doc_id", "w", 10, seed=3).collect()]
    got2 = [
        r.doc_id
        for r in weighted_sample_topk(docs.repartition(7), "doc_id", "w", 10, seed=3).collect()
    ]
    assert got == got2

    rows = docs.collect()
    keys = []
    for r in rows:
        u = (((r.doc_id * 1103515245 + 12345 + 3) % _M) % _M + 0.5) / _M
        keys.append((round(math.log(u) / r.w * 1e6), -r.doc_id, r.doc_id))
    expected = [d for _, _, d in sorted(keys, reverse=True)[:10]]
    assert got == expected
