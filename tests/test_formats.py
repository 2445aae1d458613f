"""CSV/JSON round-trip fidelity + partitioned-layout pruning."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_csv_json_roundtrip_fidelity(spark, tmp_path):
    from mta_rtf_dbt_spark.sources.formats import (
        read_csv, read_jsonl, write_csv, write_jsonl,
    )
    from mta_rtf_dbt_spark.sources.registry import load

    src = load(spark, SF, "orders").limit(500).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        # exercise null handling + quoting/escapes through both formats
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.concat(F.lit('sep,and"quote '), F.col("o_orderpriority")))
        .alias("tricky"),
    )
    schema = "o_orderkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, tricky string"
    write_csv(src, str(tmp_path / "c")); write_jsonl(src, str(tmp_path / "j"))
    c = read_csv(spark, str(tmp_path / "c"), schema)
    j = read_jsonl(spark, str(tmp_path / "j"), schema).select(*c.columns)
    orig = sorted(map(tuple, src.collect()))
    assert sorted(map(tuple, c.collect())) == orig
    assert sorted(map(tuple, j.collect())) == orig


def test_partitioned_write_prunes(spark, tmp_path):
    from mta_rtf_dbt_spark.sources.registry import load

    path = str(tmp_path / "orders_by_year")
    (
        load(spark, SF, "orders")
        .withColumn("order_year", F.year("o_orderdate"))
        .write.partitionBy("order_year")
        .parquet(path)
    )
    df = spark.read.parquet(path).filter(F.col("order_year") == 1997)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "order_year" in plan.split("PartitionFilters")[1].split("]")[0]
    # the partition predicate must NOT appear as a post-scan data filter
    pushed = plan.split("PushedFilters")[1].split("]")[0] if "PushedFilters" in plan else ""
    assert "order_year" not in pushed
    assert df.count() > 0
