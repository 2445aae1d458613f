"""dlt-style flattening tests: path lifting, lineage integrity, idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _nested(spark):
    from mta_rtf_dbt_spark.sources.registry import load

    li = load(spark, SF, "lineitem")
    return li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.collect_list(
            F.struct(
                F.col("l_linenumber"),
                F.struct(
                    F.col("l_quantity").alias("qty"),
                    F.col("l_extendedprice").alias("price"),
                ).alias("amounts"),
            )
        ).alias("items"),
        F.count("*").alias("n_items"),
    )


def test_flatten_struct_paths_recurses(spark):
    from mta_rtf_dbt_spark.sources.ingest import flatten_struct_paths

    df = spark.createDataFrame(
        [(1, ((2, (3,)),))],
        "a int, s struct<inner: struct<x: int, deep: struct<y: int>>>",
    )
    out = flatten_struct_paths(df)
    assert set(out.columns) == {"a", "s__inner__x", "s__inner__deep__y"}
    assert out.collect()[0].asDict() == {"a": 1, "s__inner__x": 2, "s__inner__deep__y": 3}


def test_lineage_integrity_and_counts(spark):
    from mta_rtf_dbt_spark.sources.ingest import flatten_parent_child

    nested = _nested(spark)
    parent, child = flatten_parent_child(nested, "items", ["o_orderkey"], "load_a")

    assert parent.count() == parent.select("_dlt_id").distinct().count()
    assert child.count() == child.select("_dlt_id").distinct().count()
    # FK: every child points at an existing parent
    orphans = child.join(
        parent.select(F.col("_dlt_id").alias("pid")),
        child._dlt_parent_id == F.col("pid"),
        "left_anti",
    )
    assert orphans.count() == 0
    # child cardinality per parent survives the roundtrip
    per_parent = child.groupBy("_dlt_parent_id").count()
    joined = parent.join(per_parent, parent._dlt_id == per_parent._dlt_parent_id)
    assert joined.filter(F.col("count") != F.col("n_items")).count() == 0
    # __-path flattening applied to the child's nested struct
    assert {"amounts__qty", "amounts__price"} <= set(child.columns)


def test_deterministic_ids_are_idempotent(spark):
    from mta_rtf_dbt_spark.sources.ingest import flatten_parent_child

    nested = _nested(spark)
    p1, _ = flatten_parent_child(nested, "items", ["o_orderkey"], "load_a")
    p2, _ = flatten_parent_child(nested, "items", ["o_orderkey"], "load_a")
    assert p1.select("o_orderkey", "_dlt_id").subtract(
        p2.select("o_orderkey", "_dlt_id")
    ).count() == 0
    # a different load id yields different row ids (lineage distinguishes loads)
    p3, _ = flatten_parent_child(nested, "items", ["o_orderkey"], "load_b")
    assert p1.select("_dlt_id").intersect(p3.select("_dlt_id")).count() == 0
