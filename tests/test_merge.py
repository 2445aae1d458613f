"""MERGE INTO semantics (SURVEY §2.1 S6): branch resolution + write path."""

from __future__ import annotations

from pyspark.sql import functions as F

from mta_rtf_dbt_spark.operators.merge import merge_into, merge_write


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, tag string, val double",
    )


def _source(spark):
    # 2 -> update, 3 -> delete, 5 -> insert, 6 -> insert gated out
    return spark.createDataFrame(
        [
            (2, "B", 200.0, "U"),
            (3, "c", 30.0, "D"),
            (5, "e", 50.0, "I"),
            (6, "x", 60.0, "SKIP"),
        ],
        "id long, tag string, val double, _op string",
    )


def test_merge_branches(spark):
    out = merge_into(
        _target(spark),
        _source(spark),
        on=["id"],
        update_set={"tag": F.col("s.tag"), "val": F.col("s.val")},
        delete_condition=F.col("s._op") == "D",
        insert_when=~F.col("s._op").isin("SKIP", "D"),
    )
    rows = {r.id: (r.tag, r.val) for r in out.collect()}
    assert rows == {
        1: ("a", 10.0),    # untouched
        2: ("B", 200.0),   # updated
        4: ("d", 40.0),    # untouched
        5: ("e", 50.0),    # inserted
    }  # 3 deleted, 6 insert-gated


def test_merge_no_delete_keeps_all_matched(spark):
    out = merge_into(_target(spark), _source(spark).filter("_op = 'U'"), on=["id"])
    assert out.count() == 4  # whole-row upsert default, nothing dropped
    assert {r.val for r in out.filter("id = 2").collect()} == {200.0}


def test_merge_broadcast_source_plan(spark):
    out = merge_into(
        _target(spark), _source(spark), on=["id"], broadcast_source=True
    )
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_merge_write_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _target(spark).write.parquet(path)
    src = _source(spark)
    out = merge_write(
        spark,
        path,
        src,
        on=["id"],
        update_set={"tag": F.col("s.tag"), "val": F.col("s.val")},
        delete_condition=F.col("s._op") == "D",
        insert_when=~F.col("s._op").isin("SKIP", "D"),
    )
    re_read = {r.id: (r.tag, r.val) for r in out.collect()}
    assert re_read == {1: ("a", 10.0), 2: ("B", 200.0), 4: ("d", 40.0), 5: ("e", 50.0)}
    # idempotency: re-merging the same batch yields the same table
    again = merge_write(
        spark,
        path,
        src,
        on=["id"],
        update_set={"tag": F.col("s.tag"), "val": F.col("s.val")},
        delete_condition=F.col("s._op") == "D",
        insert_when=~F.col("s._op").isin("SKIP", "D"),
    )
    assert {r.id: (r.tag, r.val) for r in again.collect()} == re_read


def test_align_schemas_modes(spark):
    from mta_rtf_dbt_spark.operators.merge import align_schemas, merge_into

    t = spark.createDataFrame([(1, "a", 10.0)], "id long, tag string, val double")
    s = spark.createDataFrame([(1, "A", True), (2, "B", False)], "id long, tag string, flag boolean")

    ta, sa = align_schemas(t, s, "ignore")
    assert ta.columns == sa.columns == ["id", "tag", "val"]

    ta, sa = align_schemas(t, s, "append_new_columns")
    assert ta.columns == sa.columns == ["id", "tag", "val", "flag"]
    # existing target rows backfill NULL for the new column; merge end-to-end
    # with update_set over the source's REAL columns (aligned source carries a
    # null stand-in for val, which whole-row upsert would clobber)
    upd = {c: F.col(f"s.{c}") for c in ["tag", "flag"]}
    out = {
        r.id: (r.tag, r.val, r.flag)
        for r in merge_into(ta, sa, on=["id"], update_set=upd).collect()
    }
    assert out == {1: ("A", 10.0, True), 2: ("B", None, False)}

    ta, sa = align_schemas(t, s, "sync_all_columns")
    assert ta.columns == sa.columns == ["id", "tag", "flag"]

    import pytest

    with pytest.raises(ValueError):
        align_schemas(t, s, "nope")
