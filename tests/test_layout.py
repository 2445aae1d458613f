"""Z-order layout tests: Morton-key correctness against a Python bit
interleave, and the data-skipping property — a z-ordered range partitioning
gives tight per-file spans on BOTH dimensions, where a single-column sort
leaves the second dimension unclustered (full-range spans per file)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mta_rtf_dbt_spark.operators.layout import BITS, zorder_key


def _interleave_py(bx: int, by: int, bits: int = BITS) -> int:
    z = 0
    for j in range(bits):
        z |= ((bx >> j) & 1) << (2 * j)
        z |= ((by >> j) & 1) << (2 * j + 1)
    return z


def test_zorder_key_matches_python(spark):
    rows = [(i, i * 37 % 1000, i * 91 % 500) for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    out = zorder_key(df, "x", "y").collect()
    for r in out:
        assert r.zval == _interleave_py(r.bx, r.by), (r.bx, r.by, r.zval)
        assert 0 <= r.bx < (1 << BITS) and 0 <= r.by < (1 << BITS)


def _mean_spans(df, part_col_expr, n_parts):
    """Mean per-partition (bx span, by span) after range partitioning."""
    parts = (
        df.repartitionByRange(n_parts, part_col_expr)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("bx") - F.min("bx")).alias("sx"),
            (F.max("by") - F.min("by")).alias("sy"),
        )
        .agg(F.avg("sx").alias("mx"), F.avg("sy").alias("my"))
        .collect()[0]
    )
    return parts.mx, parts.my


def test_zorder_layout_clusters_both_dims(spark):
    # uniform 2D grid: ids map to (x, y) with no correlation between dims
    rows = [(i, (i * 7919) % 4096, (i * 104729) % 4096) for i in range(4096)]
    df = zorder_key(spark.createDataFrame(rows, ["id", "x", "y"]), "x", "y")
    full = 1 << BITS
    zx, zy = _mean_spans(df, F.col("zval"), 16)
    sx, sy = _mean_spans(df, F.col("bx"), 16)
    # single-column layout: first dim tightly clustered, second dim ~full span
    assert sx < 0.2 * full
    assert sy > 0.8 * full
    # z-order layout: BOTH dims strictly tighter than the unclustered dim
    assert zx < 0.75 * full and zy < 0.75 * full
    # and the second dim improves a lot vs the single-column layout
    assert zy < 0.75 * sy
