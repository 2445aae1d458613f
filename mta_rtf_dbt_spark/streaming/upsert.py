"""Streaming upsert: foreachBatch + MERGE — the production sink pattern.

Structured Streaming's file/parquet sinks are append-only; real pipelines
(the reference's dlt loader included — it lands GTFS-rt snapshots keyed by
`(trip_uid, as_of)`, mta_sources.yml:136-141) need *keyed upsert* into the
serving table. The standard composition is ``foreachBatch``: each
micro-batch becomes a plain DataFrame handed to the batch MERGE operator
(:mod:`mta_rtf_dbt_spark.operators.merge`), so the stream and batch paths
share ONE implementation of the update semantics.

Delivery semantics: foreachBatch is at-least-once on retry — a replayed
micro-batch re-merges the same rows. MERGE on stable keys is idempotent for
update/delete branches and for inserts of the same key set, which is what
upgrades the pipeline to effectively exactly-once (checkpointing dedupes
source files; the sink tolerates replays).

Scale: each micro-batch is a small change set against a huge target —
exactly the ``broadcast_source=True`` two-branch MERGE plan (no target
shuffle; inserts anti-join against a keys-only projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mta_rtf_dbt_spark.operators.merge import merge_write


def stream_merge_upsert(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    on: list[str],
    checkpoint: str,
    dedup_order: list[str] | None = None,
    **merge_kwargs,
):
    """Drain ``source`` (a streaming DataFrame) into the parquet table at
    ``target_path`` by MERGE, one micro-batch at a time (availableNow).

    ``dedup_order``: within a micro-batch the same key may appear multiple
    times; MERGE requires one source row per key, so rows collapse to the
    greatest ``dedup_order`` tuple per key first (last-write-wins).
    Returns the completed StreamingQuery.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        if not batch_df.columns:
            return
        src = batch_df
        if dedup_order:
            w = Window.partitionBy(*on).orderBy(
                *[F.col(c).desc() for c in dedup_order]
            )
            src = (
                src.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        merge_write(
            spark, target_path, src, on, broadcast_source=True, **merge_kwargs
        )

    return (
        source.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_scd2_snapshot(
    spark: SparkSession,
    source: DataFrame,
    history_path: str,
    keys: list[str],
    ts_col: str,
    tracked: str,
    checkpoint: str,
):
    """Streaming SCD2: each micro-batch is one dbt-snapshot invocation
    against the parquet history table (close superseded versions, append
    new ones) via :func:`mta_rtf_dbt_spark.operators.scd2.scd2_apply_batch`
    — stream and batch share ONE implementation of the snapshot semantics.

    Same delivery posture as :func:`stream_merge_upsert`: foreachBatch is
    at-least-once on retry, and re-applying a batch whose versions already
    landed changes nothing (the value comparison suppresses spurious
    versions), so the sink is replay-idempotent. Writes are staged then
    swapped (parquet has no transactional rewrite; on Delta/Iceberg this
    would be the engine's own MERGE).
    Returns the completed StreamingQuery."""
    from mta_rtf_dbt_spark.operators.scd2 import scd2_apply_batch

    def apply(batch_df: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        if not batch_df.columns:
            return
        hist = spark.read.parquet(history_path)
        updated = scd2_apply_batch(hist, batch_df, keys, ts_col, tracked)
        staged = history_path.rstrip("/") + ".__staged__"
        updated.persist()
        updated.count()
        updated.write.mode("overwrite").parquet(staged)
        import shutil

        shutil.rmtree(history_path)
        shutil.move(staged, history_path)
        updated.unpersist()

    return (
        source.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
