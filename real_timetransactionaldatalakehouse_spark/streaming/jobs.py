"""Streaming jobs: bronze append, gold windowed aggregation, dims SCD1
merge — the three micro-batch shapes of the reference
(``streaming_job.py``, ``stream_content.py``, ``stream_dims.py``),
re-expressed so each foreachBatch body calls the batch operator
library (Kappa consistency).

Sink format here is partitioned Parquet (Delta/Iceberg jars aren't in
the container); the write pattern per table — append log vs merged
latest-state — is the semantic choice the reference encodes in table
properties (SURVEY.md section 1.3).

Scale notes:
- bronze: append-only, sorted within partitions by event time before
  write (reference stream_content.py:51 write clustering O14);
- gold: watermark bounds state (T1); append mode emits only finalized
  windows (O15 — no delete amplification on the hot path);
- dims: batch-scoped dedup (T7) shrinks each MERGE's shuffled side;
  the merge itself is one shuffle on the key (operators/merge.py).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_upsert
from ..operators.relational import tumbling_window_counts


def _run_stream(writer, checkpoint: str, available_now: bool = True):
    q = writer.option("checkpointLocation", checkpoint)
    query = q.trigger(availableNow=True).start() if available_now else q.trigger(
        processingTime="10 seconds"
    ).start()
    if available_now:
        query.awaitTermination()
    return query


def bronze_append_stream(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    available_now: bool = True,
):
    """Bronze: immutable append log (reference streaming_job.py:81-84,
    A4/A5/A7/T5).  Each micro-batch is sorted within partitions by the
    event-time column before append (write clustering) and stamped
    with an ingest audit column (H4)."""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        (
            batch.withColumn("ingested_at", F.current_timestamp())
            .sortWithinPartitions(ts_col)
            .write.mode("append")
            .parquet(out_path)
        )

    return _run_stream(
        stream_df.writeStream.foreachBatch(write_batch).outputMode("append"),
        checkpoint,
        available_now,
    )


def gold_window_agg_stream(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    ts_col: str,
    group_cols: list[str],
    cases: dict[str, object],
    window: str = "1 minute",
    watermark: str = "10 seconds",
    available_now: bool = True,
):
    """Gold: tumbling-window conditional-count aggregation with event-
    time watermark, append output mode — the reference's
    stream_content.py:123-150 shape (T1/T2/T3).  Only watermark-
    finalized windows are emitted, so gold is an append-only metrics
    log (O15)."""
    agg = tumbling_window_counts(
        stream_df.withWatermark(ts_col, watermark), ts_col, window, group_cols, cases
    )

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        batch.sortWithinPartitions("window_start", *group_cols).write.mode(
            "append"
        ).parquet(out_path)

    return _run_stream(
        agg.writeStream.foreachBatch(write_batch).outputMode("append"),
        checkpoint,
        available_now,
    )


def gold_session_stream(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 seconds",
    available_now: bool = True,
):
    """Streaming sessionization via the built-in ``session_window``
    state operator — the Structured-Streaming-native counterpart of the
    reference's deliberately-batch T+1 sessionization (T10,
    PipelineArchitecture.md:217-222; the reference moved sessions to
    batch to save state-store RAM — Spark's session_window makes the
    streaming variant a one-liner when freshness is worth the state).

    Watermark bounds session state; append mode emits a session only
    once its window can no longer grow (event time past end + gap).
    State per key is one open session row — merged, not per-event.
    """
    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        batch.sortWithinPartitions(key_col, "session_start").write.mode(
            "append"
        ).parquet(out_path)

    return _run_stream(
        agg.writeStream.foreachBatch(write_batch).outputMode("append"),
        checkpoint,
        available_now,
    )


def dims_scd1_stream(
    stream_df: DataFrame,
    target_path: str,
    checkpoint: str,
    key_cols: list[str],
    order_col: str,
    op_col: str = "op",
    allowed_ops: tuple[str, ...] = ("c", "u"),
    update_cols: list[str] | None = None,
    available_now: bool = True,
):
    """Dims: SCD Type-1 upsert from a CDC envelope stream — the
    reference's stream_dims.py:59-98 foreachBatch MERGE, with the
    op-filter (B5), batch-scoped keep-latest dedup (T7/W1) and
    idempotent merge (exactly-once under replay).

    The target is read-merged-overwritten per batch (the parquet
    stand-in for MoR MERGE; swap in Delta MERGE via
    operators.merge.delta_merge_available)."""
    spark = stream_df.sparkSession

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        updates = batch.filter(F.col(op_col).isin(*allowed_ops)).drop(op_col)
        if updates.isEmpty():
            return
        if os.path.exists(target_path):
            target = spark.read.parquet(target_path)
            merged = merge_upsert(
                target, updates, key_cols, order_col=order_col,
                update_cols=update_cols,
            )
        else:
            from ..operators.relational import dedup_latest

            merged = dedup_latest(updates, key_cols, order_col)
        # write-new-then-swap: the merge plan reads the current target,
        # so the new version materializes to a side path first and then
        # replaces the target atomically-enough for a single writer
        # (a table format with snapshot commits does this for real).
        import shutil

        tmp = target_path.rstrip("/") + f".tmp-{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(target_path):
            shutil.rmtree(target_path)
        os.rename(tmp, target_path)

    return _run_stream(
        stream_df.writeStream.foreachBatch(write_batch).outputMode("append"),
        checkpoint,
        available_now,
    )
