"""Streaming-throughput SLA bench: make the SCALING.md anchors
re-measurable.

Replays the sf0.1 events table (100k rows) through the micro-batch
engine as N file-source micro-batches (``maxFilesPerTrigger=1`` — the
deterministic analogue of the reference's ``maxOffsetsPerTrigger``
rate limit, ``src/spark/streaming_job.py:195``) and reports end-to-end
events/second for the three pipeline tiers:

- bronze append (sorted, audited, hidden-partitioned — the reference's
  ingest job, ``streaming_job.py:81-84``),
- gold tumbling-window agg (watermark + window state + checkpoint —
  ``stream_content.py:123-150``),
- stateful per-key EWMA (``applyInPandasWithState`` with event-time
  timeout — the custom-state tier).

The reference's design band is 1,000-10,000 ev/s (its generator caps
ingest at ~500 ev/s via ``maxOffsetsPerTrigger`` 5000 / 10 s trigger).
Per-batch fixed cost (state commit + checkpoint fsync) dominates at
this deliberately tiny batch size, so these numbers are a FLOOR:
larger trigger intervals raise throughput roughly linearly until the
shuffle is compute-bound.

Usage:
    python tools/streaming_sla_bench.py            # 10 micro-batches
    python tools/streaming_sla_bench.py --batches 20
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--batches", type=int, default=10)
    args = ap.parse_args()

    from real_timetransactionaldatalakehouse_spark.session import batch_session
    from real_timetransactionaldatalakehouse_spark.sources import file_stream
    from real_timetransactionaldatalakehouse_spark.sources.tables import load_table
    from real_timetransactionaldatalakehouse_spark.streaming.jobs import (
        bronze_append_stream, gold_window_agg_stream,
    )
    from real_timetransactionaldatalakehouse_spark.streaming.stateful import ewma_by_key

    spark = batch_session("streaming-sla-bench")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="slabench-")
    src_dir = os.path.join(work, "input")
    events = load_table(spark, args.src, "events")
    n = events.count()
    # one file per micro-batch; sort by ts inside the replay so batch
    # boundaries approximate a log-ordered source (what the stateful
    # fold's cross-batch contract assumes)
    events.repartitionByRange(args.batches, "ts").sortWithinPartitions(
        "ts", "event_id"
    ).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    print(f"# {n:,} events in {args.batches} micro-batches", file=sys.stderr)

    def run(label, fn):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"| {label} | {dt:.1f} s | ~{n / dt:,.0f} ev/s |")

    print("| job | wall | throughput |")
    print("|---|---|---|")

    d = os.path.join(work, "bronze")
    run(
        "bronze append (sorted, audited, hidden-partitioned)",
        lambda: bronze_append_stream(
            file_stream(spark, src_dir, schema),
            os.path.join(d, "out"), os.path.join(d, "ckpt"), ts_col="ts",
        ),
    )

    # attribution row: the same append without the hidden-partition
    # clause — isolates what hours(event_ts) partitioning costs at
    # replay scale (it buys partition pruning on every serving read;
    # at sf0.1 the table spans 720 hour-dirs of ~139 rows each, a
    # small-file regime a production ingest rate never sees)
    d1b = os.path.join(work, "bronze_flat")

    def run_flat():
        from real_timetransactionaldatalakehouse_spark.streaming.jobs import _run_stream

        def write_batch(batch, epoch_id):
            (
                batch.withColumn("ingested_at", F.current_timestamp())
                .sortWithinPartitions("ts")
                .write.mode("append").parquet(os.path.join(d1b, "out"))
            )

        _run_stream(
            file_stream(spark, src_dir, schema)
            .writeStream.foreachBatch(write_batch).outputMode("append"),
            os.path.join(d1b, "ckpt"), True, True,
        )

    run("bronze append (unpartitioned, attribution-only)", run_flat)

    d2 = os.path.join(work, "gold")
    run(
        "gold 1-min window agg (watermark + state + checkpoint)",
        lambda: gold_window_agg_stream(
            file_stream(spark, src_dir, schema),
            os.path.join(d2, "out"), os.path.join(d2, "ckpt"), ts_col="ts",
            group_cols=["user_id"],
            cases={
                "views": F.col("event_type") == "view",
                "clicks": F.col("event_type") == "click",
            },
        ),
    )

    d3 = os.path.join(work, "ewma")
    def run_ewma():
        out = ewma_by_key(
            file_stream(spark, src_dir, schema),
            "user_id", "ts", "value",
            alpha=0.3, tiebreak_col="event_id", watermark="10 minutes",
        )
        q = (
            out.writeStream.foreachBatch(
                lambda b, e: b.write.mode("append")
                .parquet(os.path.join(d3, "out"))
            )
            .outputMode("update")
            .option("checkpointLocation", os.path.join(d3, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert q.exception() is None

    run("stateful per-key EWMA (applyInPandasWithState)", run_ewma)

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
