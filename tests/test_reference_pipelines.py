"""End-to-end parity with the reference's three pipelines on
FIXTURES.md-shaped synthetic data: content events (Header+Body JSON),
order events with nested items, and Debezium-style CDC envelopes —
from raw JSON strings through parse, medallion build, and SCD1 merge."""

from __future__ import annotations

import datetime
import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_timetransactionaldatalakehouse_spark import medallion as MD  # noqa: E402
from real_timetransactionaldatalakehouse_spark import schemas as SC  # noqa: E402
from real_timetransactionaldatalakehouse_spark.functions import epoch_seconds_to_ts  # noqa: E402
from real_timetransactionaldatalakehouse_spark.operators.merge import merge_upsert  # noqa: E402
from real_timetransactionaldatalakehouse_spark.sources import parse_cdc_envelope  # noqa: E402

T0 = datetime.datetime(2024, 5, 1, 8, 0, 0)


def _content_json(i, etype, video, user, watch_ms, minute):
    return json.dumps(
        {
            "event_id": f"e{i}",
            "event_timestamp": (T0 + datetime.timedelta(minutes=minute)).isoformat(),
            "video_id": video,
            "user_id": user,
            "event_type": etype,
            "payload": {
                "watch_time_ms": watch_ms,
                "device_os": "iOS",
                "app_version": "15.0",
                "network_type": "wifi",
            },
        }
    )


def test_content_pipeline_json_to_bronze_and_gold(spark):
    """JSON -> from_json(CONTENT_EVENT_SCHEMA) -> bronze Header+Body ->
    gold 1-min conditional counts (the reference 3.1 lifecycle)."""
    raws = [
        _content_json(0, "impression", "v1", "u1", 0, 0),
        _content_json(1, "play_start", "v1", "u1", 0, 0),
        _content_json(2, "play_finish", "v1", "u1", 30000, 1),
        _content_json(3, "impression", "v2", "u2", 0, 1),
        _content_json(4, "like", "v1", "u2", 1200, 2),
    ]
    raw = spark.createDataFrame([(r,) for r in raws], "value string")
    parsed = raw.select(
        F.from_json(F.col("value"), SC.CONTENT_EVENT_SCHEMA).alias("d")
    ).select("d.*")
    assert parsed.count() == 5
    assert parsed.filter(F.col("event_timestamp").isNull()).count() == 0

    bronze = MD.content_bronze(parsed)
    assert bronze.count() == 5
    row = bronze.filter(F.col("event_id") == "e2").collect()[0]
    assert json.loads(row.raw_payload)["watch_time_ms"] == 30000

    from real_timetransactionaldatalakehouse_spark.operators.relational import (
        tumbling_window_counts,
    )

    gold = tumbling_window_counts(
        parsed, "event_timestamp", "1 minute", ["video_id"],
        {
            "impressions": F.col("event_type") == "impression",
            "likes": F.col("event_type") == "like",
            "play_finish": F.col("event_type") == "play_finish",
        },
    )
    g = {(r.window_start.minute, r.video_id): r for r in gold.collect()}
    assert g[(0, "v1")].impressions == 1
    assert g[(1, "v1")].play_finish == 1
    assert g[(2, "v1")].likes == 1


def test_order_events_epoch_cast_and_latest_state(spark):
    """Order events arrive with epoch-second LONG timestamps (reference
    streaming_job.py:202 cast) and sparse update columns."""
    base = int(T0.timestamp())
    rows = [
        ("e1", "ORDER_CREATED", base, "A", "u1", 99.5, "USD", "card",
         [{"sku": "s1", "quantity": 1, "unit_price": 99.5, "category": "toys"}],
         "CREATED"),
        ("e2", "ORDER_PAID", base + 60, "A", None, None, None, None, None, "PAID"),
    ]
    df = spark.createDataFrame(rows, SC.ORDER_EVENT_SCHEMA)
    typed = df.withColumn("event_timestamp", epoch_seconds_to_ts("event_timestamp"))
    assert dict(typed.dtypes)["event_timestamp"] == "timestamp"
    cur = MD.build_gold_latest_state(typed, key="order_id", ts_col="event_timestamp")
    r = cur.collect()[0]
    assert r.current_status == "PAID"
    assert r.total_amount == 99.5 and r.currency == "USD"
    assert r.items[0]["category"] == "toys"


def test_cdc_envelope_to_scd1_dims(spark):
    """Debezium envelope JSON -> parse_cdc_envelope -> SCD1 merge —
    the reference 3.2 lifecycle, including the op filter and ISO
    timestamp cast."""
    envs = [
        {"op": "c", "ts_ms": 1000,
         "after": {"user_id": "u1", "register_country": "US", "device_os": "iOS",
                   "is_creator": False, "ltv_segment": "Standard",
                   "join_at": "2024-01-01T00:00:00"}},
        {"op": "c", "ts_ms": 1000,
         "after": {"user_id": "u2", "register_country": "JP", "device_os": "Android",
                   "is_creator": False, "ltv_segment": "Standard",
                   "join_at": "2024-02-01T12:30:00"}},
        {"op": "u", "ts_ms": 2000,
         "after": {"user_id": "u1", "register_country": None, "device_os": None,
                   "is_creator": True, "ltv_segment": "VIP", "join_at": None}},
        {"op": "r", "ts_ms": 3000,  # snapshot/read op -> filtered
         "after": {"user_id": "u1", "register_country": "XX", "device_os": None,
                   "is_creator": None, "ltv_segment": "Bogus", "join_at": None}},
    ]
    raw = spark.createDataFrame([(json.dumps(e),) for e in envs], "value string")
    parsed = parse_cdc_envelope(raw, SC.CDC_USERS_SCHEMA, ts_cast_cols=("join_at",))
    assert dict(parsed.dtypes)["join_at"] == "timestamp"

    updates = parsed.filter(F.col("op").isin("c", "u")).drop("op")
    creates = updates.filter(F.col("ts_ms") == 1000)
    dim = merge_upsert(
        creates, updates.filter(F.col("ts_ms") > 1000), ["user_id"],
        order_col="ts_ms", update_cols=["ltv_segment", "is_creator", "ts_ms"],
    )
    d = {r.user_id: r for r in dim.collect()}
    assert len(d) == 2
    assert d["u1"].ltv_segment == "VIP" and d["u1"].is_creator is True
    assert d["u1"].register_country == "US"  # SCD1 non-update column kept
    assert d["u1"].join_at == datetime.datetime(2024, 1, 1)
    assert d["u2"].ltv_segment == "Standard"


def test_silver_completion_rate(spark):
    rows = [("e1", 15000, 30000), ("e2", 45000, 30000), ("e3", 1000, None), ("e4", 0, 0)]
    df = spark.createDataFrame(rows, "event_id string, watch_time_ms long, video_duration_ms long")
    out = {r.event_id: r.completion_rate for r in MD.derive_completion(df).collect()}
    assert abs(out["e1"] - 0.5) < 1e-6
    assert out["e2"] == 1.0  # clamped
    assert out["e3"] is None and out["e4"] is None
