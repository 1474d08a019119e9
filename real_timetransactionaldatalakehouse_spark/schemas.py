"""Explicit parse schemas (SURVEY.md section 1.3: no inference on the
hot path) — the engine's equivalents of the reference's StructType /
DDL-string schemas, per FIXTURES.md.

Header + Body pattern: strict typed header columns, free-form JSON
body carried as a string and promoted on demand (reference
PipelineArchitecture.md:24, DataModel_SchemaDesign.md:30).
"""

from __future__ import annotations

from pyspark.sql import types as T

# content interaction events (reference stream_content.py:77-89)
CONTENT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("event_timestamp", T.TimestampType(), False),
        T.StructField("video_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("watch_time_ms", T.LongType(), True),
                    T.StructField("device_os", T.StringType(), True),
                    T.StructField("app_version", T.StringType(), True),
                    T.StructField("network_type", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

# transactional order events with nested line items
# (reference streaming_job.py:170-186)
ORDER_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("event_timestamp", T.LongType(), False),  # epoch seconds
        T.StructField("order_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("total_amount", T.DoubleType(), True),  # null on updates
        T.StructField("currency", T.StringType(), True),
        T.StructField("payment_method", T.StringType(), True),
        T.StructField(
            "items",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("sku", T.StringType(), True),
                        T.StructField("quantity", T.IntegerType(), True),
                        T.StructField("unit_price", T.DoubleType(), True),
                        T.StructField("category", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("current_status", T.StringType(), True),
    ]
)

# Debezium-style CDC envelopes (reference stream_dims.py:168,184)
CDC_USERS_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField(
            "after",
            T.StructType(
                [
                    T.StructField("user_id", T.StringType(), False),
                    T.StructField("register_country", T.StringType(), True),
                    T.StructField("device_os", T.StringType(), True),
                    T.StructField("is_creator", T.BooleanType(), True),
                    T.StructField("ltv_segment", T.StringType(), True),
                    T.StructField("join_at", T.StringType(), True),  # ISO -> cast
                ]
            ),
            True,
        ),
    ]
)

CDC_VIDEOS_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField(
            "after",
            T.StructType(
                [
                    T.StructField("video_id", T.StringType(), False),
                    T.StructField("creator_id", T.StringType(), True),
                    T.StructField("category", T.StringType(), True),
                    T.StructField("hashtags", T.ArrayType(T.StringType()), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("status", T.StringType(), True),
                    T.StructField("upload_time", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)
