"""Deterministic file-based streaming source for tests.

The reference's streams are Kafka topics replayed into micro-batches
(``stream_content.py:93-98``).  The driver environment has no Kafka, so
streaming semantics (watermarks, tumbling windows, foreachBatch merge)
are exercised by replaying fixture parquet/json files through
``spark.readStream`` — same micro-batch engine, deterministic input
(SURVEY.md section 5.2).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import DataStreamReader
from pyspark.sql.types import StructType


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = 1,
):
    """``readStream`` over a directory of fixture files.

    ``maxFilesPerTrigger=1`` makes each fixture file one micro-batch —
    the deterministic analogue of the reference's
    ``maxOffsetsPerTrigger`` rate limit (``streaming_job.py:195``).
    """
    reader: DataStreamReader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def kafka_stream(spark: SparkSession, bootstrap: str, topic: str, starting_offsets: str = "earliest",
                 max_offsets_per_trigger: int | None = 5000):
    """Kafka source, reference parity (``streaming_job.py:190-196``).

    Requires the spark-sql-kafka package on the classpath; not present
    in the test container — provided for deployment parity.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()
