"""CSV / JSON(L) file sources with explicit-schema discipline.

The reference's ingest surface is Kafka JSON (``streaming_job.py:
190-204``) with an explicit schema; landing files arrive in the same
two shapes (CSV exports, JSONL dumps).  These wrappers enforce the
same rules the parquet path gets for free:

- **no schema inference on the hot path** — an explicit schema is
  required (inference runs a whole extra pass over the data and can
  silently produce a different schema per batch at 100 TB);
- **corrupt rows are quarantined, not dropped** — PERMISSIVE mode
  with a named ``_corrupt_record`` column, so a bad row becomes a
  NULL-padded row carrying its raw text (the bronze-layer contract:
  land everything, gate later; ``quality.expectations`` drives the
  quarantine split downstream);
- ``FAILFAST`` is opt-in for contract-enforcing silver reads.

CSV/JSON scans are splittable when uncompressed (Spark splits by
byte range) but gzip files scan as ONE task each — at scale, land
many medium files (or zstd parquet) rather than one giant .gz; see
``sources.fan_out`` for the under-split escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if any(f.name == CORRUPT_COL for f in schema.fields):
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
    mode: str = "PERMISSIVE",
    timestamp_format: str | None = None,
) -> DataFrame:
    """Explicit-schema CSV scan.  In PERMISSIVE mode malformed rows
    land NULL-padded with their raw line in ``_corrupt_record``."""
    if mode == "PERMISSIVE":
        schema = _with_corrupt(schema)
    reader = (
        spark.read.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.load(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
    multiline: bool = False,
) -> DataFrame:
    """Explicit-schema JSON-lines scan (one object per line; set
    ``multiline`` for whole-file JSON documents, which are NOT
    splittable — avoid at scale)."""
    if mode == "PERMISSIVE":
        schema = _with_corrupt(schema)
    return (
        spark.read.format("json")
        .schema(schema)
        .option("mode", mode)
        .option("multiLine", str(multiline).lower())
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )


def corrupt_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, quarantine): clean rows
    drop the corrupt column; quarantined rows keep the full NULL-padded
    row WITH the raw text.  The quarantine side deliberately keeps all
    columns: Spark refuses plans over raw CSV/JSON that reference ONLY
    ``_corrupt_record`` (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and the
    partial parse is useful triage context anyway."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    clean = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.filter(df[CORRUPT_COL].isNotNull())
    return clean, bad
