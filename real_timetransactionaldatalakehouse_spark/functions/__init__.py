"""Scalar/aggregate helper expressions shared by the operator library.

Two concerns live here:

1. Reference-parity scalar surface (SURVEY.md section 2 H1-H10): JSON
   parse/extract, epoch<->timestamp casts, interval windows — all thin
   wrappers over built-in ``pyspark.sql.functions`` so everything stays
   inside whole-stage codegen (zero-UDF discipline, SURVEY.md section
   2 K).

2. Oracle-determinism helpers.  The driver hash-compares Spark output
   against DuckDB; floating-point *sums* are order-dependent, so hashed
   aggregates go through exact decimal accumulation (``dsum``) and
   timestamps are truncated to whole seconds (parquet ns vs Spark us
   precision) before leaving a query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- determinism


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent sum of a double column.

    Casts each value to an exact DECIMAL before summing (decimal
    addition is associative — no float reassociation drift between
    Spark's partial/final agg tree and DuckDB's sequential sum), then
    returns DOUBLE for a stable output schema.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 4) -> str:
    """DuckDB-side twin of :func:`dsum` (keep in lockstep)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent mean: exact decimal sum / count, as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(28,{scale})")).cast("double")
        / F.count(c).cast("double")
    )


def davg_sql(expr: str, scale: int = 4) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE)"
    )


def ts_second(col: Column | str) -> Column:
    """Truncate a timestamp to whole seconds for hash-stable output.

    Testdata timestamps are nanosecond parquet values; Spark reads
    microseconds, DuckDB nanoseconds — second truncation makes both
    engines emit identical values.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("second", c)


TS_SECOND_SQL = "date_trunc('second', CAST({col} AS TIMESTAMP))"

# ------------------------------------------------------- reference H* surface


def json_parse(col: Column | str, schema: str) -> Column:
    """H1 ``from_json`` (reference ``streaming_job.py:200``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


def json_extract(col: Column | str, path: str) -> Column:
    """H3 ``get_json_object`` (reference DataModel_SchemaDesign.md:129)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def epoch_seconds_to_ts(col: Column | str) -> Column:
    """H7 epoch-seconds LONG -> TIMESTAMP (reference ``streaming_job.py:202``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(c)


def epoch_millis_to_ts(col: Column | str) -> Column:
    """H7 epoch-millis LONG -> TIMESTAMP (reference ``stream_dims.py:157``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c)


def seconds_between(start: Column, end: Column) -> Column:
    """H6 ``date_diff('second', ...)`` parity (reference
    lakehouse_monitor.json:181): whole-second difference.  Both inputs
    are second-truncated first so Spark (elapsed-floor) and DuckDB
    (boundary-count) semantics coincide."""
    return (
        F.date_trunc("second", end).cast("long")
        - F.date_trunc("second", start).cast("long")
    )
