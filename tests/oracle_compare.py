"""Driver-style Spark <-> DuckDB differential comparison (SURVEY.md
section 5.1).

Mirrors the driver's check: row count + schema-insensitive,
order-insensitive value comparison with columns sorted by name.  Values
are canonicalized to strings (full-precision repr for floats) so any
engine-level drift — float reassociation, timestamp precision, null
ordering — shows up as a hard mismatch here before the driver sees it.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from dataclasses import dataclass

import duckdb

from real_timetransactionaldatalakehouse_spark import TPCH_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rows_sorted_by_colname(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(cols), out


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_query(name: str, spark_df, con, sql: str) -> CompareResult:
    s_rows_raw = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(sql)
    d_cols_raw = [d[0] for d in cur.description]
    d_rows_raw = cur.fetchall()

    if len(s_rows_raw) != len(d_rows_raw):
        return CompareResult(
            name, False, f"row count: spark={len(s_rows_raw)} duckdb={len(d_rows_raw)}"
        )

    s_cols, s_rows = _rows_sorted_by_colname(spark_df.columns, s_rows_raw)
    d_cols, d_rows = _rows_sorted_by_colname(d_cols_raw, d_rows_raw)
    if s_cols != d_cols:
        return CompareResult(name, False, f"columns: spark={s_cols} duckdb={d_cols}")
    if s_rows != d_rows:
        bad = next(
            (i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b), None
        )
        return CompareResult(
            name, False,
            f"values differ at sorted row {bad}:\n  spark : {s_rows[bad] if bad is not None else '?'}"
            f"\n  duckdb: {d_rows[bad] if bad is not None else '?'}",
        )
    return CompareResult(name, True, f"{len(s_rows)} rows")
