"""Maintenance jobs (SURVEY.md section 2 M1-M4): compaction, TTL
delete, table stats — the engine re-platforming of the reference's
Iceberg procedures (``compact_cold_data.py``).

Format-free design: on plain Parquet, compaction is a predicate-scoped
read -> repartition-to-target-file-size -> swap rewrite, preserving
row counts (the reference's invariant).  With Delta on the classpath
these become ``OPTIMIZE``/``VACUUM``/``DELETE`` fast paths.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024  # reference compact_cold_data.py:28


def table_stats(spark: SparkSession, path: str) -> DataFrame:
    """A10: file-level stats (count / bytes / avg file size) — the
    engine-maintained analogue of the reference's ``tbl$files``
    metadata-table dashboards (lakehouse_monitor.json:117,314)."""
    files = []
    if os.path.isfile(path):
        files.append((path, os.path.getsize(path)))
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                files.append((p, os.path.getsize(p)))
    df = spark.createDataFrame(files or [("", 0)], "file string, bytes long")
    if not files:
        df = df.filter(F.col("file") != "")
    return df.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        (F.sum("bytes").cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_file_bytes"),
    )


def compact(
    spark: SparkSession,
    path: str,
    where: Column | None = None,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> dict:
    """M1: bin-packing compaction.  ``where`` scopes the rewrite to
    cold data only (reference: older than 1 h, compact_cold_data.py:25)
    — hot partitions are left untouched so the streaming writer never
    races the compactor.  Returns before/after stats; row count is
    preserved by construction."""
    df = spark.read.parquet(path)
    n_before = df.count()
    cold = df.filter(where) if where is not None else df
    hot = df.filter(~where) if where is not None else None

    total_bytes = sum(
        os.path.getsize(os.path.join(r, n))
        for r, _d, ns in os.walk(path)
        for n in ns
        if n.endswith(".parquet")
    )
    n_files = max(1, round(total_bytes / target_file_bytes))

    tmp = path.rstrip("/") + ".compact-tmp"
    packed = cold.repartition(n_files)
    out = packed.unionByName(hot) if hot is not None else packed
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    n_after = spark.read.parquet(path).count()
    return {"rows_before": n_before, "rows_after": n_after, "files_target": n_files}


def ttl_delete(spark: SparkSession, path: str, ts_col: str, cutoff) -> dict:
    """M4: retention delete — rewrite keeping rows newer than the
    cutoff (reference DataModel_SchemaDesign.md:136, 7-day gold TTL)."""
    df = spark.read.parquet(path)
    n_before = df.count()
    kept = df.filter(F.col(ts_col) >= F.lit(cutoff))
    tmp = path.rstrip("/") + ".ttl-tmp"
    kept.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    n_after = spark.read.parquet(path).count()
    return {"rows_before": n_before, "rows_after": n_after}
