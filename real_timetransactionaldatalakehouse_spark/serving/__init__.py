"""Serving layer (SURVEY.md section 3.3): the reference's Trino/BI tier
becomes Spark SQL views over the gold/dim DataFrames — same SQL, one
engine.  Derived metrics (velocity, completion, freshness) are
computed at read time over the 1-minute buckets (read-side sliding
window, reference PipelineArchitecture.md:178-180; O18 no
materialization).

All view SQL takes an explicit ``as_of`` timestamp instead of now()
(SURVEY.md section 7.3 determinism rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_gold_views(spark: SparkSession, gold_stats: DataFrame,
                        dim: DataFrame | None = None) -> None:
    gold_stats.createOrReplaceTempView("gold_stats_1min")
    if dim is not None:
        dim.createOrReplaceTempView("dim_entity")


def register_gold_views_from_catalog(spark: SparkSession, cat,
                                     gold_table: str = "gold.stats_1min",
                                     dim_table: str | None = "gold.dim_entity") -> None:
    """A8: resolve the serving views through the catalog façade
    (schema.table names) instead of raw paths — versioned dims resolve
    their snapshot pointer transparently."""
    dim = None
    if dim_table is not None:
        try:
            dim = cat.read(dim_table)
        except KeyError:
            dim = None
    register_gold_views(spark, cat.read(gold_table), dim)


def velocity_view(spark: SparkSession, as_of: str, lookback_minutes: int = 30) -> DataFrame:
    """Read-side sliding rollup over 1-min buckets (reference
    Dashboard.md:45): weighted engagement per impression."""
    return spark.sql(f"""
        SELECT user_id,
               CAST(SUM(clicks) * 5 + SUM(purchases) * 10 AS DOUBLE)
                 / CAST(NULLIF(SUM(views), 0) AS DOUBLE) AS velocity
        FROM gold_stats_1min
        WHERE window_start >= TIMESTAMP '{as_of}' - INTERVAL {lookback_minutes} MINUTES
          AND window_start < TIMESTAMP '{as_of}'
        GROUP BY user_id
    """)


def trending_view(spark: SparkSession, as_of: str, k: int = 50,
                  lookback_minutes: int = 60) -> DataFrame:
    """Top-k by engagement with dim enrichment (reference Dashboard.md:48)."""
    return spark.sql(f"""
        WITH m AS (
          SELECT user_id, SUM(clicks) AS clicks, SUM(views) AS views,
                 SUM(purchases) AS purchases
          FROM gold_stats_1min
          WHERE window_start >= TIMESTAMP '{as_of}' - INTERVAL {lookback_minutes} MINUTES
            AND window_start < TIMESTAMP '{as_of}'
          GROUP BY user_id
        )
        SELECT /*+ BROADCAST(d) */ m.*, d.c_mktsegment
        FROM m LEFT JOIN dim_entity d ON m.user_id = d.user_id
        ORDER BY clicks DESC, user_id ASC
        LIMIT {k}
    """)


def freshness_view(spark: SparkSession, as_of: str) -> DataFrame:
    """Freshness lag gauge (reference lakehouse_monitor.json:181)."""
    return spark.sql(f"""
        SELECT CAST(date_trunc('second', TIMESTAMP '{as_of}') AS LONG)
               - CAST(date_trunc('second', MAX(window_start)) AS LONG) AS lag_s
        FROM gold_stats_1min
    """)
