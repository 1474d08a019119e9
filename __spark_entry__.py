"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (viral-velocity trending
pipeline, SURVEY.md section 7.2) on sf0.001.  ``queries()`` exposes one
callable per implemented operator from SURVEY.md section 2;
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL the driver
hash-compares against at sf0.01.

Determinism rules (SURVEY.md section 7.3) applied throughout:
- session timezone pinned to UTC inside every callable;
- float sums go through exact DECIMAL accumulation (order-independent)
  and come back as DOUBLE — identical in Spark and DuckDB;
- output timestamps truncated to whole seconds (parquet ns vs us);
- every window/order has a deterministic tiebreak key;
- no now()/rand(); range predicates use pinned literals.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_timetransactionaldatalakehouse_spark import functions as LF
from real_timetransactionaldatalakehouse_spark.operators import relational as R
from real_timetransactionaldatalakehouse_spark.operators import joins as J
from real_timetransactionaldatalakehouse_spark.operators import merge as M
from real_timetransactionaldatalakehouse_spark.sources import load_table

SF0001 = "/root/testdata/sf0.001"

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    """Register a declared query (and its DuckDB oracle)."""

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLES[name] = oracle
        return wrapped

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# =====================================================================
# Flagship: viral-velocity trending (SURVEY.md section 7.2 step 1).
# Exercises scan -> filter -> tumbling window conditional agg (G2/G6)
# -> read-side rollup ratio (G3) -> broadcast left-join enrichment (J3)
# -> top-k (S3): one row of each section-2 category.
# =====================================================================

def entry(spark: SparkSession) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return q_trending_velocity(spark, SF0001)


_TRENDING_ORACLE = """
WITH minute_stats AS (
  SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS window_start,
         user_id,
         COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
         COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases
  FROM events
  GROUP BY 1, 2
), rollup_u AS (
  SELECT user_id,
         CAST(SUM(views) AS BIGINT) AS views,
         CAST(SUM(clicks) AS BIGINT) AS clicks,
         CAST(SUM(purchases) AS BIGINT) AS purchases,
         CAST(SUM(clicks) * 5 + SUM(purchases) * 10 AS DOUBLE)
           / CAST(NULLIF(SUM(views), 0) AS DOUBLE) AS velocity
  FROM minute_stats
  GROUP BY user_id
)
SELECT r.user_id, r.views, r.clicks, r.purchases, r.velocity, c.c_mktsegment
FROM rollup_u r LEFT JOIN customer c ON r.user_id = c.c_custkey
WHERE r.velocity IS NOT NULL
ORDER BY r.velocity DESC, r.user_id ASC
LIMIT 50
"""


@_q("q_trending_velocity", _TRENDING_ORACLE)
def q_trending_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2+G6 window agg -> G3 ratio -> J3/J4 broadcast enrich -> S3 top-k."""
    events = _t(spark, sf_dir, "events")
    customer = _t(spark, sf_dir, "customer")

    minute_stats = R.tumbling_window_counts(
        events, "ts", "1 minute", ["user_id"],
        {
            "views": F.col("event_type") == "view",
            "clicks": F.col("event_type") == "click",
            "purchases": F.col("event_type") == "purchase",
        },
    )
    rollup = minute_stats.groupBy("user_id").agg(
        F.sum("views").alias("views"),
        F.sum("clicks").alias("clicks"),
        F.sum("purchases").alias("purchases"),
    ).withColumn(
        "velocity",
        (F.col("clicks") * 5 + F.col("purchases") * 10).cast("double")
        / F.nullif(F.col("views"), F.lit(0)).cast("double"),
    )
    enriched = J.enrich_left(rollup, customer.select(F.col("c_custkey").alias("user_id"), "c_mktsegment"), "user_id")
    return (
        enriched.filter(F.col("velocity").isNotNull())
        .select("user_id", "views", "clicks", "purchases", "velocity", "c_mktsegment")
        .orderBy(F.col("velocity").desc(), F.col("user_id").asc())
        .limit(50)
    )


# =====================================================================
# A. Scans
# =====================================================================

@_q("q_scan_project", """
SELECT l_orderkey, l_partkey, l_quantity, l_returnflag
FROM lineitem
""")
def q_scan_project(spark, sf_dir):
    """A2/B1: projected parquet scan — ReadSchema prunes to 4 columns."""
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag"
    )


@_q("q_scan_limit", """
SELECT o_orderkey, o_custkey, o_orderstatus
FROM orders ORDER BY o_orderkey LIMIT 10
""")
def q_scan_limit(spark, sf_dir):
    """A3/S2: limited scan; ordered for determinism (TakeOrderedAndProject)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
        .limit(10)
    )


# =====================================================================
# B. Projections / filters
# =====================================================================

@_q("q_project_cast", """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
       TIMESTAMP '1970-01-01 00:00:00' + o_orderkey * INTERVAL '1 second' AS ts_from_epoch
FROM orders
""")
def q_project_cast(spark, sf_dir):
    """B2/H7: computed column + cast incl. epoch-seconds -> timestamp
    (reference streaming_job.py:202)."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.floor("o_totalprice").alias("price_floor"),
        F.timestamp_seconds(F.col("o_orderkey")).alias("ts_from_epoch"),
    )


@_q("q_filter_eq", """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem WHERE l_returnflag = 'R'
""")
def q_filter_eq(spark, sf_dir):
    """B3: equality filter, pushed to the parquet scan."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@_q("q_filter_in", """
SELECT event_id, user_id, event_type, value
FROM events WHERE event_type IN ('click', 'view')
""")
def q_filter_in(spark, sf_dir):
    """B5: IN-list predicate (reference stream_dims.py:79)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select("event_id", "user_id", "event_type", "value")
    )


@_q("q_filter_range", """
SELECT event_id, user_id, event_type,
       date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts_s
FROM events
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
""")
def q_filter_range(spark, sf_dir):
    """B6/H5: time-range predicate with pinned literals (reference
    Dashboard.md:45,48; as_of passed explicitly per SURVEY 7.3)."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
    ).select("event_id", "user_id", "event_type", LF.ts_second("ts").alias("ts_s"))


@_q("q_retention_filter", """
SELECT event_id, user_id, event_type,
       date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts_s
FROM events
WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
""")
def q_retention_filter(spark, sf_dir):
    """B9/M4: TTL retention — surviving rows after the cutoff delete
    (reference DataModel_SchemaDesign.md:136, 7-day gold TTL)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts") >= F.lit("2024-01-25 00:00:00").cast("timestamp"))
        .select("event_id", "user_id", "event_type", LF.ts_second("ts").alias("ts_s"))
    )


@_q("q_having_count", """
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey HAVING COUNT(*) > 10
""")
def q_having_count(spark, sf_dir):
    """B4/G1: group-count + HAVING (reference verify_medallion.py:19-21)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 10)
    )


@_q("q_coalesce", """
SELECT c.c_custkey, c.c_name,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(o.total_spent, 0.0) AS total_spent
FROM customer c
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total_spent
  FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
""")
def q_coalesce(spark, sf_dir):
    """B8: coalesce null-handling over a left join (reference
    streaming_job.py:141-144 MERGE coalesce pattern)."""
    customer = _t(spark, sf_dir, "customer")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), LF.dsum("o_totalprice").alias("total_spent"))
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey", "c_name",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("total_spent"), F.lit(0.0)).alias("total_spent"),
        )
    )


# =====================================================================
# D. Aggregations
# =====================================================================

@_q("q_agg_count_by_key", """
SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
""")
def q_agg_count_by_key(spark, sf_dir):
    """G1: group-count (reference verify_medallion.py:19-20).
    Partial+final hash agg — shuffle carries one row per key."""
    return _t(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))


@_q("q_agg_global", """
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS total_price
FROM lineitem
""")
def q_agg_global(spark, sf_dir):
    """G4: global no-group aggregation (reference Dashboard.md:46)."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        LF.dsum("l_extendedprice").alias("total_price"),
    )


@_q("q_agg_max_ts", """
SELECT event_type, date_trunc('second', CAST(MAX(ts) AS TIMESTAMP)) AS max_ts
FROM events GROUP BY event_type
""")
def q_agg_max_ts(spark, sf_dir):
    """G5: MAX freshness probe (reference Dashboard.md:85)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.date_trunc("second", F.max("ts")).alias("max_ts"))
    )


# =====================================================================
# F. Sorts / limits
# =====================================================================

@_q("q_orderby", """
SELECT event_id, user_id,
       ROW_NUMBER() OVER (ORDER BY ts ASC, event_id ASC) AS pos
FROM events
""")
def q_orderby(spark, sf_dir):
    """S1: global sort (reference verify_medallion.py:33) — materialized
    as a global row position so the hash actually locks ordering.
    Single-partition window is fine at oracle scale; production sorts
    use range partitioning instead."""
    w = Window.orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.row_number().over(w).alias("pos")
    )


@_q("q_orderby_limit_topk", """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
""")
def q_orderby_limit_topk(spark, sf_dir):
    """S3: agg-free top-k — compiles to TakeOrderedAndProject (per-
    partition heaps, no global shuffle sort)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
    )


# =====================================================================
# G-set. Set operations
# =====================================================================

@_q("q_union_all", """
SELECT event_id, user_id, 'clicks' AS src FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, user_id, 'views' AS src FROM events WHERE event_type = 'view'
""")
def q_union_all(spark, sf_dir):
    """Set op: unionByName — the bronze replay shape (SURVEY section 2 G)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.lit("clicks").alias("src")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.lit("views").alias("src")
    )
    return clicks.unionByName(views)


# =====================================================================
# Driver contract surface
# =====================================================================

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
