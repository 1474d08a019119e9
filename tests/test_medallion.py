"""Medallion invariants (SURVEY.md section 5.3, generalizing the
reference's verify_medallion.py): latest-state correctness, silver
enrichment, maintenance count preservation, serving views."""

from __future__ import annotations

import datetime
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_timetransactionaldatalakehouse_spark import medallion as MD  # noqa: E402
from real_timetransactionaldatalakehouse_spark import maintenance as MT  # noqa: E402
from real_timetransactionaldatalakehouse_spark import serving as SV  # noqa: E402
from real_timetransactionaldatalakehouse_spark.sources import load_table  # noqa: E402

T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _order_events(spark):
    """FIXTURES.md section 2: sparse update events — total_amount etc.
    only on CREATED."""
    rows = [
        # order A: created -> paid -> shipped
        ("e1", "ORDER_CREATED", T0, "A", "u1", 100.0, "USD", [("sku1", 2, 10.0)]),
        ("e2", "ORDER_PAID", T0 + datetime.timedelta(minutes=1), "A", "u1", None, None, None),
        ("e3", "ORDER_SHIPPED", T0 + datetime.timedelta(minutes=5), "A", "u1", None, None, None),
        # order B: created -> cancelled
        ("e4", "ORDER_CREATED", T0, "B", "u2", 50.0, "EUR", [("sku2", 1, 50.0)]),
        ("e5", "ORDER_CANCELLED", T0 + datetime.timedelta(minutes=2), "B", "u2", None, None, None),
        # order C: created only
        ("e6", "ORDER_CREATED", T0, "C", "u1", 75.0, "USD", None),
    ]
    schema = (
        "event_id string, current_status string, event_timestamp timestamp, "
        "order_id string, user_id string, total_amount double, currency string, "
        "items array<struct<sku:string,quantity:int,unit_price:double>>"
    )
    return spark.createDataFrame(rows, schema)


def test_gold_latest_state(spark):
    ev = _order_events(spark)
    cur = MD.build_gold_latest_state(ev, key="order_id", ts_col="event_timestamp")
    rows = {r.order_id: r for r in cur.collect()}
    assert len(rows) == 3  # exactly one row per key
    assert rows["A"].current_status == "ORDER_SHIPPED"
    assert rows["A"].total_amount == 100.0  # filled from latest non-null
    assert rows["A"].currency == "USD"
    assert rows["A"].items[0].sku == "sku1"
    assert rows["B"].current_status == "ORDER_CANCELLED"
    assert rows["B"].total_amount == 50.0
    assert rows["C"].current_status == "ORDER_CREATED"


def test_bronze_vs_gold_consistency(spark):
    """The reference's verify_medallion check: bronze keeps full
    history; gold has one row per key with the max-ts status."""
    ev = _order_events(spark)
    bronze = MD.build_bronze(ev, ts_col="event_timestamp")
    assert bronze.count() == ev.count()
    multi = (
        bronze.groupBy("order_id").count().filter(F.col("count") > 1).collect()
    )
    assert multi  # at least one order with history
    gold = MD.build_gold_latest_state(ev, key="order_id", ts_col="event_timestamp")
    for r in multi:
        assert gold.filter(F.col("order_id") == r.order_id).count() == 1


def test_silver_sessionize_and_asof(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    timeline = (
        load_table(spark, sf_small, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("t_ts"))
        .agg(F.max("o_orderstatus").alias("status_at_event"))
    )
    silver = MD.build_silver(events, timeline)
    assert silver.count() == events.count()
    assert {"session_id", "date", "status_at_event"} <= set(silver.columns)
    # sessions start at 1 per user and are monotone
    first = silver.groupBy("user_id").agg(F.min("session_id").alias("m")).collect()
    assert all(r.m == 1 for r in first)


def test_compact_preserves_rows(spark, sf_small, tmp_path):
    li = load_table(spark, sf_small, "lineitem")
    path = str(tmp_path / "li")
    li.repartition(20).write.parquet(path)
    before_files = sum(
        1 for _r, _d, ns in os.walk(path) for n in ns if n.endswith(".parquet")
    )
    res = MT.compact(spark, path, where=F.col("l_shipdate") < "1998-01-01")
    after_files = sum(
        1 for _r, _d, ns in os.walk(path) for n in ns if n.endswith(".parquet")
    )
    assert res["rows_before"] == res["rows_after"] == li.count()
    assert after_files < before_files


def test_ttl_delete(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events")
    path = str(tmp_path / "ev")
    ev.write.parquet(path)
    cutoff = "2024-01-15 00:00:00"
    res = MT.ttl_delete(spark, path, "ts", cutoff)
    kept = spark.read.parquet(path)
    assert res["rows_after"] == kept.count()
    assert kept.filter(F.col("ts") < cutoff).count() == 0
    assert res["rows_after"] == ev.filter(F.col("ts") >= cutoff).count()


def test_table_stats(spark, sf_small):
    stats = MT.table_stats(spark, f"{sf_small}/lineitem.parquet").collect()[0]
    assert stats.n_files >= 1
    assert stats.total_bytes > 0


def test_serving_views(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    gold = MD.build_gold_window_stats(events)
    dim = load_table(spark, sf_small, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    SV.register_gold_views(spark, gold, dim)
    as_of = "2024-02-15 00:00:00"
    v = SV.velocity_view(spark, as_of, lookback_minutes=60 * 24 * 60)
    assert v.count() > 0
    t = SV.trending_view(spark, as_of, k=5, lookback_minutes=60 * 24 * 60)
    rows = t.collect()
    assert 0 < len(rows) <= 5
    f = SV.freshness_view(spark, as_of).collect()[0]
    assert f.lag_s > 0


def test_column_profile_counts(spark):
    """Profile counts: nulls excluded from n_nonnull, exact distincts,
    one row per requested column."""
    from real_timetransactionaldatalakehouse_spark.maintenance import column_profile

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (3, "b")], "k long, s string"
    )
    got = {r.column: r for r in column_profile(df).collect()}
    assert set(got) == {"k", "s"}
    assert (got["k"].n_rows, got["k"].n_nonnull, got["k"].n_distinct) == (4, 4, 3)
    assert (got["s"].n_rows, got["s"].n_nonnull, got["s"].n_distinct) == (4, 3, 2)


def test_zorder_compact_clusters_both_columns(spark, sf_small, tmp_path):
    """OPTIMIZE ZORDER analogue: after the rewrite, per-file min/max
    spans shrink on BOTH zorder columns simultaneously (that is the
    property parquet stats pruning needs); a hash layout leaves every
    file spanning ~the full range of each."""
    ev = load_table(spark, sf_small, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "z")
    ev.repartition(8).write.parquet(path)

    def span_ratio(col):
        # mean over files of (file max-min) / (global max-min)
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
        )
        g = ev.agg((F.max(col) - F.min(col)).alias("g")).first()["g"]
        rows = per_file.collect()
        return sum(r.span for r in rows) / (len(rows) * g)

    before_user, before_value = span_ratio("user_id"), span_ratio("value")
    import os as _os

    total = sum(
        _os.path.getsize(_os.path.join(r, f))
        for r, _d, fs in _os.walk(path) for f in fs if f.endswith(".parquet")
    )
    res = MT.zorder_compact(
        spark, path, ["user_id", "value"], bits=12,
        target_file_bytes=max(total // 8, 1),
    )
    assert res["rows_before"] == res["rows_after"] == ev.count()
    assert res["files_target"] >= 6
    after_user, after_value = span_ratio("user_id"), span_ratio("value")
    # hash layout: every file spans ~the full range of each column;
    # zorder must cut the mean span materially on BOTH at once
    assert before_user > 0.7 and before_value > 0.7
    assert after_user < 0.6 * before_user, (before_user, after_user)
    assert after_value < 0.6 * before_value, (before_value, after_value)


def test_doomscroll_and_cold_start_views(spark, sf_small):
    """Dashboard panels 2+3 (doomscroll rate, cold-start gauge): rates
    match a direct computation over the same gold rollup; cold-start
    pct lies in [0,1] with a consistent band."""
    import datetime

    from real_timetransactionaldatalakehouse_spark.serving import (
        cold_start_view,
        doomscroll_view,
        register_gold_views,
    )

    ev = load_table(spark, sf_small, "events")
    gold = MD.build_gold_window_stats(ev)
    register_gold_views(spark, gold)
    hi = gold.agg(F.max("window_start")).first()[0] + datetime.timedelta(minutes=1)
    as_of = hi.strftime("%Y-%m-%d %H:%M:%S")

    ds = doomscroll_view(spark, as_of, lookback_minutes=10).collect()
    assert ds, "no doomscroll bins in lookback"
    direct = {
        r.window_start: (r.errors, r.views)
        for r in gold.groupBy("window_start")
        .agg(F.sum("errors").alias("errors"), F.sum("views").alias("views"))
        .collect()
    }
    for r in ds:
        e, v = direct[r.window_start]
        want = e / v if v else None
        assert r.doomscroll_rate == want
        assert bool(r.alert) == (want is not None and want > 0.40)

    cs = cold_start_view(spark, as_of, age_minutes=120).first()
    assert cs.n_new >= 0
    if cs.n_new:
        assert 0.0 <= cs.pct_quality <= 1.0
        want_band = ("green" if cs.pct_quality > 0.20
                     else "yellow" if cs.pct_quality >= 0.10 else "red")
        assert cs.band == want_band


def test_insert_overwrite_partitions_touches_only_present(spark, tmp_path):
    """Dynamic partition overwrite must replace only the partitions in
    the incoming frame — the idempotent backfill contract."""
    from real_timetransactionaldatalakehouse_spark.maintenance import (
        insert_overwrite_partitions,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0),
         ("2024-01-02", 3, 30.0), ("2024-01-03", 4, 40.0)],
        "dt string, id int, v double",
    )
    insert_overwrite_partitions(base, path, ["dt"])
    # backfill day 2 with corrected rows only
    fix = spark.createDataFrame(
        [("2024-01-02", 3, 33.0), ("2024-01-02", 99, 99.0)],
        "dt string, id int, v double",
    )
    insert_overwrite_partitions(fix, path, ["dt"])
    got = {(str(r.dt), r.id): r.v for r in spark.read.parquet(path).collect()}
    assert got == {
        ("2024-01-01", 1): 10.0, ("2024-01-01", 2): 20.0,
        ("2024-01-02", 3): 33.0, ("2024-01-02", 99): 99.0,
        ("2024-01-03", 4): 40.0,
    }
    # replay is idempotent
    insert_overwrite_partitions(fix, path, ["dt"])
    assert {(str(r.dt), r.id): r.v for r in spark.read.parquet(path).collect()} == got
    # session default restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode").upper() == "STATIC"


def test_write_shards_enforces_rows_per_file(spark, sf_small, tmp_path):
    """Every shard file must hold at most rows_per_file rows; ordered
    shards must cover contiguous id ranges; JSONL export round-trips."""
    from pyspark.sql import functions as F

    from real_timetransactionaldatalakehouse_spark.maintenance import write_shards
    from real_timetransactionaldatalakehouse_spark.sources import load_table

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    p = str(tmp_path / "shards")
    stats = write_shards(docs, p, rows_per_file=64, order_cols=["doc_id"])
    assert stats["rows"] == docs.count()
    per_file = (
        spark.read.parquet(p)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("lo"),
             F.max("doc_id").alias("hi"))
        .collect()
    )
    assert stats["files"] == len(per_file) and len(per_file) >= 8
    assert all(r.n <= 64 for r in per_file)
    # contiguous coverage: file id ranges must not interleave
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo or a_hi <= b_hi  # ranges ordered, ties allowed at partition edges

    pj = str(tmp_path / "shards_json")
    stats_j = write_shards(docs, pj, rows_per_file=128, fmt="json")
    back = spark.read.json(pj)
    assert stats_j["rows"] == docs.count()
    assert back.count() == docs.count()
