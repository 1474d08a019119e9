"""Catalog façade (A8): schema.table round trips, versioned tables
resolved through the registry, serving views resolving via catalog
names instead of raw paths."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_timetransactionaldatalakehouse_spark.catalog import Catalog  # noqa: E402
from real_timetransactionaldatalakehouse_spark import tablefmt as TF  # noqa: E402
from real_timetransactionaldatalakehouse_spark.medallion import build_gold_window_stats  # noqa: E402
from real_timetransactionaldatalakehouse_spark.serving import (  # noqa: E402
    register_gold_views_from_catalog,
    velocity_view,
)
from real_timetransactionaldatalakehouse_spark.sources import load_table  # noqa: E402


def test_catalog_round_trip(spark, sf_small, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    ev = load_table(spark, sf_small, "events").select("event_id", "user_id")
    cat.create_table("bronze.events")
    cat.write("bronze.events", ev)
    assert cat.read("bronze.events").count() == ev.count()
    assert cat.tables("bronze") == ["events"]
    assert cat.namespaces() == ["bronze"]
    # registry survives a new Catalog instance (state file)
    cat2 = Catalog(spark, str(tmp_path / "wh"))
    assert cat2.read("bronze.events").count() == ev.count()
    cat2.drop_table("bronze.events", purge=True)
    assert cat2.tables("bronze") == []
    assert not os.path.isdir(cat2.warehouse + "/bronze/events")
    with pytest.raises(KeyError):
        cat2.read("bronze.events")


def test_catalog_versioned_and_partitioned_tables(spark, sf_small, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    ev = load_table(spark, sf_small, "events").select("event_id", "ts", "user_id")
    # versioned: each write commits a snapshot
    cat.create_table("dims.users", versioned=True)
    cat.write("dims.users", ev.limit(100))
    cat.write("dims.users", ev.limit(10))
    assert cat.read("dims.users").count() == 10
    assert TF.current_version(cat.table_path("dims.users")) == 2
    # partitioned plain table: layout column reaches the directory level
    cat.create_table("bronze.ev", partition_by=["p_date"])
    cat.write("bronze.ev", ev.withColumn("p_date", F.to_date("ts").cast("string")))
    sub = os.listdir(cat.table_path("bronze.ev"))
    assert any(d.startswith("p_date=") for d in sub)


def test_namespace_guard(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_table("gold.t1")
    with pytest.raises(ValueError):
        cat.drop_namespace("gold")
    cat.drop_table("gold.t1")
    cat.drop_namespace("gold")
    assert cat.namespaces() == []
    with pytest.raises(ValueError):
        cat.create_table("no_schema_part")


def test_serving_views_resolve_via_catalog(spark, sf_small, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    events = load_table(spark, sf_small, "events")
    gold = build_gold_window_stats(events)
    cat.create_table("gold.stats_1min")
    cat.write("gold.stats_1min", gold)
    register_gold_views_from_catalog(spark, cat, dim_table=None)
    as_of = str(events.agg(F.max("ts")).first()[0])
    v = velocity_view(spark, as_of, lookback_minutes=10**6)
    assert v.count() > 0
    assert {"user_id", "velocity"} <= set(v.columns)


def test_catalog_alter_table_add_columns(spark, sf_small, tmp_path):
    """A8 + schema evolution: ALTER through the catalog on a versioned
    table; non-versioned tables are rejected (no snapshot metadata to
    evolve)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    ev = load_table(spark, sf_small, "events").select("event_id", "props")
    cat.create_table("silver.events", versioned=True)
    cat.write("silver.events", ev)
    fields = cat.alter_table("silver.events", {"k_val": "bigint", "tag": "string"})
    assert [f["name"] for f in fields] == ["event_id", "props", "k_val", "tag"]
    got = cat.read("silver.events")
    assert dict(got.dtypes)["k_val"] == "bigint"
    assert got.filter(F.col("k_val").isNotNull() | F.col("tag").isNotNull()).count() == 0

    cat.create_table("bronze.plain")
    cat.write("bronze.plain", ev)
    with pytest.raises(ValueError, match="versioned"):
        cat.alter_table("bronze.plain", {"x": "int"})


def test_catalog_properties_and_rename(spark, sf_small, tmp_path):
    """TBLPROPERTIES round trip + catalog rename (storage untouched)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    ev = load_table(spark, sf_small, "events").select("event_id")
    cat.create_table("bronze.ev", properties={"format-version": "2"})
    cat.write("bronze.ev", ev)
    assert cat.properties("bronze.ev") == {"format-version": "2"}
    merged = cat.set_properties("bronze.ev", {"write.parquet.compression-codec": "zstd"})
    assert merged["format-version"] == "2" and len(merged) == 2
    # persisted across instances
    assert Catalog(spark, str(tmp_path / "wh")).properties("bronze.ev") == merged

    path_before = cat.table_path("bronze.ev")
    cat.rename_table("bronze.ev", "bronze.events_raw")
    assert cat.table_path("bronze.events_raw") == path_before
    assert cat.read("bronze.events_raw").count() == ev.count()
    with pytest.raises(KeyError):
        cat.meta("bronze.ev")
    cat.create_table("bronze.other")
    with pytest.raises(ValueError, match="already exists"):
        cat.rename_table("bronze.events_raw", "bronze.other")
    # failed rename leaves the source intact
    assert cat.read("bronze.events_raw").count() == ev.count()


def test_expire_snapshots_older_than_retains_recent(spark, sf_small, tmp_path):
    """Age bound: young snapshots survive even beyond keep_last."""
    import os as _os

    from real_timetransactionaldatalakehouse_spark import maintenance as MT

    tbl = str(tmp_path / "tbl")
    ev = load_table(spark, sf_small, "events").select("event_id")
    for n in (100, 50, 25):
        TF.write_version(ev.limit(n), tbl)
    # v1 is "old" (backdate mtime), v2/v3 recent
    _os.utime(TF.version_path(tbl, 1), (1, 1))
    res = MT.expire_snapshots(tbl, keep_last=1, older_than_s=3600)
    assert res["removed"] == [1]
    assert TF.list_versions(tbl) == [2, 3]


def test_maintenance_loop_cadence_and_catchup_false(spark, sf_small, tmp_path):
    """M5 cadence runner: fixed-rate hourly schedule with the DAG's
    catchup=False semantics — an overrunning run SKIPS missed ticks
    (never queues them), a failing run records its error and keeps the
    cadence, and each run produces the composed maintenance report.
    Clock and sleep are injected so the schedule arithmetic is tested
    without wall-clock waits."""
    from real_timetransactionaldatalakehouse_spark import maintenance as MT

    cat = Catalog(spark, str(tmp_path / "wh"))
    ev = load_table(spark, sf_small, "events").select("event_id", "ts")
    cat.create_table("bronze.events", versioned=True)
    cat.write("bronze.events", ev.limit(50))
    cat.write("bronze.events", ev.limit(50))

    # fake time: each run_maintenance call costs 90 "minutes" on run 1
    # (overrun) and 5 minutes otherwise
    state = {"t": 0.0, "runs": 0}

    def clock():
        return state["t"]

    def sleep(dt):
        assert dt >= 0
        state["t"] += dt

    real_run = MT.run_maintenance

    def instrumented(spark_, cat_, **kw):
        cost = 5400.0 if state["runs"] == 1 else 300.0
        state["t"] += cost
        state["runs"] += 1
        return real_run(spark_, cat_, **kw)

    MT.run_maintenance, orig = instrumented, MT.run_maintenance
    try:
        reports = MT.maintenance_loop(
            spark, cat, interval_s=3600.0, max_runs=4,
            clock=clock, sleep=sleep, keep_last=2,
        )
    finally:
        MT.run_maintenance = orig
    assert [r["run"] for r in reports] == [0, 1, 2, 3]
    # run 0 at t=0; run 1 at 3600; run 1 overruns to 9000 -> tick 7200
    # is SKIPPED and run 2 fires at 10800; run 3 back on cadence
    assert [r["scheduled_at_s"] for r in reports] == [0.0, 3600.0, 10800.0, 14400.0]
    assert all("report" in r for r in reports)
    assert reports[0]["report"]["bronze.events"]["compact"]["rows_after"] == 50

    # on_error="continue": a table whose path vanishes mid-loop records
    # the exception and the loop keeps going
    import shutil

    shutil.rmtree(cat.table_path("bronze.events"))
    bad = MT.maintenance_loop(
        spark, cat, interval_s=3600.0, max_runs=2, clock=clock, sleep=sleep,
    )
    assert len(bad) == 2 and all("error" in r for r in bad)


def test_run_maintenance_composed(spark, sf_small, tmp_path):
    """M5 analogue: one entry point composes compact -> expire ->
    orphans -> ttl over catalog tables (reference maintenance_dag.py:
    13-31 scheduling compact_cold_data.py), preserving rows, retiring
    old snapshots, and sweeping crashed-write tmp dirs."""
    import datetime

    from real_timetransactionaldatalakehouse_spark import maintenance as MT

    cat = Catalog(spark, str(tmp_path / "wh"))
    ev = load_table(spark, sf_small, "events").select("event_id", "ts", "user_id")
    cat.create_table("bronze.events", versioned=True)
    # three snapshots so keep_last=2 has something to expire post-compact
    cat.write("bronze.events", ev)
    cat.write("bronze.events", ev)
    cat.write("bronze.events", ev)
    n = ev.count()
    path = cat.table_path("bronze.events")
    # simulated crashed write
    os.makedirs(os.path.join(path, "_versions", ".tmp-v00000042"), exist_ok=True)
    # plain (non-versioned) table rides the same run
    cat.create_table("gold.flat")
    cat.write("gold.flat", ev)

    cutoff = datetime.datetime(2024, 1, 1)
    report = MT.run_maintenance(
        spark,
        cat,
        keep_last=2,
        ttl={"bronze.events": ("ts", cutoff)},
        zorder={"gold.flat": ["user_id", "event_id"]},
    )
    assert set(report) == {"bronze.events", "gold.flat"}
    r = report["bronze.events"]
    # compaction preserved rows, then TTL kept only post-cutoff rows
    assert r["compact"]["rows_before"] == r["compact"]["rows_after"] == n
    kept = ev.filter(F.col("ts") >= F.lit(cutoff)).count()
    assert r["ttl"]["rows_after"] == kept
    assert cat.read("bronze.events").count() == kept
    # snapshots beyond keep_last expired, orphan tmp dir swept
    assert r["expired"]["removed"], r
    assert ".tmp-v00000042" in r["orphans"]["removed"]
    assert not os.path.isdir(os.path.join(path, "_versions", ".tmp-v00000042"))
    # plain table: zorder-compacted only (no snapshot metadata steps)
    assert "expired" not in report["gold.flat"]
    assert report["gold.flat"]["compact"]["rows_after"] == n
    assert report["gold.flat"]["compact"]["zorder_by"] == ["user_id", "event_id"]
