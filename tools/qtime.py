#!/usr/bin/env python
"""Time individual declared queries in isolation through the noop sink.

Usage:
    python tools/qtime.py q_name [q_name ...] [--n 5]

Same session profile, warmup and timing methodology as bench.py
(min-of-N noop saves of the prebuilt plan, cache cleared between runs,
GC outside the clock) but for a handful of queries — the fast
iteration loop for the optimization rounds.
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from real_timetransactionaldatalakehouse_spark.session import (
        batch_session,
        tune_for_input,
    )

    import __spark_entry__ as entry

    argv = sys.argv[1:]
    args: list[str] = []
    n = 5
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--n"):
            n = int(a.split("=", 1)[1]) if "=" in a else int(argv[i + 1])
            i += 1 if "=" in a else 2
            continue
        args.append(a)
        i += 1

    spark = batch_session("lakehouse-qtime")
    input_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(SF_DIR)
        for f in fs
    )
    tune_for_input(spark, input_bytes)
    qs = entry.queries()

    # same warmup families as bench.py so numbers are comparable
    for wq in (
        "q_agg_global", "q_window_tumbling_1min", "q_join_inner_equi",
        "q_orderby_limit_topk", "q_dedup_latest", "q_neardup_minhash",
    ):
        qs[wq](spark, "/root/testdata/sf0.001").collect()

    from real_timetransactionaldatalakehouse_spark import TPCH_TABLES as _TT

    def _fault_in(path: str) -> None:
        if os.path.isdir(path):
            for r, _, fs in os.walk(path):
                for f in fs:
                    _fault_in(os.path.join(r, f))
            return
        with open(path, "rb") as fh:
            while fh.read(1 << 24):
                pass

    for t in _TT:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            _fault_in(p)

    def run_df(df) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        spark.sparkContext._jvm.System.gc()
        return dt

    for name in args:
        spark.sparkContext.setJobDescription(f"qtime: {name}")
        df = qs[name](spark, SF_DIR)
        cold = run_df(df)
        samples = sorted(run_df(df) for _ in range(n))
        print(
            f"{name}: cold={cold:.4f} steady={samples[0]:.4f} "
            f"samples={[round(s, 4) for s in samples]}"
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
