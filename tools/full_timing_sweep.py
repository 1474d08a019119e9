#!/usr/bin/env python
"""One-shot noop timing of EVERY registered query at sf0.1 — the
round-13 outlier finder (q_decontaminate's 5 s wall was invisible to
the bench because it is not a bench member).  One cold + one warm run
per query; prints a sorted table.  Not a benchmark — a triage sweep.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from real_timetransactionaldatalakehouse_spark.session import (
        batch_session,
        tune_for_input,
    )

    import __spark_entry__ as entry

    spark = batch_session("timing-sweep")
    input_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(SF_DIR)
        for f in fs
    )
    tune_for_input(spark, input_bytes)
    qs = entry.queries()

    def run(df) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    rows = []
    for name in qs:
        try:
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            build = time.perf_counter() - t0
            cold = run(df)
            warm = run(df)
            rows.append((name, build, cold, warm))
            print(f"RAW {name} build={build:.3f} cold={cold:.3f} warm={warm:.3f}",
                  flush=True)
        except Exception as e:
            print(f"RAW {name} ERROR {str(e)[:120]}", flush=True)
    rows.sort(key=lambda r: -r[3])
    print("\n=== sorted by warm wall ===")
    for name, build, cold, warm in rows:
        print(f"{name:38s} build={build:7.3f} cold={cold:7.3f} warm={warm:7.3f}")


if __name__ == "__main__":
    main()
