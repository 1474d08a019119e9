#!/usr/bin/env python
"""Paired A/B of the WORKING TREE vs the last round commit for a chosen
query subset — the fast iteration loop of the optimization rounds.

    python tools/ab_quick.py q_a q_b ... [--passes 3] [--runs 2]

Reuses tools/bench_ab.interleaved_ab (same-session alternating passes,
both floors recorded) so every optimization claim is host-drift-paired
instead of compared across sessions on a noisy VM.
"""

from __future__ import annotations

import importlib
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    import bench_ab

    ent = bench_ab._load_entry(_ROOT)
    session_mod = importlib.import_module(
        "real_timetransactionaldatalakehouse_spark.session")
    spark = session_mod.batch_session("ab-quick")
    input_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(args.sf) for f in fs
    )
    session_mod.tune_for_input(spark, input_bytes)
    qs = ent.queries()
    for wq in ("q_agg_global", "q_join_inner_equi", "q_dedup_latest",
               "q_neardup_minhash"):
        qs[wq](spark, "/root/testdata/sf0.001").collect()
    bench_ab._unload(_ROOT)

    import bench as _bench

    res = bench_ab.interleaved_ab(
        spark, args.sf, _ROOT, list(args.queries),
        set(_bench.ORACLE_SKIP),
        passes=args.passes, runs_per_query=args.runs,
    )
    keep = {
        k: res[k]
        for k in (
            "prev_sha", "floor_prev", "floor_curr", "prev_min", "curr_min",
            "sum_prev", "sum_curr", "paired_curr_vs_prev",
            "per_query_curr_vs_prev",
        )
    }
    print(json.dumps(keep, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
