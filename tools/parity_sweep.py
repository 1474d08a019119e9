"""Full-registry parity sweep -> committed artifact (PARITY_r{N}.json).

Why this exists: the driver certifies 50 of the 150 declared queries
per round (CORRECTNESS_r*.json), so the rotation is a zero-slack
3-round cycle and any round that changes implementations pushes
unchanged queries past the 3-round freshness bound (r9 VERDICT
"What's wrong" #2).  This tool closes that gap with EVIDENCE instead
of scheduling: it runs EVERY declared query against its DuckDB oracle
at the driver's correctness SF (sf0.01) in one process — the same
row-count + sorted-column value-hash comparison the driver applies
(tests/oracle_compare mirrors it) — and writes a one-line-per-query
JSON artifact for the round.  A query outside the driver's window
still gets a current-round, committed, reproducible hash-green record.

Usage:
    python tools/parity_sweep.py                 # sf0.01, PARITY_rNN.json
    python tools/parity_sweep.py --sf /root/testdata/sf0.001 --out /tmp/p.json

Queries without an oracle are recorded as ``no_oracle`` with their
row count (the same convention as CORRECTNESS_r*.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession
    from tests.oracle_compare import compare_query, duckdb_connection

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("parity-sweep")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb_connection(args.sf)
    results: dict[str, dict] = {}
    t0 = time.perf_counter()
    for name in qs:
        try:
            if name in osql:
                r = compare_query(name, qs[name](spark, args.sf), con, osql[name])
                results[name] = {
                    "ok": bool(r.ok),
                    "detail": None if r.ok else str(r.detail)[:200],
                }
            else:
                n = qs[name](spark, args.sf).count()
                results[name] = {"ok": None, "detail": "no_oracle", "rows": n}
        except Exception as e:  # a crash is a red row, not a dead sweep
            results[name] = {"ok": False, "detail": "EXC " + str(e)[:200]}
    wall = time.perf_counter() - t0

    n_ok = sum(1 for v in results.values() if v["ok"] is True)
    n_bad = sum(1 for v in results.values() if v["ok"] is False)
    n_no = sum(1 for v in results.values() if v["ok"] is None)
    out = args.out
    if out is None:
        # next round = 1 + max existing round number (r10 ADVICE #2:
        # first-free-gap naming would label a fresh run PARITY_r01.json
        # when only PARITY_r10.json exists — mislabeling the artifact
        # as round 1 instead of extending history past the latest)
        import re

        rounds = [
            int(m.group(1))
            for f in os.listdir(".")
            if (m := re.fullmatch(r"PARITY_r(\d+)\.json", f))
        ]
        out = f"PARITY_r{(max(rounds) if rounds else 0) + 1:02d}.json"
    payload = {
        "sf": args.sf,
        "wall_s": round(wall, 1),
        "n_queries": len(results),
        "n_ok": n_ok,
        "n_fail": n_bad,
        "n_no_oracle": n_no,
        "queries": results,
    }
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps({k: payload[k] for k in
                      ("sf", "wall_s", "n_queries", "n_ok", "n_fail",
                       "n_no_oracle")}))
    print("wrote", out)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
