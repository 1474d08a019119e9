#!/usr/bin/env python
"""Measure embedding near-dup LSH with the DERIVED plane count at the
50x replica (VERDICT r7 #3).

Three rows at the replica: the r7-certified fixed config (planes=4,
which both engines choke on at 100k+ vectors — ~10^9 in-bucket
candidates), an intermediate (8), and the auto-derived config
(derive_planes(n) = ceil(log2(n/128))).  For the derived config the
DuckDB twin runs the SAME banding (planes baked into the generated
SQL), so the ratio is algorithm-for-algorithm.

Also prints a recall/wall trade table at 1x (sf0.1, 4k vectors) where
the exact all-pairs ground truth is computable: pairs found per plane
count vs the exact threshold pairs.

Usage:
  python tools/lsh_autoplanes_bench.py [--replica /tmp/sf0.1rep50]
      [--copies 50] [--skip-fixed]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replica", default="/tmp/sf0.1rep50")
    ap.add_argument("--copies", type=int, default=50)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--tables", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.35)
    ap.add_argument("--skip-fixed", action="store_true",
                    help="skip the planes=4 row (minutes at 50x)")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from amortized_bench import build_replica

    build_replica(args.src, args.replica, args.copies)

    from pyspark.sql import functions as F  # noqa: F401

    import __spark_entry__ as entry
    from real_timetransactionaldatalakehouse_spark.operators import (
        similarity as S,
    )
    from real_timetransactionaldatalakehouse_spark.session import (
        batch_session, tune_for_input,
    )
    from real_timetransactionaldatalakehouse_spark.sources import load_table

    spark = batch_session("lsh-autoplanes-bench")
    spark.sparkContext.setLogLevel("ERROR")
    input_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(args.replica) for f in fs
    )
    tune_for_input(spark, input_bytes)

    emb = load_table(spark, args.replica, "embeddings")
    n = emb.count()
    derived = S.derive_planes(n)
    out = {"replica_vectors": n, "derived_planes": derived,
           "tables": args.tables, "threshold": args.threshold}

    def run_spark(planes: int) -> tuple[float, int]:
        df = S.embedding_neardup_pairs_lsh(
            emb, threshold=args.threshold, planes=planes,
            tables=args.tables, corpus_count=n,
        )
        t0 = time.perf_counter()
        n_pairs = df.count()
        first = time.perf_counter() - t0
        best = first
        for _ in range(args.reps - 1):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = S.embedding_neardup_pairs_lsh(
                emb, threshold=args.threshold, planes=planes,
                tables=args.tables, corpus_count=n,
            )
            df.count()
            best = min(best, time.perf_counter() - t0)
        return best, n_pairs

    rows = {}
    configs = ([] if args.skip_fixed else [4]) + [8, derived]
    for p in dict.fromkeys(configs):
        wall, n_pairs = run_spark(p)
        rows[f"planes={p}"] = {"spark_wall_s": round(wall, 2),
                               "pairs": n_pairs}

    # DuckDB twin at the derived config (same generated banding SQL)
    total_planes = args.tables * derived
    sql = f"""
WITH {entry._lsh_planes_cte(total_planes)},
allv AS (SELECT vec_id AS id, embedding AS v
         FROM read_parquet('{args.replica}/embeddings.parquet/*.parquet')),
{entry._lsh_bucket_cte("bk", "allv", derived)},
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM bk l JOIN bk r ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.id < r.id
),
scored AS (
  SELECT cand.id_a, cand.id_b,
    {entry._FOLD_DOT} / ({entry._fold_norm("a.v")} * {entry._fold_norm("b.v")}) AS score
  FROM cand JOIN allv a ON cand.id_a = a.id JOIN allv b ON cand.id_b = b.id
)
SELECT COUNT(*) FROM scored WHERE score >= {args.threshold}
"""
    con = duckdb.connect()
    d_best, d_pairs = 1e9, None
    for _ in range(args.reps):
        t0 = time.perf_counter()
        d_pairs = con.execute(sql).fetchone()[0]
        d_best = min(d_best, time.perf_counter() - t0)
    rows[f"planes={derived}"]["duckdb_twin_wall_s"] = round(d_best, 2)
    rows[f"planes={derived}"]["duckdb_pairs"] = d_pairs
    rows[f"planes={derived}"]["ratio_vs_twin"] = round(
        rows[f"planes={derived}"]["spark_wall_s"] / d_best, 2
    )
    out["replica_rows"] = rows

    # recall/wall trade at 1x where exact ground truth is computable
    emb1 = load_table(spark, args.src, "embeddings")
    n1 = emb1.count()
    exact = S.embedding_neardup_pairs(
        emb1, threshold=args.threshold, max_id=10**12
    ).count()
    trade = {"vectors": n1, "exact_pairs": exact}
    for p in [4, 8, S.derive_planes(n1), derived]:
        found = S.embedding_neardup_pairs_lsh(
            emb1, threshold=args.threshold, planes=p, tables=args.tables,
            corpus_count=n1,
        ).count()
        trade[f"planes={p}"] = {
            "pairs": found, "recall": round(found / max(exact, 1), 3)
        }
    out["recall_trade_1x"] = trade
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
