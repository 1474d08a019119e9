#!/usr/bin/env python
"""Targeted oracle-parity check for a few queries at sf0.001 + sf0.01.

    python tools/parity_quick.py q_a q_b ...

The iteration-loop companion of tools/parity_sweep.py: same
compare_query (row count + schema + sorted value hash) but only for the
queries an optimization touched, at both small SFs.  Queries without a
registered oracle report their row count per SF instead (compare those
against the committed CORRECTNESS/PARITY artifacts by hand).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession
    from tests.oracle_compare import compare_query, duckdb_connection

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("parity-quick")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entry.queries(), entry.oracle_sql()
    bad = 0
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb_connection(sf)
        for name in names:
            if name not in qs:
                print(f"{sf} {name}: NOT REGISTERED")
                bad += 1
                continue
            if name in osql:
                r = compare_query(name, qs[name](spark, sf), con, osql[name])
                print(f"{sf} {name}: {'OK' if r.ok else 'FAIL ' + str(r.detail)[:160]}")
                bad += 0 if r.ok else 1
            else:
                n = qs[name](spark, sf).count()
                print(f"{sf} {name}: no_oracle rows={n}")
        con.close()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
