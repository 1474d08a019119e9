"""Pre-certification audit of the driver's pandas canonicalizer risks.

The driver certifies the first 50 entries of ``queries()`` by loading
BOTH the Spark result and the DuckDB oracle result into pandas,
sorting columns by name, ``sort_values`` over all columns, and hashing
the values.  Two failure classes are invisible to the repo's own
fetchall-based parity sweep and have cost green rows before:

1. **Array-typed output columns** — pandas ``sort_values`` raises
   ``TypeError: unhashable type: 'list'`` (the r5 ``q_collect_set`` /
   ``q_embed_quantize`` ``err`` rows).
2. **Integer dtype drift** — DuckDB's integer ``SUM`` returns HUGEINT,
   which ``.df()`` materializes as float64 while Spark stays int64:
   ``"0"`` vs ``"0.0"`` hash mismatch (the r5 ``q_spike_detect`` red).
   The sweep flags ``duck float`` vs ``spark int`` pairs; a column
   that is float on the DuckDB side because it holds NULLs (pandas
   nullable-int promotion) is a FALSE positive when the Spark side
   holds NULLs too — both sides promote identically in the driver
   (``q_schema_evolution`` is the known benign case).

Run before every round's window is frozen:

    python tools/window_audit.py            # first 50 (the window)
    python tools/window_audit.py --all      # every declared oracle
"""

from __future__ import annotations

import argparse
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    warnings.filterwarnings("ignore")
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from real_timetransactionaldatalakehouse_spark import TPCH_TABLES

    spark = (
        SparkSession.builder.master("local[8]").appName("window-audit")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entry.queries(), entry.oracle_sql()
    names = list(qs) if args.all else list(qs)[:50]

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    issues = []
    for name in names:
        if name not in osql:
            continue  # declared rows-only
        try:
            odf = con.execute(osql[name]).df()
        except Exception as ex:  # noqa: BLE001 - report, don't die
            issues.append((name, f"oracle ERR {str(ex)[:70]}"))
            continue
        try:
            odf[sorted(odf.columns)].sort_values(by=sorted(odf.columns))
        except Exception as ex:  # noqa: BLE001
            issues.append((name, f"oracle canon CRASH {str(ex)[:60]}"))
            continue
        sdf = qs[name](spark, args.sf)
        stypes = dict(sdf.dtypes)
        for c in odf.columns:
            ot, st = str(odf[c].dtype), stypes.get(c, "?")
            if ot.startswith("float") and st in ("bigint", "int", "smallint"):
                nullable = bool(odf[c].isna().any())
                issues.append(
                    (name, f"dtype drift col={c} duck={ot} spark={st}"
                           + (" (nulls present: benign if Spark side "
                              "holds nulls too)" if nullable else
                              " (HARD mismatch risk: add CAST(... AS "
                              "BIGINT) to the oracle)"))
                )
            if ot == "object" and len(odf) and odf[c].map(
                lambda v: isinstance(v, (list, tuple))
            ).any():
                issues.append((name, f"array col={c} (canon crash: "
                                     "project to a joined string)"))
        if set(odf.columns) != set(sdf.columns):
            issues.append((name, "column-name mismatch"))
    print(f"audited {len([n for n in names if n in osql])} oracles")
    for n, msg in issues:
        print(f"{n:32s} {msg}")
    print(f"issues: {len(issues)}")


if __name__ == "__main__":
    main()
