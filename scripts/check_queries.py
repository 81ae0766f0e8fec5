"""Run a SUBSET of declared queries against their DuckDB oracles with
the driver's canonicalization — the fast inner loop for fixing one
query (driver_sim runs all 92; this runs the names you pass).

Usage: python scripts/check_queries.py name [name ...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod  # noqa: E402
from energi_data_etl_spark.plans.parity import compare_frames  # noqa: E402
from energi_data_etl_spark.sources.tables import TABLES  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    fails = 0
    for name in args:
        if name not in qs:
            print(f"??  {name}: not in catalog")
            fails += 1
            continue
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {exc}")
            fails += 1
            continue
        if name in osql:
            r = compare_frames(name, sdf, con.execute(osql[name]).df())
            print(("OK  " if r.ok else "FAIL") + f" {name} {r.detail}")
            fails += not r.ok
        else:
            print(f"rows {name} {len(sdf)} (rows-only)  dtypes: {dict(sdf.dtypes.astype(str))}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
