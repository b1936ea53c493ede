"""Targeted single-query oracle check (fast iteration companion to
oracle_sweep.py, which re-checks everything).

Usage:
    python tools/check_query.py [sf0.01] name [name2 ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_sweep import TABLES, canon  # noqa: E402


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    args = sys.argv[1:]
    sf = args.pop(0) if args and args[0].startswith("sf") else "sf0.01"
    d = f"/root/testdata/{sf}"

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName(f"check-query-{sf}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    fails = []
    for name in args:
        sdf = canon(qs[name](spark, d).toPandas())
        odf = canon(con.execute(oracles[name]).df())
        hs = int(pd.util.hash_pandas_object(sdf, index=False).sum())
        ho = int(pd.util.hash_pandas_object(odf, index=False).sum())
        ok = len(sdf) == len(odf) and list(sdf.columns) == list(odf.columns) and hs == ho
        print(f"{name}: {'OK' if ok else 'FAIL'} rows={len(sdf)}/{len(odf)} hash={'=' if hs == ho else '!='}")
        if not ok:
            fails.append(name)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
