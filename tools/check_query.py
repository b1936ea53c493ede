"""Targeted single-query oracle check (fast iteration companion to
oracle_sweep.py, which re-checks everything).

Usage:
    python tools/check_query.py [sf0.01] name [name2 ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_sweep import TABLES, check_one  # noqa: E402


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    args = sys.argv[1:]
    sf = args.pop(0) if args and args[0].startswith("sf") else "sf0.01"
    d = f"/root/testdata/{sf}"
    known = sorted(entry.queries())
    if not args:
        # round-5 review: name-less invocation silently exited 0 having
        # checked nothing — a green signal with zero queries verified
        print("usage: check_query.py [sfX] name [name2 ...]; names:",
              ", ".join(known), file=sys.stderr)
        return 2
    unknown = [n for n in args if n not in set(known)]
    if unknown:
        print(f"unknown queries {unknown}; valid names: {', '.join(known)}",
              file=sys.stderr)
        return 2

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
        ok, n_s, n_o, h_eq = check_one(spark, con, qs, oracles, name, d)
        print(f"{name}: {'OK' if ok else 'FAIL'} rows={n_s}/{n_o} hash={'=' if h_eq else '!='}")
        if not ok:
            fails.append(name)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
