"""Driver-mimic oracle parity: run every queries() entry on Spark at
sf0.01 and its oracle_sql() twin on DuckDB, compare row count, sorted
column names, and an order-insensitive value multiset — the same contract
the driver's CORRECTNESS check applies.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if hasattr(v, "__float__") and not isinstance(v, (int, bool)):
        return f"{float(v):.6g}"
    return str(v)


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(name, spark, ddb):
    df = QUERIES[name](spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    res = ddb.execute(ORACLES[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), name
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: spark={len(spark_rows)} duckdb={len(ddb_rows)}"
    )
    ms_s = _multiset(spark_rows, spark_cols)
    ms_d = _multiset(ddb_rows, ddb_cols)
    if ms_s != ms_d:
        diff = [(a, b) for a, b in zip(ms_s, ms_d) if a != b][:5]
        pytest.fail(f"{name}: value mismatch, first diffs: {diff}")


def test_rows_only_queries_run(spark):
    for name in set(QUERIES) - set(ORACLES):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name
        assert len(df.columns) > 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "n_masks", "n_spans"}
    assert sum(r["n_masks"] for r in rows) > 0  # flagship actually redacts
