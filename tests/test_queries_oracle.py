"""Driver-mimic oracle parity: run every queries() entry on Spark at
sf0.01 and its oracle_sql() twin on DuckDB, compare row count, sorted
column names, and a pandas value hash — the same contract the driver's
CORRECTNESS check applies.

The comparison deliberately goes through pandas (``df.toPandas()`` vs
duckdb ``.df()``) and hashes the materialized frames, because that is the
driver's path: a DuckDB HUGEINT that pandas widens to float64 must FAIL
here even when the integer values are equal (round-1 gap_sessionize
regression — ADVICE r1 #3).
"""

from __future__ import annotations

import duckdb
import pandas as pd
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


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted frame — the driver's pre-hash shape."""
    df = df[sorted(df.columns)].copy()
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _value_hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(df, index=False).sum())


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(name, spark, ddb):
    sdf = _canon(QUERIES[name](spark, SF_DIR).toPandas())
    odf = _canon(ddb.execute(ORACLES[name]).df())

    assert list(sdf.columns) == list(odf.columns), name
    assert len(sdf) == len(odf), f"{name}: spark={len(sdf)} duckdb={len(odf)}"
    if _value_hash(sdf) != _value_hash(odf):
        dtype_diff = {
            c: (str(sdf[c].dtype), str(odf[c].dtype))
            for c in sdf.columns
            if str(sdf[c].dtype) != str(odf[c].dtype)
        }
        neq = sdf.astype(str).compare(odf.astype(str)).head(5)
        pytest.fail(
            f"{name}: pandas value-hash mismatch; dtype diffs: {dtype_diff}; "
            f"first value diffs:\n{neq}"
        )


def test_driver_window():
    """The driver grades only the FIRST 50 queries() entries in dict
    order (round-3 verdict #1: three extra SQL queries silently pushed
    the four pipeline-parity checks out of the graded window). Pin the
    contract: total <= 50 and the pipeline-parity checks lead."""
    from pdfredact_spark.corpus_queries import PIPELINE_QUERIES

    names = list(QUERIES)
    # EXACTLY 50 (ADVICE r4): <= would let an accidentally-dropped query
    # silently shrink the graded evidence set with the gate still green
    assert len(names) == 50, f"{len(names)} queries; driver grades exactly 50"
    assert names[: len(PIPELINE_QUERIES)] == list(PIPELINE_QUERIES)
    assert set(ORACLES) == set(names)  # every graded query has an oracle


# (test_rows_only_queries_run removed, round-6 review: the loop over
# set(QUERIES) - set(ORACLES) was provably empty — test_driver_window
# asserts set equality — so it executed nothing, and its `count() >= 0`
# body was tautological besides. Oracle-less queries, if ever
# reintroduced, must come with their own real test.)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "n_masks", "n_spans"}
    assert sum(r["n_masks"] for r in rows) > 0  # flagship actually redacts


def test_distinct_users_all_null_type_keeps_group(spark, tmp_path):
    """An event_type whose user_ids are ALL NULL must still appear with
    n_users=0, matching COUNT(DISTINCT)'s keep-the-group semantics
    (round-4 review #2: a NULL pre-filter dropped the whole group while
    the oracle emitted it — a row-count mismatch on nullable corpora)."""
    import duckdb
    from pyspark.sql import functions as F

    from pdfredact_spark.queries import ORACLE_SQL, SQL_QUERIES

    rows = [
        (1, "2024-01-01 00:00:00", 10, "click", 1.0),
        (2, "2024-01-01 00:01:00", 10, "click", 1.0),
        (3, "2024-01-01 00:02:00", None, "ghost", 1.0),   # all-NULL type
        (4, "2024-01-01 00:03:00", None, "click", 1.0),   # NULL among reals
        (5, "2024-01-01 00:04:00", 11, "click", 1.0),
    ]
    schema = "event_id long, ts string, user_id long, event_type string, value double"
    df = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r["n_users"]
        for r in SQL_QUERIES["distinct_users_by_type"](spark, str(tmp_path)).collect()
    }
    assert got == {"click": 2, "ghost": 0}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    oracle = dict(con.execute(ORACLE_SQL["distinct_users_by_type"]).fetchall())
    assert got == oracle


def test_interval_overlap_boundary_refine_on_misaligned_orders(spark, tmp_path):
    """The hierarchical day-binned interval join splits each order into
    fully-covered days (joined against the per-day aggregate) plus
    partial boundary days (event-grain refine). The driver corpus is all
    midnight-aligned, so this fixture pins the boundary branch: a
    13:30-anchored order must count events by the exact half-open
    [D, D+7) window, not whole days."""
    import datetime as dt

    import duckdb

    from pdfredact_spark.queries import (
        _EVENT_EPOCH_SHIFT_US,
        ORACLE_SQL,
        q_interval_overlap_join,
    )

    shift = dt.timedelta(microseconds=_EVENT_EPOCH_SHIFT_US)
    D = dt.datetime(1997, 6, 10, 13, 30)  # misaligned
    A = dt.datetime(1997, 6, 20)  # aligned control
    orders = [(1, D), (2, A)]
    # event targets probe every boundary of order 1's [D, D+7) window
    targets = [
        D - dt.timedelta(microseconds=1),          # out (before)
        D,                                         # in  (half-open start)
        D + dt.timedelta(hours=3),                 # in  (first partial day)
        dt.datetime(1997, 6, 12, 0, 0),            # in  (full day)
        D + dt.timedelta(days=7, microseconds=-1), # in  (last partial day)
        D + dt.timedelta(days=7),                  # out (half-open end)
        A + dt.timedelta(days=3),                  # order 2 only
    ]
    events = [(i, t + shift) for i, t in enumerate(targets)]

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.createDataFrame(orders, "o_orderkey long, o_orderdate timestamp_ntz") \
        .write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(events, "event_id long, ts timestamp_ntz") \
        .write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {r["o_orderkey"]: r["n_events"]
           for r in q_interval_overlap_join(spark, str(tmp_path)).collect()}
    assert got == {1: 4, 2: 1}

    con = duckdb.connect()
    for t in ("orders", "events"):
        con.execute(  # Spark writes a directory; duckdb needs the glob
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    oracle = {k: v for k, v in con.execute(ORACLE_SQL["interval_overlap_join"]).fetchall()}
    assert got == oracle
