"""Incremental ingestion (Structured Streaming, availableNow).

The reference is strictly batch (SURVEY.md §2.9 — no streaming operators
exist to replicate), but a 10^12-doc corpus is ingested continuously in
practice. Because every pipeline stage is a deterministic per-doc map, the
SAME ``redact_full`` body runs unchanged under a file-source stream with
``trigger(availableNow=True)`` + ``foreachBatch``: each run drains
whatever files arrived since the last checkpoint and exits. Spark's
streaming checkpoint (WAL of processed files) provides exactly-once file
accounting — complementary to checkpoint.py's bucket commit log, which
covers intra-job resume of one large batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdfredact_spark.model import DOC_SCHEMA, Rule
from pdfredact_spark.pipeline import redact_full


def run_incremental(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    rules: list[Rule],
    flatten: bool = False,
    max_files_per_trigger: int | None = None,
) -> int:
    """Drain all unprocessed input files through the redaction pipeline.

    Returns the number of micro-batches executed this run. Output lands
    under ``out_dir/data`` (clean docs) and ``out_dir/errors``; the
    streaming checkpoint lives in ``out_dir/_stream_checkpoint``.
    """
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    data_dir = os.path.join(out_dir, "data")
    err_dir = os.path.join(out_dir, "errors")
    n_batches = {"n": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        full = redact_full(batch_df, rules, flatten)
        # foreachBatch is AT-LEAST-once: a retried batch must not append a
        # second copy. Writes go to a per-batch directory in OVERWRITE
        # mode, so a retry rewrites the same directory (idempotent) —
        # checkpoint.py's commit pattern. Readers scan the parent dir.
        full.persist()
        try:
            (
                full.where(F.col("error").isNull())
                .select("doc_id", "spans", "n_rule_hits")
                .write.mode("overwrite")
                .parquet(os.path.join(data_dir, f"batch={batch_id}"))
            )
            errs = full.where(F.col("error").isNotNull()).select("doc_id", "error")
            if errs.limit(1).count():
                errs.write.mode("overwrite").parquet(
                    os.path.join(err_dir, f"batch={batch_id}")
                )
        finally:
            full.unpersist()
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def windowed_counts_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> None:
    """Watermarked tumbling-window aggregation over event time: the
    canonical late-data streaming shape. Append output mode emits each
    (window, event_type) row EXACTLY ONCE, when the watermark passes the
    window's end — events arriving later than the watermark allows are
    dropped from their (already-finalized) window, by design. State is
    bounded by the watermark horizon; the window/watermark state lives in
    the streaming checkpoint and spans availableNow runs."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # window alignment
    stream = spark.readStream.schema(
        EVENT_SCHEMA_FULL
    ).parquet(input_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            F.col("n").cast("long").alias("n"),
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", os.path.join(out_dir, "windows"))
        .option("checkpointLocation", os.path.join(out_dir, "_window_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


EVENT_SCHEMA_FULL = "event_id long, ts timestamp, user_id long, event_type string, value double"


# ---------------------------------------------------------------------------
# Streaming exact dedup across ingestion waves
# ---------------------------------------------------------------------------
DOCS_TABLE_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def ledger_scan(
    spark: SparkSession,
    ledger_dir: str,
    exclude_batch: int | None = None,
    prefixes: list[str] | None = None,
) -> DataFrame:
    """Fingerprint-ledger read with PARTITION PRUNING: the ledger is laid
    out as ledger/batch=N/pfx=H (H = first hex char of the fingerprint,
    16 values), so filtering on the batch's actual prefixes prunes whole
    directories at plan time — the scan cost per micro-batch is bounded
    by the batch's prefix spread, not the ledger's total size (round-2
    verdict #5: the unpartitioned ledger re-read grew linearly forever)."""
    df = spark.read.parquet(ledger_dir)
    if exclude_batch is not None:
        df = df.where(F.col("batch") != exclude_batch)
    if prefixes is not None:
        df = df.where(F.col("pfx").isin(prefixes))
    return df


def dedup_stream(spark: SparkSession, input_path: str, out_dir: str) -> int:
    """Streaming exact dedup over a continuously-ingested documents table:
    each micro-batch keeps one row per content fingerprint (min doc_id —
    deterministic, unlike dropDuplicates' arbitrary pick) and drops rows
    whose fingerprint was already emitted by ANY earlier batch or run, via
    a left-anti join against the materialized fingerprint ledger.

    The documents table has no event time, so watermark-bounded
    dropDuplicates state doesn't apply; the ledger IS the state, and it
    survives restarts for free because it's the output. The ledger is
    partitioned by fingerprint prefix (see ledger_scan), so each batch
    anti-joins only the ledger partitions whose prefixes the batch
    actually contains — at 100 TB the per-batch ledger scan is pruned at
    plan time instead of re-reading the full history. Returns the number
    of micro-batches executed.
    """
    from pyspark.sql.window import Window

    stream = spark.readStream.schema(DOCS_TABLE_SCHEMA).parquet(input_path)
    data_dir = os.path.join(out_dir, "data")
    ledger_dir = os.path.join(out_dir, "ledger")
    n_batches = {"n": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("fp").orderBy("doc_id")
        fresh = (
            batch_df.withColumn("fp", F.md5("text"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
            # 'x' guard keeps the partition value non-numeric: an all-digit
            # hex prefix would otherwise be type-inferred as INT on read
            # and break the string prefix filter
            .withColumn("pfx", F.concat(F.lit("x"), F.substring("fp", 1, 1)))
        )
        if os.path.isdir(ledger_dir):
            # Bounded collect: at most 16 one-char prefix rows — the price
            # of pruning the ledger read to the batch's prefixes.
            pfxs = [r["pfx"] for r in fresh.select("pfx").distinct().collect()]
            # No broadcast hint: the ledger grows without bound — AQE
            # broadcasts it while small and shuffle-joins once it isn't.
            # EXCLUDE this batch's own partition: a foreachBatch retry
            # that crashed after the ledger write but before the WAL
            # commit would otherwise anti-join the batch against its own
            # fingerprints and overwrite data/batch=N with nothing.
            seen = ledger_scan(spark, ledger_dir, exclude_batch=batch_id, prefixes=pfxs)
            fresh = fresh.join(seen.select("fp"), "fp", "left_anti")
        # Materialize once: the ledger write must list exactly the rows
        # the data write emitted (two actions on one lineage could pick
        # different rows under speculative re-execution). Per-batch
        # OVERWRITE directories make a foreachBatch retry idempotent
        # (append mode would double-emit the batch).
        fresh.persist()
        try:
            fresh.drop("fp", "pfx").write.mode("overwrite").parquet(
                os.path.join(data_dir, f"batch={batch_id}")
            )
            fresh.select("fp", "pfx").write.partitionBy("pfx").mode(
                "overwrite"
            ).parquet(os.path.join(ledger_dir, f"batch={batch_id}"))
        finally:
            fresh.unpersist()
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(out_dir, "_dedup_checkpoint"))
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


# ---------------------------------------------------------------------------
# Custom stateful streaming operator: gap sessionization with cross-batch
# state (the W4 gap-session semantics as a continuous operator)
# ---------------------------------------------------------------------------
EVENT_SCHEMA = "event_id long, ts timestamp_ntz, user_id long"

_SESSION_OUT = (
    "user_id long, session_start double, session_end double, n_events long"
)
_SESSION_STATE = "start_ts double, last_ts double, n long"


def sessionize_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    gap_sec: float = 1800.0,
) -> None:
    """Stateful streaming sessionizer (applyInPandasWithState): emits a
    session row whenever a per-user gap > gap_sec closes one. State (open
    session) persists in the state store across availableNow runs, so a
    session spanning two ingestion waves closes correctly in the later run.
    Timestamps are emitted as epoch seconds (double) for a stable schema.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(input_path)

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple] = []
        ts_all: list[float] = []
        for pdf in pdfs:
            ts_all.extend(t.timestamp() for t in pdf["ts"])
        for t in sorted(ts_all):
            if last is None:
                start = last = t
                n = 1
            elif t - last > gap_sec:
                closed.append((user_id, start, last, n))
                start = last = t
                n = 1
            else:
                last = t
                n += 1
        if last is not None:
            state.update((float(start), float(last), int(n)))
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "n_events"]
            )

    q = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            fn, _SESSION_OUT, _SESSION_STATE, "append", GroupStateTimeout.NoTimeout
        )
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "sessions"))
        .option("checkpointLocation", os.path.join(out_dir, "_session_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
