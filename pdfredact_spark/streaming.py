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
        # foreachBatch may retry a batch: persist once, write both views;
        # append-mode parquet + the streaming WAL keep file accounting
        # exactly-once at the batch level.
        full.persist()
        try:
            (
                full.where(F.col("error").isNull())
                .select("doc_id", "spans", "n_rule_hits")
                .write.mode("append")
                .parquet(data_dir)
            )
            errs = full.where(F.col("error").isNotNull()).select("doc_id", "error")
            if errs.limit(1).count():
                errs.write.mode("append").parquet(err_dir)
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
