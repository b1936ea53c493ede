"""Incremental ingestion: two arrival waves, two availableNow runs — the
second run must process ONLY the new files, and the accumulated output
must equal a one-shot batch redaction of everything.
"""

from __future__ import annotations

from pdfredact_spark.fixtures import SSN_RULE, corpus
from pdfredact_spark.pipeline import docs_to_df, redact
from pdfredact_spark.streaming import run_incremental


def _invariant(df):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r in df.collect()
    }


def test_incremental_two_waves(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    docs = corpus(30)

    # wave 1: first 20 docs
    docs_to_df(spark, docs[:20]).coalesce(2).write.mode("append").parquet(in_dir)
    n1 = run_incremental(spark, in_dir, out_dir, [SSN_RULE])
    assert n1 >= 1
    got1 = spark.read.parquet(out_dir + "/data")
    assert got1.count() == 20

    # wave 2: 10 more docs arrive
    docs_to_df(spark, docs[20:]).coalesce(1).write.mode("append").parquet(in_dir)
    n2 = run_incremental(spark, in_dir, out_dir, [SSN_RULE])
    assert n2 >= 1
    got2 = spark.read.parquet(out_dir + "/data")
    assert got2.count() == 30

    # no reprocessing: a third run with nothing new executes zero batches
    n3 = run_incremental(spark, in_dir, out_dir, [SSN_RULE])
    assert n3 == 0
    assert spark.read.parquet(out_dir + "/data").count() == 30

    # accumulated streaming output == one-shot batch output
    batch_out, _ = redact(docs_to_df(spark, docs), [SSN_RULE])
    assert _invariant(got2.select("doc_id", "spans")) == _invariant(batch_out)
