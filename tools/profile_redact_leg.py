"""Decompose the bench redaction leg (guide §1): same corpus/conf as
bench.run_redaction, but times three variants at local[2]:

  identity  — scan -> identity mapInArrow -> noop   (boundary floor)
  noop      — scan -> redact -> noop                (kernel, no write)
  parquet   — scan -> redact -> parquet             (the bench job)

Usage: python tools/profile_redact_leg.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import corpus_to_parquet, _warm_python_workers


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from pdfredact_spark.fixtures import SSN_RULE
    from pdfredact_spark.pipeline import REDACTED_SCHEMA, redact
    from pdfredact_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="redactleg-")
    corpus = os.path.join(tmp, "corpus")

    gen = get_spark(master="local[32]", app_name="gen")
    gen.sparkContext.setLogLevel("ERROR")
    corpus_to_parquet(gen, n_docs, corpus)
    gen.stop()

    spark = get_spark(
        master="local[2]",
        app_name="redact-leg",
        shuffle_partitions=4,
        extra={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "2m",
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    _warm_python_workers(spark)
    df = spark.read.parquet(corpus)

    def ident(batches):
        yield from batches

    def t(label, fn):
        t0 = time.perf_counter()
        fn()
        print(f"{label:10s} {time.perf_counter() - t0:.2f}s")

    t("scanonly", lambda: df.write.format("noop").mode("overwrite").save())
    t("identity", lambda: df.mapInArrow(ident, schema=df.schema)
      .write.format("noop").mode("overwrite").save())
    out, _ = redact(df, [SSN_RULE])
    t("noop", lambda: out.write.format("noop").mode("overwrite").save())
    out2, _ = redact(df, [SSN_RULE])
    t("parquet", lambda: out2.write.mode("overwrite")
      .parquet(os.path.join(tmp, "out")))
    spark.stop()


if __name__ == "__main__":
    main()
