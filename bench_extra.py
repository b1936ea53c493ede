"""Per-query isolation harness (guide §1.4/§1.5) — NOT the graded bench.

bench.py is frozen for measurement; this file exists for optimization
work: it times each declared query against a noop sink in its own labeled
job, optionally repeats, and can dump `.explain("formatted")` plans to
plans/r08/. It never writes results anywhere.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py [query ...]
  PLANS_DIR=plans/r08 SUFFIX=_before python bench_extra.py simhash_fingerprint
  REPEAT=3 python bench_extra.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES, _warm_python_workers


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("REPEAT", "1"))
    plans_dir = os.environ.get("PLANS_DIR")
    suffix = os.environ.get("SUFFIX", "")
    names = sys.argv[1:] or BENCH_QUERIES

    from pdfredact_spark.queries import SQL_QUERIES
    from pdfredact_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        _warm_python_workers(spark)
        for name in names:
            fn = SQL_QUERIES[name]
            times = []
            for _ in range(repeat):
                spark.sparkContext.setJobDescription(f"bench_extra: {name}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            if plans_dir:
                os.makedirs(plans_dir, exist_ok=True)
                df = fn(spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as fh:
                    fh.write(plan)
            print(f"{name:32s} {times}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
