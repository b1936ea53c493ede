"""fx-13 skew probe, performance clause: with the shipped split sizing, a
mega-doc-laced corpus must not leave a dominating straggler task — max
task duration bounded relative to the median (event-log verified).

Uses its own Spark session (event logging must be set at session start).
"""

from __future__ import annotations

import collections
import glob
import io
import json


def _task_durations(event_dir: str, app_id: str) -> dict[int, list[float]]:
    try:
        import zstandard as zstd

        dctx = zstd.ZstdDecompressor()

        def opener(p):
            return io.TextIOWrapper(dctx.stream_reader(open(p, "rb")))
    except ImportError:  # pragma: no cover
        import subprocess

        def opener(p):
            return io.StringIO(
                subprocess.run(["zstd", "-dc", p], capture_output=True, text=True).stdout
            )

    files = glob.glob(f"{event_dir}/eventlog_v2_{app_id}/events_*")
    by_stage: dict[int, list[float]] = collections.defaultdict(list)
    for f in files:
        for line in opener(f):
            e = json.loads(line)
            if e["Event"] == "SparkListenerTaskEnd":
                ti = e["Task Info"]
                by_stage[e["Stage ID"]].append(
                    (ti["Finish Time"] - ti["Launch Time"]) / 1000.0
                )
    return by_stage


def test_mega_corpus_task_balance(tmp_path):
    from pdfredact_spark.fixtures import SSN_RULE, corpus
    from pdfredact_spark.pipeline import docs_to_df, redact
    from pdfredact_spark.session import get_spark

    event_dir = str(tmp_path / "events")
    import os

    os.makedirs(event_dir, exist_ok=True)
    spark = get_spark(
        master="local[8]",
        app_name="skew-probe",
        shuffle_partitions=16,
        extra={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{event_dir}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    try:
        # 4000 docs, one 20k-span mega every 500 -> 8 megas (~30% of spans),
        # written with enough files that splits carry ~equal work
        in_path = str(tmp_path / "corpus")
        docs_to_df(spark, corpus(4000, mega_every=500)).repartition(64).write.parquet(in_path)
        df = spark.read.parquet(in_path)
        out, _ = redact(df, [SSN_RULE])
        out.write.mode("overwrite").parquet(str(tmp_path / "out"))
    finally:
        spark.stop()

    by_stage = _task_durations(event_dir, app_id)
    # the redaction stage = the one with the most tasks
    stage_id, durs = max(by_stage.items(), key=lambda kv: len(kv[1]))
    durs.sort()
    median = durs[len(durs) // 2]
    worst = durs[-1]
    # generous bound (clause says 4x; allow scheduling noise on tiny tasks)
    assert worst <= max(4 * median, median + 2.0), (
        f"straggler: max {worst:.2f}s vs median {median:.2f}s over {len(durs)} tasks"
    )
