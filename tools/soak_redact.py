"""Redaction soak at configurable scale (round-5 verdict, next #5: one
notch larger than the 1M-doc soak — default 10M docs at local[32]).

Generates the deterministic bench corpus (mega-doc-laced, same shape as
bench.py), runs ONE read -> redact -> write job with Spark event logging
on, and prints a single JSON line with throughput plus event-log
evidence: per-task duration balance for the dominant stage (straggler
bound) and the JVM GC fraction (the memory-pressure signal a 10x corpus
is meant to stress).

Usage:
  python tools/soak_redact.py [n_docs] [cores]   # defaults 10_000_000, 32

Scratch lives under /tmp and is deleted on exit. ~10 min at defaults.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

# shared event-log extraction + the standing straggler bound (round-7
# review: three diverging copies of the bound is how bars silently drift)
from evidence import assert_no_straggler, collect_task_events, stage_stats


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from bench import corpus_to_parquet, run_redaction
    from pdfredact_spark.session import get_spark

    workdir = tempfile.mkdtemp(prefix="pdfredact-soak-")
    event_dir = os.path.join(workdir, "events")
    os.makedirs(event_dir)
    corpus_path = os.path.join(workdir, "corpus")
    out_path = os.path.join(workdir, "out")
    try:
        # -- generation session (no event log: gen isn't the SUT) -------
        gen = get_spark(master=f"local[{cores}]", app_name="soak-gen")
        gen.sparkContext.setLogLevel("ERROR")
        t0 = time.perf_counter()
        corpus_to_parquet(gen, n_docs, corpus_path)
        gen_sec = time.perf_counter() - t0
        gen.stop()

        # -- measured job: bench.run_redaction, the ONE definition of
        # the measured pipeline (round-6 review #2.5: a split-sizing or
        # committer change must hit bench and soak alike), plus
        # event-log conf for the straggler/GC evidence
        info: dict = {}
        redact_sec, n_out = run_redaction(
            f"local[{cores}]", corpus_path, out_path, shuffle=2 * cores,
            extra={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file://{event_dir}",
                "spark.eventLog.compress": "false",
                "spark.eventLog.rolling.enabled": "false",
            },
            info=info,
        )
        app_id = info["app_id"]
        assert n_out == n_docs, (n_out, n_docs)

        # -- event-log evidence (shared helpers: tools/evidence.py) ------
        ev = collect_task_events(event_dir, app_id)
        gc_ms, run_ms = ev["gc_ms"], ev["run_ms"]
        # dominant stage by TOTAL task time (the Python redact stage) —
        # by task count would pick a many-task trivial stage like the
        # output count
        stage_id, durs = max(ev["by_stage"].items(), key=lambda kv: sum(kv[1]))
        straggler = stage_stats(stage_id, durs)
        result = {
            "n_docs": n_docs,
            "cores": cores,
            "gen_sec": round(gen_sec, 1),
            "redact_sec": round(redact_sec, 1),
            "docs_per_sec": round(n_docs / redact_sec, 1),
            "straggler": straggler,
            "gc_frac_of_run": round(gc_ms / max(run_ms, 1), 4),
        }
        # the soak's pass criteria, asserted here so a regression fails
        # loudly instead of needing a human to eyeball the journal
        assert_no_straggler(straggler)
        assert result["gc_frac_of_run"] < 0.15, result
        print(json.dumps(result))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
