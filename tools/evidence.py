"""Shared event-log evidence helpers for the soak tools.

The repo's standing soak bound — every graded stage must satisfy
``max <= max(4 * median, median + 4s)`` — and the SparkListenerTaskEnd
duration extraction behind it were implemented three times with slight
variations (tools/soak_redact.py, tools/soak_stream.py,
tools/soak_queries.py; round-7 review). A future change to the bound
(precedent: the round-6 0.95-vs-0.97 probe trust bar fix) must land in
ONE place or the soaks silently grade against different bars. The
aggregation CHOICE stays with each tool (dominant stage for the
redaction soak, every >=5s stage for the stream soak, per-job-group
dominant stage for the query soak); the extraction, the stats shape,
and the bound live here.
"""

from __future__ import annotations

import collections
import glob
import json


def collect_task_events(event_dir: str, app_id: str) -> dict:
    """One pass over the app's event-log files. Returns
    ``{"by_stage": {stage_id: [task_sec, ...]},
       "stage_group": {stage_id: job_group_or_None},
       "gc_ms": int, "run_ms": int}``.
    Durations are wall seconds (Finish - Launch); gc/run are the summed
    JVM GC / executor run Task Metrics (for GC-fraction criteria)."""
    by_stage: dict[int, list[float]] = collections.defaultdict(list)
    stage_group: dict[int, str] = {}
    gc_ms = 0
    run_ms = 0
    for f in glob.glob(f"{event_dir}/{app_id}*"):
        for line in open(f):
            e = json.loads(line)
            if e["Event"] == "SparkListenerJobStart":
                grp = (e.get("Properties") or {}).get("spark.jobGroup.id")
                if grp:
                    for sid in e.get("Stage IDs", []):
                        stage_group[sid] = grp
            elif e["Event"] == "SparkListenerTaskEnd":
                ti = e["Task Info"]
                by_stage[e["Stage ID"]].append(
                    (ti["Finish Time"] - ti["Launch Time"]) / 1000.0
                )
                tm = e.get("Task Metrics") or {}
                gc_ms += tm.get("JVM GC Time", 0)
                run_ms += tm.get("Executor Run Time", 0)
    return {
        "by_stage": dict(by_stage),
        "stage_group": stage_group,
        "gc_ms": gc_ms,
        "run_ms": run_ms,
    }


def stage_stats(stage_id: int, durs: list[float]) -> dict:
    """The soak artifacts' per-stage stats shape."""
    durs = sorted(durs)
    return {
        "stage": stage_id,
        "n_tasks": len(durs),
        "median": round(durs[len(durs) // 2], 3),
        "p99": round(durs[int(len(durs) * 0.99)], 3),
        "max": round(durs[-1], 3),
    }


def assert_no_straggler(stats: dict, context: object = None) -> None:
    """The standing soak bound: max <= max(4 * median, median + 4s).
    The +4s floor keeps tiny-median stages (sub-second tasks) from
    failing on scheduler jitter; the 4x ratio is the real balance bar."""
    assert stats["max"] <= max(4 * stats["median"], stats["median"] + 4.0), (
        stats if context is None else (context, stats)
    )
