"""Streaming-side scale soak (round 7): the redaction path has 10M-doc
soak evidence (tools/soak_redact.py) and the graded queries a 10x soak
(tools/soak_queries.py); the streaming operators' evidence stopped at
correctness-scale fixtures. This tool drives BOTH streaming operators at
~10x sf0.1 volume on local[32] and asserts the claims that matter at
scale:

1. sessionize_stream with EVENT-TIME EVICTION (timeout_sec): 1M events /
   100k users in 5 availableNow waves, each user active in exactly one
   wave, two gap-separated sessions per user by construction. Asserts
   (a) BOUNDED STATE — the state store never holds more than ~2 waves'
   users even though 5 waves' worth have been seen (eviction lags at
   most one drain: a timed-out key fires in the first micro-batch whose
   START watermark has passed it, and a wave's closing watermark commit
   is read by the NEXT drain); (b) EXACT CONSERVATION — emitted sessions
   + open state == 2 x n_users, every session accounted for, none
   double-emitted (eviction emits are final, the count is deterministic);
   (c) per-wave drain throughput (events/s), ratio-bounded across waves
   (state lookups must not degrade as cumulative users grow).

2. dedup_stream with compaction under the writer lease: 150k docs in 3
   waves (20% of each later wave duplicates wave-0 texts), compact_every=1.
   Asserts the exact distinct-text count survives the waves and reports
   per-wave docs/s plus the compaction metrics (rows read per drain).

Both apps run with event logging; every stage that did >= 5s of total
task work must satisfy the repo's straggler bound
max <= max(4*median, median+4s) — the same bar as the other soaks.

Usage:
  python tools/soak_stream.py [events_mult] [docs_mult] [cores]
  # defaults 10 30 32 -> 1_000_000 events / 100_000 users,
  #                      150_000 docs in 3 waves

Prints ONE JSON line with all measurements.
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

BASE_EVENTS = 100_000  # sf0.1 events rows
BASE_DOCS = 5_000      # sf0.1 documents rows

SESSION_WAVES = 5
EVENTS_PER_USER = 10   # 2 sessions of 5 (960s gap between event 4 and 5)
GAP_SEC = 300.0
TIMEOUT_SEC = 600.0
WAVE_SPACING_SEC = 7_200  # waves 2h apart: watermark leaps past last+timeout

DOC_WAVES = 3


def _gen_session_wave(spark, in_dir: str, wave: int, users_per_wave: int) -> None:
    """Wave `wave` of the session corpus: users [wave*U, (wave+1)*U), each
    with EVENTS_PER_USER events — events 0-4 10s apart, then a 960s gap,
    then events 5-9 10s apart => exactly 2 sessions per user at
    GAP_SEC=300. Pure Spark expressions (JVM-side, deterministic)."""
    from pyspark.sql import functions as F

    u, e = users_per_wave, EVENTS_PER_USER
    lo = wave * u * e
    (
        spark.range(lo, lo + u * e)
        .select(
            F.col("id").alias("event_id"),
            F.expr(
                f"timestampadd(SECOND, cast("
                f"  {wave * WAVE_SPACING_SEC}"
                f"  + (((id - {lo}) div {e}) % 1000)"      # stagger users
                f"  + ((id - {lo}) % {e}) * 10"            # 10s strides
                f"  + case when (id - {lo}) % {e} >= 5 then 950 else 0 end"
                f" as int), TIMESTAMP_NTZ'2024-01-01 00:00:00')"
            ).alias("ts"),
            (wave * u + (F.col("id") - lo) / e).cast("long").alias("user_id"),
        )
        .repartition(16)
        .write.mode("append")
        .parquet(in_dir)
    )


def _gen_doc_wave(spark, in_dir: str, wave: int, docs_per_wave: int) -> None:
    """Wave `wave` of the dedup corpus: the dup slice (i%5==0, i.e.
    ceil(D/5) of D rows) carries wave-0's text for the same i
    (cross-wave exact dups); the rest are unique. Distinct texts over W
    waves = W*(D - ceil(D/5)) + ceil(D/5) — ceil, not floor: floor
    undercounts by one whenever D%5 != 0 (round-7 review)."""
    from pyspark.sql import functions as F

    d = docs_per_wave
    lo = wave * d
    src_wave = F.when((F.col("id") - lo) % 5 == 0, F.lit("0")).otherwise(
        F.lit(str(wave))
    )
    text = F.concat(
        F.lit("doc "), src_wave, F.lit(" "),
        (F.col("id") - lo).cast("string"), F.lit(" payload body"),
    )
    (
        spark.range(lo, lo + d)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.lit("en").alias("lang"),
            F.lit("soak").alias("source"),
            F.length(text).cast("long").alias("n_chars"),
        )
        .repartition(16)
        .write.mode("append")
        .parquet(in_dir)
    )


def _stage_straggler_check(event_dir: str, app_id: str,
                           min_stage_sec: float = 5.0) -> list[dict]:
    """Every stage with >= min_stage_sec of total task time must satisfy
    the standing soak bound (tools/evidence.py). Returns the graded
    stages' stats (asserts inline)."""
    ev = collect_task_events(event_dir, app_id)
    graded = []
    for sid, durs in sorted(ev["by_stage"].items()):
        if sum(durs) < min_stage_sec:
            continue
        st = stage_stats(sid, durs)
        assert_no_straggler(st)
        graded.append(st)
    return graded


def main() -> None:
    events_mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    docs_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from bench import _warm_python_workers
    from pdfredact_spark.session import get_spark
    from pdfredact_spark.streaming import dedup_stream, open_sessions, \
        sessionize_stream

    n_events = BASE_EVENTS * events_mult
    n_users = n_events // EVENTS_PER_USER
    users_per_wave = n_users // SESSION_WAVES
    n_docs = BASE_DOCS * docs_mult
    docs_per_wave = n_docs // DOC_WAVES

    workdir = tempfile.mkdtemp(prefix="pdfredact-streamsoak-")
    event_dir = os.path.join(workdir, "eventlog")
    os.makedirs(event_dir)
    result: dict = {"n_events": n_events, "n_users": n_users,
                    "n_docs": n_docs, "cores": cores}
    try:
        spark = get_spark(
            master=f"local[{cores}]", app_name="stream-soak",
            extra={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file://{event_dir}",
                "spark.eventLog.compress": "false",
                "spark.eventLog.rolling.enabled": "false",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        app_id = spark.sparkContext.applicationId
        _warm_python_workers(spark)

        # ---- sessionizer: 5 waves, eviction on ---------------------------
        sess_in = os.path.join(workdir, "events")
        sess_out = os.path.join(workdir, "sessions")
        waves = []
        max_open = 0
        for w in range(SESSION_WAVES):
            _gen_session_wave(spark, sess_in, w, users_per_wave)
            t0 = time.perf_counter()
            sessionize_stream(spark, sess_in, sess_out,
                              gap_sec=GAP_SEC, timeout_sec=TIMEOUT_SEC)
            sec = time.perf_counter() - t0
            n_open = open_sessions(spark, sess_out).count()
            max_open = max(max_open, n_open)
            waves.append({
                "wave": w,
                "drain_sec": round(sec, 2),
                "events_per_sec": round(users_per_wave * EVENTS_PER_USER / sec),
                "open_state_rows": n_open,
            })
        emitted = spark.read.parquet(os.path.join(sess_out, "sessions")).count()
        final_open = waves[-1]["open_state_rows"]
        result["sessionizer"] = {
            "waves": waves,
            "emitted_sessions": emitted,
            "final_open_state_rows": final_open,
            "max_open_state_rows": max_open,
            "expected_total_sessions": 2 * n_users,
        }
        # (a) bounded state: eviction lags at most one drain, so the store
        # never holds more than ~2 waves of users — 5 waves' worth (all of
        # n_users) would mean eviction is NOT working.
        assert max_open <= 2 * users_per_wave, (max_open, users_per_wave)
        # (b) exact conservation: every constructed session is either
        # emitted (closed by gap, or evicted-as-final) or still open.
        assert emitted + final_open == 2 * n_users, (emitted, final_open)
        # (c) per-wave throughput must not degrade as cumulative users
        # grow (state store lookups stay O(active), not O(ever-seen)).
        secs = [w["drain_sec"] for w in waves[1:]]  # wave 0 pays JVM warmup
        assert max(secs) <= 3 * min(secs), waves

        # ---- dedup stream: 3 waves, compaction + writer lease ------------
        dd_in = os.path.join(workdir, "docs")
        dd_out = os.path.join(workdir, "dedup")
        dd_waves = []
        for w in range(DOC_WAVES):
            _gen_doc_wave(spark, dd_in, w, docs_per_wave)
            m: list = []
            t0 = time.perf_counter()
            dedup_stream(spark, dd_in, dd_out, compact_every=1, metrics=m,
                         lease_ttl_sec=600.0)
            sec = time.perf_counter() - t0
            dd_waves.append({
                "wave": w,
                "drain_sec": round(sec, 2),
                "docs_per_sec": round(docs_per_wave / sec),
                "ledger_rows_read": sum(
                    b.get("compacted_rows_read", 0) for b in m),
            })
        # distinct texts: the dup slice is j % 5 == 0 for j in [0, d) —
        # ceil(d/5) slots shared across ALL waves; every other j is
        # unique per wave. floor arithmetic (4d/5 + d/5) undercounts by
        # one whenever d % 5 != 0 (round-7 review) — a correct
        # dedup_stream then failed the soak spuriously at such sizes.
        dup_slots = (docs_per_wave + 4) // 5
        expected_distinct = (
            DOC_WAVES * (docs_per_wave - dup_slots) + dup_slots
        )
        got = spark.read.parquet(os.path.join(dd_out, "data")).count()
        result["dedup_stream"] = {
            "waves": dd_waves,
            "distinct_docs": got,
            "expected_distinct": expected_distinct,
        }
        assert got == expected_distinct, (got, expected_distinct)
        # later waves read a ledger that keeps growing; wall time must not
        # blow up with it (the read is one columnar scan per drain)
        dd_secs = [w["drain_sec"] for w in dd_waves]
        assert max(dd_secs) <= 3 * min(dd_secs), dd_waves

        spark.stop()
        result["straggler_stages"] = _stage_straggler_check(event_dir, app_id)
        print(json.dumps(result))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
