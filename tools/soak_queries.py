"""Query-side scale soak (round-7 verdict, next #3): the redaction path
has 10M-doc soak evidence (tools/soak_redact.py); the graded queries
stopped at sf0.1. This tool soaks the heaviest graded shapes at ~10x
sf0.1 — 50k documents / 1M events by default — at local[32], with the
same event-log straggler/balance assertions as the redaction soak, and
reports per-query scaling vs a 1x twin corpus from the SAME generator
(same distribution, 1/Nth the rows — sf0.1's own corpus differs
structurally enough that a cross-corpus ratio measures shape, not
scale).

The overlay corpus is synthesized deterministically (id-seeded, no
wall-clock) with the STRUCTURE the dedup shapes need at scale:

* hot/cold token split — ~80% of tokens from a 30-word hot vocabulary
  (shingles over them exceed the df cap and are pruned, exactly like
  web boilerplate), ~20% id-derived rare tokens (survive the cap, carry
  the near-dup signal);
* exact duplicates (1% of docs copy an earlier doc), near duplicates
  (1% copy with 3 token edits), a shared 60-char passage in 2% of docs
  (duplicate_passages clusters), and a held-out sentinel phrase planted
  in doc_id<20 plus 1% of the rest (decontaminate overlap);
* events: 10x rows, 10x users, same 30-day window, pure Spark
  expressions (JVM-side generation; no Python in the generator path).

Other tables (orders for interval_overlap_join) are symlinked from the
base sf dir — events is the scaling side of that join.

The near-dup queries are graded over a bounded doc slice (oracle twins
assume it); here the slice is OPENED to the full corpus via their
max_doc_id parameter, at BOTH scales, so the ratio compares the same
open shape at 1x vs 10x.

Usage:
  python tools/soak_queries.py [docs_mult] [events_mult] [cores]
  # defaults 10 10 32 -> 50_000 docs, 1_000_000 events

Prints ONE JSON line; asserts (a) per-query dominant-stage straggler
bound max <= max(4*median, median+4s), (b) 10x input never costs more
than RATIO_CAP x the 1x time (scale-killer tripwire).
"""

from __future__ import annotations

import glob
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

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASE_DOCS = 5_000      # sf0.1 documents rows
BASE_EVENTS = 100_000  # sf0.1 events rows
# 10x input may cost at most this multiple of the 1x time. Linear scaling
# would be ~10x, and per-job fixed overhead at 1x biases the ratio UP
# (sub-second 1x denominators), so the cap is a tripwire for quadratic
# blowup (a 10x input at O(n^2) costs ~100x), not a linearity precision
# bound.
RATIO_CAP = 30.0

HOT_VOCAB = (
    "spark batch line column order small sort fast value scan hash slow "
    "group table query agg stream filter big merge join part vector key "
    "window customer the a of and"
).split()
SHARED_PASSAGE = "shared boilerplate passage common to many documents here"
SENTINEL_PHRASE = "held out benchmark sentence planted for decontamination"


def _doc_text(c: int) -> str:
    """Deterministic text for CONTENT id c: hot/cold token mix plus the
    structural extras keyed off c. Pure function of c (numpy RNG seeded
    by c) so exact dups are bitwise equal by construction."""
    import numpy as np

    rng = np.random.default_rng(1_000_003 + c)
    n_tok = int(rng.integers(40, 90))
    toks = []
    for _ in range(n_tok):
        if rng.random() < 0.8:
            toks.append(HOT_VOCAB[int(rng.integers(0, len(HOT_VOCAB)))])
        else:
            toks.append(f"t{int(rng.integers(0, 10_000_000)):07d}")
    if c % 50 == 21:
        toks.append(SHARED_PASSAGE)
    if c < 20 or c % 100 == 31:
        toks.append(SENTINEL_PHRASE)
    return " ".join(toks)


def _overlay_doc(i: int) -> tuple:
    """Row i of the overlay documents table: exact dup (i%100==7 copies
    i-7), near dup (i%100==13 perturbs i-13 by 3 tokens), else fresh."""
    import numpy as np

    if i % 100 == 7 and i >= 7:
        text = _doc_text(i - 7)
    elif i % 100 == 13 and i >= 13:
        words = _doc_text(i - 13).split()
        rng = np.random.default_rng(2_000_003 + i)
        for _ in range(3):
            words[int(rng.integers(0, len(words)))] = (
                f"e{int(rng.integers(0, 10_000_000)):07d}"
            )
        text = " ".join(words)
    else:
        text = _doc_text(i)
    rng = np.random.default_rng(3_000_003 + i)
    lang = ("en", "en", "zh", "es", "fr", "de")[int(rng.integers(0, 6))]
    source = f"src{int(rng.integers(0, 20))}"
    return (i, text, lang, source, len(text))


def generate_overlay(spark, overlay_dir: str, n_docs: int, n_events: int) -> None:
    import pandas as pd

    from pyspark.sql import functions as F

    os.makedirs(overlay_dir, exist_ok=True)
    # other tables: symlinks to the base sf dir (read-only reuse)
    for f in sorted(glob.glob(os.path.join(BASE_SF_DIR, "*.parquet"))):
        name = os.path.basename(f)
        if name not in ("documents.parquet", "events.parquet"):
            os.symlink(f, os.path.join(overlay_dir, name))

    def gen_docs(batches):
        for pdf in batches:
            rows = [_overlay_doc(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in rows],
                    "text": [r[1] for r in rows],
                    "lang": [r[2] for r in rows],
                    "source": [r[3] for r in rows],
                    "n_chars": [r[4] for r in rows],
                }
            )

    (
        spark.range(n_docs)
        .repartition(max(32, n_docs // 4000))
        .mapInPandas(
            gen_docs,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(overlay_dir, "documents.parquet"))
    )

    n_users = max(1, n_events // 67)  # same user:event ratio as sf0.1
    (
        spark.range(n_events)
        .select(
            F.col("id").alias("event_id"),
            F.expr(
                "timestampadd(SECOND, cast((id * 2641) % 2592000 as int), "
                "TIMESTAMP_NTZ'2024-01-01 00:00:00')"
            ).alias("ts"),
            (F.col("id") % n_users).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in
                          ("click", "view", "purchase", "scroll", "share")]),
                (F.col("id") % 5 + 1).cast("int"),
            ).alias("event_type"),
            ((F.col("id") % 1000) / 10.0).alias("value"),
            F.concat(F.lit('{"k":'), (F.col("id") % 7).cast("string"),
                     F.lit("}")).alias("props"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(os.path.join(overlay_dir, "events.parquet"))
    )


def soak_callables():
    from pdfredact_spark.queries import (
        q_decontaminate_ngram_overlap,
        q_dedup_clusters,
        q_dedup_minhash_lsh,
        q_dedup_ngram_jaccard,
        q_duplicate_passages,
        q_interval_overlap_join,
    )

    open_slice = 10**9  # max_doc_id wide open: soak the full corpus
    return {
        "dedup_ngram_jaccard": lambda s, d: q_dedup_ngram_jaccard(s, d, open_slice),
        "dedup_minhash_lsh": lambda s, d: q_dedup_minhash_lsh(s, d, open_slice),
        "dedup_clusters": lambda s, d: q_dedup_clusters(s, d, open_slice),
        "interval_overlap_join": q_interval_overlap_join,
        "duplicate_passages": q_duplicate_passages,
        "decontaminate_ngram_overlap": q_decontaminate_ngram_overlap,
    }


def run_pass(spark, sf_dir: str, cc_workdir: str,
             use_job_groups: bool) -> dict[str, dict]:
    """Run every soak query against sf_dir; returns per-query seconds and
    output row counts. With use_job_groups, each query's jobs are tagged
    so the event log can attribute tasks per query."""
    os.environ["PDFREDACT_CC_WORKDIR"] = cc_workdir
    out: dict[str, dict] = {}
    for name, fn in soak_callables().items():
        if use_job_groups:
            spark.sparkContext.setJobGroup(name, name, False)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        # Sanity recount AFTER re-tagging the job group (round-7 review:
        # counting inside the query's group attributed the recount's
        # stages to the graded query, so the dominant-stage straggler
        # stats could describe the recount execution, not the timed
        # run). The recount re-executes the plan — accepted cost for
        # row-count evidence; it is excluded from sec and from grading.
        if use_job_groups:
            spark.sparkContext.setJobGroup("untimed", "untimed", False)
        rows = df.count()
        out[name] = {"sec": round(sec, 3), "rows": rows}
    return out


def parse_event_log(event_dir: str, app_id: str) -> dict[str, dict]:
    """Per-job-group dominant-stage task-duration stats from the event
    log (same evidence shape as tools/soak_redact.py, but attributed
    per query via spark.jobGroup.id)."""
    ev = collect_task_events(event_dir, app_id)
    per_group: dict[str, dict] = {}
    for sid, durs in ev["by_stage"].items():
        grp = ev["stage_group"].get(sid)
        if grp in (None, "untimed"):
            continue
        cur = per_group.get(grp)
        if cur is None or sum(durs) > cur["_total"]:
            per_group[grp] = {"_total": sum(durs), **stage_stats(sid, durs)}
    for v in per_group.values():
        v.pop("_total")
    return per_group


def main() -> None:
    docs_mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    events_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from bench import _warm_python_workers
    from pdfredact_spark.session import get_spark

    n_docs = BASE_DOCS * docs_mult
    n_events = BASE_EVENTS * events_mult
    workdir = tempfile.mkdtemp(prefix="pdfredact-qsoak-")
    overlay = os.path.join(workdir, "overlay")
    overlay_1x = os.path.join(workdir, "overlay_1x")
    event_dir = os.path.join(workdir, "eventlog")
    os.makedirs(event_dir)
    try:
        gen = get_spark(master=f"local[{cores}]", app_name="qsoak-gen")
        gen.sparkContext.setLogLevel("ERROR")
        t0 = time.perf_counter()
        generate_overlay(gen, overlay, n_docs, n_events)
        # 1x twin from the SAME generator: the scaling ratio must compare
        # the same data distribution at 1x vs Nx. (The first cut ran the
        # baseline against the sf0.1 testdata corpus instead — its doc
        # structure differs enough from the overlay's hot/cold mix that
        # a 2x soak came out FASTER than its "baseline"; that ratio
        # measured corpus shape, not scaling.)
        generate_overlay(gen, overlay_1x, BASE_DOCS, BASE_EVENTS)
        gen_sec = time.perf_counter() - t0
        gen.stop()

        # -- 1x baseline: same open-slice shapes, same generator ----------
        base = get_spark(master=f"local[{cores}]", app_name="qsoak-base")
        base.sparkContext.setLogLevel("ERROR")
        _warm_python_workers(base)
        base_res = run_pass(base, overlay_1x,
                            os.path.join(workdir, "cc_base"),
                            use_job_groups=False)
        base.stop()

        # -- 10x soak with event logging ---------------------------------
        soak = get_spark(
            master=f"local[{cores}]", app_name="qsoak-10x",
            extra={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file://{event_dir}",
                "spark.eventLog.compress": "false",
                "spark.eventLog.rolling.enabled": "false",
            },
        )
        soak.sparkContext.setLogLevel("ERROR")
        app_id = soak.sparkContext.applicationId
        _warm_python_workers(soak)
        soak_res = run_pass(soak, overlay,
                            os.path.join(workdir, "cc_soak"),
                            use_job_groups=True)
        soak.stop()

        stragglers = parse_event_log(event_dir, app_id)
        queries = {}
        for name in soak_res:
            b, s = base_res[name], soak_res[name]
            st = stragglers.get(name)
            queries[name] = {
                "base_sec": b["sec"],
                "soak_sec": s["sec"],
                "ratio": round(s["sec"] / max(b["sec"], 1.0), 2),
                "base_rows": b["rows"],
                "soak_rows": s["rows"],
                "straggler": st,
            }
        result = {
            "n_docs": n_docs,
            "n_events": n_events,
            "cores": cores,
            "gen_sec": round(gen_sec, 1),
            "base_total_sec": round(sum(v["sec"] for v in base_res.values()), 1),
            "soak_total_sec": round(sum(v["sec"] for v in soak_res.values()), 1),
            "queries": queries,
        }
        # pass criteria, asserted so a regression fails loudly
        for name, q in queries.items():
            st = q["straggler"]
            assert st is not None, f"{name}: no tasks attributed in event log"
            assert_no_straggler(st, context=name)
            assert q["ratio"] <= RATIO_CAP, (name, q)
            assert q["soak_rows"] > 0, (name, "empty soak output")
        print(json.dumps(result))
    finally:
        os.environ.pop("PDFREDACT_CC_WORKDIR", None)
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
