"""Per-partition lineage + commit-log resumability (SURVEY.md §4.3/§4.4).

Spark batch jobs have no cross-job resume, so the pipeline processes the
input in deterministic PARTITION BUCKETS and commits a manifest per batch:

- every document is assigned ``bucket = pmod(xxhash64(doc_id), n_buckets)``
  — deterministic under retries and across runs;
- the job loops over bucket batches; each batch writes its output under
  ``<out>/data/batch=<k>/`` (overwrite-idempotent: a re-run of an
  uncommitted batch simply rewrites it) and lineage rows under
  ``<out>/metrics/batch=<k>/``;
- a batch is COMMITTED by atomically renaming a manifest into
  ``<out>/_commits/batch-<k>.json`` (os.rename is atomic on POSIX);
- on restart, committed batches are skipped (the left-anti filter is a
  driver-side bucket-set difference, so no Spark work is scheduled for
  committed data at all).

This is the Parquet+manifest stand-in for an Iceberg catalog: with Iceberg
jars on the cluster, swap the two ``write.parquet`` calls for
``writeTo(...).append()`` and the manifest for Iceberg's snapshot commit —
the orchestration is unchanged (the sandbox's PySpark ships no Iceberg
runtime, TESTDATA.md).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdfredact_spark.catalog import (
    LOCAL_LEDGER_STORAGE,
    LedgerStorage,
    acquire_lease_blocking,
    unique_owner,
    verify_lease_still_held,
)
from pdfredact_spark.model import Rule
from pdfredact_spark.pipeline import REDACTED_SCHEMA, redact_full


class KillSwitch(Exception):
    """Raised by tests to simulate a mid-run job kill."""


def _commit_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_commits")


def committed_batches(out_dir: str) -> set[int]:
    import re

    cdir = _commit_dir(out_dir)
    if not os.path.isdir(cdir):
        return set()
    out = set()
    for name in os.listdir(cdir):
        # exact-name match only (round-5 review): a stray foreign file
        # like "batch-0 (copy).json" must be ignored, not crash every
        # later resume with int()'s ValueError. A file that doesn't
        # match can't have been written by _commit, so skipping it never
        # skips a real batch.
        m = re.fullmatch(r"batch-(\d+)\.json", name)
        if m:
            out.add(int(m.group(1)))
    return out


def _config_fingerprint(rules: list[Rule], flatten: bool, n_buckets: int) -> str:
    """Deterministic digest of everything that changes a batch's OUTPUT:
    the full rule list (order matters — apply order is deterministic),
    the flatten toggle, and the bucket modulus. Stored in every manifest
    so resume can refuse to mix batches redacted under different
    configs (round-5 review: the n_buckets guard existed, the rules/
    flatten axis did not — a killed job resumed with a different rules
    file silently produced a mixed corpus). Rule.description is
    deliberately EXCLUDED (ADVICE r5): it never reaches the kernel, so
    a cosmetic description edit in the rules file must not hard-fail an
    otherwise-valid resume. NOTE this made the digest a v2: manifests
    written by pre-round-6 builds (description included) no longer
    match, so their resume fails closed with the drift error — rerun
    from scratch; there is no silent mixing either way."""
    import hashlib

    payload = json.dumps(
        {
            "rules": [
                [
                    r.pattern,
                    r.is_regex,
                    r.case_sensitive,
                    r.fragment_aware,
                    r.regex_flags,
                ]
                for r in rules
            ],
            "flatten": flatten,
            "n_buckets": n_buckets,
        },
        sort_keys=True,
    )
    return hashlib.md5(payload.encode()).hexdigest()


def guard_stream_config(
    out_dir: str, checkpoint_name: str, config: dict, operator: str
) -> None:
    """Config-at-checkpoint-birth guard for streaming operators (round-7,
    verdict next #2) — the streaming twin of _config_fingerprint: the
    first run persists the operator's semantic config as a JSON sidecar
    next to its checkpoint dir; every restart compares and hard-fails on
    ANY drift (a restored state store was built under the birth config;
    running it under another silently changes watermark/eviction/merge
    semantics for restored keys). A checkpoint that predates the sidecar
    fails closed — its birth config is unknowable, the same policy as
    manifests missing n_buckets."""
    path = os.path.join(out_dir, f"{checkpoint_name}_config.json")
    ckpt = os.path.join(out_dir, checkpoint_name)

    def stamp() -> None:  # one serialization site for first-stamp AND re-stamp
        os.makedirs(out_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(config, fh)
        os.replace(tmp, path)

    if os.path.isfile(path):
        with open(path) as fh:
            born = json.load(fh)
        if born != config and not os.path.isdir(ckpt):
            # Sidecar written but the checkpoint was never born (first
            # run failed before the stream started — bad source path,
            # schema error). There is no state store to protect, so a
            # corrected config must not wedge the out_dir (round-7
            # review): the CHECKPOINT's birth, not the sidecar's, is
            # the semantic anchor. Re-stamp and proceed.
            stamp()
            return
        if born != config:
            drift = sorted(
                k for k in set(born) | set(config)
                if born.get(k) != config.get(k)
            )
            detail = ", ".join(
                f"{k}: {born.get(k)!r} -> {config.get(k)!r}" for k in drift
            )
            raise ValueError(
                f"{operator} config drift vs checkpoint birth in "
                f"{out_dir}: {detail}. The streaming state store was "
                f"built under the original config; restarting with a "
                f"different one changes semantics for restored keys. Use "
                f"a NEW out_dir (replay the source — availableNow plus "
                f"idempotent sinks makes that safe) or restore the "
                f"original config."
            )
        return
    if os.path.isdir(ckpt):
        raise ValueError(
            f"existing {checkpoint_name} in {out_dir} has no config "
            f"sidecar (created by a pre-fingerprint build); its birth "
            f"config is unknowable, refusing to guess. Use a new out_dir."
        )
    stamp()


def _data_file_listing(out_dir: str, batch_id: int, subdir: str = "data") -> list[list]:
    """Sorted ``[relpath, size]`` pairs of the parquet files under
    ``<subdir>/batch=<k>`` — stamped into the manifest at commit time and
    re-verified for every committed batch on every later run (round-7
    cont. third pass). This turns the run lease's one residual window —
    a zombie driver's in-flight Spark file-moves landing in a batch dir
    AFTER a legitimate runner committed it — from silent corruption
    into a loud integrity failure at the next resume, the same way it
    catches manual tampering or a partial restore. Covers BOTH committed
    views: ``data`` (the good rows) and ``raw`` (which read_errors reads
    back — the zombie overwrites raw FIRST, so a kill in that window
    leaves data intact but the error view silently truncated).
    Driver-side listing: one walk per batch per run, independent of
    data size."""
    base = os.path.join(out_dir, subdir, f"batch={batch_id}")
    out = []
    for root, _dirs, files in os.walk(base):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out.append([os.path.relpath(p, base), os.path.getsize(p)])
    return sorted(out)


def _commit(out_dir: str, batch_id: int, manifest: dict) -> None:
    cdir = _commit_dir(out_dir)
    os.makedirs(cdir, exist_ok=True)
    tmp = os.path.join(cdir, f".batch-{batch_id}.json.tmp")
    final = os.path.join(cdir, f"batch-{batch_id}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
        # rename is atomic vs process crash but NOT power loss: without
        # fsync the rename can reach disk before the data blocks,
        # leaving a truncated "committed" manifest that blocks resume
        # (or skips a batch whose data never hit disk). fsync file, then
        # rename, then fsync the directory entry.
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, final)  # atomic commit point
    dfd = os.open(cdir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def run_resumable(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    rules: list[Rule],
    run_id: str = "run-0",
    n_buckets: int = 16,
    buckets_per_batch: int = 4,
    flatten: bool = False,
    kill_after_batches: int | None = None,
    lease_ttl_sec: float | None = None,
    lease_owner: str | None = None,
    lease_wait_sec: float | None = None,
    storage: LedgerStorage = LOCAL_LEDGER_STORAGE,
    _hold_before_commit_sec: float = 0.0,
) -> DataFrame:
    """Resumable redaction over ``docs`` (doc_id, spans).

    Returns the full output DataFrame read back from ``out_dir/data``.
    ``kill_after_batches`` simulates a crash for the resume test.

    ``lease_ttl_sec`` guards the run with a storage lease
    (``out_dir/run.lease``, same object family as the streaming ledger's
    ``compaction.lease``): without it, two concurrent drivers on one
    out_dir (orchestrator double-launch, zombie retry) both read an
    empty committed set and both ``overwrite`` the same batch dirs — if
    one commits the manifest and the other dies mid-overwrite, the
    committed manifest sits over a half-written data dir and every
    future resume SKIPS the batch, silently losing documents (reproduced
    across two real spark-submit drivers; journal, round-7 cont.). The
    leased run (a) blocks on a live foreign holder (loud timeout at
    ``lease_wait_sec``, default ttl+30), (b) reads ``committed_batches``
    only AFTER acquiring — a loser that waited out a winner re-processes
    nothing, (c) renews the lease before each batch so the ttl need only
    outlast ONE batch, failing loudly if the lease was usurped, and
    (d) re-verifies ownership immediately before every manifest commit
    (the streaming micro-batch check) so an outrun ttl with a real
    usurper can never stamp a manifest over a possibly-raced batch. A
    ``kill_after_batches`` "crash" deliberately does NOT release (a real
    SIGKILL couldn't): the lease expires into takeover. Back-compat:
    ``None`` (default) keeps the single-driver-per-out_dir contract
    unleased, exactly as before. ``_hold_before_commit_sec`` is a
    drive/test hook — park once, before the FIRST commit, while holding
    the lease, so a second real driver's exclusion is provable.
    """
    lease_path = storage.join(out_dir, "run.lease")
    if lease_ttl_sec is not None:
        if lease_owner is None:
            lease_owner = unique_owner("runner")
        if lease_wait_sec is None:
            lease_wait_sec = lease_ttl_sec + 30.0
        os.makedirs(out_dir, exist_ok=True)
        acquire_lease_blocking(
            storage, lease_path, lease_owner, lease_ttl_sec, lease_wait_sec
        )
    crashed = False
    try:
        return _run_resumable_batches(
            spark, docs, out_dir, rules, run_id, n_buckets,
            buckets_per_batch, flatten, kill_after_batches,
            lease_ttl_sec, lease_owner, storage, _hold_before_commit_sec,
        )
    except KillSwitch:
        crashed = True  # simulated SIGKILL: leave the lease to expire
        raise
    finally:
        if lease_ttl_sec is not None and not crashed:
            storage.release_lease(lease_path, lease_owner)


def _run_resumable_batches(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    rules: list[Rule],
    run_id: str,
    n_buckets: int,
    buckets_per_batch: int,
    flatten: bool,
    kill_after_batches: int | None,
    lease_ttl_sec: float | None,
    lease_owner: str | None,
    storage: LedgerStorage,
    _hold_before_commit_sec: float,
) -> DataFrame:
    lease_path = storage.join(out_dir, "run.lease")
    docs = docs.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )
    config_fp = _config_fingerprint(rules, flatten, n_buckets)
    # Under the lease this read is serialized AFTER any prior holder's
    # commits — a blocked second driver sees the winner's manifests here
    # and re-processes nothing.
    done = committed_batches(out_dir)
    batch_ids = list(range((n_buckets + buckets_per_batch - 1) // buckets_per_batch))

    processed = 0
    for batch_id in batch_ids:
        lo = batch_id * buckets_per_batch
        hi = min(lo + buckets_per_batch, n_buckets)
        if batch_id in done:
            # Config-drift guard: a committed manifest written under a
            # DIFFERENT (n_buckets, buckets_per_batch) covers different
            # bucket ranges — silently skipping it would drop or double
            # documents. Resume must use the original partitioning.
            with open(os.path.join(_commit_dir(out_dir), f"batch-{batch_id}.json")) as f:
                manifest = json.load(f)
            if manifest.get("buckets") != list(range(lo, hi)) or (
                # the modulus matters even when ranges coincide: batch 0
                # is [0,4) under both n_buckets=8 and 16, but pmod(h,8)
                # and pmod(h,16) assign DIFFERENT documents to it. A
                # manifest MISSING the field is a hard error too — it
                # predates the guard, so its modulus is unverifiable and
                # defaulting it to the current run's value would pass
                # exactly the drift case the guard exists for (ADVICE r3).
                manifest.get("n_buckets") != n_buckets
            ):
                raise ValueError(
                    f"batch {batch_id} was committed for buckets "
                    f"{manifest.get('buckets')} of {manifest.get('n_buckets')} "
                    f"but this run derives {list(range(lo, hi))} of {n_buckets} "
                    f"— resume with the original n_buckets/buckets_per_batch"
                )
            if manifest.get("config_fp") != config_fp:
                # Rules/flatten drift (round-5 review): a committed batch
                # redacted under DIFFERENT rules (or flatten toggle) must
                # not be silently mixed with this run's output. A
                # manifest missing the field predates the guard and is
                # equally unverifiable — hard error, the n_buckets
                # precedent.
                raise ValueError(
                    f"batch {batch_id} was committed under config "
                    f"{manifest.get('config_fp')} but this run's rules/"
                    f"flatten fingerprint is {config_fp} — resume with "
                    "the original rules and flatten setting (or use a "
                    "fresh out_dir)"
                )
            listing = _data_file_listing(out_dir, batch_id)
            raw_listing = _data_file_listing(out_dir, batch_id, "raw")
            if manifest.get("raw_files") != raw_listing:
                raise ValueError(
                    f"batch {batch_id}'s raw files do not match its "
                    f"committed manifest: the raw dir (read_errors' "
                    f"source) was modified after commit, or the manifest "
                    f"predates the integrity guard. Re-run this out_dir "
                    f"from scratch or restore the committed files."
                )
            if manifest.get("data_files") != listing:
                # Data-integrity guard (round-7 cont. third pass): the
                # files now present differ from what the committing run
                # stamped — a zombie runner's late file-moves, manual
                # tampering, or a partial restore. Mixing them in (or
                # silently serving fewer rows) is exactly the loss the
                # manifest exists to prevent. A manifest MISSING the
                # field predates the guard: unverifiable, hard error
                # (the n_buckets precedent — manifest v3).
                n_rec = manifest.get("data_files")
                raise ValueError(
                    f"batch {batch_id}'s data files do not match its "
                    f"committed manifest (recorded "
                    f"{'<absent>' if n_rec is None else len(n_rec)} "
                    f"files, found {len(listing)}): the batch dir was "
                    f"modified after commit (zombie writer, tampering, "
                    f"partial restore) or the manifest predates the "
                    f"integrity guard. Re-run this out_dir from scratch "
                    f"or restore the committed files."
                )
            continue
        if lease_ttl_sec is not None and not storage.renew_lease(
            lease_path, lease_owner, lease_ttl_sec
        ):
            # The record is gone, tombstoned, or foreign: a usurper ran
            # (or is running) against this out_dir. Processing on would
            # overwrite batch dirs a concurrent runner may be committing.
            raise RuntimeError(
                f"run lease {lease_path} was taken over before batch "
                f"{batch_id} (owner {lease_owner}): a concurrent runner "
                f"claimed this out_dir — this run outran lease_ttl_sec. "
                f"Increase the ttl above the longest batch; audit the "
                f"usurper's progress before retrying."
            )
        batch = docs.filter((F.col("bucket") >= lo) & (F.col("bucket") < hi))
        # Materialize the single-pass result ONCE; good/error views are then
        # derived from the written files (no recompute of the Python stage).
        full = redact_full(batch.select("doc_id", "spans"), rules, flatten)
        full = full.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
        )
        raw_path = os.path.join(out_dir, "raw", f"batch={batch_id}")
        full.write.mode("overwrite").parquet(raw_path)
        full = spark.read.parquet(raw_path)

        out = full.where(F.col("error").isNull()).select(
            "doc_id", "spans", "n_rule_hits",
            F.size("spans").cast("long").alias("n_spans"), "bucket",
        )
        errs = full.where(F.col("error").isNotNull()).select("doc_id", "error")

        data_path = os.path.join(out_dir, "data", f"batch={batch_id}")
        # Hive-partitioned by bucket: downstream reads of specific buckets
        # prune partitions at planning time (asserted in test_plan_quality).
        (
            out.select("doc_id", "spans", "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(data_path)
        )

        # Lineage rows: one per bucket (the resume partition unit).
        metrics = (
            out.groupBy("bucket")
            .agg(
                F.min("doc_id").alias("doc_id_min"),
                F.max("doc_id").alias("doc_id_max"),
                F.count("*").alias("n_docs"),
                F.sum("n_spans").alias("n_spans"),
                F.sum("n_rule_hits").alias("n_rule_hits"),
                F.sum(
                    F.aggregate(
                        "spans",
                        F.lit(0).cast("long"),
                        lambda acc, s: acc + F.length(s.text) + F.length(s.media_ref) + 8,
                    )
                ).alias("bytes_processed"),
            )
            .withColumn("run_id", F.lit(run_id))
            .withColumn("partition_id", F.col("bucket"))
        )
        metrics_path = os.path.join(out_dir, "metrics", f"batch={batch_id}")
        metrics.write.mode("overwrite").parquet(metrics_path)

        # Bounded error sample: the manifest keeps at most 100 rows, so never
        # ship more than that to the driver (a high-error-rate corpus must
        # not OOM the driver); the exact count is a separate cheap scan of
        # the already-materialized raw parquet.
        n_errors = errs.count()
        err_rows = errs.limit(100).collect() if n_errors else []
        if _hold_before_commit_sec and processed == 0:
            # drive/test hook: park ONCE before the first commit, lease
            # held, so a second real driver's blocking acquire is provable
            time.sleep(_hold_before_commit_sec)
        if lease_ttl_sec is not None:
            # The streaming micro-batch check, on the commit point: a
            # batch that outran the ttl AND lost the lease to a usurper
            # may have raced that runner's overwrite of this very batch
            # dir — committing the manifest would stamp "done" over it.
            verify_lease_still_held(storage, lease_path, lease_owner)
        _commit(
            out_dir,
            batch_id,
            {
                "run_id": run_id,
                "batch_id": batch_id,
                "buckets": list(range(lo, hi)),
                "n_buckets": n_buckets,
                "config_fp": config_fp,
                "n_errors": n_errors,
                "errors": [{"doc_id": r["doc_id"], "error": r["error"]} for r in err_rows],
                "data_files": _data_file_listing(out_dir, batch_id),
                "raw_files": _data_file_listing(out_dir, batch_id, "raw"),
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            },
        )
        processed += 1
        if kill_after_batches is not None and processed >= kill_after_batches:
            raise KillSwitch(f"killed after {processed} batch(es)")

    data_dir = os.path.join(out_dir, "data")
    for root, _dirs, files in os.walk(data_dir):
        if any(f.endswith(".parquet") for f in files):
            return spark.read.parquet(data_dir)
    # Every batch produced zero clean docs (empty input, or every doc
    # quarantined by the fail-fast): partitionBy on an empty frame wrote
    # only _SUCCESS markers, which spark.read.parquet cannot infer a
    # schema from — return the documented empty shape instead of
    # crashing AFTER all batches committed.
    from pyspark.sql.types import IntegerType, StructField, StructType

    # Schema parity with the populated path (round-5 review): partition
    # discovery over data/batch=<k>/bucket=<b>/ yields BOTH partition
    # columns, so the empty frame must carry batch too or callers that
    # select it break exactly on the edge case this fallback handles.
    fields = [f for f in REDACTED_SCHEMA.fields if f.name in ("doc_id", "spans")]
    return spark.createDataFrame(
        [],
        StructType(
            fields
            + [
                StructField("batch", IntegerType(), True),
                StructField("bucket", IntegerType(), True),
            ]
        ),
    )


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "metrics"))


def read_errors(spark: SparkSession, out_dir: str) -> DataFrame:
    """Quarantined documents (rotation fail-fast / malformed rows) with
    their error messages, read back from the materialized raw output."""
    raw = spark.read.parquet(os.path.join(out_dir, "raw"))
    return raw.where(F.col("error").isNotNull()).select("doc_id", "error")
