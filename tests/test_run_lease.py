"""Batch run-lease coverage (round-7 continuation): run_resumable under
a storage lease.

Why the batch side needs the lease at all: two concurrent drivers on one
out_dir (orchestrator double-launch, zombie retry) both read an empty
committed-batch set, both ``overwrite`` ``data/batch=0``; if one commits
the manifest and the other dies mid-overwrite, the result is a committed
manifest over a half-written data dir — every future resume SKIPS the
batch and the corpus silently loses documents (reproduced across two
real spark-submit drivers, journal BENCH/BASELINE.md round-7 cont.).
The fix is the same object the streaming side uses: a storage-level
lease (out_dir/run.lease), held for the WHOLE run with per-batch
renewal, with committed_batches read only AFTER acquisition, and a
still-held check before every manifest commit.
"""
from __future__ import annotations

import os
import threading
import time

import pytest

from pdfredact_spark.checkpoint import committed_batches, run_resumable
from pdfredact_spark.fixtures import SSN_RULE, corpus
from pdfredact_spark.pipeline import docs_to_df

RULES = [SSN_RULE]


# --------------------------------------------------------------------------
# renew_lease backend primitive
# --------------------------------------------------------------------------

def test_renew_lease_extends_expiry_and_respects_takeover(
    tmp_path, ledger_storage, monkeypatch
):
    """renew_lease is the run-long-hold primitive: only the current
    holder can extend, extension actually moves the expiry, and after a
    legal takeover (or a release) the old holder's renew fails — it must
    never resurrect a lost lease over a usurper."""
    import time as time_mod

    st = ledger_storage
    lease = str(tmp_path / "renew.lease")
    base = time_mod.time()
    clock = [base]
    monkeypatch.setattr(time_mod, "time", lambda: clock[0])

    assert st.renew_lease(lease, "a", 5.0) is False  # absent: nothing to renew
    assert st.try_acquire_lease(lease, "a", ttl_sec=5.0)
    assert st.renew_lease(lease, "b", 5.0) is False  # foreign owner
    clock[0] = base + 3.0
    assert st.renew_lease(lease, "a", 5.0) is True  # expiry -> base+8
    clock[0] = base + 7.0  # past the ORIGINAL expiry (base+5)
    assert not st.try_acquire_lease(lease, "b", ttl_sec=5.0), (
        "renewal did not extend the expiry: a foreign claim won at t+7 "
        "against a lease renewed to t+8"
    )
    clock[0] = base + 9.0  # past the renewed expiry: legal takeover
    assert st.try_acquire_lease(lease, "b", ttl_sec=5.0)
    assert st.renew_lease(lease, "a", 5.0) is False  # lost to the usurper
    assert st.read_json(lease)["owner"] == "b"  # and did not clobber it
    st.release_lease(lease, "b")
    assert st.renew_lease(lease, "b", 5.0) is False  # released: gone


def test_renew_lease_expired_but_unclaimed_is_still_ours(
    tmp_path, ledger_storage, monkeypatch
):
    """Expiry with NO takeover is harmless (the record still carries our
    owner) — the same verdict _verify_lease_still_held renders. A holder
    that overran its ttl but was not usurped may renew and continue."""
    import time as time_mod

    st = ledger_storage
    lease = str(tmp_path / "renew2.lease")
    base = time_mod.time()
    clock = [base]
    monkeypatch.setattr(time_mod, "time", lambda: clock[0])

    assert st.try_acquire_lease(lease, "a", ttl_sec=1.0)
    clock[0] = base + 10.0  # long expired, nobody took over
    assert st.renew_lease(lease, "a", 5.0) is True
    assert not st.try_acquire_lease(lease, "b", ttl_sec=5.0)  # live again


# --------------------------------------------------------------------------
# run_resumable under the lease
# --------------------------------------------------------------------------

def test_run_resumable_leased_output_and_release(spark, tmp_path, ledger_storage):
    """The leased run produces the same output as the unleased twin and
    leaves the lease claimable (released on completion)."""
    docs = docs_to_df(spark, corpus(12))
    out_l = str(tmp_path / "leased")
    out_p = str(tmp_path / "plain")
    got = run_resumable(
        spark, docs, out_l, RULES, n_buckets=8, buckets_per_batch=4,
        lease_ttl_sec=60.0, storage=ledger_storage,
    )
    want = run_resumable(spark, docs, out_p, RULES, n_buckets=8, buckets_per_batch=4)
    a = {(r["doc_id"], tuple((s["kind"], s["text"]) for s in r["spans"]))
         for r in got.collect()}
    b = {(r["doc_id"], tuple((s["kind"], s["text"]) for s in r["spans"]))
         for r in want.collect()}
    assert a == b and len(a) == 12
    # released: a fresh claim by another owner wins immediately
    lease = os.path.join(out_l, "run.lease")
    assert ledger_storage.try_acquire_lease(lease, "probe", ttl_sec=1.0)


def test_run_resumable_usurped_lease_fails_loudly_before_commit(
    spark, tmp_path, ledger_storage
):
    """A run that outruns its ttl AND loses the lease to a real usurper
    must fail LOUDLY without committing the raced batch — committing
    would stamp a manifest over data a concurrent runner may be
    overwriting (the exact loss window the lease exists to close)."""
    docs = docs_to_df(spark, corpus(8))
    out = str(tmp_path / "usurped")
    lease = os.path.join(out, "run.lease")
    st = ledger_storage

    def usurp():
        # wait out the 1s ttl, then claim like a second driver would
        deadline = time.monotonic() + 10.0
        while time.monotonic() < deadline:
            if st.try_acquire_lease(lease, "usurper", ttl_sec=60.0):
                return
            time.sleep(0.1)

    t = threading.Timer(1.5, usurp)
    t.start()
    try:
        with pytest.raises(RuntimeError, match="taken over|usurp"):
            run_resumable(
                spark, docs, out, RULES, n_buckets=4, buckets_per_batch=4,
                lease_ttl_sec=1.0, storage=st,
                _hold_before_commit_sec=4.0,
            )
    finally:
        t.join()
    assert committed_batches(out) == set(), (
        "the usurped run committed a manifest over a possibly-raced batch"
    )
    # the failed runner's cleanup must NOT have clobbered the usurper
    cur = st.read_json(lease)
    assert cur is not None and cur["owner"] == "usurper" and not cur.get("released")


def test_run_resumable_second_runner_blocks_then_noops(spark, tmp_path):
    """Two concurrent runners on one out_dir serialize on the lease, and
    the loser — having read committed_batches only AFTER acquiring —
    re-processes NOTHING (manifests all carry the winner's run_id)."""
    docs = docs_to_df(spark, corpus(10))
    out = str(tmp_path / "race")
    lease = os.path.join(out, "run.lease")
    HOLD = 3.0
    err: list[BaseException] = []

    def first():
        try:
            run_resumable(
                spark, docs, out, RULES, run_id="run-A",
                n_buckets=4, buckets_per_batch=4,
                lease_ttl_sec=60.0, _hold_before_commit_sec=HOLD,
            )
        except BaseException as e:  # surfaced by the main thread
            err.append(e)

    th = threading.Thread(target=first)
    th.start()
    deadline = time.monotonic() + 30.0
    while time.monotonic() < deadline and not os.path.isfile(lease):
        time.sleep(0.05)
    assert os.path.isfile(lease), "first runner never acquired the lease"
    t0 = time.monotonic()
    got = run_resumable(
        spark, docs, out, RULES, run_id="run-B",
        n_buckets=4, buckets_per_batch=4, lease_ttl_sec=60.0,
    )
    waited = time.monotonic() - t0
    th.join(timeout=120)
    assert not err, err
    # the second runner cannot have finished before the first's parked
    # hold ended: its blocking acquire waited out the live lease
    assert waited >= HOLD - 1.5, (
        f"second runner finished {waited:.1f}s after launch — it cannot "
        f"have blocked on the {HOLD}s hold"
    )
    assert {r["doc_id"] for r in got.collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }
    # every manifest was committed by the winner; the loser no-op'd
    import json

    cdir = os.path.join(out, "_commits")
    run_ids = set()
    for name in sorted(os.listdir(cdir)):
        if name.endswith(".json"):
            with open(os.path.join(cdir, name)) as fh:
                run_ids.add(json.load(fh)["run_id"])
    assert run_ids == {"run-A"}, run_ids


def test_run_resumable_killswitch_leaves_lease_to_expire(spark, tmp_path):
    """KillSwitch models SIGKILL: the dying run must NOT release (a real
    SIGKILL couldn't), so a follow-up driver waits out the ttl —
    takeover, not trust. The resumed run completes under its own claim."""
    from pdfredact_spark.checkpoint import KillSwitch

    docs = docs_to_df(spark, corpus(10))
    out = str(tmp_path / "killed")
    lease = os.path.join(out, "run.lease")
    with pytest.raises(KillSwitch):
        run_resumable(
            spark, docs, out, RULES, n_buckets=8, buckets_per_batch=4,
            lease_ttl_sec=2.0, kill_after_batches=1,
        )
    from pdfredact_spark.catalog import LOCAL_LEDGER_STORAGE

    cur = LOCAL_LEDGER_STORAGE.read_json(lease)
    assert cur is not None and not cur.get("released"), (
        "a simulated crash released its lease — a real SIGKILL cannot"
    )
    pre = committed_batches(out)
    assert pre  # the killed run committed its first batch
    got = run_resumable(  # blocking acquire waits out the 2s ttl
        spark, docs, out, RULES, n_buckets=8, buckets_per_batch=4,
        lease_ttl_sec=2.0,
    )
    assert pre <= committed_batches(out)
    assert got.select("doc_id").distinct().count() == 10


# --------------------------------------------------------------------------
# CC work_dir under the lease (round-7 cont.: the run_resumable design
# applied to _connected_components' durable work_dirs)
# --------------------------------------------------------------------------

def _cc_labels(df):
    return {(r["node"], r["label"]) for r in df.collect()}


def test_cc_durable_work_dir_leased_and_released(spark, tmp_path):
    """A durable-work_dir CC run takes cc.lease, computes exactly, and
    leaves it claimable; the engine-owned tempfile scratch is private
    and never leased."""
    from pdfredact_spark.catalog import LOCAL_LEDGER_STORAGE
    from pdfredact_spark.queries import _connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    wd = str(tmp_path / "ccwd")
    got = _cc_labels(_connected_components(edges, work_dir=wd))
    assert got == {(i, 0) for i in range(31)}
    lease = os.path.join(wd, "cc.lease")
    assert LOCAL_LEDGER_STORAGE.try_acquire_lease(lease, "probe", 1.0)


def test_cc_second_driver_blocks_then_fast_forwards(spark, tmp_path):
    """Two concurrent CC runs on one durable work_dir serialize on the
    lease; the loser — resume decision made only AFTER acquiring — fast-
    forwards from the winner's converged round (one re-confirm round)
    instead of recomputing or racing the round dirs."""
    from pdfredact_spark.queries import _connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "src long, dst long"
    )
    wd = str(tmp_path / "race")
    lease = os.path.join(wd, "cc.lease")
    HOLD = 3.0
    err: list = []
    a_rounds: list = []

    def first():
        try:
            _connected_components(
                edges, _rounds=a_rounds, work_dir=wd, _hold_lease_sec=HOLD
            ).collect()
        except BaseException as e:
            err.append(e)

    th = threading.Thread(target=first)
    th.start()
    deadline = time.monotonic() + 30.0
    while time.monotonic() < deadline and not os.path.isfile(lease):
        time.sleep(0.05)
    assert os.path.isfile(lease), "first CC run never acquired the lease"
    t0 = time.monotonic()
    b_rounds: list = []
    got = _cc_labels(_connected_components(edges, _rounds=b_rounds, work_dir=wd))
    waited = time.monotonic() - t0
    th.join(timeout=120)
    assert not err, err
    assert waited >= HOLD - 1.5, (
        f"second CC run finished {waited:.1f}s after launch — it cannot "
        f"have blocked on the {HOLD}s hold")
    assert got == {(i, 0) for i in range(101)}
    # loser re-confirmed convergence in ONE round off the winner's rounds
    assert len(b_rounds) == 1 and len(a_rounds) > 1, (b_rounds, a_rounds)


def test_cc_usurped_lease_fails_loudly(spark, tmp_path, monkeypatch):
    """A CC run that outruns its ttl and loses the work_dir to a real
    usurper fails loudly at the next round boundary instead of racing
    the usurper's round dirs."""
    import pytest as _pytest

    from pdfredact_spark.catalog import LOCAL_LEDGER_STORAGE
    from pdfredact_spark.queries import _connected_components

    monkeypatch.setenv("PDFREDACT_CC_LEASE_TTL", "1.0")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "src long, dst long"
    )
    wd = str(tmp_path / "usurped")
    lease = os.path.join(wd, "cc.lease")

    def usurp():
        deadline = time.monotonic() + 10.0
        while time.monotonic() < deadline:
            if LOCAL_LEDGER_STORAGE.try_acquire_lease(lease, "usurper", 60.0):
                return
            time.sleep(0.1)

    t = threading.Timer(1.5, usurp)
    t.start()
    try:
        with _pytest.raises(RuntimeError, match="taken over"):
            _connected_components(
                edges, work_dir=wd, _hold_lease_sec=4.0
            ).collect()
    finally:
        t.join()
    cur = LOCAL_LEDGER_STORAGE.read_json(lease)
    assert cur is not None and cur["owner"] == "usurper"
