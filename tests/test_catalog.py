from __future__ import annotations

from pdfredact_spark.catalog import Catalog, _is_table_name
from pdfredact_spark.fixtures import corpus
from pdfredact_spark.pipeline import docs_to_df


def test_parquet_fallback_roundtrip(spark, tmp_path):
    cat = Catalog(spark)
    assert cat.iceberg is False  # no Iceberg jars in this sandbox
    target = str(tmp_path / "docs")
    df = docs_to_df(spark, corpus(6))
    assert not cat.exists(target)
    cat.overwrite(df, target)
    assert cat.exists(target)
    assert cat.read(target).count() == 6
    cat.append(docs_to_df(spark, corpus(4)), target)
    assert cat.read(target).count() == 10


def test_table_name_routing():
    assert _is_table_name("warehouse.docs.main")
    assert not _is_table_name("/data/docs")
    assert not _is_table_name("file:/data/docs")


def test_catalog_iceberg_branch_routing(spark):
    """The Iceberg runtime is environment-blocked (no jar — re-checked
    every round), but the prepared switch's ROUTING logic is code, not
    environment, so it gets a real test: with the Iceberg extension
    configured, dotted table names must route to spark.table /
    df.writeTo (append / partitionedBy+createOrReplace), while paths
    keep routing to the parquet reader/writer — the format-agnostic
    contract callers rely on. Uses call recorders; the session fixture
    is only needed for F.col."""
    import types

    from pdfredact_spark.catalog import Catalog

    calls: list = []

    class Rec:
        def __init__(self, name):
            self._name = name

        def __call__(self, *a, **k):
            calls.append((self._name, a))
            return self

        def __getattr__(self, item):
            return Rec(f"{self._name}.{item}")

    class FakeSpark:
        conf = types.SimpleNamespace(
            get=lambda k: "org.apache.iceberg.spark.extensions."
                          "IcebergSparkSessionExtensions"
        )
        read = Rec("read")

        def table(self, t):
            calls.append(("table", (t,)))
            return "TABLE_DF"

    cat = Catalog(FakeSpark())
    assert cat.iceberg

    assert cat.read("warehouse.docs.main") == "TABLE_DF"
    assert ("table", ("warehouse.docs.main",)) in calls
    cat.read("/data/docs")  # a PATH still routes to parquet
    assert any(n == "read.parquet" for n, _a in calls)

    df = types.SimpleNamespace(writeTo=Rec("writeTo"), write=Rec("write"))
    calls.clear()
    cat.append(df, "warehouse.docs.main")
    assert calls[0] == ("writeTo", ("warehouse.docs.main",))
    assert any(n == "writeTo.append" for n, _a in calls)

    calls.clear()
    cat.overwrite(df, "warehouse.docs.main", partition_by=["bucket"])
    assert calls[0] == ("writeTo", ("warehouse.docs.main",))
    assert any(n == "writeTo.partitionedBy" for n, _a in calls)
    assert any(n.endswith("createOrReplace") for n, _a in calls)

    calls.clear()
    cat.append(df, "/data/docs", partition_by=["bucket"])  # path -> parquet
    assert calls[0][0] == "write.mode" and calls[0][1] == ("append",)
    assert any(n.endswith("parquet") for n, _a in calls)


def test_media_real_decode_is_stubbed():
    import pytest

    from pdfredact_spark.media import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"payload", fake=False)


def test_object_store_list_never_walks_outside_prefix_dir(tmp_path, monkeypatch):
    """Round-6 review #1: a key query whose prefix-parent doesn't exist
    must return empty WITHOUT walking any ancestor — the original
    nearest-existing-ancestor climb os.walk'ed arbitrary unrelated
    trees (worst case '/') on e.g. is_dir() of a fresh not-yet-created
    work_dir."""
    import os

    from pdfredact_spark.catalog import ObjectStoreLedgerStorage

    st = ObjectStoreLedgerStorage()
    root = str(tmp_path / "store")
    st._put(os.path.join(root, "real", "k.parquet"), b"x")

    walked: list = []
    real_walk = os.walk
    monkeypatch.setattr(
        os, "walk", lambda p, *a, **k: (walked.append(p), real_walk(p, *a, **k))[1]
    )
    assert not st.is_dir(os.path.join(root, "missing", "deep"))
    assert st.list_dirs(os.path.join(root, "missing", "batch=*")) == []
    assert not st.has_parquet(os.path.join(root, "also-missing"))
    assert walked == []  # nonexistent parent -> no walk at all
    # and a legitimate query walks exactly its own prefix dir
    assert st.is_dir(os.path.join(root, "real"))
    assert walked == [os.path.join(root, "real")]


def test_object_store_storage_semantics(tmp_path):
    """The object-store LedgerStorage backend (round-5 verdict, next #2)
    must behave like an S3-class store, not like POSIX:

    * no directory objects — an empty directory is invisible to is_dir /
      list_dirs / has_parquet even when the local FS has one;
    * list_dirs derives common prefixes from a flat key listing;
    * delete_tree is per-key — afterwards the prefix is gone even though
      the emulation's empty local dirs remain;
    * the meta flip is a conditional PUT: a stale etag raises
      ConditionFailed (the lost-update guard rename can't give)."""
    import os

    import pytest

    from pdfredact_spark.catalog import ConditionFailed, ObjectStoreLedgerStorage

    st = ObjectStoreLedgerStorage()
    root = str(tmp_path / "store")

    # empty POSIX directory != an object-store "directory"
    os.makedirs(os.path.join(root, "ledger", "batch=0"))
    assert not st.is_dir(os.path.join(root, "ledger", "batch=0"))
    assert st.list_dirs(os.path.join(root, "ledger", "batch=*")) == []

    # keys under prefixes surface as "directories" via common prefixes
    for b, f in [(0, "part-0.parquet"), (0, "_SUCCESS"), (2, "_SUCCESS")]:
        st._put(os.path.join(root, "ledger", f"batch={b}", f), b"x")
    got = st.list_dirs(os.path.join(root, "ledger", "batch=*"))
    assert got == [os.path.join(root, "ledger", "batch=0"),
                   os.path.join(root, "ledger", "batch=2")]
    assert st.is_dir(os.path.join(root, "ledger", "batch=0"))
    assert st.has_parquet(os.path.join(root, "ledger", "batch=0"))
    assert not st.has_parquet(os.path.join(root, "ledger", "batch=2"))
    assert st.is_file(os.path.join(root, "ledger", "batch=0", "_SUCCESS"))
    assert st.parquet_bytes_under([os.path.join(root, "ledger")]) == 1

    # per-key delete_tree: prefix disappears, sibling untouched
    st.delete_tree(os.path.join(root, "ledger", "batch=0"))
    assert not st.is_dir(os.path.join(root, "ledger", "batch=0"))
    assert st.list_dirs(os.path.join(root, "ledger", "batch=*")) == [
        os.path.join(root, "ledger", "batch=2")
    ]

    # conditional-PUT meta flip
    meta_key = os.path.join(root, "ledger_meta.json")
    assert st.read_json(meta_key) is None
    st.write_json_atomic(meta_key, {"gen": 0})
    assert st.read_json(meta_key) == {"gen": 0}
    etag0 = st.get_etag(meta_key)
    st.write_json_atomic(meta_key, {"gen": 1})  # re-reads the etag itself
    assert st.read_json(meta_key) == {"gen": 1}
    with pytest.raises(ConditionFailed):
        st.put_json_if(meta_key, {"gen": 99}, etag0)  # stale etag loses
    assert st.read_json(meta_key) == {"gen": 1}


def test_storage_backends_equivalent_on_random_op_sequences(tmp_path):
    """Seeded randomized equivalence: for any sequence of external
    writes (simulating Spark executors laying down part files +
    _SUCCESS markers, as every engine write does) interleaved with
    interface operations, the POSIX and object-store backends must
    agree on every observable — list_dirs, is_dir, is_file,
    has_parquet, parquet_bytes_under, read_json — and deletes must
    leave both in agreeing states. The ONE designed divergence is
    empty directories (visible to POSIX glob, nonexistent in an object
    store); the engine never creates file-less directories (Spark
    always writes _SUCCESS), so the generator always puts >= 1 file in
    a directory it creates."""
    import json
    import os
    import random

    from pdfredact_spark.catalog import LedgerStorage, ObjectStoreLedgerStorage

    backends = {
        "posix": (LedgerStorage(), str(tmp_path / "posix")),
        "store": (ObjectStoreLedgerStorage(), str(tmp_path / "store")),
    }

    def external_write(rel: str, data: bytes) -> None:
        for _st, root in backends.values():
            p = os.path.join(root, rel)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "wb") as fh:
                fh.write(data)

    def observe(rel_pattern_base: str):
        """All observables, root-normalized, from both backends."""
        outs = []
        for st, root in backends.values():
            base = os.path.join(root, rel_pattern_base)
            dirs = [d[len(root):] for d in st.list_dirs(base + "=*")]
            facts = []
            for rd in dirs:
                p = root + rd
                facts.append(
                    (rd, st.is_dir(p), st.has_parquet(p),
                     st.is_file(os.path.join(p, "_SUCCESS")),
                     st.parquet_bytes_under([p]))
                )
            meta = st.read_json(os.path.join(root, "meta.json"))
            outs.append((sorted(dirs), sorted(facts), meta))
        return outs

    rng = random.Random(20260817)
    live: list[str] = []
    for step in range(300):
        op = rng.random()
        if op < 0.45 or not live:
            # external write: a new "batch" dir with files
            b = rng.randrange(40)
            d = f"ledger/batch={b}"
            n_parq = rng.randrange(3)
            for i in range(n_parq):
                external_write(
                    f"{d}/part-{i}.parquet", b"p" * rng.randrange(1, 9)
                )
            external_write(f"{d}/_SUCCESS", b"")
            if d not in live:
                live.append(d)
        elif op < 0.65:
            # meta flip through the interface on both backends
            obj = {"gen": step, "k": rng.randrange(5)}
            for st, root in backends.values():
                st.write_json_atomic(os.path.join(root, "meta.json"), obj)
        elif op < 0.8:
            # delete a live dir through the interface on both backends
            d = live.pop(rng.randrange(len(live)))
            for st, root in backends.values():
                st.delete_tree(os.path.join(root, d))
        if rng.random() < 0.5:
            posix_view, store_view = observe("ledger/batch")
            assert posix_view == store_view, (step, posix_view, store_view)
    posix_view, store_view = observe("ledger/batch")
    assert posix_view == store_view
    assert posix_view[0] or posix_view[2]  # the run exercised something


def test_session_parses_local_with_max_failures(spark):
    # local[N,maxFailures] is valid Spark master syntax; get_spark must not
    # crash deriving the shuffle-partition default from it (getOrCreate
    # returns the existing session, but the parse runs first)
    from pdfredact_spark.session import get_spark

    s = get_spark(master="local[4,2]", app_name="parse-probe")
    assert s is spark


def test_lease_single_winner_random_model(tmp_path, ledger_storage, monkeypatch):
    """Model-based check of the lease protocol's ONE invariant (round 7):
    at any instant there is at most one live holder, and try_acquire's
    outcome is exactly predicted by a two-field model {owner, expires} —
    acquire succeeds iff no unexpired lease exists (even the current
    holder cannot re-acquire its own live lease), renew extends exactly
    the records that still carry the caller (round-7 cont.), release
    clears only the caller's own record (an expired holder's release
    must not evict a usurper). Driven as 600 random
    acquire/renew/release/clock-advance ops
    per backend under a monotone fake clock (expiry-driven takeover is
    deterministic in the model, so a divergence pinpoints the op).
    Complements the targeted CAS/tombstone/torn-lease tests: those pin
    specific discovered races, this sweeps the whole state space."""
    import random
    import time as time_mod

    st = ledger_storage
    lease = str(tmp_path / "model.lease")

    base = time_mod.time()
    clock = [base]
    monkeypatch.setattr(time_mod, "time", lambda: clock[0])

    owners = ["w1", "w2", "c1", "c2"]
    holder: tuple[str, float] | None = None  # model: (owner, expires)

    def live() -> bool:
        return holder is not None and holder[1] > clock[0]

    rng = random.Random(0x1EA5E)
    n_acquires = n_takeovers = n_renews = 0
    for step in range(600):
        op = rng.random()
        if op < 0.45:
            owner = rng.choice(owners)
            ttl = rng.choice([5.0, 50.0])
            was_stale_record = holder is not None and not live()
            got = st.try_acquire_lease(lease, owner, ttl_sec=ttl)
            assert got == (not live()), (
                step, owner, holder, clock[0] - base, got,
            )
            if got:
                n_acquires += 1
                n_takeovers += was_stale_record
                holder = (owner, clock[0] + ttl)
        elif op < 0.65:
            # renew (round-7 cont.): succeeds iff the record still
            # carries the caller — live OR expired-but-unclaimed (expiry
            # with no takeover is harmless); a tombstoned/foreign/absent
            # record must refuse AND stay untouched.
            owner = rng.choice(owners)
            ttl = rng.choice([5.0, 50.0])
            got = st.renew_lease(lease, owner, ttl_sec=ttl)
            assert got == (holder is not None and holder[0] == owner), (
                step, owner, holder, clock[0] - base, got,
            )
            if got:
                n_renews += 1
                holder = (owner, clock[0] + ttl)
        elif op < 0.85:
            owner = rng.choice(owners)
            st.release_lease(lease, owner)
            if holder is not None and holder[0] == owner:
                holder = None  # cleared (or tombstoned: equally claimable)
        else:
            clock[0] += rng.choice([1.0, 10.0, 60.0])
        if live():
            # the stored record must agree with the model's live holder
            cur = st.read_json(lease)
            assert cur is not None and cur["owner"] == holder[0], (
                step, cur, holder,
            )
    # the sweep must have exercised the interesting transitions
    assert n_acquires >= 50 and n_takeovers >= 5 and n_renews >= 20, (
        n_acquires, n_takeovers, n_renews,
    )


import pytest as _pytest


@_pytest.mark.parametrize("backend", ["posix", "store"])
def test_lease_multiprocess_stress_no_double_winner(tmp_path, backend):
    """Round-7 review: the model sweep above is single-threaded, so it
    cannot see IMPLEMENTATION races — and the implementation had them.
    tools/lease_stress.py races 6 real processes on one lease path with
    simulated holder crashes (no release -> ttl expiry -> takeover) and
    detects mutual exclusion violations via an owner-tagged token file.
    Against the pre-fix code this harness caught, within seconds, on
    BOTH backends: the POSIX stale takeover's unconditional
    remove-then-recreate deleting a racer's fresh LIVE lease; torn-file
    reads crashing acquire (FileNotFoundError TOCTOU); the object-store
    CAS being only thread-atomic (threading.Lock) while the protocol's
    deployment shape is two driver PROCESSES; and concurrent emulated
    PUTs to one key destroying each other's shared tmp file. Fixed by
    kernel-flock'd lease critical sections (POSIX), a cross-process
    flock CAS linearization point and per-PUT unique tmp names (object
    store). This test re-runs the harness and asserts zero violations,
    zero worker crashes, and real contention (liveness floor)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lease = str(tmp_path / "stress.lease")
    token = str(tmp_path / "token")
    viol = str(tmp_path / "violations")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(repo, "tools", "lease_stress.py"),
             backend, lease, token, viol, "3.0", "0.25", "0.4"],
            cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for _ in range(6)
    ]
    wins = 0
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()[-2000:]
        wins += int(out)
    if os.path.isfile(viol):
        with open(viol) as fh:
            raise AssertionError(f"mutual exclusion violated:\n{fh.read()}")
    # liveness: the protocol made progress under crash-driven takeovers
    assert wins >= 10, wins
