"""Thin table catalog: Iceberg when available, partitioned Parquet fallback.

The north rule targets Iceberg tables; this sandbox's PySpark ships no
Iceberg runtime jar (TESTDATA.md), so the engine abstracts the four table
operations it needs behind one object. With
``spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions``
and a configured catalog, table names route to ``writeTo``/``table`` (real
Iceberg snapshots); otherwise paths route to Parquet directories. Callers
(jobs, checkpoint, streaming) never branch on the format themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _iceberg_enabled(spark: SparkSession) -> bool:
    try:
        ext = spark.conf.get("spark.sql.extensions") or ""
    except Exception:
        return False
    return "IcebergSparkSessionExtensions" in ext


def _is_table_name(target: str) -> bool:
    """Catalog table names are dotted identifiers, not paths."""
    return "/" not in target and not target.startswith("file:")


class LedgerStorage:
    """Storage-layer operations the streaming dedup ledger and its
    compaction need (ADVICE r4 / round-4 verdict #4): listing delta and
    generation directories, recursive delete of absorbed inputs, the
    atomic meta-pointer flip, and the metrics walk. The compaction
    algorithm orders its steps (write gen G+1 fully -> flip pointer ->
    delete absorbed inputs) so any backend whose pointer flip is atomic
    is crash-safe; everything filesystem-specific lives HERE, so an
    object-store deployment (no atomic rename, prefix listing instead
    of directories) swaps one class — e.g. a conditional-PUT meta flip —
    without touching streaming.py.

    This default implementation is the local/POSIX filesystem (matching
    the sandbox and any HDFS-fuse mount): os.replace gives the atomic
    pointer flip, os.walk the listing.
    """

    def join(self, *parts: str) -> str:
        import os

        return os.path.join(*parts)

    def read_json(self, path: str) -> dict | None:
        import json
        import os

        if not os.path.isfile(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def write_json_atomic(self, path: str, obj: dict) -> None:
        """Readers must see either the old or the new pointer, never a
        partial write: write-then-rename (POSIX rename atomicity)."""
        import json
        import os

        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(obj, fh)
        os.replace(tmp, path)

    def list_dirs(self, pattern: str) -> list[str]:
        import glob

        return sorted(glob.glob(pattern))

    def is_dir(self, path: str) -> bool:
        import os

        return os.path.isdir(path)

    def is_file(self, path: str) -> bool:
        import os

        return os.path.isfile(path)

    def delete_tree(self, path: str) -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    def has_parquet(self, path: str) -> bool:
        """True if any .parquet file exists under path. An all-duplicate
        micro-batch writes a ledger delta containing only _SUCCESS;
        reading such a directory raises UNABLE_TO_INFER_SCHEMA, so every
        ledger read must skip file-less directories."""
        import os

        for _root, _dirs, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def parquet_bytes_under(self, paths: list[str]) -> int:
        """Metrics-only (test soaks): bytes of parquet under the paths."""
        import os

        total = 0
        for p in paths:
            for root, _dirs, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        return total

    # --- compaction lease (round-6: the single-writer contract in code) ---
    def _lease_mutex(self, path: str):
        """Kernel-enforced mutual exclusion for the lease's OWN
        read-check-write critical sections: flock(LOCK_EX) on a sibling
        `<path>.lock` file, released automatically on close AND on
        process crash (no ttl needed for the mutex itself). Round-7
        multi-process stress (tools/lease_stress.py, 8 racing processes
        with simulated crashes) proved the previous lock-free protocol
        admitted two winners: (a) a stale takeover's unconditional
        remove-then-recreate let racer C delete racer B's freshly
        created LIVE lease, and (b) a reader classifying a torn
        mid-write file as stale could steal a live mid-acquire claim.
        Under the mutex both windows are gone by construction: a torn
        lease can only be observed if its creator CRASHED inside the
        critical section (then stale is the correct verdict), and
        check-then-remove/create pairs are serialized. flock is
        advisory and local to one filesystem — exactly this backend's
        deployment model (driver-visible local/HDFS-fuse path); the
        network/object-store deployment uses the CAS subclass."""
        import fcntl
        import os
        from contextlib import contextmanager

        @contextmanager
        def held():
            fd = os.open(path + ".lock", os.O_CREAT | os.O_RDWR, 0o644)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)
                yield
            finally:
                os.close(fd)  # close releases the flock

        return held()

    def try_acquire_lease(self, path: str, owner: str, ttl_sec: float) -> bool:
        """Single-winner lease: claim wins iff no unexpired lease exists
        (an expired lease — holder dead past its ttl, the contract
        forbids a live holder outrunning it — is taken over). The whole
        read-check-write runs under the kernel flock mutex (see
        _lease_mutex), so two takeover racers serialize and a torn file
        (ADVICE r6: creator crashed mid-write) is safely stale. The
        object-store subclass overrides with a conditional-PUT CAS."""
        import time

        with self._lease_mutex(path):
            try:
                cur = self.read_json(path)
            except ValueError:
                cur = None  # torn = creator crashed inside the mutex: stale
            except FileNotFoundError:
                cur = None
            if cur is not None and cur.get("expires", 0) > time.time():
                return False  # live holder
            self.write_json_atomic(
                path, {"owner": owner, "expires": time.time() + ttl_sec}
            )
            return True

    def release_lease(self, path: str, owner: str) -> None:
        """Release only a lease this owner still holds (a takeover after
        our expiry must not be clobbered). Owner check + remove run
        under the same mutex as acquire, so the check's verdict cannot
        rot between read and remove (the round-7 review's TOCTOU)."""
        import os

        with self._lease_mutex(path):
            try:
                cur = self.read_json(path)
            except (ValueError, FileNotFoundError):
                return  # torn/vanished lease can't be ours
            if cur is not None and cur.get("owner") == owner:
                try:
                    os.remove(path)
                except FileNotFoundError:
                    pass

    def renew_lease(self, path: str, owner: str, ttl_sec: float) -> bool:
        """Extend a lease this owner still holds (the run-long-hold
        primitive: run_resumable holds one lease across many batches and
        re-stamps the expiry before each, so the ttl only needs to
        outlast a single batch, not the whole run). True = extended;
        False = the record is absent, torn, tombstoned, or carries a
        foreign owner — some other holder ran, the caller must fail
        loudly, and this call must NOT have clobbered the usurper.
        Expired-but-still-ours renews fine: expiry with no takeover is
        harmless (the verify_lease_still_held verdict). Same mutex as
        acquire/release, so renew-vs-takeover racers serialize."""
        import time

        with self._lease_mutex(path):
            try:
                cur = self.read_json(path)
            except (ValueError, FileNotFoundError):
                return False  # torn/vanished can't be provably ours
            if cur is None or cur.get("owner") != owner or cur.get("released"):
                return False
            self.write_json_atomic(
                path, {"owner": owner, "expires": time.time() + ttl_sec}
            )
            return True


LOCAL_LEDGER_STORAGE = LedgerStorage()


class ConditionFailed(RuntimeError):
    """A conditional PUT lost the race: the object's etag changed between
    read and write. Under the compaction single-writer contract this
    never fires; a second concurrent compactor surfaces HERE instead of
    silently clobbering the meta pointer."""


class ObjectStoreLedgerStorage(LedgerStorage):
    """Object-store-semantics backend (round-5 verdict, next-round #2):
    proves in code that the ledger-compaction and CC-round contracts
    hold WITHOUT POSIX primitives — no atomic rename, no directories.
    An S3-class store offers exactly five operations, and every
    interface method below is built from ONLY these:

    * PUT(key, bytes)   — atomic whole-object write per key (readers see
                          old or new bytes, never partial; rename does
                          not exist);
    * PUT-IF(key, bytes, etag) — conditional PUT: the meta pointer flip,
                          raising ConditionFailed on a lost update
                          (STRONGER than the POSIX backend's os.replace,
                          which last-writer-wins);
    * GET/HEAD(key)     — read / stat one object;
    * LIST(prefix)      — flat key enumeration by string prefix; there
                          are no directory objects, "directories" are a
                          key-naming convention and an EMPTY directory
                          does not exist;
    * DELETE(key)       — per-key delete; delete_tree = LIST + DELETE.

    The byte payload maps onto the local filesystem (Spark's parquet
    writers land there regardless; a real S3 deployment pairs this
    class with an S3A/magic committer for the parquet side — Spark's
    own problem, not this layer's). The os.* calls inside the five
    primitives are the emulated store's SERVER side; nothing above the
    primitive line touches the filesystem directly. Empty local
    directories left behind by per-key deletes are invisible to every
    key-based predicate — faithfully matching a store where no
    directory object ever existed.
    """

    def _cas_lock(self, key: str):
        """The emulated server's linearization point for PUT-IF (a real
        store's CAS). This must serialize ACROSS PROCESSES, not just
        threads: the round-7 protocol explicitly runs two real drivers
        against one out_dir (verify flow 10, leased dedup_stream), and
        each driver constructs its own backend instance — a
        threading.Lock (the original implementation) let two processes
        interleave read-etag/compare/put and both win the lease CAS
        (caught by tools/lease_stress.py: ENTER-OVERLAP violations).
        flock on a server-internal `<key>.cas-lock` file is the
        emulation's stand-in for the store's server-side serialization;
        like `.put-tmp`, the lock file is invisible to LIST."""
        import fcntl
        import os
        from contextlib import contextmanager

        @contextmanager
        def held():
            os.makedirs(os.path.dirname(key), exist_ok=True)
            fd = os.open(key + ".cas-lock", os.O_CREAT | os.O_RDWR, 0o644)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)
                yield
            finally:
                os.close(fd)

        return held()

    # --- the five store primitives (the only filesystem access) --------
    def _list_keys(self, prefix: str):
        import os

        # Keys matching '<dir>/stem...' can only live under <dir> (or,
        # for a '<dir>/' prefix, under <dir> itself) — walk exactly
        # that root and nothing else. Climbing to the nearest EXISTING
        # ancestor (round-6 review #1) walked arbitrary unrelated trees
        # (worst case '/') whenever the prefix's parent didn't exist
        # yet, e.g. is_dir() on a fresh not-yet-created work_dir.
        root = prefix.rstrip("/") if prefix.endswith("/") else os.path.dirname(prefix)
        if not os.path.isdir(root):
            return
        for dirpath, _dirs, files in os.walk(root):
            for f in sorted(files):
                if f.endswith((".put-tmp", ".cas-lock")):
                    continue  # incomplete PUTs / server lock internals
                    # never appear in LIST
                k = os.path.join(dirpath, f)
                if k.startswith(prefix):
                    yield k

    def _get(self, key: str) -> bytes | None:
        try:
            with open(key, "rb") as fh:
                return fh.read()
        except (FileNotFoundError, IsADirectoryError, NotADirectoryError):
            return None

    def _head(self, key: str) -> int | None:
        import os

        try:
            return os.path.getsize(key) if os.path.isfile(key) else None
        except OSError:
            return None

    def _put(self, key: str, data: bytes) -> None:
        """The store's atomic whole-object PUT. The emulation must be
        FAITHFUL to that atomicity (round-6 review #2.1): truncate-in-
        place would let a crash mid-write leave a torn object — a real
        S3 PUT can't — wedging resume on a truncated meta JSON. The
        tmp+rename here is the emulated store's SERVER internals (below
        the primitive line), not the compaction algorithm using rename."""
        import os
        import uuid

        os.makedirs(os.path.dirname(key), exist_ok=True)  # local-FS artifact
        # tmp name must be unique PER PUT: two concurrent PUTs to one key
        # sharing `<key>.put-tmp` raced each other's os.replace (one PUT
        # crashed FileNotFoundError — caught by tools/lease_stress.py).
        # A real store serializes concurrent PUTs server-side; unique
        # tmps + atomic rename give last-writer-wins, same as S3.
        tmp = f"{key}.{os.getpid()}-{uuid.uuid4().hex[:8]}.put-tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, key)

    def _delete(self, key: str) -> None:
        import os

        try:
            os.remove(key)
        except FileNotFoundError:
            pass

    @staticmethod
    def _etag(data: bytes | None) -> str | None:
        import hashlib

        return None if data is None else hashlib.md5(data).hexdigest()

    # --- conditional PUT (exposed for tests / concurrent compactors) ---
    def get_etag(self, path: str) -> str | None:
        return self._etag(self._get(path))

    def put_json_if(self, path: str, obj: dict, expected_etag: str | None) -> None:
        import json

        with self._cas_lock(path):
            cur = self._etag(self._get(path))
            if cur != expected_etag:
                raise ConditionFailed(
                    f"conditional PUT on {path}: expected etag "
                    f"{expected_etag}, found {cur}"
                )
            self._put(path, json.dumps(obj).encode())

    # --- LedgerStorage interface ---------------------------------------
    def read_json(self, path: str) -> dict | None:
        import json

        data = self._get(path)
        return None if data is None else json.loads(data)

    def write_json_atomic(self, path: str, obj: dict) -> None:
        """The meta pointer flip as a conditional PUT: read the current
        etag, put-if-match. Readers see old or new JSON (PUT is atomic
        per key); a concurrent flip raises ConditionFailed instead of
        interleaving."""
        self.put_json_if(path, obj, self.get_etag(path))

    def list_dirs(self, pattern: str) -> list[str]:
        # the engine only ever lists '<base>/<stem>*'; LIST(prefix) then
        # derive first-level common prefixes (S3 delimiter-style)
        assert pattern.endswith("*") and "*" not in pattern[:-1], pattern
        prefix = pattern[:-1]
        base = prefix[: prefix.rfind("/") + 1]
        seen = set()
        for k in self._list_keys(prefix):
            rest = k[len(base):]
            if "/" in rest:  # a key UNDER a prefix-directory
                seen.add(base + rest.split("/", 1)[0])
        return sorted(seen)

    def is_dir(self, path: str) -> bool:
        return next(iter(self._list_keys(path.rstrip("/") + "/")), None) is not None

    def is_file(self, path: str) -> bool:
        return self._head(path) is not None

    def delete_tree(self, path: str) -> None:
        for k in list(self._list_keys(path.rstrip("/") + "/")):
            self._delete(k)

    def has_parquet(self, path: str) -> bool:
        return any(
            k.endswith(".parquet")
            for k in self._list_keys(path.rstrip("/") + "/")
        )

    def parquet_bytes_under(self, paths: list[str]) -> int:
        return sum(
            self._head(k) or 0
            for p in paths
            for k in self._list_keys(p.rstrip("/") + "/")
            if k.endswith(".parquet")
        )

    def try_acquire_lease(self, path: str, owner: str, ttl_sec: float) -> bool:
        """True CAS lease: claim an absent lease with a conditional PUT
        expecting etag None; take over a stale one with a conditional
        PUT expecting the STALE content's etag — two takeover racers
        cannot both win (the loser's etag no longer matches), which is
        strictly stronger than the POSIX remove-then-recreate."""
        import time

        cur = self._get(path)
        if cur is not None:
            import json

            try:
                live = json.loads(cur).get("expires", 0) > time.time()
            except ValueError:
                live = False  # torn/garbage lease object: treat as stale
            if live:
                return False
        try:
            self.put_json_if(
                path,
                {"owner": owner, "expires": time.time() + ttl_sec},
                self._etag(cur),
            )
            return True
        except ConditionFailed:
            return False  # raced: someone else claimed or took over first

    def release_lease(self, path: str, owner: str) -> None:
        """Release = conditional-PUT a TOMBSTONE ({released, expires: 0} —
        immediately stale, so the next try_acquire_lease claims it via CAS
        on the tombstone's etag). No trailing DELETE (ADVICE r6): an
        unconditional delete after the CAS opened a window where a racer's
        fresh CAS-acquired lease was destroyed, re-admitting a second
        concurrent winner — exactly what the CAS exists to prevent. The
        single lease key is simply overwritten by every later cycle."""
        cur = self._get(path)
        if cur is None:
            return
        import json

        try:
            obj = json.loads(cur)
        except ValueError:
            return
        if obj.get("owner") != owner or obj.get("released"):
            return  # not ours (takeover happened) / already tombstoned
        try:
            self.put_json_if(
                path,
                {"owner": owner, "released": True, "expires": 0},
                self._etag(cur),
            )
        except ConditionFailed:
            return  # lost a takeover race: not ours to release anymore

    def renew_lease(self, path: str, owner: str, ttl_sec: float) -> bool:
        """Renew as a conditional PUT on the CURRENT record's etag: if a
        usurper (or a release tombstone) replaced the record between our
        read and the PUT, the etag no longer matches and the renew loses
        — it can never resurrect a lost lease over a foreign holder."""
        import json
        import time

        cur = self._get(path)
        if cur is None:
            return False
        try:
            obj = json.loads(cur)
        except ValueError:
            return False  # torn/garbage can't be provably ours
        if obj.get("owner") != owner or obj.get("released"):
            return False
        try:
            self.put_json_if(
                path,
                {"owner": owner, "expires": time.time() + ttl_sec},
                self._etag(cur),
            )
            return True
        except ConditionFailed:
            return False  # raced a takeover: the usurper keeps the lease


def unique_owner(role: str) -> str:
    """Per-process unique lease owner (ADVICE r6: a shared constant voids
    release_lease's owner check between two real processes)."""
    import os
    import socket
    import uuid

    return f"{role}-{socket.gethostname()}-{os.getpid()}-{uuid.uuid4().hex[:8]}"


def acquire_lease_blocking(
    storage: LedgerStorage, path: str, owner: str, ttl_sec: float,
    wait_sec: float,
) -> None:
    """Acquire a storage lease, waiting out a live holder. Waiting
    ``ttl + margin`` outlasts both a live holder that releases on
    completion and a crashed holder whose lease expires into takeover;
    past the deadline, fail LOUDLY — a writer that proceeded without the
    lease would reopen exactly the concurrent-holder race the lease
    exists to close (delta-vs-fold for the streaming ledger,
    commit-vs-overwrite for the batch run)."""
    import time

    deadline = time.monotonic() + wait_sec
    while not storage.try_acquire_lease(path, owner, ttl_sec):
        if time.monotonic() > deadline:
            raise RuntimeError(
                f"could not acquire lease {path} within {wait_sec:.0f}s: "
                f"another holder keeps it past its ttl. If its process is "
                f"dead, the lease expires into takeover at ttl; a longer "
                f"hold means the ttl is undersized for the holder's actual "
                f"work duration."
            )
        time.sleep(0.5)


def verify_lease_still_held(
    storage: LedgerStorage, path: str, owner: str
) -> None:
    """Post-critical-section usurpation check (round-7 review follow-up):
    a holder that outran its ttl is only HARMED if some other holder
    actually claimed the lease while this one was still inside its
    critical section — then the interleave the lease exists to prevent
    may have happened, and releasing silently would bury it. Merely
    expiring with nobody taking over is harmless (the record still
    carries our owner). So: still ours (live or expired) -> fine;
    absent, tombstoned, or another owner -> a foreign holder ran
    concurrently -> fail LOUDLY so the operator re-sizes the ttl and
    audits the affected work instead of trusting a possibly-raced
    output."""
    try:
        cur = storage.read_json(path)
    except (FileNotFoundError, ValueError):
        # vanished between isfile and open (a foreign release's remove —
        # the TOCTOU try_acquire_lease also guards) or torn by a crashed
        # foreign writer: either way, foreign activity -> the loud path
        cur = None
    if cur is None or cur.get("owner") != owner or cur.get("released"):
        raise RuntimeError(
            f"lease {path} was taken over while this holder's critical "
            f"section ran (expected owner {owner}, found "
            f"{cur and cur.get('owner')!r}): the work outran the lease "
            f"ttl and a foreign writer/compactor ran concurrently — its "
            f"output may have raced this holder's reads or writes. "
            f"Increase the ttl above the longest batch and audit this "
            f"batch's output before trusting it."
        )


class Catalog:
    """Format-agnostic read/append/overwrite for the engine's tables."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.iceberg = _iceberg_enabled(spark)

    def _use_iceberg(self, target: str) -> bool:
        return self.iceberg and _is_table_name(target)

    def read(self, target: str) -> DataFrame:
        if self._use_iceberg(target):
            return self.spark.table(target)
        return self.spark.read.parquet(target)

    def append(self, df: DataFrame, target: str, partition_by: list[str] | None = None) -> None:
        if self._use_iceberg(target):
            df.writeTo(target).append()
            return
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)

    def overwrite(self, df: DataFrame, target: str, partition_by: list[str] | None = None) -> None:
        if self._use_iceberg(target):
            w = df.writeTo(target)
            if partition_by:
                # keep the format-agnostic contract: the Iceberg table must
                # be partitioned like the Parquet layout would be
                from pyspark.sql.functions import col

                w = w.partitionedBy(*[col(c) for c in partition_by])
            w.createOrReplace()
            return
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)

    def exists(self, target: str) -> bool:
        if self._use_iceberg(target):
            return self.spark.catalog.tableExists(target)
        jvm = self.spark.sparkContext._jvm
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(target)
        return path.getFileSystem(hconf).exists(path)
