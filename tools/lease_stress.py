"""Multi-PROCESS stress worker for the storage lease protocol.

The round-7 model sweep (tests/test_catalog.py) checks the lease's
logical invariant single-threaded; this worker checks the
IMPLEMENTATION's atomicity across real processes — the deployment shape
(two drivers on one out_dir) that verify-drive flow 10 exercises once,
hammered thousands of times with adversarial timing:

* N processes spin on ``try_acquire_lease`` for one lease path;
* a winner marks a token file with ``owner|expires``, holds the lease
  for a few ms (far under the ttl), verifies the token is STILL its own
  (another tag = two concurrent winners), clears it, and releases;
* with probability ``crash_prob`` a winner skips release entirely —
  the simulated crashed holder — so the stale-takeover path (the race
  window found by the round-7 review: remove-then-recreate on POSIX,
  read-etag-then-CAS on the object store) is exercised every ttl.

Violations are judged TTL-AWARE so scheduler stalls cannot flag
spuriously (a worker descheduled past the ttl mid-hold is legally
usurpable — the protocol's documented contract, not a bug): a found
live token only counts as ENTER-OVERLAP while its embedded expiry is
still comfortably in the future, a holder only writes/clears the token
and grades TOKEN-STOLEN while its own ttl is comfortably unexpired
(an overrunning holder goes silent, exactly like a crash), and a 50ms
guard band absorbs the skew between the storage's expiry stamp and the
worker's local estimate.

Any mutual-exclusion violation is appended to a shared violations file
(O_APPEND, one line per sighting). The paired test asserts the file
stays empty. Run standalone:

    python tools/lease_stress.py posix /tmp/l.lease /tmp/tok /tmp/viol 3.0
"""

from __future__ import annotations

import os
import random
import sys
import time


def _log_violation(violations_path: str, msg: str) -> None:
    fd = os.open(violations_path, os.O_WRONLY | os.O_CREAT | os.O_APPEND)
    try:
        os.write(fd, (msg + "\n").encode())
    finally:
        os.close(fd)


def _read_token(token_path: str) -> bytes:
    try:
        with open(token_path, "rb") as fh:
            return fh.read()
    except FileNotFoundError:
        return b""


def _write_token(token_path: str, data: bytes) -> None:
    tmp = f"{token_path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, token_path)


def run_worker(
    backend: str,
    lease_path: str,
    token_path: str,
    violations_path: str,
    duration_sec: float,
    ttl_sec: float = 0.3,
    crash_prob: float = 0.4,
    seed: int | None = None,
) -> int:
    """Returns the number of successful acquisitions (for liveness
    assertions — a protocol that deadlocks scores 0)."""
    from pdfredact_spark.catalog import LedgerStorage, ObjectStoreLedgerStorage

    storage = LedgerStorage() if backend == "posix" else ObjectStoreLedgerStorage()
    rng = random.Random(seed if seed is not None else os.getpid())
    pid = os.getpid()
    wins = 0
    deadline = time.monotonic() + duration_sec
    i = 0
    while time.monotonic() < deadline:
        i += 1
        owner = f"w{pid}-{i}"
        t_claim = time.time()  # BEFORE acquire: conservative expiry base
        if not storage.try_acquire_lease(lease_path, owner, ttl_sec):
            time.sleep(rng.uniform(0, 0.002))
            continue
        wins += 1
        # my_expires UNDER-estimates the storage's stamp (sampled before
        # the acquire call), so "I am provably live" below is
        # conservative — a stall inside acquire can never inflate it.
        my_expires = t_claim + ttl_sec
        GUARD = 0.05  # absorbs storage-vs-local expiry stamp skew
        # --- inside the (claimed) critical section -------------------
        # Token protocol: EVERY mutation (mark AND clear) embeds its
        # writer's expiry estimate, so a grader can always distinguish a
        # live counterparty (true double-admission) from the late write
        # of an overrunning, legally-usurped holder (scheduling artifact
        # the lease contract explicitly excludes). A violation is logged
        # ONLY when both sides are provably inside their ttls: the
        # grader by its own conservative clock, the counterparty by the
        # expiry embedded in the token it wrote.
        def foreign_live(token: bytes, now: float) -> bool:
            try:
                kind, exp = token.rsplit(b"|", 1)
                return now < float(exp) - GUARD and not kind.startswith(
                    b"cleared-"
                )
            except (IndexError, ValueError):
                return False  # unparseable = can't prove liveness

        prev = _read_token(token_path)
        now0 = time.time()  # sampled AFTER the read: provably-then state
        if prev and foreign_live(prev, now0):
            # previous holder provably inside its ttl AND inside its
            # critical section when we entered: true double-admission
            _log_violation(
                violations_path,
                f"ENTER-OVERLAP {owner} found live token {prev!r}",
            )
        tag = f"{owner}|{my_expires}".encode()
        if time.time() < my_expires - GUARD:
            _write_token(token_path, tag)
            time.sleep(rng.uniform(0.001, 0.004))  # hold << ttl
            if rng.random() < 0.5 and hasattr(storage, "renew_lease"):
                # renew mid-hold (round-7 cont.): run_resumable's
                # run-long-hold primitive, stressed under the same
                # adversarial timing. Two gradeable outcomes:
                # * success -> extend my_expires (conservative base
                #   sampled BEFORE the call) and hold longer under the
                #   extension — later checks grade against the new ttl;
                # * denial while PROVABLY live -> violation: a foreign
                #   takeover/tombstone displaced an unexpired lease
                #   (renew itself never clobbers, so denial is the only
                #   side observable here).
                # A third of renewers first OVERRUN the ttl on purpose
                # (sleep past expiry, inviting a real takeover) — a
                # correct renew is then denied and the worker goes
                # silent (not provably live), while a broken renew that
                # skips the owner/etag check RESURRECTS over the usurper
                # and re-enters with a fresh gradeable expiry, lighting
                # up ENTER-OVERLAP/TOKEN-STOLEN on both sides (sabotage
                # validation, journal round-7 cont.: 0 violations before
                # this branch existed, because ms-scale holds never
                # outran the ttl naturally).
                if rng.random() < 0.33:
                    time.sleep(ttl_sec * 1.2)
                t_renew = time.time()
                renewed = storage.renew_lease(lease_path, owner, ttl_sec)
                now_r = time.time()
                if renewed:
                    my_expires = t_renew + ttl_sec
                    tag = f"{owner}|{my_expires}".encode()
                    if time.time() < my_expires - GUARD:
                        _write_token(token_path, tag)
                    time.sleep(rng.uniform(0.001, 0.004))
                elif now_r < my_expires - GUARD:
                    _log_violation(
                        violations_path,
                        f"RENEW-DENIED {owner} live until {my_expires}",
                    )
            cur = _read_token(token_path)
            now1 = time.time()  # AFTER the read (a stall between a
            # pre-read sample and the read could grade a legal
            # post-expiry takeover with a stale "I was live" timestamp)
            if (
                cur != tag
                and now1 < my_expires - GUARD  # I am provably live...
                and foreign_live(cur, now1)  # ...and so is the writer
            ):
                _log_violation(
                    violations_path,
                    f"TOKEN-STOLEN {owner} wrote {tag!r} read back {cur!r}",
                )
            if time.time() < my_expires - GUARD:
                _write_token(
                    token_path, f"cleared-{owner}|{my_expires}".encode()
                )
        # an overrunning holder touches nothing further (like a crash);
        # its possible late writes carry a stale embedded expiry, so no
        # grader counts them; release itself is owner-checked so a late
        # release cannot clobber a usurper.
        # --------------------------------------------------------------
        if rng.random() < crash_prob:
            continue  # simulated crash: never release; expiry -> takeover
        storage.release_lease(lease_path, owner)
    return wins


def main(argv: list[str]) -> None:
    backend, lease_path, token_path, violations_path, duration = argv[:5]
    kwargs = {}
    if len(argv) > 5:
        kwargs["ttl_sec"] = float(argv[5])
    if len(argv) > 6:
        kwargs["crash_prob"] = float(argv[6])
    wins = run_worker(
        backend, lease_path, token_path, violations_path, float(duration),
        **kwargs,
    )
    print(wins)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main(sys.argv[1:])
