"""Pure-policy tests for bench.py's certified-run selection (round-7
verdict next #1): the committed BENCH_rN.json must be a certified
(contended=False) run whenever the session produced one, and the
fallback must pick the least-contended attempt — without ever
cherry-picking among certified runs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import pick_result


def _run(attempt, contended, pre, post, mid=None):
    r = {
        "run_attempt": attempt,
        "contended": contended,
        "cpu_quota_probe": {"eff_2_to_8": pre},
        "cpu_quota_probe_post": {"eff_2_to_8": post},
    }
    if mid is not None:
        r["cpu_quota_probe_mid"] = {"eff_2_to_8": mid}
    return r


def test_first_certified_run_wins():
    # attempt 2 certifies; attempt 3 would too but must NOT be reached
    # for cherry-picking — FIRST certified is the artifact.
    runs = [
        _run(1, True, 0.97, 0.84),
        _run(2, False, 0.98, 1.01),
        _run(3, False, 0.99, 1.02),
    ]
    assert pick_result(runs)["run_attempt"] == 2


def test_all_contended_picks_least_contended():
    # min(pre, post) is the contention score: 0.84, 0.92, 0.88 -> run 2.
    runs = [
        _run(1, True, 0.97, 0.84),
        _run(2, True, 0.92, 0.96),
        _run(3, True, 0.88, 0.95),
    ]
    assert pick_result(runs)["run_attempt"] == 2


def test_single_run_passthrough():
    runs = [_run(1, True, 0.5, 0.5)]
    assert pick_result(runs)["run_attempt"] == 1


def test_mid_probe_counts_toward_contention_score():
    # run 1 has quiet endpoints but a noisy MIDDLE (the round-7 failure
    # mode: a concurrent burst ended before the post probe); run 2 is
    # uniformly mildly contended but its worst probe beats run 1's mid.
    runs = [
        _run(1, True, 1.02, 1.02, mid=0.70),
        _run(2, True, 0.93, 0.94, mid=0.95),
    ]
    assert pick_result(runs)["run_attempt"] == 2


def test_query_canary_median_and_disengage():
    """Round-7 cont.: the canary is the MEDIAN per-query slowdown vs the
    quiet-window reference — robust to any single query legitimately
    changing, moved only by a uniformly slow window — and silently
    disengages (None) when there is no comparable reference."""
    from bench import query_canary

    ref = {f"q{i}": 1.0 for i in range(10)}
    same = {f"q{i}": 1.0 for i in range(10)}
    assert query_canary(same, ref) == 1.0
    # one query 10x slower (a legitimate change): median unmoved
    one_slow = dict(same, q3=10.0)
    assert query_canary(one_slow, ref) == 1.0
    # uniformly 3x slower: median flags
    uniform = {k: 3.0 for k in ref}
    assert query_canary(uniform, ref) == 3.0
    # disengage: too few common keys / zero reference times
    assert query_canary({"a": 1.0}, ref) is None
    assert query_canary(same, {f"q{i}": 0.0 for i in range(10)}) is None


def test_load_reference_gates_on_sf_and_certification(tmp_path, monkeypatch):
    import json

    import bench

    ref_path = str(tmp_path / "ref.json")
    monkeypatch.setattr(bench, "REFERENCE_JSON", ref_path)
    assert bench.load_reference(0.1) is None  # absent: disengaged
    body = {"sf": 0.1, "contended": False,
            "queries": {"q1": 1.0}, "redaction": {"sec_high": 9.0}}
    with open(ref_path, "w") as fh:
        json.dump(body, fh)
    got = bench.load_reference(0.1)
    assert got == {"queries": {"q1": 1.0}, "sec_high": 9.0}
    assert bench.load_reference(0.01) is None  # other sf: ratios = volume
    body["contended"] = True  # a flagged reference must never be the bar
    with open(ref_path, "w") as fh:
        json.dump(body, fh)
    assert bench.load_reference(0.1) is None
