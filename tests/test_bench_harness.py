"""Unit pins for the bench harness's measurement policy and the
bench_diff snapshot contract — no SparkSession needed.

The r12 six-sweep series showed that single-family mid-sweep bursts
(dedup_cc_clusters 11.7 s, graph_kcore_peel 13.1 s — ~5× their level
in every other sweep) cost a cross-sweep adjudication because nothing
in the committed snapshot labeled them.  r13 makes the label part of
the snapshot (``burst_suspect``) and the post-probe-failure state
explicit (``box_ref_post_sec: null``); these tests pin both contracts
so a refactor can't silently revert either to the ambiguous form.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_module("bench_module", os.path.join(REPO, "bench.py"))
bench_diff = _load_module(
    "bench_diff_module", os.path.join(REPO, "tools", "bench_diff.py")
)


def _runner(times):
    """Fake run_fn returning the scripted sample sequence."""
    it = iter(times)
    return lambda name: next(it)


def test_measure_min_of_two_agreeing_samples():
    best, spread = bench.measure(_runner([1.0, 1.1]), "q")
    assert best == 1.0 and spread is None


def test_measure_adaptive_third_sample_on_disagreement():
    # samples disagree by >25% -> third sample runs and min-of-3 wins
    best, spread = bench.measure(_runner([2.0, 1.0, 0.9]), "q")
    assert best == 0.9
    # 2.0 / 0.9 = 2.2x spread: contention seen but below the 3x flag
    assert spread is None


def test_measure_flags_burst_beyond_3x():
    best, spread = bench.measure(_runner([5.0, 1.0, 1.05]), "q")
    assert best == 1.0
    assert spread == 5.0  # max/min across this query's own samples


def test_measure_no_burst_flag_below_jitter_floor():
    # sub-50ms minima: scheduler jitter alone explains any ratio
    best, spread = bench.measure(_runner([0.2, 0.01, 0.01]), "q")
    assert best == 0.01 and spread is None


def test_measure_no_third_sample_when_agreeing():
    calls = []

    def run(name):
        calls.append(name)
        return 1.0

    bench.measure(run, "q")
    assert len(calls) == 2


def _write_snapshot(tmp_path, name, payload):
    p = tmp_path / name
    p.write_text(json.dumps(payload) + "\n")
    return str(p)


def test_bench_diff_load_reads_burst_and_null_post(tmp_path, capsys):
    path = _write_snapshot(
        tmp_path,
        "new.json",
        {
            "queries": {"a": 1.0, "b": 4.0},
            "box_ref_sec": 0.5,
            "box_ref_pre_sec": 0.5,
            "box_ref_post_sec": None,  # post probe FAILED, not zero drift
            "burst_suspect": {"b": 4.5},
        },
    )
    q, ref, burst = bench_diff._load(path)
    out = capsys.readouterr().out
    assert q == {"a": 1.0, "b": 4.0} and ref == 0.5
    assert burst == {"b": 4.5}
    assert "UNMEASURED" in out, "null post probe must not read as zero drift"


def test_bench_diff_load_old_snapshots_without_new_fields(tmp_path, capsys):
    # pre-r12 snapshots carry neither probe ends nor burst flags: no
    # warning, empty burst set
    path = _write_snapshot(
        tmp_path, "old.json", {"queries": {"a": 1.0}, "box_ref_sec": 0.5}
    )
    q, ref, burst = bench_diff._load(path)
    out = capsys.readouterr().out
    assert q == {"a": 1.0} and ref == 0.5 and burst == {}
    assert "UNMEASURED" not in out and "burst" not in out


def test_bench_diff_annotates_burst_suspect_mover(tmp_path, capsys, monkeypatch):
    old = _write_snapshot(
        tmp_path, "o.json", {"queries": {"a": 1.0, "b": 2.0}, "box_ref_sec": 0.5}
    )
    new = _write_snapshot(
        tmp_path,
        "n.json",
        {
            "queries": {"a": 1.05, "b": 9.0},
            "box_ref_sec": 0.5,
            "burst_suspect": {"b": 4.5},
        },
    )
    monkeypatch.setattr(sys, "argv", ["bench_diff.py", old, new])
    bench_diff.main()
    out = capsys.readouterr().out
    # the 4.5x mover is printed AND labeled with its sweep's burst flag
    assert "b: 2.00s -> 9.00s" in out
    assert "burst-suspect in NEW sweep (4.5x spread)" in out
    # the quiet query is not flagged as a mover
    assert "a: 1.00s" not in out
