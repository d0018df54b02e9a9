#!/usr/bin/env python3
"""Tests for refresh_bench_ref.py's merge policy — especially the
testdata-generation binding (VERDICT r18 #4): an anchor whose
sf_fingerprint differs from the sweep's must NOT min-merge (its floors
measure different bytes); it enters the sweep wholesale.

Run: python3 tools/test_refresh_bench_ref.py
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import refresh_bench_ref as tool  # noqa: E402


def run(full, ref, argv_extra=()):
    d = tempfile.mkdtemp(prefix="graft-refresh-test-")
    full_p = os.path.join(d, "BENCH_full.json")
    ref_p = os.path.join(d, "BENCH_ref.local32.json")
    json.dump(full, open(full_p, "w"))
    if ref is not None:
        json.dump(ref, open(ref_p, "w"))
    rc = tool.main([full_p, ref_p, *argv_extra])
    out = json.load(open(ref_p)) if os.path.exists(ref_p) else None
    return rc, out


BASE_FULL = {
    "cpus": "32", "ts": "t", "calib_before_sec": 0.70,
    "calib_after_sec": 0.70, "calib_ref": 0.68,
    "queries_min": {"q_a": 2.0, "q_b": 1.0},
}


def test_min_merge_same_fingerprint():
    full = dict(BASE_FULL, sf_fingerprint="fp1")
    ref = {"queries_min": {"q_a": 1.5, "q_b": 3.0}, "cpus": "32",
           "sf_fingerprint": "fp1"}
    rc, out = run(full, ref)
    assert rc == 0
    # min-merge: q_a keeps the anchor floor, q_b ratchets down
    assert out["queries_min"] == {"q_a": 1.5, "q_b": 1.0}
    assert out["sf_fingerprint"] == "fp1"


def test_fingerprint_mismatch_enters_wholesale():
    full = dict(BASE_FULL, sf_fingerprint="fp2")
    ref = {"queries_min": {"q_a": 0.1, "q_b": 0.1}, "cpus": "32",
           "sf_fingerprint": "fp1"}
    rc, out = run(full, ref)
    assert rc == 0
    # regenerated data: old floors (measured on fp1 bytes) discarded —
    # sweep values enter wholesale, ratchet guard inapplicable
    assert out["queries_min"] == {"q_a": 2.0, "q_b": 1.0}
    assert out["sf_fingerprint"] == "fp2"


def test_missing_stamp_warns_but_merges():
    full = dict(BASE_FULL)  # no sf_fingerprint (pre-r19 sweep)
    ref = {"queries_min": {"q_a": 1.5, "q_b": 3.0}, "cpus": "32"}
    rc, out = run(full, ref)
    assert rc == 0
    assert out["queries_min"] == {"q_a": 1.5, "q_b": 1.0}
    assert "sf_fingerprint" not in out


def test_unstamped_sweep_preserves_anchor_fingerprint():
    full = dict(BASE_FULL)  # pre-r19 sweep, no stamp
    ref = {"queries_min": {"q_a": 1.5, "q_b": 3.0}, "cpus": "32",
           "sf_fingerprint": "fp1"}
    rc, out = run(full, ref)
    assert rc == 0
    # the binding survives: the next stamped sweep can still detect a
    # regeneration against fp1
    assert out["sf_fingerprint"] == "fp1"


def test_ratchet_guard_still_holds_3x_improvements():
    full = dict(BASE_FULL, sf_fingerprint="fp1",
                queries_min={"q_a": 0.1, "q_b": 1.0})
    ref = {"queries_min": {"q_a": 1.5, "q_b": 3.0}, "cpus": "32",
           "sf_fingerprint": "fp1"}
    rc, out = run(full, ref)
    assert rc == 0
    assert out["queries_min"]["q_a"] == 1.5  # held (>3x, same data)


def test_contended_sweep_refused():
    full = dict(BASE_FULL, sf_fingerprint="fp1", calib_after_sec=1.2)
    ref = {"queries_min": {"q_a": 1.5}, "cpus": "32",
           "sf_fingerprint": "fp1"}
    rc, out = run(full, ref)
    assert rc == 1
    assert out["queries_min"] == {"q_a": 1.5}  # untouched


def test_cross_config_refused():
    full = dict(BASE_FULL, sf_fingerprint="fp1")
    ref = {"queries_min": {"q_a": 1.5}, "cpus": "4", "sf_fingerprint": "fp1"}
    rc, out = run(full, ref)
    assert rc == 1


if __name__ == "__main__":
    fns = [v for k, v in sorted(globals().items()) if k.startswith("test_")]
    for fn in fns:
        fn()
        print(f"PASS {fn.__name__}")
    print(f"{len(fns)} passed")
