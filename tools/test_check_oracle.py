#!/usr/bin/env python3
"""Unit tests for check_oracle's canonicalization (ADVICE r5 item 2).

Run: python3 tools/test_check_oracle.py

The edge these pin down: cells that COMPARE equal but CANONICALIZE
differently (-0.0 vs 0.0). pandas sort_values orders them arbitrarily
(stable mergesort preserves engine-dependent input order), so frame_sig
must sort the canonical lines — otherwise the positional compare flips on
input order alone.
"""
import math
import sys

import pandas as pd

sys.path.insert(0, __import__("os").path.dirname(__file__))
import check_oracle  # noqa: E402


def test_neg_zero_input_order_invariant():
    # same logical frame, opposite input orders: -0.0 == 0.0 under the raw
    # sort, so only canonical-line sorting makes the signatures equal
    a = pd.DataFrame({"k": [1, 1], "v": [-0.0, 0.0]})
    b = pd.DataFrame({"k": [1, 1], "v": [0.0, -0.0]})
    assert check_oracle.frame_sig(a) == check_oracle.frame_sig(b), \
        "-0.0/0.0 signature depends on input order"
    cols, lines = check_oracle.frame_sig(a)
    assert lines == sorted(lines), "lines not canonically sorted"
    # both values survive distinctly (a FAIL on -0.0 vs 0.0 divergence must
    # still be detectable when only one side produces the negative zero)
    assert any("\x1f-0.0" in ln for ln in lines)
    assert any("\x1f0.0" in ln for ln in lines)


def test_neg_zero_divergence_still_detected():
    # canonical sorting must NOT mask a real mismatch: a frame with -0.0
    # differs from one with only 0.0
    a = pd.DataFrame({"v": [-0.0]})
    b = pd.DataFrame({"v": [0.0]})
    assert check_oracle.frame_sig(a) != check_oracle.frame_sig(b)


def test_nan_and_null_canon():
    assert check_oracle.canon(float("nan")) == "NaN"
    assert check_oracle.canon(None) == "NULL"
    assert math.isnan(float("nan"))  # sanity


def test_plain_frame_roundtrip():
    a = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    cols, lines = check_oracle.frame_sig(a)
    assert cols == ["a", "b"]
    assert lines == ["x\x1f1", "y\x1f2"]


if __name__ == "__main__":
    fails = 0
    for name, fn in sorted(globals().items()):
        if name.startswith("test_"):
            try:
                fn()
                print(f"PASS  {name}")
            except AssertionError as e:
                print(f"FAIL  {name}: {e}")
                fails += 1
    sys.exit(1 if fails else 0)
