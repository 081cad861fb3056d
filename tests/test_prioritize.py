"""Unit tests for the driver-queue ordering in __spark_entry__:
never-checked first, then latest-check failures, then stable greens
least-recently-certified first — with NUMERIC round ordering (r10 after
r9, not between r1 and r2)."""

from __future__ import annotations

import importlib
import json
import os
import sys


def _make_entry(tmp_path, files: dict[str, dict]):
    """Load a fresh __spark_entry__ whose _HERE points at tmp_path."""
    for name, payload in files.items():
        with open(os.path.join(tmp_path, name), "w") as f:
            json.dump(payload, f)
    mod = importlib.import_module("__spark_entry__")
    mod = importlib.reload(mod)
    mod._HERE = str(tmp_path)
    return mod


def _row_ok():
    return {"err": None, "rows_match": True, "hash_match": True}


def _row_fail():
    return {"err": None, "rows_match": True, "hash_match": False}


def test_ordering_new_then_failed_then_oldest_green(tmp_path):
    em = _make_entry(
        tmp_path,
        {
            "CORRECTNESS_r1.json": {"a": _row_ok(), "b": _row_ok()},
            "CORRECTNESS_r2.json": {"b": _row_ok(), "c": _row_fail()},
        },
    )
    d = {"c": 3, "x": 9, "a": 1, "b": 2}
    got = list(em._prioritized(d))
    # x never checked -> head; c failed latest -> repair; greens oldest
    # first: a (r1) before b (r2)
    assert got == ["x", "c", "a", "b"]


def test_numeric_round_ordering_beats_lexicographic(tmp_path):
    # lexicographically r10 < r9; numerically r10 is newer. A pass in r10
    # must override a fail in r9, and r10-checked greens must sort AFTER
    # r2-checked greens.
    em = _make_entry(
        tmp_path,
        {
            "CORRECTNESS_r9.json": {"a": _row_fail()},
            "CORRECTNESS_r10.json": {"a": _row_ok()},
            "CORRECTNESS_r2.json": {"b": _row_ok()},
        },
    )
    d = {"a": 1, "b": 2}
    got = list(em._prioritized(d))
    assert got == ["b", "a"]  # both green; b last checked r2 < a's r10
    _, failed = em._driver_status()
    assert failed == set()  # r10 pass overrode the r9 fail


def test_rows_only_counts_as_checked(tmp_path):
    em = _make_entry(
        tmp_path,
        {
            "CORRECTNESS_r1.json": {
                "a": {"err": "no_oracle", "spark_rows": 5},
                "b": {"err": "no_oracle", "spark_rows": None},
            },
        },
    )
    d = {"a": 1, "b": 2}
    got = list(em._prioritized(d))
    # a executed (weak pass); b recorded no row count -> failed -> repair
    assert got == ["b", "a"]


def teardown_module(module):
    # restore the real module state for later test files in this session
    mod = sys.modules.get("__spark_entry__")
    if mod is not None:
        importlib.reload(mod)
