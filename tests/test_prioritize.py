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
    # c failed latest -> repair FIRST (a red row that stays red is worse
    # than a new id waiting a round — round-6 cap lesson); x never
    # checked -> head; greens oldest first: a (r1) before b (r2)
    assert got == ["c", "x", "a", "b"]


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


def test_recertify_list_preempts_even_never_checked(tmp_path):
    """An id on the re-certify list whose newest driver row is at or
    before its stale round must lead the queue — ahead of never-checked
    ids — and must drop back to ordinary green rotation once a newer
    driver row lands (self-clearing)."""
    em = _make_entry(
        tmp_path,
        {
            "CORRECTNESS_r2.json": {"stream_tumble": _row_ok(), "b": _row_ok()},
        },
    )
    d = {"x": 9, "stream_tumble": 1, "b": 2}
    got = list(em._prioritized(d))
    assert got == ["stream_tumble", "x", "b"]

    em2 = _make_entry(
        tmp_path,
        {
            "CORRECTNESS_r2.json": {"stream_tumble": _row_ok(), "b": _row_ok()},
            "CORRECTNESS_r5.json": {"stream_tumble": _row_ok()},
        },
    )
    got2 = list(em2._prioritized(d))
    # cleared: b (r2) now rotates ahead of stream_tumble (r5)
    assert got2 == ["x", "b", "stream_tumble"]
