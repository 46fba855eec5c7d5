"""Unit tests for the scaling-bench measurement harness (no Spark session).

The scaling gate's credibility rests on the harness emulating an N-core
executor faithfully: each child must be CPU-pinned to exactly N cores
(`local[N]` bounds task slots only — JVM service threads and Python workers
otherwise borrow idle host cores at small N), and the ceiling probes must
run under the same mask. These tests pin that contract without launching
Spark, so they stay cheap and can never perturb a timing window themselves.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_child_argv_is_taskset_pinned(monkeypatch):
    """The child subprocess tree must run under `taskset -c 0..N-1`."""
    captured = {}

    class FakeOut:
        stdout = (
            'RESULT:{"cores": 8, "sec": 1.0, "docs": 10, "docs_per_sec": 10.0,'
            ' "clusters": 5, "repeats": 2, "warmup_reps": 1, "stages": {}}'
        )
        stderr = ""

    def fake_run(argv, **kw):
        captured["argv"] = argv
        return FakeOut()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "SCALING_PIN_CPUS", True)
    monkeypatch.setattr(bench.shutil, "which", lambda _: "/usr/bin/taskset")
    res = bench._scaling_child(8)
    assert captured["argv"][:3] == ["taskset", "-c", "0-7"]
    assert res["pinned"] is True


def test_child_unpinned_when_disabled(monkeypatch):
    """SCALING_PIN_CPUS=0 must fall back to an unpinned child, recorded."""
    captured = {}

    class FakeOut:
        stdout = (
            'RESULT:{"cores": 2, "sec": 1.0, "docs": 10, "docs_per_sec": 10.0,'
            ' "clusters": 5, "repeats": 2, "warmup_reps": 1, "stages": {}}'
        )
        stderr = ""

    def fake_run(argv, **kw):
        captured["argv"] = argv
        return FakeOut()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "SCALING_PIN_CPUS", False)
    res = bench._scaling_child(2)
    assert captured["argv"][0] != "taskset"
    assert res["pinned"] is False


@pytest.mark.skipif(
    not hasattr(os, "sched_getaffinity"), reason="no sched affinity API"
)
def test_probe_initializer_matches_child_mask(monkeypatch):
    """The ceiling-probe pool workers restrict to the same {0..N-1} mask the
    pinned job child runs under, so ceilings are measured at matched
    affinity (probe and job see the same cores)."""
    monkeypatch.setattr(bench, "SCALING_PIN_CPUS", True)
    before = os.sched_getaffinity(0)
    try:
        bench._pin_to(2)
        assert os.sched_getaffinity(0) == {0, 1}
    finally:
        os.sched_setaffinity(0, before)
