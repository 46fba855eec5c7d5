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


def test_parse_repeats_single_and_per_level():
    assert bench._parse_repeats("3") == {2: 3, 8: 3, 32: 3}
    assert bench._parse_repeats("1,2,3") == {2: 1, 8: 2, 32: 3}
    with pytest.raises(ValueError):
        bench._parse_repeats("1,2")


def test_prior_samples_filters_unpinned_and_garbage(tmp_path):
    p = tmp_path / "samples.jsonl"
    p.write_text(
        '{"cores": 2, "pinned": true, "sec": 9.0}\n'
        '{"cores": 8, "pinned": false, "sec": 1.0}\n'  # unpinned: excluded
        "not json at all\n"  # corrupt line: skipped
        '{"pinned": true, "sec": 1.0}\n'  # no cores: excluded
        '{"cores": 32, "pinned": true, "sec": 2.0}\n'
    )
    out = bench._prior_samples(str(p))
    assert [d["cores"] for d in out] == [2, 32]
    assert bench._prior_samples(str(tmp_path / "missing.jsonl")) == []


def test_seed_gate_refs_takes_best_grant_per_level():
    """The gate reference must be the best per-proc grant from ANY recorded
    source — bracketing probe, gate telemetry, or stage-boundary probes —
    so a run whose every window at one level is degraded cannot gate
    itself against its own collapse (observed in r05 run2 at local[32])."""
    prior = [
        {"cores": 8, "pinned": True, "alu_rate": 8e8},  # 1e8/proc
        {
            "cores": 8,
            "pinned": True,
            "alu_rate": 4e8,  # 0.5e8/proc
            "gate_best_perproc_rate": 1.5e8,
            "stage_probes": {"start": {"alu": 24e8}, "verify": {"alu": 8e8}},
        },  # stage probe start: 3e8/proc — the best evidence
        {"cores": 2, "pinned": True, "alu_rate": 7e8},  # 3.5e8/proc
    ]
    refs = bench._seed_gate_refs(prior)
    assert refs[8] == pytest.approx(3e8)
    assert refs[2] == pytest.approx(3.5e8)
    assert 32 not in refs


def test_run_scaling_report_renders_with_fake_children(tmp_path, monkeypatch):
    """End-to-end smoke of run_scaling with stubbed children and probes:
    the markdown template renders only AFTER hours of measurement, so a
    rendering bug must be catchable without a real run. Also pins the
    cross-run merge: a prior pinned+probed sample at the same corpus
    joins the best-window pool; a faster prior window wins the headline."""
    import json as _json

    (tmp_path / "BENCH").mkdir()
    probes = {
        k: {"alu": 1e9, "dram": 3e4}
        for k in ("start", "features", "candidates", "verify", "exact_cc_winners")
    }
    stages = {"features": 4.0, "candidates": 1.0, "verify": 2.0, "exact_cc_winners": 1.0}
    corpus_files = bench._corpus_file_count(bench.SCALING_CORPUS_DOCS)
    prior = {
        "cores": 8,
        "pinned": True,
        "sec": 7.0,  # faster than the fresh local[8] window below
        "docs": 100,
        "docs_per_sec": 100 / 7.0,
        "clusters": 60,
        "alu_rate": 8e8,
        "dram_rate": 2e4,
        "stages": dict(stages),
        "stage_probes": probes,
        "corpus_files": corpus_files,
        "engine": bench.SCALING_ENGINE_TAG,
    }
    # a sample from the pre-multi-file corpus layout (no corpus_files key):
    # physically a different job (serial one-row-group scans), must NOT join
    # the pool even though it is pinned + probed and would win on sec
    stale = dict(prior, sec=1.0, docs_per_sec=100.0)
    stale.pop("corpus_files")
    # a sample measured on a DIFFERENT engine version (pre-tag sample, no
    # engine key): a best-window ratio across engine versions measures the
    # code delta, not scaling — must NOT join the pool either
    old_engine = dict(prior, sec=0.5, docs_per_sec=200.0)
    old_engine.pop("engine")
    with open(tmp_path / "BENCH" / "scaling_samples.jsonl", "w") as f:
        f.write(_json.dumps(prior) + "\n")
        f.write(_json.dumps(stale) + "\n")
        f.write(_json.dumps(old_engine) + "\n")

    def fake_child(cores, repeats=1, warmup=1):
        return {
            "cores": cores,
            "sec": 80.0 / cores,
            "docs": 100,
            "docs_per_sec": 100 / (80.0 / cores),
            "clusters": 60,
            "repeats": repeats,
            "warmup_reps": warmup,
            "warmup_docs": 10,
            "stages": {s: v * 8 / cores for s, v in stages.items()},
            "stage_probes": probes,
            "pinned": True,
        }

    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    monkeypatch.setattr(bench, "_ensure_bench_corpus", lambda n=None: "unused")
    monkeypatch.setattr(bench, "_scaling_child", fake_child)
    monkeypatch.setattr(bench, "_alu_rate", lambda n: n * 1e8)
    monkeypatch.setattr(bench, "_dram_rate", lambda n: n * 1e4)
    monkeypatch.setattr(bench, "SCALING_GATE", 0.85)
    monkeypatch.setattr(bench, "SCALING_GATE_WAIT", 0.0)
    monkeypatch.setattr(bench, "SCALING_MERGE_SAMPLES", True)
    report = bench.run_scaling(rounds=1)
    # fresh local[8] window is 10.0s; the prior probed sample's 7.0s wins
    assert report["local8"]["sec"] == 7.0
    assert report["merged_prior_samples"] == 1
    assert report["best_window_pool_per_level"] == {2: 1, 8: 2, 32: 1}
    # raw JSON and markdown both landed
    assert (tmp_path / "BENCH" / "scaling_last_run.json").exists()
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "Best-window pool per level" in md
    assert "1 prior pinned, stage-probed sample(s)" in md
    # contemporaneous table rendered for every stage
    for s in stages:
        assert f"| {s} |" in md


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


def test_parse_levels_subset_and_empty():
    assert bench._parse_levels("2,8,32") == (2, 8, 32)
    assert bench._parse_levels("8") == (8,)
    assert bench._parse_levels("") == ()
    with pytest.raises(ValueError):
        bench._parse_levels("2,16")


def _seed_pool(tmp_path, corpus_files):
    """A pool with one pinned+probed sample per level at the current
    corpus layout (grants scale per-proc so windows are 'matched')."""
    import json as _json

    (tmp_path / "BENCH").mkdir()
    stages = {
        "features": 4.0,
        "candidates": 1.0,
        "verify": 2.0,
        "exact_cc_winners": 1.0,
    }
    with open(tmp_path / "BENCH" / "scaling_samples.jsonl", "w") as f:
        for cores, sec in ((2, 40.0), (8, 12.5), (32, 8.0)):
            probes = {
                k: {"alu": cores * 1e8, "dram": cores * 1e4}
                for k in ("start", *stages)
            }
            f.write(
                _json.dumps(
                    {
                        "cores": cores,
                        "pinned": True,
                        "sec": sec,
                        "docs": 100,
                        "docs_per_sec": 100 / sec,
                        "clusters": 60,
                        "alu_rate": cores * 1e8,
                        "dram_rate": cores * 1e4,
                        "stages": {s: v * 2 / cores for s, v in stages.items()},
                        "stage_probes": probes,
                        "corpus_files": corpus_files,
                        "engine": bench.SCALING_ENGINE_TAG,
                    }
                )
                + "\n"
            )
    return stages


def test_run_scaling_single_level_draws_rest_from_pool(tmp_path, monkeypatch):
    """SCALING_LEVELS=8 must launch only the local[8] child and fill the
    other levels' best windows from the cross-run pool, so a
    budget-constrained run can spend every window on the gate's numerator."""
    corpus_files = bench._corpus_file_count(bench.SCALING_CORPUS_DOCS)
    stages = _seed_pool(tmp_path, corpus_files)
    launched = []

    def fake_child(cores, repeats=1, warmup=1):
        launched.append(cores)
        probes = {
            k: {"alu": cores * 1e8, "dram": cores * 1e4}
            for k in ("start", *stages)
        }
        return {
            "cores": cores,
            "sec": 10.0,
            "docs": 100,
            "docs_per_sec": 10.0,
            "clusters": 60,
            "repeats": repeats,
            "warmup_reps": warmup,
            "warmup_docs": 10,
            "stages": {s: v * 2 / cores for s, v in stages.items()},
            "stage_probes": probes,
            "pinned": True,
        }

    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    monkeypatch.setattr(bench, "_ensure_bench_corpus", lambda n=None: "unused")
    monkeypatch.setattr(bench, "_scaling_child", fake_child)
    monkeypatch.setattr(bench, "_alu_rate", lambda n: n * 1e8)
    monkeypatch.setattr(bench, "_dram_rate", lambda n: n * 1e4)
    monkeypatch.setattr(bench, "SCALING_GATE", 0.85)
    monkeypatch.setattr(bench, "SCALING_GATE_WAIT", 0.0)
    monkeypatch.setattr(bench, "SCALING_MERGE_SAMPLES", True)
    monkeypatch.setattr(bench, "SCALING_LEVELS", (8,))
    report = bench.run_scaling(rounds=1)
    assert launched == [8]
    # local[2]/local[32] headline rows came from the pool
    assert report["local2"]["sec"] == 40.0
    assert report["local32"]["sec"] == 8.0
    # local[8] pools this run's 10.0s window with the prior 12.5s; min wins
    assert report["local8"]["sec"] == 10.0
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "pair not sampled this invocation" in md


def test_run_scaling_report_only_from_pool(tmp_path, monkeypatch):
    """SCALING_LEVELS='' regenerates BASELINE.md purely from the pool,
    launching no children, and reports the matched-window figure."""
    corpus_files = bench._corpus_file_count(bench.SCALING_CORPUS_DOCS)
    _seed_pool(tmp_path, corpus_files)

    def boom(*a, **kw):
        raise AssertionError("report-only run must not launch children")

    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    monkeypatch.setattr(bench, "_ensure_bench_corpus", lambda n=None: "unused")
    monkeypatch.setattr(bench, "_scaling_child", boom)
    monkeypatch.setattr(bench, "_alu_rate", lambda n: n * 1e8)
    monkeypatch.setattr(bench, "_dram_rate", lambda n: n * 1e4)
    monkeypatch.setattr(bench, "SCALING_GATE", 0.85)
    monkeypatch.setattr(bench, "SCALING_MERGE_SAMPLES", True)
    monkeypatch.setattr(bench, "SCALING_LEVELS", ())
    report = bench.run_scaling(rounds=1)
    assert report["best_window_pool_per_level"] == {2: 1, 8: 1, 32: 1}
    # matched-window pairs: pool grants are per-proc-equal by construction
    m = report["matched_window_eff_2to8"]
    assert m is not None
    # eff = (100/12.5) / (4 * (100/40)) = 0.8
    assert m["eff"] == 0.8
    assert m["grant_match"] == 1.0
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "Matched-window pairs (supplementary)" in md
