"""bench.py budget machinery (round 5): the harness must degrade
gracefully under a wall budget — skips recorded loudly, the committed
scaling report protected from reduced runs, and the SIGTERM snapshot
always carrying the newest complete result. Pure-Python tests (no
Spark): the end-to-end path is exercised by the bench CLI itself."""

import json

import bench


def test_budget_allows_within_and_records_skips():
    b = bench.Budget(10_000)
    assert b.allow("stage a", 60)
    assert b.skipped == []
    tight = bench.Budget(5)
    assert not tight.allow("stage b", 60)
    assert len(tight.skipped) == 1 and "stage b" in tight.skipped[0]
    # denial message carries the estimate vs remaining evidence
    assert "est 60s" in tight.skipped[0]


def test_budget_reserve_holds_back_wall_for_later_phases():
    # scaling extras must leave the suite its reserve: a stage that fits
    # the raw remaining but not remaining-minus-reserve is denied, and
    # the denial records the reserve it respected
    b = bench.Budget(500)
    assert b.allow("cheap extra", 50, reserve=400)
    assert not b.allow("greedy extra", 200, reserve=400)
    assert "reserve 400s" in b.skipped[-1]
    # the suite itself asks with no reserve and still fits
    assert b.allow("suite core", 400)


def test_scaling_report_guard_refuses_reduced_runs(tmp_path, monkeypatch):
    # reduced-size, fewer-than-3-trial, and controls-skipped runs must
    # not overwrite evidence, and the refusal is recorded in the dict
    # itself (ADVICE r4: loud).  A budget-trimmed 2-pair driver run
    # clobbered the committed 3-pair+controls report once in round 5 —
    # hence trials >= 3 and the control-kernel requirement.
    for bad in (
        {"edges": 100, "trials": 3, "control_efficiency_2_8": 0.8},
        {"edges": 10**9, "trials": 1, "control_efficiency_2_8": 0.8},
        {"edges": 10**9, "trials": 2, "control_efficiency_2_8": 0.8},
        {"edges": 10**9, "trials": 3},  # control kernels budget-skipped
    ):
        bench.write_scaling_report(bad)
        assert bad["report_written"] is False
        assert "does not overwrite" in bad["report_skip_reason"]


def test_scaling_report_threshold_tracks_default_probe_size():
    # ADVICE r4: the guard threshold must derive from the default probe
    # size, not a hardcoded constant
    edges_default = bench.DEFAULT_SCALE_N * bench.DEFAULT_OUT_DEGREE
    ok = {"edges": int(0.76 * edges_default), "trials": 3,
          "control_efficiency_2_8": 0.8}
    bad = {"edges": int(0.5 * edges_default), "trials": 3,
           "control_efficiency_2_8": 0.8}
    bench.write_scaling_report(bad)
    assert bad["report_written"] is False
    # the passing path would write BENCH/BASELINE.md — verify only the
    # guard decision, not the write, by checking the threshold math
    assert ok["edges"] >= int(0.75 * edges_default)


def test_sigterm_snapshot_merges_suite_and_scaling():
    bench._set_snapshot(
        {"metric": "graph_suite_wall_seconds", "value": 1.0, "partial": True})
    snap = dict(bench._LATEST_SNAPSHOT)
    assert snap["metric"] == "graph_suite_wall_seconds"
    # snapshot is JSON-serializable at every point (the handler prints it)
    json.dumps(snap)


def test_pinned_leg_falls_back_without_taskset(monkeypatch):
    # no taskset on the host -> None, so scaling_run uses the in-process
    # path instead of crashing
    import shutil

    monkeypatch.setattr(shutil, "which", lambda name: None)
    assert bench.pinned_leg(2) is None


def test_pinned_leg_parses_last_json_line(monkeypatch):
    # the leg subprocess may emit log noise on stdout before its JSON
    # line (py4j warnings); the parser must take the LAST JSON line and
    # never leak child stdout into the parent's stdout contract
    import shutil
    import subprocess

    monkeypatch.setattr(shutil, "which", lambda name: "/usr/bin/taskset")
    captured = {}

    class FakeProc:
        returncode = 0
        stdout = 'WARN noise\n{"cores": 2, "eps": 1.5, "edges": 10}\n'
        stderr = ""

    def fake_run(cmd, capture_output, text):
        captured["cmd"] = cmd
        assert capture_output and text
        return FakeProc()

    monkeypatch.setattr(subprocess, "run", fake_run)
    leg = bench.pinned_leg(2, n=1000, parts=8)
    assert leg == {"cores": 2, "eps": 1.5, "edges": 10}
    # the command pins to exactly the leg's cores
    assert captured["cmd"][:3] == ["taskset", "-c", "0-1"]
    assert "--control" not in captured["cmd"]
    ctl = bench.pinned_leg(8, control=True)
    assert "--control" in captured["cmd"]
    assert captured["cmd"][2] == "0-7"
    assert ctl["cores"] == 2  # fake payload passthrough


def test_pinned_leg_failure_returns_none(monkeypatch):
    import shutil
    import subprocess

    monkeypatch.setattr(shutil, "which", lambda name: "/usr/bin/taskset")

    class FailProc:
        returncode = 1
        stdout = ""
        stderr = "boom"

    monkeypatch.setattr(
        subprocess, "run", lambda cmd, capture_output, text: FailProc())
    assert bench.pinned_leg(2) is None
