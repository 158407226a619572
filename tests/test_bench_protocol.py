"""The bench driver's child result-line protocol.

bench.py runs every chip phase in a bounded child process and parses one
result line from its stdout (the remote TPU worker can wedge; a hung phase
must cost one field, not the round's artifact). These tests pin the
coupling between the __main__ printers' formats and the parser regexes —
a drift there silently drops a measured result — and the structured
per-phase failure statuses recorded into the final JSON (VERDICT r3
weak #4: a missing number must be diagnosable from the artifact alone).
"""
import re
import subprocess
import sys

import bench


def test_pbd_result_roundtrip():
    # median-of-5 + spread (VERDICT r3 weak #7: ±10% trial noise must be
    # visible in the artifact)
    line = f"PBD_RESULT block {712.34:.2f} {55.10:.2f}"
    g = re.search(bench.PBD_RE, line).groups()
    assert g[0] == "block" and float(g[1]) == 712.34 and float(g[2]) == 55.10
    line = f"PBD_RESULT batch4 {1523.0:.2f} {12.00:.2f}"
    assert float(re.search(bench.PBD_RE, line).group(2)) == 1523.0


def test_gnn_result_roundtrip():
    steps, fps = 13551.27, 4.21e11
    line = f"GNN_RESULT slotmm bf16 {steps:.2f} {fps:.6g}"
    g = re.search(bench.GNN_RE, line).groups()
    assert float(g[0]) == steps
    assert abs(float(g[1]) - fps) / fps < 1e-5


def test_gnn_result_nan_flops():
    # cost_analysis() can fail on some backends; the child then prints nan
    line = f"GNN_RESULT matmul f32 {9000.5:.2f} {float('nan'):.6g}"
    g = re.search(bench.GNN_RE, line).groups()
    assert float(g[0]) == 9000.5
    assert float(g[1]) != float(g[1])  # NaN


def test_mppi_result_roundtrip():
    line = f"MPPI_RESULT {48123.77:.2f}"
    assert float(re.search(bench.MPPI_RE, line).group(1)) == 48123.77


def test_result_lines_survive_surrounding_noise():
    noisy = ("WARNING: Platform 'axon' is experimental\n"
             "PBD_RESULT dense 505.10 21.30\ntrailing logs\n")
    assert float(re.search(bench.PBD_RE, noisy).group(2)) == 505.10


def test_child_status_timeout(monkeypatch):
    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=k["timeout"])

    monkeypatch.setattr(subprocess, "run", fake_run)
    g, status = bench._child(["--mppi", "slotmm", "bf16"], bench.MPPI_RE,
                             timeout_s=1)
    assert g is None and status == "timeout"


class _Res:
    def __init__(self, rc, out="", err=""):
        self.returncode, self.stdout, self.stderr = rc, out, err


def test_child_status_oom(monkeypatch):
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Res(
        1, err="jaxlib ... RESOURCE_EXHAUSTED: Out of memory allocating"))
    g, status = bench._child(["--mppi", "x", "y"], bench.MPPI_RE)
    assert g is None and status == "oom"


def test_child_status_parse_and_rc(monkeypatch):
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _Res(0, out="no result line here"))
    assert bench._child(["--gnn", "m", "f32"], bench.GNN_RE)[1] == "parse"
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Res(3))
    assert bench._child(["--gnn", "m", "f32"], bench.GNN_RE)[1] == "rc=3"


def test_child_status_ok(monkeypatch):
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Res(
        0, out="PBD_RESULT block 800.00 40.00\n"))
    g, status = bench._child(["--pbd-mode", "block"], bench.PBD_RE)
    assert status == "ok" and float(g[1]) == 800.0 and float(g[2]) == 40.0


def test_malformed_flag_exits_nonzero_without_bench():
    # ADVICE r3 #3: 'python bench.py --gnn slotmm' (missing dtype) must
    # error out, never fall through to the full multi-child TPU run
    r = subprocess.run([sys.executable, "/root/repo/bench.py", "--gnn",
                        "slotmm"], capture_output=True, text=True, timeout=60)
    assert r.returncode == 2
    assert "usage error" in r.stderr


# --- round-5 budget armor (BENCH_r04 post-mortem: driver timeout killed the
# run after 7 healthy phases and the single end-of-run print lost every
# number). These pin: internal deadline skipping, the guaranteed-emission
# SIGTERM path, and the per-phase partial persistence. ---------------------

import copy
import json
import signal
import time

import pytest


@pytest.fixture
def fresh_res(monkeypatch, tmp_path):
    """Isolated RES accumulator + partial path + un-printed state."""
    saved = copy.deepcopy(bench.RES)
    bench.RES.clear()
    bench.RES.update({
        "pbd_by_mode": {}, "pbd_spread": {}, "pbd_batch": None,
        "gnn_by_mode": {}, "gnn_batches": {}, "mppi": None,
        "phases": {}, "backend": None, "aborted": False,
    })
    monkeypatch.setattr(bench, "_PRINTED", False)
    monkeypatch.setattr(bench, "PARTIAL_PATH",
                        str(tmp_path / "bench_partial.json"))
    yield bench.RES
    bench.RES.clear()
    bench.RES.update(saved)


def test_deadline_exhausted_skips_all_phases(fresh_res, monkeypatch, capsys):
    # clock exhausted before main(): every phase must be skipped_budget and
    # a parsable summary line must still print — no child may launch
    monkeypatch.setattr(bench, "_T0", time.time() - bench.DEADLINE_S - 1)

    def boom(*a, **k):
        raise AssertionError("child launched past deadline")

    monkeypatch.setattr(bench, "_pbd_variant_subprocess", boom)
    monkeypatch.setattr(bench, "_gnn_subprocess", boom)
    monkeypatch.setattr(bench, "_mppi_subprocess", boom)
    monkeypatch.setattr(bench, "_backend_reachable", lambda *a, **k: "cpu")
    bench.main("cpu")
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["vs_baseline"] == 0.0
    assert all(v == "skipped_budget" for v in summary["phases"].values())
    assert not summary["aborted_early"]


def test_headline_phases_run_first_and_caps_respected(fresh_res, monkeypatch,
                                                      capsys):
    monkeypatch.setattr(bench, "_T0", time.time())
    calls = []

    def fake_pbd(mode, timeout_s=900):
        calls.append(("pbd", mode, timeout_s))
        return (1400.0, 20.0), "ok"

    def fake_gnn(agg, dtype, timeout_s=900, batch=512):
        calls.append(("gnn", agg, dtype, batch, timeout_s))
        return (50000.0, 1e12), "ok"

    def fake_mppi(agg, dtype, timeout_s=900):
        calls.append(("mppi", agg, dtype, timeout_s))
        return 1200.0, "ok"

    monkeypatch.setattr(bench, "_pbd_variant_subprocess", fake_pbd)
    monkeypatch.setattr(bench, "_gnn_subprocess", fake_gnn)
    monkeypatch.setattr(bench, "_mppi_subprocess", fake_mppi)
    bench.main("tpu")
    # headline-first: pbd block, gnn slotmm bf16, mppi — before any extra
    assert calls[0][:2] == ("pbd", "block")
    assert calls[1][:3] == ("gnn", "slotmm", "bf16")
    assert calls[2][0] == "mppi"
    assert all(c[-1] <= bench.DEADLINE_S for c in calls)  # caps <= budget
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["pbd_steps_per_s"] == 1400.0
    assert summary["mppi_samples_per_s"] == 1200.0
    assert summary["phases"]["pbd_block"] == "ok"
    # partial persisted on disk too
    disk = json.load(open(bench.PARTIAL_PATH))
    assert disk["pbd_steps_per_s"] == 1400.0


def test_sigterm_prints_best_known_summary_once(fresh_res, capsys):
    bench.RES["_started"] = True
    bench.RES["backend"] = "tpu"
    bench.RES["pbd_by_mode"]["block"] = 1450.0
    bench.RES["pbd_spread"]["block"] = 10.0
    bench.RES["phases"]["pbd_block"] = "ok"
    with pytest.raises(SystemExit) as e:
        bench._on_term(signal.SIGTERM, None)
    assert e.value.code == 128 + signal.SIGTERM
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["pbd_steps_per_s"] == 1450.0
    assert summary["phases"]["_killed"] == f"signal={int(signal.SIGTERM)}"
    # idempotent: a second trigger (atexit after the handler) stays silent
    bench._print_summary()
    assert capsys.readouterr().out == ""


def test_summary_not_printed_before_start(fresh_res, capsys):
    # the backend-unreachable path prints its own error JSON; the atexit
    # summary printer must not add a second (all-zero) line after it
    bench._print_summary()
    assert capsys.readouterr().out == ""
