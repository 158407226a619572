"""The bench driver's child result-line protocol.

bench.py runs every chip phase in a bounded child process and parses one
result line from its stdout (the remote TPU worker can wedge; a hung phase
must cost one field, not the round's artifact). These tests pin the
coupling between the __main__ printers' formats and the parser regexes —
a drift there silently drops a measured result.
"""
import re

import bench


def test_pbd_result_roundtrip():
    line = f"PBD_RESULT block {712.34:.2f}"
    g = re.search(bench.PBD_RE, line).groups()
    assert g[0] == "block" and float(g[1]) == 712.34
    line = f"PBD_RESULT batch4 {1523.0:.2f}"
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
             "PBD_RESULT dense 505.10\ntrailing logs\n")
    assert float(re.search(bench.PBD_RE, noisy).group(2)) == 505.10
