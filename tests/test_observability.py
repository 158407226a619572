"""Profiling/metrics/timestamp utility tests."""

import os
import time

import numpy as np

from adaptigraph_tpu.utils.profiling import MetricsLogger, Timer, plot_loss_curves
from adaptigraph_tpu.planning.real_world.timestamp import (
    TimestampAccumulator, align_obs)


class TestTimer:
    def test_accumulates_and_reports(self):
        t = Timer()
        for _ in range(3):
            with t("stage_a"):
                time.sleep(0.01)
        rep = t.report()
        assert "stage_a" in rep and t.count["stage_a"] == 3
        assert t.total["stage_a"] >= 0.03


class TestMetrics:
    def test_jsonl_roundtrip(self, tmp_path):
        m = MetricsLogger(str(tmp_path / "metrics.jsonl"))
        m.log(0, loss=1.5)
        m.log(1, loss=1.2, lr=1e-3)
        recs = m.read()
        assert len(recs) == 2 and recs[1]["lr"] == 1e-3

    def test_loss_plot(self, tmp_path):
        out = str(tmp_path / "loss.png")
        plot_loss_curves([3.0, 2.0, 1.0], [2.5, 2.2, 1.4], out)
        assert os.path.getsize(out) > 1000


class TestTimestamps:
    def test_accumulator_fills_ticks(self):
        acc = TimestampAccumulator(start_time=0.0, dt=0.1)
        acc.put([0.05, 0.15, 0.42], [10, 11, 12])
        ts, idx = acc.get()
        assert len(acc) == 5  # ticks 0..4 covered
        assert idx[0] == 10 and idx[1] == 11 and idx[4] == 12

    def test_align_obs_common_ticks(self):
        streams = {
            "cam_0": (np.array([0.0, 0.1, 0.2, 0.3]), np.array([0, 1, 2, 3])),
            "cam_1": (np.array([0.01, 0.12, 0.19]), np.array([0, 1, 2])),
        }
        aligned = align_obs(streams, dt=0.1)
        assert set(aligned) == {"cam_0", "cam_1"}
        n = len(aligned["cam_0"])
        assert n == len(aligned["cam_1"]) and n >= 2
