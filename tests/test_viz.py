"""Smoke tests for the visualization/dump tooling (C23 analog)."""

import os
import tempfile

import numpy as np

from pre3_tpu.eval.viz import export_ply, plot_slam_stats, plot_trajectory


def test_plot_trajectory_writes_png():
    t = np.cumsum(np.random.default_rng(0).normal(size=(20, 3)), axis=0)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "traj.png")
        plot_trajectory(p, t, gt_t=t + 0.01)
        assert os.path.getsize(p) > 1000


def test_plot_stats_writes_png():
    class S:
        n_ic = np.arange(10)
        n_li = np.arange(10)
        n_hi = np.zeros(10)
        n_active = np.full(10, 32)
        n_visible = np.full(10, 30)
        vo_inliers = np.arange(10) * 3
        vo_ok = np.ones(10, bool)

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "stats.png")
        plot_slam_stats(p, S())
        assert os.path.getsize(p) > 1000


def test_export_ply():
    pts = np.random.default_rng(1).normal(size=(50, 3)).astype(np.float32)
    cols = np.random.default_rng(2).uniform(size=(50, 3))
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "map.ply")
        export_ply(p, pts, cols)
        lines = open(p).read().splitlines()
    assert lines[0] == "ply"
    assert "element vertex 50" in lines[2]
    assert len(lines) == 50 + 10  # header lines + points
