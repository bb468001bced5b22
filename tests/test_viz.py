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


def test_summarize_stats_and_report():
    from pre3_tpu.eval.stats import stats_report, summarize_stats

    class S:
        n_ic = np.array([10, 12, 8, 0])
        n_li = np.array([8, 9, 6, 0])
        n_hi = np.array([1, 1, 0, 0])
        n_active = np.array([30, 31, 32, 32])
        n_visible = np.array([28, 30, 29, 27])
        vo_inliers = np.array([40, 42, 38, 44])
        vo_ok = np.array([True, True, True, False])

    s = summarize_stats(S())
    assert s["steps"] == 4
    assert s["ic_matches_min"] == 0
    assert abs(s["vo_ok_rate"] - 0.75) < 1e-9
    assert s["steps_without_update"] == 1
    assert s["map_size_final"] == 32
    rep = stats_report(S())
    assert "vo_ok_rate" in rep and "inlier_ratio_mean" in rep


def test_plot_feature_performance():
    from pre3_tpu.eval.viz import plot_feature_performance
    from pre3_tpu.utils.replay import FeaturePerformance

    rng = np.random.default_rng(0)
    tp = rng.integers(1, 30, 20)
    tm = (tp * rng.uniform(0.3, 1.0, 20)).astype(int)
    perf = FeaturePerformance(
        slot=np.arange(20), times_predicted=tp, times_measured=tm,
        track_ratio=tm / np.maximum(tp, 1), age=rng.integers(0, 25, 20),
        is_inverse_depth=rng.uniform(size=20) > 0.5,
    )
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "perf.png")
        plot_feature_performance(p, perf)
        assert os.path.getsize(p) > 1000
