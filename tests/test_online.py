"""Online streaming driver tests: pipelined processing, stage timing,
snapshot/resume determinism (the mono_slam.m online loop + DataSnapshots
resume tier, runtime/online.py)."""

import jax
import numpy as np
import pytest

from pre3_tpu.data.synthetic import render_sequence
from pre3_tpu.ekf.slam import SlamConfig
from pre3_tpu.eval.trajectory import ate_rmse
from pre3_tpu.geometry.camera import sr4000_camera
from pre3_tpu.runtime.online import OnlineSlam

CAM = sr4000_camera()
EXTRACT = {"threshold": 0.05, "max_features": 128}


@pytest.fixture(scope="module")
def seq():
    return render_sequence(n_frames=7, n_points=300, noise=0.004)


@pytest.mark.slow
def test_online_tracks_sequence(seq):
    frames, traj, _ = seq
    slam = OnlineSlam(
        CAM, cfg=SlamConfig(match_ratio=1.3), n_landmarks=32,
        extractor_kwargs=EXTRACT, key=jax.random.PRNGKey(1),
    )
    slam.run(frames, prefetch=2)
    ts, _ = slam.trajectory
    gt = (traj.t - traj.t[0]) @ traj.r[0]
    ate = ate_rmse(ts, gt, align=False)
    assert ate < 0.08, f"online ATE {ate:.3f}"
    summ = slam.timer.summary()
    assert summ["dispatch"]["count"] == len(frames)
    assert summ["decode_wait"]["count"] == len(frames)


@pytest.mark.slow
def test_online_snapshot_resume_deterministic(seq, tmp_path):
    frames, _, _ = seq
    cfg = SlamConfig(match_ratio=1.3)
    a = OnlineSlam(
        CAM, cfg=cfg, n_landmarks=32, extractor_kwargs=EXTRACT,
        key=jax.random.PRNGKey(3), snapshot_dir=str(tmp_path),
        snapshot_every=4,
    )
    a.run(frames)
    ts_a, qs_a = a.trajectory

    b = OnlineSlam(
        CAM, cfg=cfg, n_landmarks=32, extractor_kwargs=EXTRACT,
    )
    b.resume(str(tmp_path / "snapshot_00004.npz"))
    f_prev = frames[b.step_i - 1]
    b.prime(f_prev.intensity, f_prev.xyz, f_prev.confidence)
    for f in frames[b.step_i:]:
        b.process(f.intensity, f.xyz, f.confidence)
    ts_b, qs_b = b.trajectory

    np.testing.assert_allclose(ts_b, ts_a[4:], atol=1e-5)
    np.testing.assert_allclose(qs_b, qs_a[4:], atol=1e-5)


@pytest.mark.slow
def test_online_chunked_matches_quality(seq):
    """Chunked streaming (process_chunk) tracks the sequence as well as
    per-frame streaming; one dispatch per chunk."""
    frames, traj, _ = seq
    slam = OnlineSlam(
        CAM, cfg=SlamConfig(match_ratio=1.3), n_landmarks=32,
        extractor_kwargs=EXTRACT, key=jax.random.PRNGKey(1),
    )
    slam.run(frames, chunk=3)
    ts, _ = slam.trajectory
    assert len(ts) == len(frames)
    gt = (traj.t - traj.t[0]) @ traj.r[0]
    ate = ate_rmse(ts, gt, align=False)
    assert ate < 0.08, f"chunked online ATE {ate:.3f}"
    assert [r.step for r in slam.results] == list(range(len(frames)))
    # sliding-window smoother consumes the streamed records
    sm_t, sm_q = slam.smooth(window=6, max_keyframes=6, iters=5)
    assert sm_t.shape == ts.shape and sm_q.shape == (len(frames), 4)
    ate_sm = ate_rmse(sm_t, gt, align=False)
    assert ate_sm < ate + 0.02, f"smoothed ATE {ate_sm:.3f} vs {ate:.3f}"
    # frames before the window are untouched
    np.testing.assert_array_equal(sm_t[0], ts[0])
