"""Sequence-level EKF-SLAM regression (the mono_slam.m pipeline end to
end) on synthetic ground truth — BASELINE configs #2/#3."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pre3_tpu.data.synthetic import render_sequence
from pre3_tpu.eval.trajectory import ate_rmse
from pre3_tpu.frontend.pipeline import extract_features, extract_features_sift
from pre3_tpu.ekf.slam import SlamConfig, run_slam
from pre3_tpu.geometry.camera import sr4000_camera

CAM = sr4000_camera()


def _stack(feats):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *feats)


@pytest.mark.slow
def test_slam_sift_sequence():
    frames, traj, scene = render_sequence(n_frames=8, n_points=300,
                                          noise=0.004)
    feats = _stack([
        extract_features_sift(
            jnp.asarray(f.intensity), jnp.asarray(f.xyz),
            jnp.asarray(f.confidence), keypoints_per_octave=48,
        )
        for f in frames
    ])
    out = run_slam(CAM, feats, jax.random.PRNGKey(0), n_landmarks=32)
    gt = (traj.t - traj.t[0]) @ traj.r[0]
    ate = ate_rmse(np.asarray(out.t), gt, align=False)
    assert ate < 0.05, f"SLAM ATE {ate:.3f} m"
    s = out.stats
    assert np.asarray(s.vo_ok).all()
    assert np.asarray(s.n_li).mean() > 8
    # the map stays populated
    assert int(np.asarray(s.n_active)[-1]) > 15


@pytest.mark.slow
def test_slam_fast_frontend_sequence():
    """BASELINE config #2: FAST frontend + EKF."""
    frames, traj, scene = render_sequence(n_frames=7, n_points=300,
                                          noise=0.004)
    feats = _stack([
        extract_features(
            jnp.asarray(f.intensity), jnp.asarray(f.xyz),
            jnp.asarray(f.confidence), threshold=0.05, max_features=128,
        )
        for f in frames
    ])
    out = run_slam(CAM, feats, jax.random.PRNGKey(1), n_landmarks=32,
                   cfg=SlamConfig(match_ratio=1.3))
    gt = (traj.t - traj.t[0]) @ traj.r[0]
    ate = ate_rmse(np.asarray(out.t), gt, align=False)
    assert ate < 0.05, f"SLAM(FAST) ATE {ate:.3f} m"


@pytest.mark.slow
def test_slam_ncc_warp_matcher_sequence():
    """Config #2 with the warped-patch NCC measurement path
    (matching.m / pred_patch_fc.m analog, ekf/ncc_matching.py): the map is
    matched by correlating warped init patches against the raw image —
    no descriptor refresh, FEATURE_EXTRACTOR='FAST' mode of the reference."""
    frames, traj, scene = render_sequence(n_frames=7, n_points=300,
                                          noise=0.004)
    feats = _stack([
        extract_features(
            jnp.asarray(f.intensity), jnp.asarray(f.xyz),
            jnp.asarray(f.confidence), threshold=0.05, max_features=128,
        )
        for f in frames
    ])
    images = jnp.stack([jnp.asarray(f.intensity) for f in frames])
    xyz_imgs = jnp.stack(
        [jnp.asarray(np.nan_to_num(f.xyz)) for f in frames]
    )
    out = run_slam(
        CAM, feats, jax.random.PRNGKey(2), n_landmarks=32,
        cfg=SlamConfig(matcher="ncc_warp"),
        images=images, xyz_imgs=xyz_imgs,
    )
    gt = (traj.t - traj.t[0]) @ traj.r[0]
    ate = ate_rmse(np.asarray(out.t), gt, align=False)
    assert ate < 0.08, f"SLAM(NCC) ATE {ate:.3f} m"
    s = out.stats
    assert np.asarray(s.n_li).mean() > 5
