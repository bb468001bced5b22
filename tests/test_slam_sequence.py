"""Sequence-level EKF-SLAM regression (the mono_slam.m pipeline end to
end) on synthetic ground truth — BASELINE configs #2/#3, plus the
EST_METHOD=PURE_EKF and ONLY_PREDICT modes of config_file.m."""

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


@pytest.fixture(scope="module")
def seq7():
    """One shared 7-frame scene for every FAST-frontend sequence test."""
    return render_sequence(n_frames=7, n_points=300, noise=0.004)


@pytest.fixture(scope="module")
def fast_feats(seq7):
    frames, _, _ = seq7
    return _stack([
        extract_features(
            jnp.asarray(f.intensity), jnp.asarray(f.xyz),
            jnp.asarray(f.confidence), threshold=0.05, max_features=128,
        )
        for f in frames
    ])


def _gt(traj):
    return (traj.t - traj.t[0]) @ traj.r[0]


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
    ate = ate_rmse(np.asarray(out.t), _gt(traj), align=False)
    assert ate < 0.05, f"SLAM ATE {ate:.3f} m"
    s = out.stats
    assert np.asarray(s.vo_ok).all()
    assert np.asarray(s.n_li).mean() > 8
    # the map stays populated
    assert int(np.asarray(s.n_active)[-1]) > 15


@pytest.mark.slow
def test_slam_fast_frontend_sequence(seq7, fast_feats):
    """BASELINE config #2: FAST frontend + EKF."""
    _, traj, _ = seq7
    out = run_slam(CAM, fast_feats, jax.random.PRNGKey(1), n_landmarks=32,
                   cfg=SlamConfig(match_ratio=1.3))
    ate = ate_rmse(np.asarray(out.t), _gt(traj), align=False)
    assert ate < 0.05, f"SLAM(FAST) ATE {ate:.3f} m"


@pytest.mark.slow
def test_slam_pure_ekf_sequence(seq7, fast_feats):
    """EST_METHOD=PURE_EKF (ekf_update_all.m:27-62): one Kalman update on
    ALL individually-compatible matches, no 1-point RANSAC gating. On
    clean synthetic data (no mismatches to gate out) it must track as
    well as the gated path."""
    _, traj, _ = seq7
    out = run_slam(CAM, fast_feats, jax.random.PRNGKey(1), n_landmarks=32,
                   cfg=SlamConfig(match_ratio=1.3, est_method="pure_ekf"))
    ate = ate_rmse(np.asarray(out.t), _gt(traj), align=False)
    assert ate < 0.05, f"SLAM(pure_ekf) ATE {ate:.3f} m"
    s = out.stats
    # all IC matches update; nothing is li/hi partitioned away
    assert np.asarray(s.n_ic)[1:].mean() > 5


@pytest.mark.slow
def test_slam_only_predict_sequence(seq7, fast_feats):
    """ONLY_PREDICT flag (config_file.m FLAG.ONLY_PREDICT): the filter
    dead-reckons on VO control with no measurement updates. The pose
    must follow VO (finite drift), and the covariance must grow
    monotonically since nothing ever corrects it."""
    _, traj, _ = seq7
    out = run_slam(CAM, fast_feats, jax.random.PRNGKey(1), n_landmarks=32,
                   cfg=SlamConfig(match_ratio=1.3, only_predict=True))
    ate = ate_rmse(np.asarray(out.t), _gt(traj), align=False)
    assert ate < 0.12, f"SLAM(only_predict) ATE {ate:.3f} m"
    s = out.stats
    assert (np.asarray(s.n_li) == 0).all()
    assert (np.asarray(s.n_hi) == 0).all()
    # dead reckoning is strictly worse-or-equal to the updating filter
    out_upd = run_slam(CAM, fast_feats, jax.random.PRNGKey(1),
                       n_landmarks=32, cfg=SlamConfig(match_ratio=1.3))
    ate_upd = ate_rmse(np.asarray(out_upd.t), _gt(traj), align=False)
    assert ate >= ate_upd * 0.5, (ate, ate_upd)


@pytest.mark.slow
def test_slam_ncc_warp_matcher_sequence(seq7, fast_feats):
    """Config #2 with the warped-patch NCC measurement path
    (matching.m / pred_patch_fc.m analog, ekf/ncc_matching.py): the map is
    matched by correlating warped init patches against the raw image —
    no descriptor refresh, FEATURE_EXTRACTOR='FAST' mode of the reference.

    ATE gate 0.08 vs the descriptor path's 0.05: NCC measurements are
    quantized to the integer-pixel candidate grid inside the χ² ellipse
    (matching.m:75-97 scans whole pixels; the reference shares this
    limit), while descriptor matching inherits subpixel keypoint
    refinement — so the NCC path carries ~0.5 px extra measurement noise
    by construction and tracks correspondingly looser."""
    frames, traj, _ = seq7
    images = jnp.stack([jnp.asarray(f.intensity) for f in frames])
    xyz_imgs = jnp.stack(
        [jnp.asarray(np.nan_to_num(f.xyz)) for f in frames]
    )
    out = run_slam(
        CAM, fast_feats, jax.random.PRNGKey(2), n_landmarks=32,
        cfg=SlamConfig(matcher="ncc_warp"),
        images=images, xyz_imgs=xyz_imgs,
    )
    ate = ate_rmse(np.asarray(out.t), _gt(traj), align=False)
    assert ate < 0.08, f"SLAM(NCC) ATE {ate:.3f} m"
    s = out.stats
    assert np.asarray(s.n_li).mean() > 5


@pytest.mark.slow
def test_slam_constant_velocity_mode(seq7, fast_feats):
    """motion_model='cv': the pure Civera constant-velocity estimator
    (the reference with MOTION_INPUT off, dfv_by_dxv.m:27-117) — no VO
    at all; v/ω are estimated by the EKF through the correlations the
    cv prediction builds. Tracks the smooth synthetic motion, within a
    looser bound than the odometry-driven filter."""
    _, traj, _ = seq7
    out = run_slam(CAM, fast_feats, jax.random.PRNGKey(1), n_landmarks=32,
                   cfg=SlamConfig(match_ratio=1.3, motion_model="cv"))
    ate = ate_rmse(np.asarray(out.t), _gt(traj), align=False)
    assert ate < 0.12, f"SLAM(cv) ATE {ate:.3f} m"
    s = out.stats
    assert not np.asarray(s.vo_ok).any()  # VO is never run
    assert np.asarray(s.n_li).mean() > 5  # updates still flow


@pytest.mark.slow
def test_slam_cv_fallback_coasts_through_vo_denial():
    """motion_model='odo_cv_fallback' (VERDICT r3 #5): frames whose
    features are blanked deny VO; the fallback coasts on the carried
    v/ω (refreshed from VO per fv.m:47-52) instead of freezing at
    identity. Measured in ONLY_PREDICT mode (pure dead reckoning, the
    motion model IS the estimator) on a constant-velocity trajectory —
    the regime the Civera model is exact for: the identity fallback
    leaves a permanent ~4×6 cm hole, the coast carries straight through
    it. A full-filter run checks boundedness with updates on."""
    from pre3_tpu.data.synthetic import (
        Trajectory, make_scene, render_frame,
    )

    n = 12
    # constant-velocity dolly: 6 cm/frame in +x, identity rotation
    t_gt = np.stack([np.array([0.06 * i, 0.0, 0.0]) for i in range(n)])
    r_gt = np.stack([np.eye(3)] * n).astype(np.float32)
    traj = Trajectory(t=t_gt.astype(np.float32), r=r_gt)
    scene = make_scene(n_points=300, seed=0, x_range=(-1.5, 2.2))
    frames = [
        render_frame(scene, traj.t[i], traj.r[i], timestamp=0.1 * i,
                     noise=0.004, seed=1000 + i)
        for i in range(n)
    ]
    feats = _stack([
        extract_features(
            jnp.asarray(f.intensity), jnp.asarray(f.xyz),
            jnp.asarray(f.confidence), threshold=0.05, max_features=128,
        )
        for f in frames
    ])
    # blank frames 5-7: no valid features → VO denied (steps 5-8: pairs
    # 4→5 … 7→8 all touch a blanked frame), no matches either
    blank = jnp.zeros(n, bool).at[jnp.array([5, 6, 7])].set(True)
    feats = feats._replace(
        valid=jnp.where(blank[:, None], False, feats.valid)
    )
    gt = _gt(traj)

    base = SlamConfig(match_ratio=1.3, only_predict=True)
    out_id = run_slam(CAM, feats, jax.random.PRNGKey(1), n_landmarks=32,
                      cfg=base)
    out_cv = run_slam(
        CAM, feats, jax.random.PRNGKey(1), n_landmarks=32,
        cfg=base._replace(motion_model="odo_cv_fallback",
                          std_a=3.0, std_alpha=2.0),
    )
    s = out_cv.stats
    assert not np.asarray(s.vo_ok)[jnp.array([4, 5, 6, 7])].any()
    ate_cv = ate_rmse(np.asarray(out_cv.t), gt, align=False)
    ate_id = ate_rmse(np.asarray(out_id.t), gt, align=False)
    # dead reckoning: the coast must clearly beat the frozen-pose hole
    assert ate_cv < 0.5 * ate_id, (ate_cv, ate_id)

    # full filter (updates on): coasting stays bounded
    out_full = run_slam(
        CAM, feats, jax.random.PRNGKey(1), n_landmarks=32,
        cfg=SlamConfig(match_ratio=1.3, motion_model="odo_cv_fallback",
                       std_a=3.0, std_alpha=2.0),
    )
    ate_full = ate_rmse(np.asarray(out_full.t), gt, align=False)
    assert ate_full < 0.08, f"full-filter coast ATE {ate_full:.3f} m"
