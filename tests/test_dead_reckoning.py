"""End-to-end VO dead-reckoning regression on a synthetic sequence.

The sequence-level analog of Test_RANSAC_dead_reckoning.m, with a real
oracle: the synthetic renderer's ground-truth trajectory. This is the
BASELINE config-#1 pipeline (frontend → match → RANSAC → pose chaining).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.data.synthetic import render_sequence
from pre3_tpu.eval.trajectory import ate_rmse, rpe_translation
from pre3_tpu.frontend.pipeline import extract_features
from pre3_tpu.vo.dead_reckoning import run_sequence, vo_pair
from pre3_tpu.geometry.quaternion import q2r


def _stack_features(frames, max_features=192):
    feats = [
        extract_features(
            jnp.asarray(f.intensity),
            jnp.asarray(f.xyz),
            jnp.asarray(f.confidence),
            threshold=0.05,
            max_features=max_features,
        )
        for f in frames
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *feats)


def test_vo_pair_recovers_gt_delta():
    frames, traj, scene = render_sequence(n_frames=2, n_points=300, noise=0.004)
    feats = _stack_features(frames)
    f1 = jax.tree.map(lambda x: x[0], feats)
    f2 = jax.tree.map(lambda x: x[1], feats)
    step = vo_pair(f1, f2, jax.random.PRNGKey(0), batch=512)
    assert bool(step.ok)
    # GT delta: R_d = R1ᵀ R2, t_d = R1ᵀ (t2 − t1)
    r1, r2 = traj.r[0], traj.r[1]
    rd = r1.T @ r2
    td = r1.T @ (traj.t[1] - traj.t[0])
    np.testing.assert_allclose(np.asarray(q2r(step.delta.q)), rd, atol=0.01)
    np.testing.assert_allclose(np.asarray(step.delta.t), td, atol=0.02)


def test_sequence_ate_within_bound():
    frames, traj, scene = render_sequence(n_frames=15, n_points=300, noise=0.004)
    feats = _stack_features(frames)
    out = run_sequence(feats, jax.random.PRNGKey(1), batch=512)
    assert bool(np.all(np.asarray(out.ok[1:]))), "VO failed on some pair"
    est = np.asarray(out.t)
    # trajectory is expressed relative to frame 0, as is GT after offset
    gt = traj.t - traj.t[0]
    gt = gt @ traj.r[0]  # world → frame-0 camera coords: R0ᵀ·(t−t0)
    ate = ate_rmse(est, gt, align=False)
    rpe = rpe_translation(est, gt)
    # per-step GT motion is ~2-4 cm; demand cm-level dead reckoning
    assert ate < 0.05, f"ATE {ate:.3f} m too large"
    assert rpe < 0.02, f"RPE {rpe:.3f} m too large"


def test_failure_keeps_previous_pose():
    """Blank frames produce no features → identity motion, ok=False
    (Test_RANSAC_dead_reckoning.m:36-41 failure semantics)."""
    frames, traj, scene = render_sequence(n_frames=3, n_points=250, noise=0.004)
    feats = _stack_features(frames)
    # invalidate all features of frame 1
    feats = feats._replace(
        valid=feats.valid.at[1].set(False)
    )
    out = run_sequence(feats, jax.random.PRNGKey(2), batch=256)
    assert not bool(out.ok[1])
    np.testing.assert_allclose(out.t[1], out.t[0])
