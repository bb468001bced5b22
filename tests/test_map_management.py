"""Behavioral checks of new-feature candidate selection.

The reference initializes features by Gaussian-center-weighted sampling
without replacement (Weighted_Smpl_wo_replacement.m:1-35). The engine's
"weighted" mode realizes that as one Gumbel top-k over log-weights; these
tests pin (a) distributional agreement with a faithful sequential NumPy
sampler, (b) the behavioral difference vs the default top-k mode (center
concentration), and (c) that SLAM still tracks under the weighted mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pre3_tpu.ekf.map_management import weighted_candidate_choice


def _sequential_reference(rng, uv, mask, n_draw, n_cols, n_rows):
    """Faithful port of Weighted_Smpl_wo_replacement.m: mvnpdf weights at
    N(center, diag((W/6)^2, (H/6)^2)), randsample one at a time, zero the
    drawn weight, re-normalize."""
    cx, cy, sx, sy = n_cols / 2, n_rows / 2, n_cols / 6, n_rows / 6
    w = np.exp(
        -0.5 * (((uv[:, 0] - cx) / sx) ** 2 + ((uv[:, 1] - cy) / sy) ** 2)
    )
    w = np.where(mask, w, 0.0)
    out = []
    for _ in range(n_draw):
        if w.sum() <= 0:
            break
        p = w / w.sum()
        i = rng.choice(len(uv), p=p)
        out.append(i)
        w[i] = 0.0
    return out


def test_gumbel_topk_matches_sequential_weighted_sampling():
    """Inclusion frequencies of the Gumbel top-k selection agree with the
    sequential re-normalized sampler (they are the same distribution)."""
    rng = np.random.default_rng(0)
    n, n_draw, trials = 12, 4, 4000
    uv = rng.uniform([5, 5], [170, 140], (n, 2)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[10] = False  # one ineligible candidate must never be drawn

    counts_seq = np.zeros(n)
    for _ in range(trials):
        for i in _sequential_reference(rng, uv, mask, n_draw, 176, 144):
            counts_seq[i] += 1

    uv_j = jnp.asarray(uv)
    mask_j = jnp.asarray(mask)
    choose = jax.jit(
        lambda k: weighted_candidate_choice(
            k, uv_j, mask_j, n_draw, n_cols=176, n_rows=144
        )
    )
    keys = jax.random.split(jax.random.PRNGKey(1), trials)
    counts_gum = np.zeros(n)
    for k in keys:
        idx, ok = choose(k)
        for i in np.asarray(idx)[np.asarray(ok)]:
            counts_gum[i] += 1

    assert counts_gum[10] == 0 and counts_seq[10] == 0
    p_seq = counts_seq / trials  # inclusion probability per candidate
    p_gum = counts_gum / trials
    # binomial std at trials=4000 is <0.008; allow 5 sigma
    np.testing.assert_allclose(p_gum, p_seq, atol=0.04)


def test_weighted_mode_concentrates_near_center():
    """vs score-top-k, weighted sampling picks features closer to the
    image center on average (the reference's stated intent)."""
    rng = np.random.default_rng(2)
    n, n_draw = 64, 8
    uv = rng.uniform([2, 2], [174, 142], (n, 2)).astype(np.float32)
    score = rng.uniform(0.1, 1.0, n).astype(np.float32)
    center = np.array([88.0, 72.0])

    top_idx = np.argsort(-score)[:n_draw]
    d_topk = np.linalg.norm(uv[top_idx] - center, axis=-1).mean()

    keys = jax.random.split(jax.random.PRNGKey(3), 200)
    ds = []
    for k in keys:
        idx, ok = weighted_candidate_choice(
            k, jnp.asarray(uv), jnp.ones(n, bool), n_draw,
            n_cols=176, n_rows=144,
        )
        ds.append(
            np.linalg.norm(np.asarray(uv[np.asarray(idx)]) - center,
                           axis=-1).mean()
        )
    assert np.mean(ds) < d_topk * 0.8


@pytest.mark.slow
def test_slam_tracks_with_weighted_init_sampling():
    from pre3_tpu.data.synthetic import render_sequence
    from pre3_tpu.ekf.slam import SlamConfig, run_slam
    from pre3_tpu.eval.trajectory import ate_rmse
    from pre3_tpu.frontend.pipeline import extract_features_sift
    from pre3_tpu.geometry.camera import sr4000_camera

    cam = sr4000_camera()
    frames, traj, _ = render_sequence(n_frames=8, n_points=400, noise=0.004)
    feats = [
        extract_features_sift(
            jnp.asarray(f.intensity),
            jnp.asarray(np.nan_to_num(f.xyz)),
            jnp.asarray(f.confidence),
        )
        for f in frames
    ]
    feats = jax.tree.map(lambda *xs: jnp.stack(xs), *feats)
    gt = (traj.t - traj.t[0]) @ traj.r[0]
    out = run_slam(
        cam, feats, jax.random.PRNGKey(0),
        cfg=SlamConfig(init_sampling="weighted"), n_landmarks=64,
    )
    assert ate_rmse(np.asarray(out.t), gt, align=False) < 0.05
