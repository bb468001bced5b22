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


# ---------------------------------------------------------------------------
# Batched covariance-augmentation equality (r5: add_features rewrote the
# per-add sequential loop — 8 full-pytree where-selects per step — as one
# batched strip/block scatter; this pins exact agreement with the
# sequential form, including the overfull case where free_slots' tail
# holds active slots that must stay untouched)
# ---------------------------------------------------------------------------

from pre3_tpu.ekf.map_management import add_features
from pre3_tpu.ekf.state import CAM_DIM, LM_DIM, init_state
from pre3_tpu.frontend.pipeline import Features
from pre3_tpu.geometry.camera import sr4000_camera
from pre3_tpu.geometry.inverse_depth import inverse_depth_point


def add_features_seq(cam_model, state, frame, predicted_h, step, n_measured,
                     max_adds=8, min_measured=25, min_separation_px=10.0,
                     std_pxl=1.0, depth_sigma=0.01,
                     depth_range_quadratic=False, depth_range_d0=2.0):
    """The former sequential implementation (reference oracle)."""
    k = state.n_landmarks
    d2map = jnp.linalg.norm(frame.uv[:, None, :] - predicted_h[None], axis=-1)
    d2map = jnp.where(state.active[None], d2map, jnp.inf)
    far = jnp.min(d2map, axis=-1) > min_separation_px
    has_depth = jnp.linalg.norm(frame.xyz, axis=-1) > 0.2
    cand = frame.valid & has_depth & far
    want = n_measured < min_measured
    score = jnp.where(cand & want, frame.score, -1.0)
    top_score, top_idx = jax.lax.top_k(score, max_adds)
    top_ok = top_score > 0
    slot_order = jnp.argsort(state.active.astype(jnp.int32), stable=True)
    free_slots = slot_order[:max_adds]
    slot_free = ~state.active[free_slots]

    def add_one(st, j):
        fidx = top_idx[j]
        slot = free_slots[j]
        do = top_ok[j] & slot_free[j]
        uv = frame.uv[fidx]
        xyz = frame.xyz[fidx]
        rho0 = 1.0 / jnp.maximum(jnp.linalg.norm(xyz), 1e-6)
        d0 = depth_range_d0
        sig_rho = (depth_sigma * jnp.maximum(rho0 * rho0, 1.0 / (d0 * d0))
                   if depth_range_quadratic else depth_sigma * rho0 * rho0)
        cam13 = st.x[:CAM_DIM]

        def y_of(c, uv_, rho_):
            return inverse_depth_point(cam_model, uv_, c[0:3], c[3:7], rho_)

        y = y_of(cam13, uv, rho0)
        jc = jax.jacfwd(lambda c: y_of(c, uv, rho0))(cam13)
        juv = jax.jacfwd(lambda u: y_of(cam13, u, rho0))(uv)
        jr = jax.jacfwd(lambda rr: y_of(cam13, uv, rr))(rho0)
        strip = jc @ st.p[:CAM_DIM, :]
        pll = (jc @ st.p[:CAM_DIM, :CAM_DIM] @ jc.T
               + (std_pxl**2) * (juv @ juv.T)
               + (sig_rho**2) * jnp.outer(jr, jr))
        row0 = CAM_DIM + slot * LM_DIM
        p = st.p
        p = jax.lax.dynamic_update_slice(p, strip, (row0, 0))
        p = jax.lax.dynamic_update_slice(p, strip.T, (0, row0))
        p = jax.lax.dynamic_update_slice(p, pll, (row0, row0))
        x = jax.lax.dynamic_update_slice(st.x, y, (row0,))
        new = st._replace(
            x=x, p=p,
            active=st.active.at[slot].set(True),
            is_id=st.is_id.at[slot].set(True),
            desc=st.desc.at[slot].set(frame.desc[fidx]),
            times_predicted=st.times_predicted.at[slot].set(0),
            times_measured=st.times_measured.at[slot].set(0),
            init_frame=st.init_frame.at[slot].set(step),
            last_visible=st.last_visible.at[slot].set(step),
            init_uv=st.init_uv.at[slot].set(uv),
            init_cam=st.init_cam.at[slot].set(cam13[0:7]),
        )
        return jax.tree.map(lambda a, b: jnp.where(do, a, b), new, st)

    for j in range(max_adds):
        state = add_one(state, j)
    return state

def _random_state_and_frame(seed=0, k=24, kf=40, dd=32, n_act=10):
    rng = np.random.default_rng(seed)
    st = init_state(n_landmarks=k, desc_dim=dd)
    act = np.zeros(k, bool)
    act[:n_act] = True
    x = np.asarray(st.x).copy()
    x[3] = 1.0
    x[0:3] = rng.normal(scale=0.1, size=3)
    for i in range(n_act):
        x[CAM_DIM + i * LM_DIM: CAM_DIM + (i + 1) * LM_DIM] = np.r_[
            rng.normal(scale=0.5, size=3), rng.uniform(-1, 1, 2),
            rng.uniform(0.3, 1.0)]
    d = x.shape[0]
    nact = CAM_DIM + n_act * LM_DIM
    a_mat = rng.normal(scale=0.05, size=(nact, nact))
    p = np.zeros((d, d), np.float32)
    p[:nact, :nact] = (a_mat @ a_mat.T).astype(np.float32)
    st = st._replace(
        x=jnp.asarray(x, jnp.float32), p=jnp.asarray(p),
        active=jnp.asarray(act), is_id=jnp.asarray(act),
        times_predicted=jnp.asarray(rng.integers(0, 9, k), jnp.int32),
        times_measured=jnp.asarray(rng.integers(0, 9, k), jnp.int32),
    )
    frame = Features(
        uv=jnp.asarray(rng.uniform(5, 140, (kf, 2)), jnp.float32),
        xyz=jnp.asarray(
            np.c_[rng.normal(scale=0.6, size=(kf, 2)),
                  rng.uniform(1.0, 3.0, kf)], jnp.float32),
        desc=jnp.asarray(rng.normal(size=(kf, dd)), jnp.float32),
        score=jnp.asarray(rng.uniform(0, 1, kf), jnp.float32),
        valid=jnp.asarray(rng.uniform(size=kf) > 0.2),
    )
    ph = jnp.asarray(rng.uniform(0, 160, (k, 2)), jnp.float32)
    return st, frame, ph


@pytest.mark.parametrize("quad", [False, True])
@pytest.mark.parametrize("n_meas", [0, 50])
def test_batched_add_matches_sequential(quad, n_meas):
    cam = sr4000_camera()
    st, frame, ph = _random_state_and_frame()
    step = jnp.asarray(5, jnp.int32)
    kw = dict(n_measured=jnp.asarray(n_meas, jnp.int32), max_adds=8,
              min_measured=25, depth_range_quadratic=quad)
    new = add_features(cam, st, frame, ph, step, **kw)
    old = add_features_seq(cam, st, frame, ph, step,
                           n_measured=jnp.asarray(n_meas, jnp.int32),
                           max_adds=8, min_measured=25,
                           depth_range_quadratic=quad)
    for f in new._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(new, f)), np.asarray(getattr(old, f)),
            atol=2e-5, err_msg=f"field {f}")


def test_batched_add_overfull_leaves_active_slots_untouched():
    """max_adds exceeding the free-slot count: the scatter must not zero
    the active slots that pad free_slots' tail."""
    cam = sr4000_camera()
    st, frame, ph = _random_state_and_frame()
    step = jnp.asarray(5, jnp.int32)
    new = add_features(cam, st, frame, ph, step,
                       n_measured=jnp.asarray(0, jnp.int32), max_adds=16)
    old = add_features_seq(cam, st, frame, ph, step,
                           n_measured=jnp.asarray(0, jnp.int32),
                           max_adds=16)
    assert int(jnp.sum(new.active)) == st.n_landmarks  # filled the map
    for f in new._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(new, f)), np.asarray(getattr(old, f)),
            atol=2e-5, err_msg=f"field {f}")
