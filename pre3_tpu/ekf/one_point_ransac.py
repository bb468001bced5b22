"""1-point / 3-point RANSAC inlier gating inside the EKF.

Re-design of the reference's sequential hypothesis loop
(ransac_hypotheses.m:27-86: up to 1000 adaptive iterations, each doing a
partial Kalman update from random individually-compatible matches and
counting low-innovation support via compute_hypothesis_support_fast.m) and
the high-innovation rescue (rescue_hi_inliers.m:27-47: χ²(2, 0.95)=5.9915
gating against the post-update covariance).

The reference's namesake "3-Point" behavior (select_random_match.m:47-51):
each hypothesis draws THREE distinct IC matches whenever more than three
exist, and one otherwise; the hypothesis update then stacks the drawn
measurements (6-dim innovation, 6×6 S — ransac_hypotheses.m:56-63 builds
the stacked sparse Hi and block-diagonal R).

TPU shape: draw ALL B hypotheses at once ([B, 3] Gumbel-top-k samples
without replacement — the randperm analog), compute all B partial state
updates as one batched gain application (ΔX_b = P H_bᵀ S_b⁻¹ ν_b with a
batched 6×6 Cholesky solve), reproject every landmark under every
hypothesis as a [B, K] tensor op, and argmax support. Fixed B replaces
the adaptive iteration count (SURVEY §7.1); B ≥ the reference's adaptive
budget so the statistical behavior is conservative (statistical parity vs
a reference-faithful adaptive loop is pinned by
tests/test_ransac_parity.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pre3_tpu.ekf.measurement import Observations, measure_one
from pre3_tpu.ekf.state import CAM_DIM, LM_DIM, EkfState
from pre3_tpu.geometry.camera import Camera

CHI2_2_95 = 5.9915


def one_point_ransac(
    key: jax.Array,
    cam_model: Camera,
    state: EkfState,
    obs: Observations,
    batch: int = 256,
    std_z: float = 1.0,
    n_points: int = 3,
) -> jnp.ndarray:
    """Select low-innovation inliers among IC matches. Returns [K] bool.

    n_points: matches stacked per hypothesis. 3 reproduces the reference's
    3PRE mode — 3-match hypotheses when >3 IC matches exist, 1-match
    otherwise (select_random_match.m:47-51); 1 forces the classic Civera
    1-point variant everywhere.

    Support threshold = std_z (ransac_hypotheses.m:33: "RANSAC threshold
    should have a low value", set to the measurement std).
    """
    k = state.n_landmarks
    ic = obs.ic
    num_ic = jnp.sum(ic)

    # Draw [B, S] hypothesis landmark indices without replacement within a
    # hypothesis (randperm analog), ∝ IC mask across slots.
    logits = jnp.where(ic, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (batch, k))
    _, idx = jax.lax.top_k(logits[None] + g, n_points)  # [B, S]
    # 3-match hypotheses only when more than S IC matches exist, else
    # 1-match (select_random_match.m:47-51). Surplus draws are masked to
    # exact no-ops (zero H rows / zero innovation with unit R).
    n_use = jnp.where(num_ic > n_points, n_points, 1)
    use = (jnp.arange(n_points)[None, :] < n_use) & ic[idx]  # [B, S]

    p = state.p
    pc = p[:, :CAM_DIM]  # [D, 13]
    pl_all = p[:, CAM_DIM:].reshape(-1, k, LM_DIM)  # [D, K, 6]
    # Per-landmark gain column block P H_iᵀ = P[:, cam] Hc_iᵀ +
    # P[:, lm_i] Hl_iᵀ, precomputed once for all K slots: [K, D, 2].
    ph = jnp.einsum("dc,kec->kde", pc, obs.hc) + jnp.einsum(
        "dkl,kel->kde", pl_all, obs.hl
    )
    nu_all = obs.z - obs.h  # [K, 2]
    s_pts = n_points

    def delta_for(idx_h, use_h):
        """ΔX for one hypothesis from its S stacked matches."""
        phs = jnp.where(use_h[:, None, None], ph[idx_h], 0.0)  # [S, D, 2]
        hc = jnp.where(use_h[:, None, None], obs.hc[idx_h], 0.0)
        hl = jnp.where(use_h[:, None, None], obs.hl[idx_h], 0.0)
        nu = jnp.where(use_h[:, None], nu_all[idx_h], 0.0)  # [S, 2]
        # S[2j:2j+2, 2m:2m+2] = H_j (P H_mᵀ) — H_j has nonzeros only in
        # the camera block and landmark-j block, so only those rows of
        # each column block are touched.
        s_cam = jnp.einsum("jac,mcb->jamb", hc, phs[:, :CAM_DIM, :])
        starts = CAM_DIM + idx_h * LM_DIM  # [S]
        lm_rows = jax.vmap(
            lambda s0: jax.lax.dynamic_slice(
                phs, (0, s0, 0), (s_pts, LM_DIM, 2)
            )
        )(starts)  # [S(j), S(m), 6, 2]
        s_lm = jnp.einsum("jal,jmlb->jamb", hl, lm_rows)
        s = (s_cam + s_lm).reshape(2 * s_pts, 2 * s_pts)
        s = s + (std_z**2) * jnp.eye(2 * s_pts)
        # S is PSD + σ²I → Cholesky solve (cheaper than LU at 6×6 batched)
        c, low = jax.scipy.linalg.cho_factor(s, lower=True)
        y = jax.scipy.linalg.cho_solve((c, low), nu.reshape(-1))
        ph_flat = jnp.transpose(phs, (1, 0, 2)).reshape(-1, 2 * s_pts)
        return ph_flat @ y  # [D]

    dx = jax.vmap(delta_for)(idx, use)  # [B, D]
    x_hyp = state.x[None] + dx  # [B, D]

    # Support: reproject all landmarks under each hypothesis state
    # (compute_hypothesis_support_fast.m:35-110, batched twice).
    def project_all(xb):
        camb = xb[:CAM_DIM]
        lms = xb[CAM_DIM:].reshape(k, LM_DIM)
        return jax.vmap(
            lambda l, iid: measure_one(cam_model, camb, l, iid)
        )(lms, state.is_id)  # [K, 2]

    h_all = jax.vmap(project_all)(x_hyp)  # [B, K, 2]
    resid = jnp.linalg.norm(obs.z[None] - h_all, axis=-1)  # [B, K]
    inlier = (resid < std_z) & ic[None]
    support = jnp.sum(inlier, axis=-1)  # [B]
    # Guard: a hypothesis from an invalid draw (no IC at all) has support 0.
    any_ic = jnp.any(ic)
    best = jnp.argmax(support)
    li = inlier[best] & any_ic
    return li


def rescue_hi_inliers(
    cam_model: Camera,
    state: EkfState,  # post low-innovation update
    obs: Observations,
    li: jnp.ndarray,
    std_z: float = 1.0,
) -> tuple[jnp.ndarray, Observations]:
    """χ² gate the remaining IC matches against the post-li state
    (rescue_hi_inliers.m:27-47: h/H recomputed at the updated state, then
    νᵀS⁻¹ν < χ²(2, 0.95)). Returns (hi mask [K], refreshed Observations
    carrying the recomputed h/H/S for the hi update)."""
    from pre3_tpu.ekf.measurement import predict_measurements

    obs2 = predict_measurements(cam_model, state, std_z=std_z)
    obs2 = obs2._replace(z=obs.z, ic=obs.ic)
    nu = obs.z - obs2.h  # [K, 2]
    # closed-form batched 2×2 inverse for the χ² forms
    s00 = obs2.s[:, 0, 0]
    s01 = obs2.s[:, 0, 1]
    s10 = obs2.s[:, 1, 0]
    s11 = obs2.s[:, 1, 1]
    det = s00 * s11 - s01 * s10
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    chi2 = inv_det * (
        s11 * nu[:, 0] ** 2
        - (s01 + s10) * nu[:, 0] * nu[:, 1]
        + s00 * nu[:, 1] ** 2
    )
    hi = obs.ic & (~li) & (chi2 < CHI2_2_95)
    return hi, obs2
