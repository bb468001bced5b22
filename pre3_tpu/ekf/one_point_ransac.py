"""1-point RANSAC inlier gating inside the EKF.

Re-design of the reference's sequential hypothesis loop
(ransac_hypotheses.m:27-86: up to 1000 adaptive iterations, each doing a
partial Kalman update from ONE random individually-compatible match and
counting low-innovation support via compute_hypothesis_support_fast.m) and
the high-innovation rescue (rescue_hi_inliers.m:27-47: χ²(2, 0.95)=5.9915
gating against the post-update covariance).

TPU shape: draw ALL B hypotheses at once (random IC matches), compute all
B partial state updates as one batched gain application (ΔX_b = P H_iᵀ
S_i⁻¹ ν_i — a [B, D] tensor), reproject every landmark under every
hypothesis as a [B, K] tensor op, and argmax support. Fixed B replaces
the adaptive iteration count (SURVEY §7.1); B ≥ the reference's adaptive
budget so the statistical behavior is conservative.
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
) -> jnp.ndarray:
    """Select low-innovation inliers among IC matches. Returns [K] bool.

    Support threshold = std_z (ransac_hypotheses.m:33: "RANSAC threshold
    should have a low value", set to the measurement std).
    """
    k = state.n_landmarks
    ic = obs.ic

    # Draw B hypothesis landmark indices ∝ IC mask.
    logits = jnp.where(ic, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (batch, k))
    hyp_idx = jnp.argmax(logits[None] + g, axis=-1)  # [B]

    # Per-hypothesis partial update ΔX = P H_iᵀ S_i⁻¹ ν_i  (only landmark i
    # measured). P H_iᵀ = P[:, cam] Hcᵀ + P[:, lm_i] Hlᵀ.
    p = state.p
    pc = p[:, :CAM_DIM]  # [D, 13]
    pl_all = p[:, CAM_DIM:].reshape(-1, k, LM_DIM)  # [D, K, 6]

    def delta_for(i):
        hc = obs.hc[i]  # [2, 13]
        hl = obs.hl[i]  # [2, 6]
        ph_t = pc @ hc.T + pl_all[:, i, :] @ hl.T  # [D, 2]
        s = obs.s[i]  # already includes R
        nu = obs.z[i] - obs.h[i]
        # closed-form 2×2 solve (jnp.linalg.solve lowers to a sequential
        # LU loop on TPU — wasteful for a 2×2)
        det = s[0, 0] * s[1, 1] - s[0, 1] * s[1, 0]
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        x = jnp.array(
            [s[1, 1] * nu[0] - s[0, 1] * nu[1],
             -s[1, 0] * nu[0] + s[0, 0] * nu[1]]
        ) * inv_det
        return ph_t @ x  # [D]

    dx = jax.vmap(delta_for)(hyp_idx)  # [B, D]
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
