"""Trajectory smoothing: propagate keyframe BA corrections to all frames.

After bundle adjustment refines the keyframe poses (backend/ba.py), the
non-keyframe poses still carry the original VO/EKF estimates. This module
redistributes the per-keyframe corrections over the in-between frames —
the correction ΔT_k = T_ba(k) ∘ T_est(k)⁻¹ is interpolated between
consecutive keyframes (linear translation, quaternion slerp) and applied
to every frame. This is the standard keyframe-smoother output step the
reference lacks entirely (its offline keyframing only copies files,
SR4000_key_frame_selection.m:112-143).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pre3_tpu.geometry.quaternion import (
    qconj, qnormalize, qprod, qrotate,
)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Quaternion slerp, batched over leading axes; stable for near-equal
    rotations (falls back to nlerp)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    small = sin_t < 1e-5
    w0 = jnp.where(small, 1.0 - u, jnp.sin((1.0 - u) * theta) / jnp.where(
        small, 1.0, sin_t))
    w1 = jnp.where(small, u, jnp.sin(u * theta) / jnp.where(small, 1.0,
                                                            sin_t))
    return qnormalize(w0 * q0 + w1 * q1)


def apply_ba_corrections(
    traj_t: jnp.ndarray,  # [F, 3] original per-frame positions
    traj_q: jnp.ndarray,  # [F, 4]
    kf_indices: jnp.ndarray,  # [M] keyframe frame indices (sorted)
    kf_valid: jnp.ndarray,  # [M]
    ba_t: jnp.ndarray,  # [M, 3] refined keyframe positions
    ba_q: jnp.ndarray,  # [M, 4]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Smoothed full trajectory (t, q)."""
    n = traj_t.shape[0]
    m = kf_indices.shape[0]

    # per-keyframe left-corrections ΔT = T_ba ∘ T_est⁻¹
    dt_q = jax.vmap(lambda qa, qe: qnormalize(qprod(qa, qconj(qe))))(
        ba_q, traj_q[kf_indices]
    )
    dt_t = ba_t - jax.vmap(qrotate)(dt_q, traj_t[kf_indices])

    # for each frame, find the surrounding keyframes (searchsorted on the
    # valid prefix) and the interpolation fraction
    n_valid = jnp.sum(kf_valid)
    idxs = jnp.where(kf_valid, kf_indices, n + 1)  # invalid → +inf-ish
    frames = jnp.arange(n)
    hi = jnp.clip(jnp.searchsorted(idxs, frames, side="right"),
                  1, n_valid - 1)
    lo = hi - 1
    f_lo = idxs[lo]
    f_hi = idxs[hi]
    u = jnp.clip(
        (frames - f_lo) / jnp.maximum(f_hi - f_lo, 1), 0.0, 1.0
    ).astype(traj_t.dtype)

    q_corr = slerp(dt_q[lo], dt_q[hi], u[:, None])
    t_corr = (1.0 - u)[:, None] * dt_t[lo] + u[:, None] * dt_t[hi]

    new_q = jax.vmap(lambda dq, q: qnormalize(qprod(dq, q)))(q_corr, traj_q)
    new_t = jax.vmap(qrotate)(q_corr, traj_t) + t_corr
    return new_t, new_q
