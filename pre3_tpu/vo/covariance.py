"""Pose-shift covariance of the RANSAC rigid-motion estimate.

Re-design of the reference's VO covariance estimators (aux_code/
cov_pose_shift_calc.m:1-40 — implicit-function-theorem form with
symbolically generated second derivatives d2E_*_4cov.m; and the derivest-
based numeric variants covariance_estimate_RANSAC.m). Here the IFT form is
computed directly with jax autodiff (SURVEY §7.2-4):

  θ* = argmin E(θ, F)  with E the weighted alignment cost,
  Σ_θ = A⁻¹ (Σᵢ Bᵢ Σ_pᵢ Bᵢᵀ) A⁻ᵀ,  A = ∂²E/∂θ², Bᵢ = ∂²E/∂θ∂pᵢ

with the reference's SR4000 sensor noise model in spherical coordinates
(range σ_r = 1 cm, angular σ_a = 0.24° — cov_pose_shift_calc.m).

θ is the 6-vector [dt, dω] perturbation of the fitted (R, t) on the
manifold; Σ_θ is therefore the covariance of the VO increment that feeds
the EKF prediction (a principled replacement for the hand-tuned constant
process noise of predict_state_and_covariance.m:98-102).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from pre3_tpu.geometry.quaternion import qrotate, v2q


SIGMA_RANGE = 0.01  # m (reference sensor model)
# numpy (not device) scalar: see geometry/camera.py::sr4000_camera
SIGMA_ANG = np.float32(0.24 * np.pi / 180.0)  # rad


def sr4000_point_covariance(p: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] Cartesian covariance of an SR4000 3D point from the
    spherical noise model: σ_r along the ray, r·σ_a across it."""
    r = jnp.linalg.norm(p, axis=-1, keepdims=True)
    ray = p / jnp.maximum(r, 1e-9)
    # tangential variance (isotropic in the plane ⊥ ray)
    var_t = (r[..., 0] * SIGMA_ANG) ** 2
    var_r = SIGMA_RANGE**2
    eye = jnp.eye(3, dtype=p.dtype)
    rr = ray[..., :, None] * ray[..., None, :]
    return var_r * rr + var_t[..., None, None] * (eye - rr)


def _cost(theta, r, t, p1, p2, w):
    """Weighted alignment cost at pose perturbation θ = [dt, dω]."""
    dq = v2q(theta[3:])
    pred = qrotate(dq[None], jnp.einsum("ij,nj->ni", r, p2)) + t + theta[:3]
    resid = p1 - pred
    return 0.5 * jnp.sum(w * jnp.sum(resid * resid, axis=-1))


@jax.jit
def vo_covariance(
    r: jnp.ndarray,  # [3, 3] fitted rotation
    t: jnp.ndarray,  # [3] fitted translation
    p1: jnp.ndarray,  # [N, 3] frame-1 points
    p2: jnp.ndarray,  # [N, 3] frame-2 points
    w: jnp.ndarray,  # [N] inlier weights
) -> jnp.ndarray:
    """[6, 6] covariance of the VO increment [dt, dω]."""
    zero = jnp.zeros(6)
    a = jax.hessian(_cost, argnums=0)(zero, r, t, p1, p2, w)  # [6, 6]
    # B_i = ∂²E/∂θ∂p1_i and ∂²E/∂θ∂p2_i — get both as full Jacobians of
    # the gradient wrt the point arrays: [6, N, 3]
    grad_theta = jax.grad(_cost, argnums=0)
    b1 = jax.jacfwd(lambda pp: grad_theta(zero, r, t, pp, p2, w))(p1)
    b2 = jax.jacfwd(lambda pp: grad_theta(zero, r, t, p1, pp, w))(p2)
    s1 = sr4000_point_covariance(p1)  # [N, 3, 3]
    s2 = sr4000_point_covariance(p2)
    mid = (
        jnp.einsum("anj,njk,bnk->ab", b1, s1, b1)
        + jnp.einsum("anj,njk,bnk->ab", b2, s2, b2)
    )
    # damped inverse of A (rank-deficient when too few inliers)
    a_reg = a + 1e-6 * jnp.eye(6)
    a_inv = jnp.linalg.inv(a_reg)
    cov = a_inv @ mid @ a_inv.T
    return 0.5 * (cov + cov.T)
