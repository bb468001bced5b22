"""Inverse-depth landmark parameterization.

Reference semantics (hinv_my_version.m:26-53, hi_inverse_depth.m:27-85,
inversedepth_2_cartesian.m:29-74, inversedepth2cartesian.m):

  landmark y = [x0, y0, z0, θ, φ, ρ]  — camera center at init (world),
  azimuth/elevation of the observation ray (world frame), inverse depth.

  ray        m(θ, φ) = [cosφ·sinθ, −sinφ, cosφ·cosθ]
  3D point   p = y0 + (1/ρ)·m(θ, φ)
  camera-frame direction for projection (scale-free, valid at ρ→0):
             hrl = R_cwᵀ · ( ρ·(y0 − t_wc) + m(θ, φ) )

All functions broadcast over leading axes (vmap-ready) and are autodiff-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from pre3_tpu.geometry.quaternion import q2r, qconj, qrotate
from pre3_tpu.geometry.camera import Camera, undistort


def ray_from_angles(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """m(θ, φ): unit world-frame observation ray (reference m.m)."""
    cphi = jnp.cos(phi)
    return jnp.stack(
        [cphi * jnp.sin(theta), -jnp.sin(phi), cphi * jnp.cos(theta)], axis=-1
    )


def angles_from_ray(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of ray_from_angles (hinv_my_version.m:50-52)."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    theta = jnp.arctan2(nx, nz)
    phi = jnp.arctan2(-ny, jnp.sqrt(nx * nx + nz * nz))
    return theta, phi


def inverse_depth_point(
    cam: Camera, uvd: jnp.ndarray, t_wc: jnp.ndarray, q_wc: jnp.ndarray,
    rho: jnp.ndarray,
) -> jnp.ndarray:
    """Initialize a 6-vector inverse-depth landmark from a distorted pixel
    observation and the current camera pose (hinv_my_version.m)."""
    uv = undistort(cam, uvd)
    hx = (uv[..., 0] - cam.cx) / cam.f
    hy = (uv[..., 1] - cam.cy) / cam.f
    h_lr = jnp.stack([hx, hy, jnp.ones_like(hx)], axis=-1)
    n = qrotate(q_wc, h_lr)  # ray in world frame
    theta, phi = angles_from_ray(n)
    return jnp.concatenate(
        [t_wc, theta[..., None], phi[..., None], rho[..., None]], axis=-1
    )


def inverse_depth_to_cartesian(y: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] inverse-depth landmark → [..., 3] world point
    (inversedepth2cartesian.m)."""
    rho = y[..., 5:6]
    m = ray_from_angles(y[..., 3], y[..., 4])
    return y[..., :3] + m / jnp.maximum(jnp.abs(rho), 1e-12) * jnp.sign(
        jnp.where(rho == 0, 1.0, rho)
    )


def inverse_depth_camera_ray(
    y: jnp.ndarray, t_wc: jnp.ndarray, q_wc: jnp.ndarray
) -> jnp.ndarray:
    """Scale-free camera-frame direction hrl of an inverse-depth landmark
    (hi_inverse_depth.m:41): R_cw(ρ·(y0 − t_wc) + m). Well-defined as ρ→0."""
    rho = y[..., 5:6]
    m = ray_from_angles(y[..., 3], y[..., 4])
    v_w = rho * (y[..., :3] - t_wc) + m
    return qrotate(qconj(q_wc), v_w)


def linearity_index(
    y: jnp.ndarray, sigma_rho: jnp.ndarray, t_wc: jnp.ndarray
) -> jnp.ndarray:
    """Civera linearity index 4·σd·cosα/d for the inverse-depth→Cartesian
    conversion decision (inversedepth_2_cartesian.m:56: convert when < 0.1).

    y: [..., 6] landmark, sigma_rho: [...] std of ρ, t_wc: current camera
    center. Returns [...] index (lower = more Gaussian in Cartesian)."""
    rho = y[..., 5]
    std_d = sigma_rho / jnp.maximum(rho * rho, 1e-12)
    p = inverse_depth_to_cartesian(y)
    d1 = p - y[..., :3]  # from init camera center
    d2 = p - t_wc  # from current camera center
    n1 = jnp.linalg.norm(d1, axis=-1)
    n2 = jnp.linalg.norm(d2, axis=-1)
    cos_alpha = jnp.sum(d1 * d2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)
    return 4.0 * std_d * cos_alpha / jnp.maximum(n2, 1e-12)


def conversion_jacobian(y: jnp.ndarray) -> jnp.ndarray:
    """Jacobian ∂p/∂y of the inverse-depth→Cartesian map, [..., 3, 6]
    (inversedepth_2_cartesian.m:63-66). Kept analytic — it is tiny and the
    closed form documents the reference parity; autodiff of
    inverse_depth_to_cartesian matches it (tested)."""
    theta, phi, rho = y[..., 3], y[..., 4], y[..., 5]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    m = ray_from_angles(theta, phi)
    dm_dtheta = jnp.stack([cp * ct, jnp.zeros_like(ct), -cp * st], axis=-1)
    dm_dphi = jnp.stack([-sp * st, -cp, -sp * ct], axis=-1)
    inv_rho = 1.0 / rho
    cols = [
        jnp.broadcast_to(jnp.eye(3, dtype=y.dtype), y.shape[:-1] + (3, 3)),
        (inv_rho[..., None] * dm_dtheta)[..., None],
        (inv_rho[..., None] * dm_dphi)[..., None],
        (-(inv_rho * inv_rho)[..., None] * m)[..., None],
    ]
    return jnp.concatenate(cols, axis=-1)
