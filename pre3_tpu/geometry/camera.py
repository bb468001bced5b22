"""Pinhole camera with 2-parameter radial distortion (SR4000 calibration).

Re-design of the reference camera layer (initialize_cam.m:27-97,
distort_fm_my_version.m:26-60, undistort_fm_my_version.m:26-80,
hu_my_version.m, hinv_my_version.m, hi_inverse_depth.m:63-85). The model:

  normalized undistorted  xu = (u - Cx)/f,  yu = (v - Cy)/f
  distortion factor       D  = 1 + k1·r² + k2·r⁴,  r² = xu² + yu²
  distorted pixel         ud = Cx + f·xu·D,  vd = Cy + f·yu·D

Undistortion inverts r_d = r_u·D(r_u) with a fixed 10-step Newton iteration
(static trip count → jit-friendly; matches undistort_fm_my_version.m:62-71).
All functions broadcast over leading axes and are autodiff-safe, replacing
the reference's hand Jacobians (jacob_undistor_fm_my_version.m, dhd_dhu).

Pixel convention: u is the column coordinate (x, along width nCols=176) and
v the row coordinate (y, along height nRows=144), per initialize_cam.m:88-93.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Camera(NamedTuple):
    f: jnp.ndarray  # focal length, pixels
    cx: jnp.ndarray  # principal point x (column)
    cy: jnp.ndarray  # principal point y (row)
    k1: jnp.ndarray  # radial distortion
    k2: jnp.ndarray
    n_rows: int  # image height (static)
    n_cols: int  # image width (static)


def sr4000_camera(dtype=jnp.float32) -> Camera:
    """The reference's hard-coded SR4000 calibration (initialize_cam.m:64-77).

    Intrinsics are *numpy* scalars so that functions closing over a Camera
    embed them as HLO literals rather than hoisted executable parameters
    (device-array closure constants become extra compiled-program buffers,
    which a jax 0.9 dispatch fast path can drop after checkpoint resume —
    "Execution supplied N buffers but compiled program expected 2N")."""
    a = lambda x: np.asarray(x, dtype)
    return Camera(
        f=a(250.57731), cx=a(91.69), cy=a(72.27),
        k1=a(-0.84656), k2=a(0.53701),
        n_rows=144, n_cols=176,
    )


def distort(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixel [..., 2] → distorted pixel (distort_fm_my_version.m)."""
    xu = (uv[..., 0] - cam.cx) / cam.f
    yu = (uv[..., 1] - cam.cy) / cam.f
    r2 = xu * xu + yu * yu
    d = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
    return jnp.stack([cam.cx + cam.f * xu * d, cam.cy + cam.f * yu * d], axis=-1)


def undistort(cam: Camera, uvd: jnp.ndarray, newton_steps: int = 10) -> jnp.ndarray:
    """Distorted pixel [..., 2] → undistorted pixel.

    Solves r_u + k1·r_u³ + k2·r_u⁵ = r_d by Newton iteration with a fixed
    step count (undistort_fm_my_version.m:62-71); the loop unrolls at trace
    time so XLA fuses the whole solve into elementwise ops.
    """
    xd = (uvd[..., 0] - cam.cx) / cam.f
    yd = (uvd[..., 1] - cam.cy) / cam.f
    rd = jnp.sqrt(xd * xd + yd * yd)
    ru = rd / (1.0 + cam.k1 * rd * rd + cam.k2 * rd**4)
    for _ in range(newton_steps):
        f1 = ru + cam.k1 * ru**3 + cam.k2 * ru**5 - rd
        f1p = 1.0 + 3.0 * cam.k1 * ru * ru + 5.0 * cam.k2 * ru**4
        ru = ru - f1 / f1p
    d = 1.0 + cam.k1 * ru * ru + cam.k2 * ru**4
    safe_d = jnp.where(d == 0, 1.0, d)
    return jnp.stack(
        [cam.cx + cam.f * xd / safe_d, cam.cy + cam.f * yd / safe_d], axis=-1
    )


def project_point(cam: Camera, p_cam: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Camera-frame 3D point [..., 3] → *undistorted* pixel (hu_my_version.m).

    Guards z≈0 with eps (the caller gates by in_fov/depth validity)."""
    z = p_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < eps, eps, z)
    u = cam.cx + cam.f * p_cam[..., 0] / safe_z
    v = cam.cy + cam.f * p_cam[..., 1] / safe_z
    return jnp.stack([u, v], axis=-1)


def project(cam: Camera, p_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D point → distorted pixel (full measurement model h)."""
    return distort(cam, project_point(cam, p_cam))


def unproject(cam: Camera, uvd: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixel [..., 2] → unit-z camera-frame ray [..., 3]
    (hinv_my_version.m direction part)."""
    uv = undistort(cam, uvd)
    x = (uv[..., 0] - cam.cx) / cam.f
    y = (uv[..., 1] - cam.cy) / cam.f
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def in_fov(
    cam: Camera,
    p_cam: jnp.ndarray,
    uvd: jnp.ndarray,
    half_fov_deg: float = 60.0,
    margin: float = 0.0,
) -> jnp.ndarray:
    """Visibility gate: in front of camera, within the FOV cone, and the
    distorted projection inside image bounds (hi_inverse_depth.m:63-85)."""
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    rho = jnp.sqrt(x * x + y * y)
    # atan2-based cone test matches the reference's atand(...) < 60 gate.
    ang = jnp.degrees(jnp.arctan2(rho, z))
    u, v = uvd[..., 0], uvd[..., 1]
    return (
        (z > 0)
        & (jnp.abs(ang) < half_fov_deg)
        & (u > margin) & (u < cam.n_cols - 1 - margin)
        & (v > margin) & (v < cam.n_rows - 1 - margin)
    )
