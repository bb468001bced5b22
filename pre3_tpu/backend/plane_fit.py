"""RANSAC plane fit → gravity-aligned initial orientation prior.

Re-design of the reference's floor-plane initialization
(plane_fit_to_data.m:1-130 + initialize_x_and_p.m:35-37, flag
INITIAL_ORIENTATION_COMPENSATION): fit a plane to the lower region of the
first depth frame with RANSAC, take its normal as the gravity direction,
and build the world-from-camera rotation that levels the camera. Also
usable online as a heading observation (the commented
ekf_heading_update.m path).

Batched RANSAC like vo/ransac.py: all B 3-point hypotheses at once,
[B, N] support scoring, masked least-squares refit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pre3_tpu.geometry.quaternion import r2q


class PlaneFit(NamedTuple):
    normal: jnp.ndarray  # [3] unit normal (oriented toward -y: "up")
    offset: jnp.ndarray  # [] plane offset: n·x = d
    inliers: jnp.ndarray  # [N] bool
    ok: jnp.ndarray  # [] bool


@partial(jax.jit, static_argnames=("batch",))
def ransac_plane(
    key: jax.Array,
    pts: jnp.ndarray,  # [N, 3]
    valid: jnp.ndarray,  # [N]
    batch: int = 512,
    threshold: float = 0.02,
    min_inliers: int = 30,
) -> PlaneFit:
    n = pts.shape[0]
    logits = jnp.where(valid, 0.0, -jnp.inf)[None, :]
    g = jax.random.gumbel(key, (batch, n))
    _, idx = jax.lax.top_k(logits + g, 3)  # [B, 3]
    tri = pts[idx]  # [B, 3, 3]
    nrm = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nn = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / jnp.maximum(nn, 1e-9)
    d = jnp.sum(nrm * tri[:, 0], axis=-1)  # [B]
    dist = jnp.abs(jnp.einsum("bi,ni->bn", nrm, pts) - d[:, None])
    support = jnp.sum((dist < threshold) & valid[None], axis=-1)
    support = jnp.where(nn[:, 0] > 1e-8, support, -1)
    best = jnp.argmax(support)

    # least-squares refit on the winning inliers (smallest eigenvector of
    # the centered scatter matrix — closed-form 3×3 symmetric eig)
    w = ((dist[best] < threshold) & valid).astype(pts.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c = jnp.sum(pts * w[:, None], axis=0) / wsum
    pc = (pts - c) * w[:, None]
    cov = pc.T @ pc / wsum
    from pre3_tpu.ops.svd3 import sym3_eigvals, _eigvec

    lam = sym3_eigvals(cov)
    normal = _eigvec(cov, lam[..., 2])  # smallest eigenvalue direction
    # orient "up" (camera y points down ⇒ floor normal has negative y)
    normal = jnp.where(normal[1] > 0, -normal, normal)
    offset = jnp.sum(normal * c)
    inl = (jnp.abs(pts @ normal - offset) < threshold) & valid
    ok = jnp.sum(inl) >= min_inliers
    return PlaneFit(normal=normal, offset=offset, inliers=inl, ok=ok)


def floor_up_direction(
    key: jax.Array,
    xyz_image: jnp.ndarray,  # [H, W, 3], NaN-safe
    floor_rows_from: float = 0.6,
    batch: int = 512,
) -> PlaneFit:
    """RANSAC-fit the floor in the lower image region and return the fit;
    fit.normal is the camera-frame direction that is world 'up'. This is
    the per-frame observation of the reference's (commented) online
    heading correction, mono_slam.m:189-193 → plane_fit_to_data per step.
    """
    h, w = xyz_image.shape[:2]
    r0 = int(h * floor_rows_from)
    region = jnp.nan_to_num(xyz_image[r0:]).reshape(-1, 3)
    valid = (jnp.abs(region[:, 2]) > 0.3) & (
        jnp.linalg.norm(region, axis=-1) < 10.0
    )
    return ransac_plane(key, region, valid, batch=batch)


def initial_orientation_from_floor(
    key: jax.Array,
    xyz_image: jnp.ndarray,  # [H, W, 3] first frame, NaN-safe
    floor_rows_from: float = 0.6,
    batch: int = 512,
    max_tilt_deg: float = 60.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fit the floor in the lower part of the first frame and return
    (q0 [4], ok): the camera orientation prior such that the floor normal
    maps to world 'up' (initialize_x_and_p.m:35-37).

    Returns identity orientation with ok=False when no plane is found —
    matching the flag-off behavior. max_tilt_deg additionally rejects
    implausible fits (a deviation from the reference, which assumes a
    floor is always visible): when the dominant lower-region plane is a
    WALL, its normal is ~90° from any credible gravity direction, and
    blindly leveling it would rotate the whole world frame sideways —
    measured 0.25 m ATE on a 48-frame wall-only scene before this gate."""
    fit = floor_up_direction(key, xyz_image, floor_rows_from, batch)
    up_cam = fit.normal  # camera-frame direction that is world "up"
    up_world = jnp.array([0.0, -1.0, 0.0])  # y-down convention
    tilt = jnp.arccos(jnp.clip(jnp.dot(up_cam, up_world), -1.0, 1.0))
    fit = fit._replace(
        ok=fit.ok & (tilt < jnp.radians(max_tilt_deg))
    )
    # rotation taking up_cam → up_world, minimal-angle (Rodrigues)
    v = jnp.cross(up_cam, up_world)
    s = jnp.linalg.norm(v)
    cth = jnp.dot(up_cam, up_world)
    vx = jnp.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ])
    r = jnp.eye(3) + vx + vx @ vx * ((1 - cth) / jnp.maximum(s * s, 1e-12))
    r = jnp.where(s < 1e-6, jnp.eye(3), r)
    q = r2q(r)
    q = jnp.where(fit.ok, q, jnp.array([1.0, 0, 0, 0]))
    return q, fit.ok
