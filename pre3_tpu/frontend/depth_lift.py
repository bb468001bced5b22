"""Depth-lifting of 2D keypoints through the per-pixel XYZ image.

Reference: inittialize_depth_my_version.m:1-93 + confidence_filtering.m —
for every keypoint, look up the SR4000 per-pixel 3D point, and invalidate
when the depth is NaN, closer than 0.4 m, or the confidence is below
0.5·max(confidence). (The SR4000→camera [-x,-y,z] axis flip is applied at
frame-parse time in data/sr4000.py, not here.)

Vectorized gather over a fixed-K keypoint list; masks compose with the
detector's validity mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LiftedFeatures(NamedTuple):
    uv: jnp.ndarray  # [K, 2] pixel positions (u=col, v=row)
    xyz: jnp.ndarray  # [K, 3] camera-frame 3D points (0 where invalid)
    valid: jnp.ndarray  # [K] bool


def lift(
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    xyz_image: jnp.ndarray,
    confidence: jnp.ndarray | None = None,
    min_range: float = 0.4,
    confidence_ratio: float = 0.5,
) -> LiftedFeatures:
    """Sample xyz at nearest pixel and gate by range/confidence/NaN."""
    h, w = xyz_image.shape[:2]
    cols = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, w - 1)
    rows = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, h - 1)
    p = xyz_image[rows, cols]  # [K, 3]
    finite = jnp.all(jnp.isfinite(p), axis=-1)
    p = jnp.where(finite[..., None], p, 0.0)
    d = jnp.linalg.norm(p, axis=-1)
    ok = valid & finite & (d >= min_range)
    if confidence is not None:
        conf = confidence[rows, cols]
        ok = ok & (conf > confidence_ratio * jnp.max(confidence))
    return LiftedFeatures(uv=uv, xyz=p, valid=ok)
