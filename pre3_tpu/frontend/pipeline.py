"""Frontend pipeline: detect → describe → depth-lift, one jitted step.

Replaces the reference's disk-pipelined frontend
(SIFT_extract_save.m → .mat cache → SIFT_match_save.m) with a single fused
device computation per frame producing a fixed-capacity feature set.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pre3_tpu.frontend.fast import detect
from pre3_tpu.frontend.patches import extract_patch_descriptors
from pre3_tpu.frontend.depth_lift import lift


class Features(NamedTuple):
    """Fixed-capacity per-frame feature set (masked)."""

    uv: jnp.ndarray  # [K, 2]
    desc: jnp.ndarray  # [K, D]
    xyz: jnp.ndarray  # [K, 3] camera-frame 3D (0 where invalid)
    valid: jnp.ndarray  # [K] bool
    score: jnp.ndarray  # [K] detector response


@partial(jax.jit, static_argnames=("max_features", "patch"))
def extract_features(
    intensity: jnp.ndarray,  # [H, W] float
    xyz: jnp.ndarray,  # [H, W, 3], NaNs allowed
    confidence: jnp.ndarray,  # [H, W]
    threshold: float = 0.06,
    max_features: int = 256,
    patch: int = 11,
) -> Features:
    corners = detect(intensity, threshold=threshold, max_corners=max_features)
    desc = extract_patch_descriptors(intensity, corners.uv, patch=patch)
    lifted = lift(
        corners.uv, corners.valid, jnp.nan_to_num(xyz), confidence
    )
    return Features(
        uv=corners.uv, desc=desc, xyz=lifted.xyz, valid=lifted.valid,
        score=corners.score,
    )


@partial(
    jax.jit,
    static_argnames=("n_octaves", "keypoints_per_octave", "upright"),
)
def extract_features_sift(
    intensity: jnp.ndarray,
    xyz: jnp.ndarray,
    confidence: jnp.ndarray,
    n_octaves: int = 3,
    keypoints_per_octave: int = 96,
    peak_thresh: float = 0.004,
    upright: bool = True,
) -> Features:
    """SIFT variant of the frontend (the reference's primary extractor,
    SIFT_extract_save.m): DoG keypoints + 128-D descriptors + depth lift."""
    from pre3_tpu.frontend.sift import extract_sift

    f = extract_sift(
        intensity, n_octaves=n_octaves,
        keypoints_per_octave=keypoints_per_octave,
        peak_thresh=peak_thresh, upright=upright,
    )
    lifted = lift(f.uv, f.valid, jnp.nan_to_num(xyz), confidence)
    return Features(
        uv=f.uv, desc=f.desc, xyz=lifted.xyz, valid=lifted.valid,
        score=f.score,
    )
