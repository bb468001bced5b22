"""SE(3) poses as (translation, quaternion) pairs.

Replaces the reference's pose plumbing (Pose2H.m / H2Pose.m, aux_code/
odometry_model.m pose composition, fv.m:109-124). A pose (t, q) maps
body-frame points to the world frame: x_w = R(q) x_b + t. Stored as a
NamedTuple of arrays so it is a pytree (jit/vmap/scan-friendly); all ops
support leading batch axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pre3_tpu.geometry.quaternion import q2r, qconj, qnormalize, qprod, qrotate, q2v, r2q


class Pose(NamedTuple):
    """World-from-body rigid transform."""

    t: jnp.ndarray  # [..., 3] translation
    q: jnp.ndarray  # [..., 4] unit quaternion, scalar-first


def pose_identity(batch_shape=(), dtype=jnp.float32) -> Pose:
    t = jnp.zeros(batch_shape + (3,), dtype)
    q = jnp.zeros(batch_shape + (4,), dtype).at[..., 0].set(1.0)
    return Pose(t=t, q=q)


def pose_compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b: apply b first, then a (x → a(b(x)))."""
    return Pose(t=a.t + qrotate(a.q, b.t), q=qnormalize(qprod(a.q, b.q)))


def pose_inverse(a: Pose) -> Pose:
    qi = qconj(a.q)
    return Pose(t=-qrotate(qi, a.t), q=qi)


def pose_apply(a: Pose, x: jnp.ndarray) -> jnp.ndarray:
    """Transform points [..., 3] by the pose."""
    return qrotate(a.q, x) + a.t


def pose_delta(a: Pose, b: Pose) -> Pose:
    """Relative pose a⁻¹ ∘ b (the motion taking frame a to frame b)."""
    return pose_compose(pose_inverse(a), b)


def pose_to_matrix(a: Pose) -> jnp.ndarray:
    """Pose → 4×4 homogeneous matrix (reference Pose2H.m)."""
    r = q2r(a.q)
    top = jnp.concatenate([r, a.t[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def pose_from_matrix(h: jnp.ndarray) -> Pose:
    """4×4 homogeneous matrix → Pose (reference H2Pose.m)."""
    return Pose(t=h[..., :3, 3], q=r2q(h[..., :3, :3]))


def pose_log(a: Pose) -> jnp.ndarray:
    """Pose → 6-vector [t, rotation-vector] (decoupled log, as the
    reference uses [dX; q2e(dq)] chaining — we use rotation vectors
    instead of Euler angles to avoid gimbal issues)."""
    return jnp.concatenate([a.t, q2v(a.q)], axis=-1)
