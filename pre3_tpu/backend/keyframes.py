"""Keyframe selection.

Re-design of the offline keyframing pass (SR4000_key_frame_selection.m:
1-173): a frame becomes a keyframe when the VO motion since the last
keyframe exceeds a rotation or translation threshold and the VO solution
is valid (accept test at :102: a_rot ≥ 4° or ‖T‖ ≥ 0.05 m, det(R)≈1,
state==1). The reference then renumbers files on disk; here selection is
a mask + gather over a stacked sequence (static shapes, max_keyframes
capacity).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.frontend.pipeline import Features
from pre3_tpu.geometry.quaternion import qconj, qprod, q2v
from pre3_tpu.vo.dead_reckoning import Trajectory


ROT_THRESH_DEG = 4.0  # SR4000_key_frame_selection.m:102
TRANS_THRESH_M = 0.05


class KeyframeSet(NamedTuple):
    indices: jnp.ndarray  # [M] int32 frame indices (padded with last)
    valid: jnp.ndarray  # [M] bool
    n: jnp.ndarray  # [] int32


def select_keyframes(
    traj_t: jnp.ndarray,  # [F, 3] VO/SLAM trajectory positions
    traj_q: jnp.ndarray,  # [F, 4]
    ok: jnp.ndarray,  # [F] per-frame validity
    max_keyframes: int = 16,
    rot_thresh_deg: float = ROT_THRESH_DEG,
    trans_thresh_m: float = TRANS_THRESH_M,
) -> KeyframeSet:
    """Greedy sequential selection via lax.scan: frame f is accepted when
    its motion relative to the LAST ACCEPTED keyframe crosses a threshold
    (the reference's find_the_key_frame loop, vectorized as a scan carrying
    the last-keyframe pose)."""
    n_frames = traj_t.shape[0]
    rot_thresh = jnp.radians(rot_thresh_deg)

    def body(carry, inp):
        last_t, last_q, count = carry
        t, q, okf, idx = inp
        dq = qprod(qconj(last_q), q)
        ang = jnp.linalg.norm(q2v(dq))
        dist = jnp.linalg.norm(t - last_t)
        accept = okf & (
            (ang >= rot_thresh) | (dist >= trans_thresh_m)
        ) & (count < max_keyframes)
        new_carry = (
            jnp.where(accept, t, last_t),
            jnp.where(accept, q, last_q),
            count + accept.astype(jnp.int32),
        )
        return new_carry, accept

    idxs = jnp.arange(n_frames, dtype=jnp.int32)
    init = (traj_t[0], traj_q[0], jnp.asarray(1, jnp.int32))
    _, accepted = jax.lax.scan(
        body, init, (traj_t, traj_q, ok, idxs)
    )
    accepted = accepted.at[0].set(True)  # frame 0 is always a keyframe

    # compact to fixed capacity: indices of accepted frames, padded
    order = jnp.argsort(~accepted, stable=True)  # accepted first
    indices = order[:max_keyframes].astype(jnp.int32)
    valid = accepted[indices]
    indices = jnp.sort(jnp.where(valid, indices, n_frames - 1))
    return KeyframeSet(
        indices=indices, valid=jnp.sort(valid)[::-1],
        n=jnp.sum(accepted).astype(jnp.int32),
    )
