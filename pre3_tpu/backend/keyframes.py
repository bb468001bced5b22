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

import os
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


# ---------------------------------------------------------------------------
# Offline keyframing driver (the full SR4000_key_frame_selection.m pass)
# ---------------------------------------------------------------------------


class OfflineKeyframes(NamedTuple):
    """Result of the offline pass: accepted frame indices plus the VO
    increment of each accepted keyframe relative to the PREVIOUS keyframe
    (what the reference saves per accepted frame at :102-110)."""

    indices: np.ndarray  # [M] int
    delta_t: np.ndarray  # [M, 3] (zeros for the first keyframe)
    delta_q: np.ndarray  # [M, 4]
    n_vo_calls: int


def find_keyframes_vo(
    feats,  # Features pytree stacked over frames: leaves [F, ...]
    key,
    rot_thresh_deg: float = ROT_THRESH_DEG,
    trans_thresh_m: float = TRANS_THRESH_M,
    vo_cache=None,
    batch: int = 1024,
    min_inliers: int = 8,
) -> OfflineKeyframes:
    """Offline keyframe search, reference semantics: each candidate frame's
    VO is computed AGAINST THE LAST ACCEPTED KEYFRAME (find_the_key_frame,
    SR4000_key_frame_selection.m:72), not chained frame-to-frame, and the
    frame is accepted when a_rot ≥ 4° or ‖T‖ ≥ 0.05 m with a valid
    solution (:102). Invalid-VO frames are skipped (:75-81). A host loop
    over a jitted pair-VO kernel (offline pass; the online analog is
    select_keyframes above). `vo_cache` is a utils.cache.VoCache for
    resumable passes (the reference's RANSAC5_step_%d_%d.mat cache)."""
    import jax as _jax

    from pre3_tpu.vo.dead_reckoning import vo_pair

    n_frames = int(jax.tree.leaves(feats)[0].shape[0])
    rot_thresh = float(np.radians(rot_thresh_deg))
    pair = _jax.jit(lambda f1, f2, k: vo_pair(
        f1, f2, k, batch=batch, min_inliers=min_inliers
    ))
    frame = lambda i: jax.tree.map(lambda x: x[i], feats)

    last = 0
    indices = [0]
    deltas_t = [np.zeros(3, np.float32)]
    deltas_q = [np.array([1.0, 0, 0, 0], np.float32)]
    n_calls = 0
    for i in range(1, n_frames):
        key, sub = _jax.random.split(key)
        compute = lambda: pair(frame(last), frame(i), sub)
        step = (vo_cache.get(last, i, compute) if vo_cache is not None
                else compute())
        n_calls += 1
        if not bool(step.ok):
            continue  # skip frames whose VO fails (:75-81)
        ang = float(jnp.linalg.norm(q2v(step.delta.q)))
        dist = float(jnp.linalg.norm(step.delta.t))
        if ang >= rot_thresh or dist >= trans_thresh_m:
            indices.append(i)
            deltas_t.append(np.asarray(step.delta.t))
            deltas_q.append(np.asarray(step.delta.q))
            last = i
    return OfflineKeyframes(
        indices=np.asarray(indices, np.int64),
        delta_t=np.stack(deltas_t), delta_q=np.stack(deltas_q),
        n_vo_calls=n_calls,
    )


def export_keyframe_dataset(
    indices,
    out_dir: str,
    src_dir: str | None = None,
    feats=None,
    deltas: OfflineKeyframes | None = None,
) -> str:
    """Write the keyframe mirror dataset (the reference's renumber-and-copy
    into KeyFrames/, SR4000_key_frame_selection.m:112-143): accepted raw
    `d1_*.dat` frames from `src_dir` are copied as `d1_%04d.dat` with NEW
    consecutive numbering, per-keyframe features (if given, stacked over
    frames) are saved as npz, and `manifest.json` records the new→original
    index map plus inter-keyframe VO increments. Returns out_dir."""
    import json
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    indices = [int(i) for i in indices]
    if src_dir is not None:
        from pre3_tpu.data.sr4000 import list_sequence

        paths = list_sequence(src_dir)
        for new, orig in enumerate(indices):
            shutil.copyfile(
                paths[orig], os.path.join(out_dir, f"d1_{new + 1:04d}.dat")
            )
    if feats is not None:
        for new, orig in enumerate(indices):
            kf = jax.tree.map(lambda x: np.asarray(x[orig]), feats)
            with open(os.path.join(
                    out_dir, f"features_{new + 1:04d}.npz"), "wb") as f:
                np.savez(f, **{k: getattr(kf, k) for k in kf._fields})
    manifest = {
        "original_indices": indices,
        "rot_thresh_deg": ROT_THRESH_DEG,
        "trans_thresh_m": TRANS_THRESH_M,
    }
    if deltas is not None:
        manifest["delta_t"] = deltas.delta_t.tolist()
        manifest["delta_q"] = deltas.delta_q.tolist()
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir
