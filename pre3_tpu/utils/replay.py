"""Deterministic record/replay + feature-performance analysis.

Re-design of the reference's DATA_PLAY mode (mono_slam.m:265-427 +
config_file.m:27): there, every step's filter/features_info snapshot is
re-loaded from disk and per-feature tracking statistics are derived. Here
a recording is a checkpoint (utils/checkpoint.py) plus the input feature
sequence; replay re-runs the *same deterministic jitted program* from the
saved state — bit-stable because all randomness flows from the saved PRNG
key — and the feature-performance records come straight from the masked
state counters (the FeaturePerformance/ dumps of mono_slam.m:290-313).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np

from pre3_tpu.ekf.state import EkfState


class FeaturePerformance(NamedTuple):
    """Per-landmark tracking statistics (FeaturePerformance analog)."""

    slot: np.ndarray  # [M] landmark slot index
    times_predicted: np.ndarray  # [M]
    times_measured: np.ndarray  # [M]
    track_ratio: np.ndarray  # [M] measured / max(predicted, 1)
    age: np.ndarray  # [M] frames since init
    is_inverse_depth: np.ndarray  # [M]


def feature_performance(state: EkfState, step: int) -> FeaturePerformance:
    active = np.asarray(state.active)
    slots = np.nonzero(active)[0]
    tp = np.asarray(state.times_predicted)[slots]
    tm = np.asarray(state.times_measured)[slots]
    return FeaturePerformance(
        slot=slots,
        times_predicted=tp,
        times_measured=tm,
        track_ratio=tm / np.maximum(tp, 1),
        age=step - np.asarray(state.init_frame)[slots],
        is_inverse_depth=np.asarray(state.is_id)[slots],
    )


def replay_sequence(
    cam_model,
    feats,
    checkpoint_path: str,
    cfg=None,
    n_frames: int | None = None,
):
    """Resume a SLAM run from a checkpoint and re-run the remaining frames
    deterministically (the resume-from-step prompt of mono_slam.m:57-62,
    done properly: same state + same key ⇒ identical trajectory).

    Returns (trajectory-like list of (t, q), final_state, stats list)."""
    import jax.numpy as jnp

    from pre3_tpu.ekf.slam import SlamConfig, slam_step
    from pre3_tpu.utils.checkpoint import load_state

    cfg = cfg or SlamConfig()
    state, start_step, key, _ = load_state(checkpoint_path)
    total = feats.uv.shape[0] if n_frames is None else n_frames
    traj = []
    stats = []
    for k in range(start_step + 1, total):
        key, sub = jax.random.split(key)
        frame = jax.tree.map(lambda x: x[k], feats)
        prev = jax.tree.map(lambda x: x[k - 1], feats)
        state, st = slam_step(
            cam_model, state, frame, prev, jnp.asarray(k, jnp.int32), sub,
            cfg,
        )
        traj.append((np.asarray(state.x[0:3]), np.asarray(state.x[3:7])))
        stats.append(st)
    return traj, state, stats
