"""Disk caches for intermediate pipeline products (tiers 1–2 of SURVEY §5).

The reference pipelines its stages through `.mat` caches under the dataset
folder: per-frame SIFT results (`FeatureExtractionMatching/SIFT_result%04d.mat`,
SIFT_extract_save.m:104-106) and per-pair RANSAC pose shifts
(`RANSAC_pose_shift/RANSAC5_step_%d_%d.mat`, SIFT_match_save.m:79-80;
`RANSAC_pose_shift_dr_Ye/RANSAC_RESULT_%d_%d.mat`,
Calculate_V_Omega_RANSAC_dr_ye.m:12-27), with OVERWRITE / RECALCULATE
flags (config_file.m:95-97) controlling reuse. Those caches are both its
checkpoint/resume story for offline passes and its stage-handoff
"transport".

Here the same two tiers are npz files of the engine's pytrees (Features,
VoStep) — cheap host-side memoization around the jitted kernels, used by
the offline drivers (keyframe selection, batch VO) so interrupted passes
resume where they stopped. Tier 3 (full filter snapshots) lives in
utils/checkpoint.py.
"""

from __future__ import annotations

import os
from typing import Callable

import jax.numpy as jnp
import numpy as np

from pre3_tpu.frontend.pipeline import Features
from pre3_tpu.geometry.se3 import Pose
from pre3_tpu.vo.dead_reckoning import VoStep

FEATURE_DIR = "FeatureExtractionMatching"  # config_file.m:40-68 dir names
VO_DIR = "RANSAC_pose_shift"


def _save_npz(path: str, arrays: dict[str, np.ndarray]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: a crashed pass never leaves halves


class FeatureCache:
    """Per-frame feature cache (tier 1: SIFT_result%04d analog).

    get(step, compute) returns the cached Features for `step` or calls
    `compute()` and persists the result. `overwrite=True` ignores and
    replaces existing entries (the reference's RECALCULATE flag).
    """

    def __init__(self, root: str, overwrite: bool = False):
        self.dir = os.path.join(root, FEATURE_DIR)
        os.makedirs(self.dir, exist_ok=True)
        self.overwrite = overwrite

    def path(self, step: int) -> str:
        return os.path.join(self.dir, f"features_{step:04d}.npz")

    def get(self, step: int, compute: Callable[[], Features]) -> Features:
        p = self.path(step)
        if not self.overwrite and os.path.exists(p):
            with np.load(p) as z:
                return Features(**{f: jnp.asarray(z[f])
                                   for f in Features._fields})
        feats = compute()
        _save_npz(p, {f: np.asarray(getattr(feats, f))
                      for f in Features._fields})
        return feats


class VoCache:
    """Per-frame-pair VO cache (tier 2: RANSAC5_step_%d_%d analog)."""

    def __init__(self, root: str, overwrite: bool = False):
        self.dir = os.path.join(root, VO_DIR)
        os.makedirs(self.dir, exist_ok=True)
        self.overwrite = overwrite

    def path(self, step_pre: int, step_cur: int) -> str:
        return os.path.join(self.dir, f"vo_{step_pre}_{step_cur}.npz")

    def get(self, step_pre: int, step_cur: int,
            compute: Callable[[], VoStep]) -> VoStep:
        p = self.path(step_pre, step_cur)
        if not self.overwrite and os.path.exists(p):
            with np.load(p) as z:
                return VoStep(
                    delta=Pose(t=jnp.asarray(z["t"]), q=jnp.asarray(z["q"])),
                    ok=jnp.asarray(z["ok"]),
                    n_inliers=jnp.asarray(z["n_inliers"]),
                    n_matches=jnp.asarray(z["n_matches"]),
                    cov=jnp.asarray(z["cov"]),
                )
        step = compute()
        _save_npz(p, {
            "t": np.asarray(step.delta.t), "q": np.asarray(step.delta.q),
            "ok": np.asarray(step.ok),
            "n_inliers": np.asarray(step.n_inliers),
            "n_matches": np.asarray(step.n_matches),
            "cov": np.asarray(step.cov),
        })
        return step
