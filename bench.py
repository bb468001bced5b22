"""Benchmark driver. Prints ONE JSON line {metric, value, unit, vs_baseline}.

Headline: full EKF-SLAM frames/s (BASELINE config #3 — the reference's
flagship mono_slam.m pipeline: SIFT frontend → VO → inverse-depth EKF with
1-point RANSAC → map management), run as one jitted device program over a
synthetic SR4000-like sequence (no dataset ships with the reference; the
synthetic renderer provides ground truth, so the benchmark also reports
ATE as a correctness guard).

Secondary (in "extra"): VO dead-reckoning frames/s (config #1).

vs_baseline denominator: the reference MATLAB pipeline publishes no
frames/s (BASELINE.md); BASELINE_FPS below is the MEASURED steady-state
throughput of the reference-faithful single-thread NumPy port of the
mono_slam.m per-frame loop (pre3_tpu/eval/reference_port.py) on this
host — 7.96 frames/s, tools/measure_baseline.py, recorded in BASELINE.md.
North-star target: vs_baseline ≥ 10.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.data.synthetic import render_sequence
from pre3_tpu.ekf.slam import SlamConfig, run_slam
from pre3_tpu.eval.trajectory import ate_rmse
from pre3_tpu.frontend.pipeline import extract_features, extract_features_sift
from pre3_tpu.geometry.camera import sr4000_camera
from pre3_tpu.vo.dead_reckoning import run_sequence

BASELINE_FPS = 7.96  # measured reference-port fps on this host, see above
N_FRAMES = 64
N_LANDMARKS = 64


def time_reps(fn, reps=3):
    out = fn(0)
    jax.tree.leaves(out)[0].block_until_ready()  # compile+warm
    t0 = time.time()
    for r in range(reps):
        out = fn(r + 1)
        jax.tree.leaves(out)[0].block_until_ready()
    return out, (time.time() - t0) / reps


def main():
    cam = sr4000_camera()
    frames, traj, scene = render_sequence(
        n_frames=N_FRAMES, n_points=400, noise=0.004
    )
    intensity = jnp.asarray(np.stack([f.intensity for f in frames]))
    xyz = jnp.asarray(np.nan_to_num(np.stack([f.xyz for f in frames])))
    conf = jnp.asarray(np.stack([f.confidence for f in frames]))
    gt = (traj.t - traj.t[0]) @ traj.r[0]

    # ---- headline: full EKF-SLAM (SIFT frontend) ----
    @jax.jit
    def slam_pipeline(intensity, xyz, conf, key):
        feats = jax.vmap(
            lambda i, x, c: extract_features_sift(i, x, c)
        )(intensity, xyz, conf)
        return run_slam(cam, feats, key, n_landmarks=N_LANDMARKS)

    slam_out, slam_dt = time_reps(
        lambda r: slam_pipeline(intensity, xyz, conf, jax.random.PRNGKey(r))
    )
    slam_fps = N_FRAMES / slam_dt
    slam_ate = ate_rmse(np.asarray(slam_out.t), gt, align=False)

    # ---- secondary: VO dead reckoning (FAST+patch frontend) ----
    @jax.jit
    def vo_pipeline(intensity, xyz, conf, key):
        feats = jax.vmap(
            lambda i, x, c: extract_features(
                i, x, c, threshold=0.05, max_features=256
            )
        )(intensity, xyz, conf)
        return run_sequence(feats, key, batch=1024)

    vo_out, vo_dt = time_reps(
        lambda r: vo_pipeline(intensity, xyz, conf, jax.random.PRNGKey(r))
    )
    vo_fps = N_FRAMES / vo_dt
    vo_ate = ate_rmse(np.asarray(vo_out.t), gt, align=False)

    print(
        json.dumps(
            {
                "metric": "slam_frames_per_s",
                "value": round(slam_fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(slam_fps / BASELINE_FPS, 2),
                "extra": {
                    "backend": jax.default_backend(),
                    "n_frames": N_FRAMES,
                    "slam_ate_rmse_m": round(slam_ate, 4),
                    "slam_li_mean": float(
                        np.asarray(slam_out.stats.n_li).mean()
                    ),
                    "vo_frames_per_s": round(vo_fps, 2),
                    "vo_ate_rmse_m": round(vo_ate, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
