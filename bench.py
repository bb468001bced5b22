"""Benchmark driver: full VO pipeline frames/s on the available backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Pipeline benchmarked (BASELINE config #1, the reference's
Test_RANSAC_dead_reckoning path): per frame — FAST detect → patch
descriptors → depth lift → descriptor matmul matching → 1024-hypothesis
batched RANSAC rigid fit → pose chaining. The whole sequence is one jitted
program (features vmapped over frames, lax.scan over pairs).

vs_baseline denominator: the reference MATLAB pipeline publishes no
frames/s; BASELINE.md records the estimate MATLAB_FPS below (per-frame
SIFT×3 + ≤2000-iteration sequential RANSAC + dense-EKF on 176×144 at an
assumed 10 Hz sensor; the pipeline is below real time on period CPUs).
The north-star target is vs_baseline ≥ 10.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.data.synthetic import render_sequence
from pre3_tpu.frontend.pipeline import extract_features
from pre3_tpu.vo.dead_reckoning import run_sequence

MATLAB_FPS = 2.0  # documented estimate of the reference pipeline, see above
N_FRAMES = 64
MAX_FEATURES = 256
RANSAC_BATCH = 1024


def main():
    frames, traj, scene = render_sequence(
        n_frames=N_FRAMES, n_points=400, noise=0.004
    )
    intensity = jnp.asarray(np.stack([f.intensity for f in frames]))
    xyz = jnp.asarray(np.nan_to_num(np.stack([f.xyz for f in frames])))
    conf = jnp.asarray(np.stack([f.confidence for f in frames]))

    @jax.jit
    def pipeline(intensity, xyz, conf, key):
        feats = jax.vmap(
            lambda i, x, c: extract_features(
                i, x, c, threshold=0.05, max_features=MAX_FEATURES
            )
        )(intensity, xyz, conf)
        return run_sequence(feats, key, batch=RANSAC_BATCH)

    key = jax.random.PRNGKey(0)
    out = pipeline(intensity, xyz, conf, key)  # compile + run
    out.t.block_until_ready()

    # steady-state timing
    reps = 5
    t0 = time.time()
    for r in range(reps):
        out = pipeline(intensity, xyz, conf, jax.random.PRNGKey(r))
        out.t.block_until_ready()
    dt = time.time() - t0
    fps = N_FRAMES * reps / dt

    # sanity: the benchmark must also be *correct*
    from pre3_tpu.eval.trajectory import ate_rmse

    gt = (traj.t - traj.t[0]) @ traj.r[0]
    ate = ate_rmse(np.asarray(out.t), gt, align=False)

    print(
        json.dumps(
            {
                "metric": "vo_frames_per_s",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / MATLAB_FPS, 2),
                "extra": {
                    "backend": jax.default_backend(),
                    "n_frames": N_FRAMES,
                    "ate_rmse_m": round(ate, 4),
                    "vo_ok_frac": float(np.asarray(out.ok).mean()),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
