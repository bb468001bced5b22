"""Tilted-start measurement for the plane-fit orientation prior
(VERDICT r4 #7): does SlamConfig.initial_orientation earn reference
parity (INITIAL_ORIENTATION_COMPENSATION=1, config_file.m:29)?

Scene: corridor with a world floor plane 1 m below the camera, whole
trajectory pitched 15° down (world stays gravity-aligned). Configs:
  A  prior OFF, heading OFF   — round-4 default
  B  prior OFF, heading every 8 — attitude updates assume a gravity-
     aligned filter frame; on a tilted start they fight the frame
  C  prior ON,  heading OFF
  D  prior ON,  heading every 8 — the reference's full startup
ATE is reported with SE(3) alignment (the prior changes the world-frame
convention of the estimate, so unaligned ATE would compare frames, not
accuracy).

Usage: python tools/measure_tilt.py [n_frames]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.data.synthetic import render_sequence
from pre3_tpu.ekf.slam import SlamConfig, run_slam
from pre3_tpu.eval.trajectory import ate_rmse
from pre3_tpu.frontend.pipeline import extract_features_sift
from pre3_tpu.geometry.camera import sr4000_camera

N_LANDMARKS = 256
BASE = SlamConfig(min_measured=50, max_update_slots=96)


def main(n_frames=128, tilt=-15.0):  # negative = camera pitched DOWN
    # (toward the floor); positive would pitch away from it
    cam = sr4000_camera()
    print("backend:", jax.default_backend(), flush=True)
    drift = 0.03 * 0.5 * n_frames
    frames, traj, _ = render_sequence(
        n_frames=n_frames, n_points=int(400 + 1.7 * n_frames),
        noise=0.004, x_range=(-1.8, drift + 1.8),
        floor_y=1.0, tilt_deg=tilt,
    )
    intensity = jnp.asarray(np.stack([f.intensity for f in frames]))
    xyz = jnp.asarray(np.nan_to_num(np.stack([f.xyz for f in frames])))
    conf = jnp.asarray(np.stack([f.confidence for f in frames]))
    gt = traj.t - traj.t[0]  # world (gravity-aligned) frame

    def run(cfg, xyz_imgs):
        @jax.jit
        def pipe(intensity, xyz_, conf, key):
            fs = jax.vmap(extract_features_sift)(intensity, xyz_, conf)
            return run_slam(
                cam, fs, key, cfg=cfg, n_landmarks=N_LANDMARKS,
                xyz_imgs=xyz_imgs,
            )
        out = pipe(intensity, xyz, conf, jax.random.PRNGKey(0))
        jax.block_until_ready(out.t)
        return out

    for name, cfg, use_xyz in (
        ("A prior=off heading=off", BASE, False),
        ("B prior=off heading=8  ",
         BASE._replace(heading_update_every=8), True),
        ("C prior=on  heading=off",
         BASE._replace(initial_orientation=True), True),
        ("D prior=on  heading=8  ",
         BASE._replace(initial_orientation=True,
                       heading_update_every=8), True),
    ):
        out = run(cfg, xyz if use_xyz else None)
        ate_al = ate_rmse(np.asarray(out.t), gt, align=True)
        print(f"[tilt {tilt:.0f}°] {name}  ATE(aligned) "
              f"{float(ate_al):.4f} m", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
