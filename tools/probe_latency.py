"""Per-execute overhead probe for the chunk=1 streaming path (VERDICT r3
#10): decompose online_latency_ms_per_frame into (a) a runtime floor that
any program pays per execute (tunnel RTT + dispatch), (b) a
program-size-proportional component, (c) actual compute.

Programs timed, in increasing size:
  tiny    — x + 1 on a [8] array
  mid     — one [1024, 1024] matmul
  fe      — the SIFT frontend alone (one frame)
  slam    — the full fused OnlineSlam step (frontend + EKF, chunk=1)
  slam-lean — same step with stats/record outputs dropped (tests whether
              output count / program size moves the per-execute cost)

Each timed as median of 20 dispatch→fetch round trips on device-resident
inputs. If tiny ≈ slam, the floor is tunnel-inherent and no program diet
can beat it; the written conclusion goes to BASELINE.md.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/probe_latency.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from pre3_tpu.data.synthetic import render_sequence  # noqa: E402
from pre3_tpu.ekf.slam import SlamConfig  # noqa: E402
from pre3_tpu.geometry.camera import sr4000_camera  # noqa: E402
from pre3_tpu.runtime.online import OnlineSlam  # noqa: E402


def emit(k, v):
    print(json.dumps({k: round(v, 2)}), flush=True)


def med_roundtrip(fn, args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.ravel()[0])  # fetch = unfakeable completion
        ts.append(time.time() - t0)
    return 1e3 * float(np.median(ts))


def main():
    cam = sr4000_camera()
    res = {}

    x8 = jnp.zeros(8)
    res["tiny_ms"] = med_roundtrip(jax.jit(lambda x: x + 1.0), (x8,))
    emit("tiny_ms", res["tiny_ms"])

    a = jnp.ones((1024, 1024))
    res["mid_matmul_ms"] = med_roundtrip(
        jax.jit(lambda a: a @ a), (a,)
    )
    emit("mid_matmul_ms", res["mid_matmul_ms"])

    frames, _, _ = render_sequence(n_frames=4, n_points=300, noise=0.004)
    i0 = jnp.asarray(frames[0].intensity)
    x0 = jnp.asarray(np.nan_to_num(frames[0].xyz))
    c0 = jnp.asarray(frames[0].confidence)

    from pre3_tpu.frontend.pipeline import extract_features_sift

    fe = jax.jit(extract_features_sift)
    res["frontend_ms"] = med_roundtrip(fe, (i0, x0, c0))
    emit("frontend_ms", res["frontend_ms"])

    # full fused step (the production chunk=1 program)
    slam = OnlineSlam(cam, cfg=SlamConfig(min_measured=50),
                      n_landmarks=256, extractor="sift")
    slam.process(i0, x0, c0)
    i1 = jnp.asarray(frames[1].intensity)
    x1 = jnp.asarray(np.nan_to_num(frames[1].xyz))
    c1 = jnp.asarray(frames[1].confidence)
    slam.process(i1, x1, c1)  # compile fused
    np.asarray(slam.results[-1].t)
    ts = []
    fr = [(jnp.asarray(f.intensity), jnp.asarray(np.nan_to_num(f.xyz)),
           jnp.asarray(f.confidence)) for f in frames[2:]]
    for rep in range(20):
        f = fr[rep % len(fr)]
        t0 = time.time()
        r = slam.process(*f)
        np.asarray(r.t)
        ts.append(time.time() - t0)
    res["slam_step_ms"] = 1e3 * float(np.median(ts))
    emit("slam_step_ms", res["slam_step_ms"])

    # lean variant: same computation, stats/record outputs dropped
    def lean(state, key, step_i, prev, intensity, xyz, conf):
        out = slam.fused_fn(state, key, step_i, prev, intensity, xyz, conf)
        return out[0], out[1], out[2], out[3], out[4], out[5]

    jlean = jax.jit(lean, donate_argnums=(0, 1, 2, 3))
    carry = slam._carry
    state, key, step, feats = carry
    out = jlean(state, key, step, feats, *fr[0])
    jax.block_until_ready(out[4])
    ts = []
    for rep in range(20):
        f = fr[rep % len(fr)]
        t0 = time.time()
        out = jlean(out[0], out[1], out[2], out[3], *f)
        np.asarray(out[4])
        ts.append(time.time() - t0)
    res["slam_step_lean_ms"] = 1e3 * float(np.median(ts))
    emit("slam_step_lean_ms", res["slam_step_lean_ms"])

    res = {k: round(v, 2) for k, v in res.items()}
    res["conclusion_floor_ms"] = res["tiny_ms"]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
