"""Benchmark driver. Prints ONE JSON line {metric, value, unit, vs_baseline}.

Headline: full EKF-SLAM frames/s (BASELINE config #3 — the reference's
flagship mono_slam.m pipeline: SIFT frontend → VO → inverse-depth EKF with
1-point RANSAC → map management) at the REFERENCE OPERATING POINT:
min_measured=50 (mono_slam.m:91), 256 landmark slots, a 256-frame
corridor sequence. One jitted device program (frontend vmapped + lax.scan
over the EKF) on a synthetic SR4000-like sequence (no dataset ships with
the reference; the synthetic renderer provides ground truth, so the
benchmark also reports ATE as a correctness guard).

In "extra":
  fps_k64 / fps_k256        — map-capacity scaling (gate: within 2×)
  per_stage_ms              — measured stage attribution: frontend alone,
                              plus scan-ablation deltas (only_predict
                              carries VO+predict+match+map-mgmt; pure_ekf
                              adds one Kalman update; 1pre adds RANSAC +
                              rescue + the second update)
  ba_fps / ba_ate_rmse_m    — config #4: keyframes + Schur BA + smoothing
  online_fps                — OnlineSlam streaming throughput (per-frame
                              dispatch, prefetchless inner loop)
  vo_frames_per_s           — config #1 secondary
  device_tflops / mxu_util  — XLA cost-analysis FLOPs over measured time;
                              utilization vs the chip's 197 TFLOP/s bf16
                              peak (conservative: the pipeline runs f32)

vs_baseline denominator: the reference MATLAB pipeline publishes no
frames/s (BASELINE.md); BASELINE_FPS below is the MEASURED steady-state
throughput of the reference-faithful single-thread NumPy port of the
mono_slam.m per-frame loop (pre3_tpu/eval/reference_port.py) on this
host — 7.96 frames/s, tools/measure_baseline.py, recorded in BASELINE.md.
North-star target: vs_baseline ≥ 10.
"""

import json
import sys
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
N_FRAMES = 256
N_LANDMARKS = 256  # headline map capacity (reference operating point)
CFG = SlamConfig(min_measured=50, max_update_slots=96)  # mono_slam.m:91;
# the bounded update is exact while ≤ 96 slots measure (n_li ≈ 40-50 at
# this operating point) and cuts the O(D²·2K) downdate 2.7× (BASELINE.md
# r4 map-capacity table)
BF16_PEAK_TFLOPS = 197.0  # v5e chip peak (pipeline is f32 → conservative)


def _sync(out):
    """Force completion: block AND fetch one output leaf. Through the
    remote-device tunnel, block_until_ready alone can return before the
    program actually finishes (measured: identical-args re-dispatches
    appear to take ~0.1 ms); a host fetch of any output buffer of the
    program is an unfakeable completion barrier."""
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


def time_reps(fn, reps=3):
    out = fn(0)
    _sync(out)  # compile+warm
    t0 = time.time()
    for r in range(reps):
        out = fn(r + 1)
        _sync(out)
    return out, (time.time() - t0) / reps


def time_reps_stats(fn, reps=5):
    """Per-rep timings for tunnel-noisy modes (VERDICT r4 #5: a metric
    with 2.7× run-to-run spread needs median + spread, not one sample).
    Returns (out, [per-rep seconds])."""
    out = fn(0)
    _sync(out)  # compile+warm
    times = []
    for r in range(reps):
        t0 = time.time()
        out = fn(r + 1)
        _sync(out)
        times.append(time.time() - t0)
    return out, times


def fps_stats(n_frames, times):
    fps = sorted(n_frames / t for t in times)
    return {
        "median": round(float(np.median(fps)), 2),
        "min": round(fps[0], 2),
        "max": round(fps[-1], 2),
        "n_runs": len(fps),
    }


def _note(msg):
    """Progress marker on stderr (stdout stays the single JSON line)."""
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    cam = sr4000_camera()
    # Corridor scene: the trajectory drifts ≈1.5 cm/frame in +x (≈3.8 m
    # over 256 frames); spread landmarks along the path at the same
    # per-view density as the round-1 64-frame box scene.
    drift = 0.03 * 0.5 * N_FRAMES
    frames, traj, scene = render_sequence(
        n_frames=N_FRAMES, n_points=832, noise=0.004,
        x_range=(-1.8, drift + 1.8),
    )

    # ---- reference-port head-to-head on the SAME corridor (host CPU) ----
    # The NumPy port of mono_slam.m runs concurrently in a host thread
    # while the TPU sections execute; its ATE at bench length is the
    # accuracy bound the engine must meet or beat, and its fps is the
    # honest same-sequence baseline denominator. Skip: PRE3_REF_PORT=0.
    import os
    import threading

    ref_result = {}

    def _ref_port():
        from pre3_tpu.eval.reference_port import run_reference_slam

        est, times = run_reference_slam(frames, min_measured=50)
        g = (np.asarray(traj.t) - np.asarray(traj.t[0])) @ np.asarray(
            traj.r[0]
        )
        ref_result["ate"] = float(np.sqrt(np.mean(
            np.sum((est - g[: len(est)]) ** 2, axis=1)
        )))
        warm = times[N_FRAMES // 4:]
        ref_result["fps"] = 1.0 / float(np.mean(warm))

    # started AFTER the online-streaming section (the last timed TPU
    # measurement): host CPU/GIL contention from the port thread would
    # otherwise skew both the host-bound TPU metrics and the port's own
    # fps denominator (ADVICE r3)
    ref_thread = None
    run_ref_port = os.environ.get("PRE3_REF_PORT", "1") != "0"
    intensity = jnp.asarray(np.stack([f.intensity for f in frames]))
    xyz = jnp.asarray(np.nan_to_num(np.stack([f.xyz for f in frames])))
    conf = jnp.asarray(np.stack([f.confidence for f in frames]))
    gt = (traj.t - traj.t[0]) @ traj.r[0]
    extra = {"backend": jax.default_backend(), "n_frames": N_FRAMES,
             "n_landmarks": N_LANDMARKS, "min_measured": CFG.min_measured}
    stage = {}

    # ---- frontend alone (stage attribution) ----
    fe = jax.jit(lambda i, x, c: jax.vmap(extract_features_sift)(i, x, c))
    feats, fe_dt = time_reps(lambda r: fe(intensity, xyz, conf))
    stage["frontend_sift"] = 1e3 * fe_dt / N_FRAMES
    _note(f"frontend {stage['frontend_sift']:.3f} ms/frame")

    # ---- headline: full EKF-SLAM, frontend + scan in ONE program ----
    def make_pipeline(cfg, k):
        @jax.jit
        def pipe(intensity, xyz, conf, key):
            fs = jax.vmap(extract_features_sift)(intensity, xyz, conf)
            return run_slam(cam, fs, key, cfg=cfg, n_landmarks=k)
        return pipe

    head = make_pipeline(CFG, N_LANDMARKS)
    slam_out, slam_dt = time_reps(
        lambda r: head(intensity, xyz, conf, jax.random.PRNGKey(r))
    )
    slam_fps = N_FRAMES / slam_dt
    slam_ate = ate_rmse(np.asarray(slam_out.t), gt, align=False)
    extra["slam_ate_rmse_m"] = round(float(slam_ate), 4)
    extra["slam_li_mean"] = round(
        float(np.asarray(slam_out.stats.n_li).mean()), 2
    )
    extra["slam_active_mean"] = round(
        float(np.asarray(slam_out.stats.n_active).mean()), 1
    )
    extra["fps_k256"] = round(slam_fps, 2)
    _note(f"headline {slam_fps:.1f} fps, ate {slam_ate:.4f}")

    # device-utilization figure from XLA's cost analysis of the compiled
    # headline program (flops are an HLO estimate; time is measured)
    try:
        lowered = head.lower(
            intensity, xyz, conf, jax.random.PRNGKey(0)
        ).compile()
        flops = float(lowered.cost_analysis()
                      .get("flops", 0.0))
        if flops > 0:
            tflops = flops / slam_dt / 1e12
            extra["device_tflops"] = round(tflops, 2)
            extra["mxu_util_pct_bf16peak"] = round(
                100.0 * tflops / BF16_PEAK_TFLOPS, 2
            )
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        pass

    # ---- map-capacity scaling: K=64 on the same sequence ----
    k64 = make_pipeline(CFG, 64)
    _, k64_dt = time_reps(
        lambda r: k64(intensity, xyz, conf, jax.random.PRNGKey(r))
    )
    extra["fps_k64"] = round(N_FRAMES / k64_dt, 2)
    _note(f"k64 {extra['fps_k64']} fps")

    # ---- scan-ablation stage deltas at K=256 (scan only, on feats) ----
    abl = {}
    for name, cfg in [
        ("only_predict", CFG._replace(only_predict=True)),
        ("pure_ekf", CFG._replace(est_method="pure_ekf")),
        ("1pre", CFG),
    ]:
        run = jax.jit(
            lambda f, key, c=cfg: run_slam(
                cam, f, key, cfg=c, n_landmarks=N_LANDMARKS
            )
        )
        _, dt = time_reps(lambda r: run(feats, jax.random.PRNGKey(r)))
        abl[name] = 1e3 * dt / N_FRAMES
    stage["vo_predict_match_mgmt"] = abl["only_predict"]
    stage["ekf_update"] = max(abl["pure_ekf"] - abl["only_predict"], 0.0)
    stage["ransac_rescue_hi_update"] = max(abl["1pre"] - abl["pure_ekf"], 0.0)
    extra["per_stage_ms"] = {k: round(v, 3) for k, v in stage.items()}
    _note(f"stages {extra['per_stage_ms']}")

    # ---- config #4: keyframes + Schur BA + smoothing ----
    from pre3_tpu.backend.ba import bundle_adjust
    from pre3_tpu.backend.ekf_ba import ba_problem_from_slam
    from pre3_tpu.backend.keyframes import select_keyframes
    from pre3_tpu.backend.smoothing import apply_ba_corrections

    t0 = time.time()
    ks = select_keyframes(
        slam_out.t, slam_out.q, jnp.ones(N_FRAMES, bool), max_keyframes=64
    )
    prob = ba_problem_from_slam(
        slam_out, np.asarray(ks.indices), np.asarray(ks.valid),
        max_landmarks=512,
    )
    if prob is not None:
        res = bundle_adjust(cam, prob, iters=10)
        sm_t, _ = apply_ba_corrections(
            slam_out.t, slam_out.q, ks.indices, ks.valid, res.kf_t, res.kf_q
        )
        jax.block_until_ready(sm_t)
        ba_compile_dt = time.time() - t0
        # steady-state: re-run the already-compiled backend
        t0 = time.time()
        res = bundle_adjust(cam, prob, iters=10)
        sm_t, _ = apply_ba_corrections(
            slam_out.t, slam_out.q, ks.indices, ks.valid, res.kf_t, res.kf_q
        )
        jax.block_until_ready(sm_t)
        ba_dt = time.time() - t0
        extra["ba_ate_rmse_m"] = round(
            float(ate_rmse(np.asarray(sm_t), gt, align=False)), 4
        )
        extra["ba_fps"] = round(N_FRAMES / (slam_dt + ba_dt), 2)
        extra["ba_ms_total"] = round(1e3 * ba_dt, 1)
        extra["ba_n_keyframes"] = int(ks.n)
        _note(f"ba {extra['ba_fps']} fps, ate {extra['ba_ate_rmse_m']}")

    # ---- loop-closure scenario (same shapes → same compiled program) ----
    # Out-and-back trajectory: the persistent map (max_invisible large)
    # lets the filter re-acquire outbound landmarks on the return leg
    # through the uncertainty-widened search gate — EKF loop closure —
    # and gives BA long-range constraints a pure corridor cannot.
    loop_drift = 0.03 * 0.5 * (N_FRAMES // 2)
    lframes, ltraj, _ = render_sequence(
        n_frames=N_FRAMES, n_points=600, noise=0.004,
        x_range=(-1.8, loop_drift + 1.8), loop=True,
    )
    li_ = jnp.asarray(np.stack([f.intensity for f in lframes]))
    lx = jnp.asarray(np.nan_to_num(np.stack([f.xyz for f in lframes])))
    lc = jnp.asarray(np.stack([f.confidence for f in lframes]))
    lgt = (ltraj.t - ltraj.t[0]) @ ltraj.r[0]
    # Plain CFG: measured (BASELINE.md r3) the invisible-landmark rule
    # should stay ON even for revisits — retained stale landmarks admit
    # wrong matches and cost accuracy (0.144 vs 0.128 m ATE).
    lout = head(li_, lx, lc, jax.random.PRNGKey(0))
    extra["loop_slam_ate_rmse_m"] = round(
        float(ate_rmse(np.asarray(lout.t), lgt, align=False)), 4
    )
    lks = select_keyframes(
        lout.t, lout.q, jnp.ones(N_FRAMES, bool), max_keyframes=64
    )
    lprob = ba_problem_from_slam(
        lout, np.asarray(lks.indices), np.asarray(lks.valid),
        max_landmarks=512,
    )
    if lprob is not None:
        lres = bundle_adjust(cam, lprob, iters=10)
        lsm_t, _ = apply_ba_corrections(
            lout.t, lout.q, lks.indices, lks.valid, lres.kf_t, lres.kf_q
        )
        extra["loop_ba_ate_rmse_m"] = round(
            float(ate_rmse(np.asarray(lsm_t), lgt, align=False)), 4
        )

    # ---- config #2: FAST frontend + NCC warped-patch matcher ----
    # (the reference's FEATURE_EXTRACTOR='FAST' mode: fast_corner_detect
    # + matching.m correlation scan; engine: frontend/fast.py +
    # ekf/ncc_matching.py). Measured at the same operating point as the
    # headline so BASELINE config #2 has recorded perf (VERDICT r3 #7).
    cfg_ncc = CFG._replace(matcher="ncc_warp", match_ratio=1.3)

    @jax.jit
    def fast_ncc_pipeline(intensity, xyz, conf, key):
        fs = jax.vmap(
            lambda i, x, c: extract_features(
                i, x, c, threshold=0.05, max_features=256
            )
        )(intensity, xyz, conf)
        return run_slam(
            cam, fs, key, cfg=cfg_ncc, n_landmarks=N_LANDMARKS,
            images=intensity, xyz_imgs=xyz,
        )

    fast_out, fast_times = time_reps_stats(
        lambda r: fast_ncc_pipeline(intensity, xyz, conf,
                                    jax.random.PRNGKey(r))
    )
    ncc = fps_stats(N_FRAMES, fast_times)
    extra["slam_fast_ncc_fps"] = ncc["median"]
    extra["slam_fast_ncc_fps_spread"] = ncc
    extra["slam_fast_ncc_ate_rmse_m"] = round(
        float(ate_rmse(np.asarray(fast_out.t), gt, align=False)), 4
    )
    _note(f"ncc {ncc['median']} fps")

    # ---- config #1: VO dead reckoning (FAST+patch frontend) ----
    @jax.jit
    def vo_pipeline(intensity, xyz, conf, key):
        fs = jax.vmap(
            lambda i, x, c: extract_features(
                i, x, c, threshold=0.05, max_features=256
            )
        )(intensity, xyz, conf)
        return run_sequence(fs, key, batch=1024)

    vo_out, vo_dt = time_reps(
        lambda r: vo_pipeline(intensity, xyz, conf, jax.random.PRNGKey(r))
    )
    extra["vo_frames_per_s"] = round(N_FRAMES / vo_dt, 2)
    extra["vo_ate_rmse_m"] = round(
        float(ate_rmse(np.asarray(vo_out.t), gt, align=False)), 4
    )
    _note(f"vo {extra['vo_frames_per_s']} fps")

    # ---- online streaming throughput (per-frame dispatch path) ----
    from pre3_tpu.runtime.online import OnlineSlam

    online = OnlineSlam(
        cam, cfg=CFG, n_landmarks=N_LANDMARKS, extractor="sift"
    )
    # device-resident inputs, PRE-SLICED before the timed loop: measures
    # engine streaming throughput (per-frame host→device copies are a
    # property of the transport — PCIe locally, the tunnel here — and an
    # eager slice per frame would add a dispatch round-trip that is not
    # part of the pipeline either)
    n_online = min(64, N_FRAMES - 2)
    frames_dev = [
        (intensity[i], xyz[i], conf[i]) for i in range(2 + n_online)
    ]
    jax.block_until_ready(frames_dev)
    for i in range(2):  # warm the jits
        online.process(frames_dev[i][0], frames_dev[i][1], frames_dev[i][2])
    np.asarray(online.results[-1].t)
    # latency mode: one dispatch per frame (chunk=1). Tunnel-noisy →
    # median + spread over ≥5 passes (VERDICT r4 #5)
    c1_times = []
    dispatch_s = 0.0
    for _rep in range(5):
        t0 = time.time()
        for i in range(2, 2 + n_online):
            r = online.process(frames_dev[i][0], frames_dev[i][1],
                               frames_dev[i][2])
        dispatch_s = time.time() - t0  # host loop, nothing forced yet
        np.asarray(r.t)  # fetch the last pose = pipeline completion
        c1_times.append(time.time() - t0)
    c1 = fps_stats(n_online, c1_times)
    extra["online_fps_chunk1"] = c1["median"]
    extra["online_fps_chunk1_spread"] = c1
    extra["online_dispatch_ms"] = round(1e3 * dispatch_s / n_online, 3)
    extra["online_latency_ms_per_frame"] = round(
        1e3 * np.median(c1_times) / n_online, 3
    )

    # throughput mode: 16 frames per dispatch (process_chunk) — the
    # per-execute overhead a remote/tunneled runtime charges a program is
    # paid per CHUNK here, so throughput approaches the offline scan.
    # Also tunnel-noisy (45–122 fps observed across r3/r4 single-sample
    # runs): median + spread over ≥5 passes
    c = 16
    n_chunks = (N_FRAMES - 2 - n_online) // c
    chunks = [
        (intensity[lo:lo + c], xyz[lo:lo + c], conf[lo:lo + c])
        for lo in range(2 + n_online, 2 + n_online + n_chunks * c, c)
    ]
    jax.block_until_ready(chunks)
    out = online.process_chunk(*chunks[0])  # warm the chunk program
    np.asarray(out[-1].t)
    n_done = (n_chunks - 1) * c
    ck_times = []
    for _rep in range(5):
        t0 = time.time()
        for ch in chunks[1:]:
            out = online.process_chunk(*ch)
        np.asarray(out[-1].t)
        ck_times.append(time.time() - t0)
    ck = fps_stats(n_done, ck_times)
    extra["online_fps"] = ck["median"]
    extra["online_fps_spread"] = ck
    extra["online_chunk"] = c
    _note(f"online c1 {c1['median']} / c16 {ck['median']} fps")

    # all timed TPU sections done — now run the CPU reference port
    # uncontended (it only shares the host with untimed result assembly)
    if run_ref_port:
        ref_thread = threading.Thread(target=_ref_port, daemon=True)
        ref_thread.start()

    if ref_thread is not None:
        ref_thread.join(timeout=600)
        if "ate" in ref_result:
            extra["ref_port_ate_rmse_m"] = round(ref_result["ate"], 4)
            extra["ref_port_fps_same_seq"] = round(ref_result["fps"], 2)
            extra["ate_vs_ref_port"] = round(
                extra["slam_ate_rmse_m"] / max(ref_result["ate"], 1e-9), 3
            )

    print(
        json.dumps(
            {
                "metric": "slam_frames_per_s",
                "value": round(slam_fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(slam_fps / BASELINE_FPS, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
