"""Online streaming SLAM driver with stage pipelining.

The reference's online loop (mono_slam.m:113-435) is strictly serial:
decode → SIFT → match → EKF per frame, with disk .mat files as the only
stage handoff (RANSAC_CALC_SAVE_SR4000.m:14-15). This driver is the
TPU-native replacement for that whole arrangement:

  * decode / host IO runs in a background thread pool (prefetch depth N),
    overlapping disk + numpy work with device compute;
  * the frontend (feature extraction, a jitted program) and the backend
    (the jitted EKF step) are dispatched asynchronously — JAX's async
    dispatch queues frame k's EKF step and frame k+1's extraction on the
    device without host blocking, so the host only synchronizes when a
    pose is actually read.

Snapshots (utils/checkpoint.py) every `snapshot_every` steps reproduce the
DataSnapshots resume tier (mono_slam.m:57-62,251-264).
"""

from __future__ import annotations

import itertools
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Any, Callable, Iterable, Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.ekf.map_management import add_features
from pre3_tpu.ekf.measurement import predict_measurements
from pre3_tpu.ekf.slam import SlamConfig, StepStats, slam_step
from pre3_tpu.ekf.state import EkfState, init_state
from pre3_tpu.frontend.pipeline import (
    Features, extract_features, extract_features_sift,
)
from pre3_tpu.geometry.camera import Camera
from pre3_tpu.utils.profiling import StageTimer


class StepResult(NamedTuple):
    step: int
    t: jnp.ndarray  # [3] device array (lazy)
    q: jnp.ndarray  # [4]
    stats: StepStats


class OnlineSlam:
    """Feed frames one at a time; poses stream out.

    >>> slam = OnlineSlam(cam)
    >>> for fr in frames:
    ...     res = slam.process(fr.intensity, fr.xyz, fr.confidence)
    """

    def __init__(
        self,
        cam: Camera,
        cfg: SlamConfig = SlamConfig(),
        n_landmarks: int = 64,
        extractor: str = "fast",
        extractor_kwargs: dict[str, Any] | None = None,
        key: jax.Array | None = None,
        snapshot_dir: str | None = None,
        snapshot_every: int = 0,
        timer: StageTimer | None = None,
        sync_timing: bool = False,
    ) -> None:
        self.cam = cam
        self.cfg = cfg
        self.n_landmarks = n_landmarks
        self.timer = timer or StageTimer()
        self.sync = sync_timing
        self.snapshot_dir = snapshot_dir
        self.snapshot_every = snapshot_every
        self._key = key if key is not None else jax.random.PRNGKey(0)
        ek = dict(extractor_kwargs or {})
        if extractor == "fast":
            self._featurize = partial(extract_features, **ek)
        elif extractor == "sift":
            self._featurize = partial(extract_features_sift, **ek)
        else:
            raise ValueError(f"unknown extractor {extractor!r}")
        self._needs_image = cfg.matcher == "ncc_warp"

        def step(state, key, frame, prev, step_i, image, xyz_img):
            # key chaining and pose extraction live INSIDE the program:
            # one dispatch per frame, no eager split/slice round-trips
            # (each eager op costs a full tunnel RTT on remote devices)
            key, sub = jax.random.split(key)
            state, (stats, _record) = slam_step(
                cam, state, frame, prev, step_i, sub, cfg,
                image=image, xyz_img=xyz_img,
            )
            return state, key, state.x[0:3], state.x[3:7], stats

        # Donating the state aliases its input/output buffers so the
        # [D, D] covariance allocation is reused every step instead of
        # reallocated.
        self._jstep = jax.jit(step, donate_argnums=(0, 1))

        def boot(state, feats, image):
            obs0 = predict_measurements(cam, state, std_z=cfg.std_z)
            return add_features(
                cam, state, feats, obs0.h, jnp.asarray(0, jnp.int32),
                n_measured=jnp.asarray(0, jnp.int32),
                max_adds=cfg.max_adds * 4,
                min_measured=cfg.min_measured,
                std_pxl=cfg.std_z,
                image=image,
            )

        # jitted: the eager form dispatches thousands of primitives
        # one-by-one, which is pathological on a remote-tunneled device
        self._jboot = jax.jit(boot)
        self.state: EkfState | None = None
        self._prev: Features | None = None
        self.step_i = 0
        self.results: list[StepResult] = []

    # -- pipeline stages ---------------------------------------------------

    def _extract(self, intensity, xyz, confidence):
        img = jnp.asarray(intensity, jnp.float32)
        # NaN handling happens inside the jitted extractors; a host-side
        # nan_to_num here would force device→host→device round trips when
        # the caller feeds device-resident arrays.
        xyzj = jnp.asarray(xyz, jnp.float32)
        conf = jnp.asarray(confidence, jnp.float32)
        with self.timer.stage("frontend"):
            feats = self._featurize(img, xyzj, conf)
            if self.sync:
                jax.block_until_ready(feats.uv)
        return feats, img, xyzj

    def _bootstrap(self, feats: Features, img, xyzj) -> None:
        self.state = init_state(
            n_landmarks=self.n_landmarks, desc_dim=feats.desc.shape[-1]
        )
        self.state = self._jboot(
            self.state, feats, img if self._needs_image else None
        )

    def process(self, intensity, xyz, confidence) -> StepResult:
        """Feed one frame. Returns lazily-valued device pose arrays —
        reading them syncs; not reading them keeps the pipe full."""
        feats, img, xyzj = self._extract(intensity, xyz, confidence)
        if self.state is None:
            self._bootstrap(feats, img, xyzj)
            res = StepResult(
                0, self.state.x[0:3], self.state.x[3:7],
                None,
            )
        else:
            args = (
                self.state, self._key, feats, self._prev,
                jnp.asarray(self.step_i, jnp.int32),
                img if self._needs_image else None,
                xyzj if self._needs_image else None,
            )
            with self.timer.stage("ekf_step_dispatch"):
                # slam_step's closure constants are all numpy (embedded as
                # HLO literals — see geometry/camera.py::sr4000_camera), so
                # the compiled program's buffer list is exactly the
                # arguments and this dispatch stays valid across
                # snapshot/resume with no recompile workaround.
                self.state, self._key, t, q, stats = self._jstep(*args)
                if self.sync:
                    jax.block_until_ready(self.state.x)
            res = StepResult(self.step_i, t, q, stats)
        self._prev = feats
        self.step_i += 1
        self.results.append(res)
        if (
            self.snapshot_dir
            and self.snapshot_every
            and self.step_i % self.snapshot_every == 0
        ):
            self.snapshot()
        return res

    def run(
        self,
        frames: Iterable,
        decode: Callable[[Any], tuple] | None = None,
        prefetch: int = 2,
    ) -> list[StepResult]:
        """Drive a whole sequence with host-side decode prefetch.

        `decode(frame) -> (intensity, xyz, confidence)` runs in a
        background thread pool `prefetch` frames ahead of the device
        (defaults to attribute access for Frame-like objects)."""
        if decode is None:
            def decode(f):
                return f.intensity, f.xyz, f.confidence

        it: Iterator = iter(frames)
        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = [
                pool.submit(decode, f)
                for f in itertools.islice(it, prefetch)
            ]
            while pending:
                fut = pending.pop(0)
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(pool.submit(decode, nxt))
                with self.timer.stage("decode_wait"):
                    args = fut.result()
                self.process(*args)
        return self.results

    # -- persistence --------------------------------------------------------

    def snapshot(self) -> str:
        from pre3_tpu.utils.checkpoint import save_state

        path = f"{self.snapshot_dir}/snapshot_{self.step_i:05d}.npz"
        save_state(path, self.state, self.step_i, self._key)
        return path

    def resume(self, path: str) -> None:
        """Restore state/step/key from a snapshot. The previous frame's
        features are transient (not checkpointed — same as the reference,
        whose resume re-reads the image, mono_slam.m:121-135): call
        prime() with frame step_i−1 before the next process()."""
        from pre3_tpu.utils.checkpoint import load_state

        self.state, self.step_i, self._key, _ = load_state(path)

    def prime(self, intensity, xyz, confidence) -> None:
        """Set the previous-frame features after resume()."""
        self._prev, _, _ = self._extract(intensity, xyz, confidence)

    # -- views ---------------------------------------------------------------

    @property
    def trajectory(self) -> tuple[np.ndarray, np.ndarray]:
        """([F, 3], [F, 4]) — synchronizes."""
        ts = np.stack([np.asarray(r.t) for r in self.results])
        qs = np.stack([np.asarray(r.q) for r in self.results])
        return ts, qs
