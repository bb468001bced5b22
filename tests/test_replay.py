"""Record/replay determinism test (DATA_PLAY analog): resuming from a
mid-sequence checkpoint reproduces the original trajectory exactly."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pre3_tpu.data.synthetic import render_sequence
from pre3_tpu.ekf.slam import SlamConfig, slam_step
from pre3_tpu.ekf.state import init_state
from pre3_tpu.ekf.measurement import predict_measurements
from pre3_tpu.ekf.map_management import add_features
from pre3_tpu.frontend.pipeline import extract_features
from pre3_tpu.geometry.camera import sr4000_camera
from pre3_tpu.utils.checkpoint import save_state
from pre3_tpu.utils.replay import feature_performance, replay_sequence

CAM = sr4000_camera()


@pytest.mark.slow
def test_replay_reproduces_trajectory():
    frames, traj, scene = render_sequence(n_frames=6, n_points=250,
                                          noise=0.004)
    feats = [
        extract_features(
            jnp.asarray(f.intensity), jnp.asarray(f.xyz),
            jnp.asarray(f.confidence), threshold=0.05, max_features=128,
        )
        for f in frames
    ]
    feats = jax.tree.map(lambda *xs: jnp.stack(xs), *feats)
    cfg = SlamConfig(vo_batch=256, ransac_batch=128)

    # run step-by-step, checkpoint at step 2
    state = init_state(n_landmarks=32, desc_dim=feats.desc.shape[-1])
    first = jax.tree.map(lambda x: x[0], feats)
    obs0 = predict_measurements(CAM, state)
    state = add_features(
        CAM, state, first, obs0.h, jnp.asarray(0, jnp.int32),
        n_measured=jnp.asarray(0, jnp.int32), max_adds=24, min_measured=25,
    )
    key = jax.random.PRNGKey(7)
    original = []
    ckpt_args = None
    for k in range(1, 6):
        key, sub = jax.random.split(key)
        frame = jax.tree.map(lambda x: x[k], feats)
        prev = jax.tree.map(lambda x: x[k - 1], feats)
        if k == 3:
            ckpt_args = (state, k - 1, key)
        state, _ = slam_step(CAM, state, frame, prev,
                             jnp.asarray(k, jnp.int32), sub, cfg)
        original.append(np.asarray(state.x[0:3]))

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "snap.npz")
        save_state(p, ckpt_args[0], step=ckpt_args[1], key=ckpt_args[2])
        rep_traj, rep_state, _ = replay_sequence(CAM, feats, p, cfg=cfg)

    replayed = [t for t, q in rep_traj]
    np.testing.assert_allclose(
        np.stack(replayed), np.stack(original[2:]), atol=1e-6
    )
    perf = feature_performance(rep_state, step=5)
    assert len(perf.slot) > 5
    assert np.all(perf.track_ratio <= 1.0)
