"""Stage-pipeline tests (SURVEY §2.4 pipeline-over-stages row): the
sharded frontend + chunked backend must reproduce the monolithic
run_slam exactly (same PRNG schedule), sharded or not."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pre3_tpu.data.synthetic import render_sequence
from pre3_tpu.ekf.slam import SlamConfig, run_slam
from pre3_tpu.frontend.pipeline import extract_features
from pre3_tpu.geometry.camera import sr4000_camera
from pre3_tpu.parallel.mesh import make_mesh
from pre3_tpu.runtime.stage_pipeline import (
    run_slam_pipelined, sharded_extract,
)

CAM = sr4000_camera()
EK = {"threshold": 0.05, "max_features": 128}
CFG = SlamConfig(match_ratio=1.3)


@pytest.fixture(scope="module")
def seq():
    frames, traj, _ = render_sequence(n_frames=9, n_points=300, noise=0.004)
    intensity = jnp.asarray(np.stack([f.intensity for f in frames]))
    xyz = jnp.asarray(np.nan_to_num(np.stack([f.xyz for f in frames])))
    conf = jnp.asarray(np.stack([f.confidence for f in frames]))
    return intensity, xyz, conf, traj


def test_sharded_extract_matches_serial(seq):
    intensity, xyz, conf, _ = seq
    mesh = make_mesh(8, axis="frame")
    out = sharded_extract(
        mesh, intensity[:8], xyz[:8], conf[:8],
        extractor="fast", extractor_kwargs=EK,
    )
    ref = jax.vmap(lambda i, x, c: extract_features(i, x, c, **EK))(
        intensity[:8], xyz[:8], conf[:8]
    )
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("use_mesh", [False, True])
def test_pipelined_matches_run_slam(seq, use_mesh):
    intensity, xyz, conf, _ = seq
    key = jax.random.PRNGKey(3)
    mesh = make_mesh(4, axis="frame") if use_mesh else None
    out = run_slam_pipelined(
        CAM, intensity, xyz, conf, key, mesh=mesh, cfg=CFG,
        n_landmarks=32, chunk=4, extractor="fast", extractor_kwargs=EK,
    )
    feats = jax.vmap(lambda i, x, c: extract_features(i, x, c, **EK))(
        intensity, xyz, conf
    )
    ref = run_slam(CAM, feats, key, cfg=CFG, n_landmarks=32)
    np.testing.assert_allclose(
        np.asarray(out.t), np.asarray(ref.t), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.q), np.asarray(ref.q), atol=1e-4
    )
    assert np.array_equal(
        np.asarray(out.stats.n_li), np.asarray(ref.stats.n_li)
    )
