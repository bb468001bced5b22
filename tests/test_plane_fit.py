"""Plane-fit orientation prior tests (reference C21/C22,
Test_Plane_fitting.m scenario with synthetic ground truth)."""

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.backend.plane_fit import (
    initial_orientation_from_floor, ransac_plane,
)
from pre3_tpu.geometry.quaternion import qrotate


def test_ransac_plane_with_outliers():
    rng = np.random.default_rng(0)
    n = 400
    # plane: n·x = d with normal (0, -0.8, 0.6)
    normal = np.array([0.0, -0.8, 0.6])
    normal /= np.linalg.norm(normal)
    d = 1.5
    u = rng.uniform(-1, 1, (n, 2))
    basis = np.linalg.svd(normal[None])[2][1:]  # two in-plane dirs
    pts = d * normal + u @ basis + rng.normal(scale=0.004, size=(n, 3))
    out_idx = rng.choice(n, 100, replace=False)
    pts[out_idx] += rng.uniform(0.3, 1.5, (100, 3))
    fit = ransac_plane(
        jax.random.PRNGKey(0), jnp.asarray(pts, jnp.float32),
        jnp.ones(n, bool), batch=512, threshold=0.02,
    )
    assert bool(fit.ok)
    n_est = np.asarray(fit.normal)
    cos = abs(float(n_est @ normal))
    assert cos > 0.999, f"normal cos {cos}"
    assert int(fit.inliers.sum()) > 250


def test_initial_orientation_levels_floor():
    """Tilted camera looking at a floor plane: the prior must rotate the
    floor normal to world-up."""
    from pre3_tpu.data.synthetic import _rodrigues

    h, w = 144, 176
    rng = np.random.default_rng(1)
    # camera tilted 20° about x: floor normal in camera frame
    tilt = _rodrigues(np.array([np.radians(-20.0), 0, 0]))  # pitch down: floor visible
    up_world = np.array([0.0, -1.0, 0.0])
    up_cam = tilt.T @ up_world
    # build xyz image: lower half is the floor plane n·x = -1 (floor 1 m
    # below camera), upper half far wall
    xyz = np.full((h, w, 3), np.nan, np.float32)
    for r in range(h):
        for c in range(0, w, 4):
            ray = np.array([(c - 88) / 250.0, (r - 72) / 250.0, 1.0])
            denom = ray @ up_cam
            if r > h * 0.55 and denom < -1e-3:
                s = -1.0 / denom  # floor 1 m below
                if 0 < s < 8:
                    xyz[r, c] = ray * s
            else:
                xyz[r, c] = ray * 4.0
    q0, ok = initial_orientation_from_floor(
        jax.random.PRNGKey(2), jnp.asarray(xyz)
    )
    assert bool(ok)
    up_rot = np.asarray(qrotate(q0, jnp.asarray(up_cam, jnp.float32)))
    cos = float(up_rot @ up_world)
    assert cos > 0.99, f"leveled cos {cos}"


def test_no_plane_returns_identity():
    xyz = np.full((144, 176, 3), np.nan, np.float32)
    q0, ok = initial_orientation_from_floor(
        jax.random.PRNGKey(3), jnp.asarray(xyz)
    )
    assert not bool(ok)
    np.testing.assert_allclose(np.asarray(q0), [1, 0, 0, 0])
