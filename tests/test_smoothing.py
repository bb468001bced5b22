"""Keyframe-correction smoothing tests."""

import jax.numpy as jnp
import numpy as np

from pre3_tpu.backend.smoothing import apply_ba_corrections, slerp
from pre3_tpu.geometry.quaternion import e2q, q2e


def test_slerp_endpoints_and_midpoint():
    q0 = e2q(jnp.array([0.0, 0.0, 0.0]))
    q1 = e2q(jnp.array([0.0, 0.0, 0.4]))
    np.testing.assert_allclose(slerp(q0, q1, jnp.asarray(0.0)), q0, atol=1e-6)
    np.testing.assert_allclose(slerp(q0, q1, jnp.asarray(1.0)), q1, atol=1e-6)
    mid = slerp(q0, q1, jnp.asarray(0.5))
    np.testing.assert_allclose(float(q2e(mid)[2]), 0.2, atol=1e-5)


def test_identity_corrections_noop():
    n = 10
    t = jnp.asarray(np.cumsum(np.ones((n, 3)) * 0.1, axis=0), jnp.float32)
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    kf = jnp.array([0, 4, 9])
    new_t, new_q = apply_ba_corrections(
        t, q, kf, jnp.ones(3, bool), t[kf], q[kf]
    )
    np.testing.assert_allclose(new_t, t, atol=1e-5)
    np.testing.assert_allclose(np.abs(new_q[:, 0]), 1.0, atol=1e-5)


def test_keyframes_land_on_ba_poses():
    rng = np.random.default_rng(0)
    n = 12
    t = jnp.asarray(np.cumsum(rng.normal(scale=0.05, size=(n, 3)), axis=0),
                    jnp.float32)
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    kf = jnp.array([0, 5, 11])
    ba_t = t[kf] + jnp.asarray(rng.normal(scale=0.02, size=(3, 3)),
                               jnp.float32)
    ba_q = q[kf]
    new_t, new_q = apply_ba_corrections(t, q, kf, jnp.ones(3, bool), ba_t,
                                        ba_q)
    np.testing.assert_allclose(new_t[kf], ba_t, atol=1e-5)


def test_interpolation_monotone():
    """Mid-frames interpolate smoothly between keyframe corrections."""
    n = 9
    t = jnp.zeros((n, 3))
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    kf = jnp.array([0, 8])
    ba_t = jnp.asarray([[0.0, 0, 0], [0.8, 0, 0]])
    new_t, _ = apply_ba_corrections(t, q, kf, jnp.ones(2, bool), ba_t,
                                    q[kf])
    np.testing.assert_allclose(
        np.asarray(new_t[:, 0]), np.arange(9) * 0.1, atol=1e-5
    )
