"""Quaternion algebra tests: group identities + conversion round trips.

Replaces the reference's by-hand F_test_q2rpy.m-style checks with proper
property tests; the analytic q2R form (slamToolbox q2R.m) is the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pre3_tpu.geometry import (
    qprod, qconj, qnormalize, q2r, r2q, v2q, q2v, e2q, q2e, qrotate,
)


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return np.asarray(qnormalize(jnp.asarray(q)))


def test_qprod_identity():
    q = jnp.asarray(random_quats(16))
    e = jnp.array([1.0, 0, 0, 0])
    np.testing.assert_allclose(qprod(q, e), q, atol=1e-6)
    np.testing.assert_allclose(qprod(e, q), q, atol=1e-6)


def test_qprod_conjugate_inverse():
    q = jnp.asarray(random_quats(16, seed=1))
    e = qprod(q, qconj(q))
    expect = jnp.zeros_like(e).at[:, 0].set(1.0)
    np.testing.assert_allclose(e, expect, atol=1e-5)


def test_q2r_homomorphism():
    """R(q1 ⊗ q2) = R(q1) R(q2)."""
    q1 = jnp.asarray(random_quats(8, seed=2))
    q2 = jnp.asarray(random_quats(8, seed=3))
    lhs = q2r(qprod(q1, q2))
    rhs = jnp.einsum("nij,njk->nik", q2r(q1), q2r(q2))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_q2r_orthonormal():
    q = jnp.asarray(random_quats(8, seed=4))
    r = q2r(q)
    eye = jnp.broadcast_to(jnp.eye(3), r.shape)
    np.testing.assert_allclose(
        jnp.einsum("nij,nkj->nik", r, r), eye, atol=1e-5
    )
    np.testing.assert_allclose(jnp.linalg.det(r), jnp.ones(8), atol=1e-5)


def test_qrotate_matches_matrix():
    q = jnp.asarray(random_quats(8, seed=5))
    v = jnp.asarray(np.random.default_rng(6).normal(size=(8, 3)), jnp.float32)
    np.testing.assert_allclose(
        qrotate(q, v), jnp.einsum("nij,nj->ni", q2r(q), v), atol=1e-5
    )


def test_r2q_roundtrip():
    q = jnp.asarray(random_quats(64, seed=7))
    q_canon = jnp.where(q[:, :1] < 0, -q, q)
    np.testing.assert_allclose(r2q(q2r(q)), q_canon, atol=1e-5)


def test_r2q_roundtrip_near_degenerate():
    """Exercise all four Shepperd pivot branches: rotations near pi about
    each axis have tiny trace."""
    vs = []
    for axis in np.eye(3):
        vs.append(axis * (np.pi - 1e-3))
        vs.append(axis * 1e-8)  # near identity
    v = jnp.asarray(np.array(vs), jnp.float32)
    q = v2q(v)
    np.testing.assert_allclose(r2q(q2r(q)), q, atol=1e-4)


def test_v2q_q2v_roundtrip():
    rng = np.random.default_rng(8)
    v = rng.normal(size=(32, 3)).astype(np.float32)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True) * rng.uniform(
        0, 3.0, size=(32, 1)
    ).astype(np.float32)
    np.testing.assert_allclose(q2v(v2q(jnp.asarray(v))), v, atol=1e-4)


def test_v2q_small_angle_grad():
    """v2q must be differentiable at v=0 (needed for autodiff Jacobians of
    the motion model)."""
    g = jax.jacfwd(v2q)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    # d q_vec / d v = I/2 at zero
    np.testing.assert_allclose(np.asarray(g)[1:, :], 0.5 * np.eye(3), atol=1e-6)


def test_e2q_q2e_roundtrip():
    rng = np.random.default_rng(9)
    e = np.stack(
        [
            rng.uniform(-3.0, 3.0, 32),
            rng.uniform(-1.4, 1.4, 32),  # pitch away from gimbal lock
            rng.uniform(-3.0, 3.0, 32),
        ],
        axis=-1,
    ).astype(np.float32)
    np.testing.assert_allclose(q2e(e2q(jnp.asarray(e))), e, atol=1e-4)


def test_e2q_axis_conventions():
    """90° yaw maps x̂ → ŷ, 90° roll maps ŷ → ẑ (ZYX convention)."""
    yaw90 = e2q(jnp.array([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(
        qrotate(yaw90, jnp.array([1.0, 0, 0])), jnp.array([0.0, 1, 0]), atol=1e-6
    )
    roll90 = e2q(jnp.array([np.pi / 2, 0.0, 0.0]))
    np.testing.assert_allclose(
        qrotate(roll90, jnp.array([0.0, 1, 0])), jnp.array([0.0, 0, 1]), atol=1e-6
    )
