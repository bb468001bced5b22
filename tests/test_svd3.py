"""Closed-form 3×3 SVD vs jnp.linalg.svd, incl. degenerate inputs."""

import jax.numpy as jnp
import numpy as np

from pre3_tpu.ops.svd3 import svd3, sym3_eigvals


def check_svd(a, atol=5e-4):
    u, s, vt = svd3(jnp.asarray(a))
    u, s, vt = np.asarray(u), np.asarray(s), np.asarray(vt)
    # reconstruction
    rec = u @ (s[..., None] * vt)
    rec_tol = max(atol, 2e-2 * float(np.abs(a).max()))
    assert np.abs(rec - a).max() <= rec_tol, np.abs(rec - a).max()
    # orthogonality
    eye = np.broadcast_to(np.eye(3), u.shape)
    np.testing.assert_allclose(
        u @ np.swapaxes(u, -1, -2), eye, atol=atol
    )
    np.testing.assert_allclose(
        vt @ np.swapaxes(vt, -1, -2), eye, atol=atol
    )
    # descending nonnegative
    assert np.all(s[..., 0] + 1e-6 >= s[..., 1])
    assert np.all(s[..., 1] + 1e-6 >= s[..., 2])
    assert np.all(s >= -1e-6)
    # singular values match lapack; small σ computed via AᵀA carry an
    # f32 floor of ~√eps·σ₁ ≈ 2e-2·σ₁ (documented svd3 contract)
    s_ref = np.linalg.svd(a, compute_uv=False)
    floor = np.maximum(atol, 2e-2 * (s_ref[..., :1] + 1e-9))
    assert np.all(np.abs(s - s_ref) <= floor), np.abs(s - s_ref).max()


def test_random_batch():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(256, 3, 3)).astype(np.float32)
    check_svd(a, atol=1e-3)


def test_scaled_inputs():
    rng = np.random.default_rng(1)
    for scale in (1e-3, 1.0, 1e3):
        a = (rng.normal(size=(32, 3, 3)) * scale).astype(np.float32)
        check_svd(a, atol=1e-3 * scale)


def test_rank_two_coplanar():
    """Coplanar point sets give rank-2 cross-covariances — the reference's
    state=2 case (find_transform_matrix.m:27-33)."""
    rng = np.random.default_rng(2)
    b = rng.normal(size=(16, 3, 2)).astype(np.float32)
    c = rng.normal(size=(16, 2, 3)).astype(np.float32)
    a = b @ c  # rank ≤ 2
    check_svd(a, atol=1e-3)


def test_rank_one_collinear():
    rng = np.random.default_rng(3)
    u = rng.normal(size=(16, 3, 1)).astype(np.float32)
    v = rng.normal(size=(16, 1, 3)).astype(np.float32)
    check_svd(u @ v, atol=1e-3)


def test_zero_matrix():
    check_svd(np.zeros((4, 3, 3), np.float32))


def test_identity_and_rotations():
    from pre3_tpu.data.synthetic import _rodrigues

    mats = [np.eye(3)]
    rng = np.random.default_rng(4)
    for _ in range(8):
        mats.append(_rodrigues(rng.normal(size=3)))
    check_svd(np.stack(mats).astype(np.float32), atol=5e-4)


def test_repeated_singular_values():
    # diag(2, 2, 1) — repeated σ: eigvector plane degenerate
    a = np.stack([np.diag([2.0, 2.0, 1.0]), np.diag([3.0, 3.0, 3.0])])
    check_svd(a.astype(np.float32))


def test_eigvals_match_numpy():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(64, 3, 3)).astype(np.float32)
    a = x @ np.swapaxes(x, -1, -2)
    ours = np.asarray(sym3_eigvals(jnp.asarray(a)))
    ref = np.linalg.eigvalsh(a)[..., ::-1]
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_kabsch_with_svd3_matches_reference_rotation():
    """End use: Kabsch through svd3 must recover known rotations including
    the planar det-flip case."""
    from pre3_tpu.data.synthetic import _rodrigues
    from pre3_tpu.vo.rigid import kabsch

    rng = np.random.default_rng(6)
    r = _rodrigues(np.array([0.2, -0.1, 0.3])).astype(np.float32)
    q = rng.uniform(-1, 1, (30, 3)).astype(np.float32)
    q[:, 2] *= 1e-7  # coplanar
    p = q @ r.T + np.array([0.1, 0.2, -0.1], np.float32)
    fit = kabsch(jnp.asarray(p), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(fit.r), r, atol=1e-3)
    assert float(jnp.linalg.det(fit.r)) > 0.9
