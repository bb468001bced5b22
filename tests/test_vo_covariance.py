"""VO covariance (IFT) tests: consistency against Monte-Carlo sampling —
the proper version of the reference's derivest cross-checks
(covariance_estimate_RANSAC.m)."""

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.vo.covariance import sr4000_point_covariance, vo_covariance
from pre3_tpu.vo.rigid import kabsch
from pre3_tpu.geometry.quaternion import q2v, r2q, qprod, qconj


def test_point_covariance_structure():
    p = jnp.array([0.0, 0.0, 2.0])
    c = np.asarray(sr4000_point_covariance(p))
    # along-ray variance = σ_r², cross-ray = (r σ_a)²
    assert c[2, 2] == np.float32(0.01**2)
    np.testing.assert_allclose(
        c[0, 0], (2.0 * 0.24 * np.pi / 180) ** 2, rtol=1e-5
    )
    np.testing.assert_allclose(c[0, 1], 0.0, atol=1e-12)


def test_covariance_matches_monte_carlo():
    rng = np.random.default_rng(0)
    n = 60
    from pre3_tpu.data.synthetic import _rodrigues

    r_true = _rodrigues(np.array([0.05, -0.03, 0.08])).astype(np.float32)
    t_true = np.array([0.1, -0.05, 0.02], np.float32)
    q2 = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
         rng.uniform(1.5, 3.5, n)], axis=-1
    ).astype(np.float32)
    p1_clean = q2 @ r_true.T + t_true
    w = jnp.ones(n)

    # analytic covariance at the noise-free fit
    cov = np.asarray(
        vo_covariance(jnp.asarray(r_true), jnp.asarray(t_true),
                      jnp.asarray(p1_clean), jnp.asarray(q2), w)
    )

    # Monte Carlo: perturb points with the sensor model, refit
    def sample_noise(pts, key):
        c = np.asarray(sr4000_point_covariance(jnp.asarray(pts)))
        ls = np.linalg.cholesky(c + 1e-12 * np.eye(3))
        z = rng.normal(size=(len(pts), 3)).astype(np.float32)
        return pts + np.einsum("nij,nj->ni", ls, z).astype(np.float32)

    thetas = []
    for trial in range(200):
        p1n = sample_noise(p1_clean, None)
        q2n = sample_noise(q2, None)
        fit = kabsch(jnp.asarray(p1n), jnp.asarray(q2n))
        # express as perturbation wrt the true pose: dt, dω
        dr = np.asarray(fit.r) @ r_true.T
        dw = np.asarray(q2v(r2q(jnp.asarray(dr))))
        dt = np.asarray(fit.t) - t_true
        thetas.append(np.concatenate([dt, dw]))
    emp = np.cov(np.stack(thetas).T)

    # diagonal magnitudes agree within MC error (factor ~2)
    d_an = np.diag(cov)
    d_emp = np.diag(emp)
    ratio = d_an / np.maximum(d_emp, 1e-12)
    assert np.all(ratio > 0.4) and np.all(ratio < 2.5), ratio


def test_covariance_shrinks_with_more_points():
    rng = np.random.default_rng(1)

    def cov_trace(n):
        q2 = np.stack(
            [rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
             rng.uniform(1.5, 3.5, n)], axis=-1
        ).astype(np.float32)
        p1 = q2 + np.array([0.1, 0, 0], np.float32)
        c = vo_covariance(
            jnp.eye(3), jnp.asarray([0.1, 0, 0]), jnp.asarray(p1),
            jnp.asarray(q2), jnp.ones(n),
        )
        return float(jnp.trace(c))

    assert cov_trace(200) < cov_trace(20)
