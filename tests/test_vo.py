"""VO tests: Kabsch/Horn rigid fit + batched RANSAC with outliers.

Oracle pattern follows the reference's TestScripts RANSAC comparisons
(Test_RANSAC_methodver2_*.m): known rigid motions on random point clouds,
with and without outlier contamination.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.vo.rigid import horn_quaternion, kabsch
from pre3_tpu.vo.ransac import ransac_rigid


def make_rigid_problem(n=50, seed=0, noise=0.0, outlier_frac=0.0):
    rng = np.random.default_rng(seed)
    q2 = rng.uniform(-1, 1, (n, 3)).astype(np.float32) * 2.0
    # random rotation + translation
    a = rng.normal(size=3)
    a = a / np.linalg.norm(a) * rng.uniform(0.1, 1.0)
    from pre3_tpu.data.synthetic import _rodrigues

    r = _rodrigues(a).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32) * 0.5
    p1 = q2 @ r.T + t
    if noise > 0:
        p1 = p1 + rng.normal(scale=noise, size=p1.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    if n_out:
        out_idx = rng.choice(n, n_out, replace=False)
        p1[out_idx] += rng.uniform(0.5, 2.0, (n_out, 3)).astype(np.float32)
    else:
        out_idx = np.array([], int)
    return jnp.asarray(p1), jnp.asarray(q2), r, t, out_idx


class TestRigid:
    def test_kabsch_exact(self):
        p1, p2, r, t, _ = make_rigid_problem()
        fit = kabsch(p1, p2)
        assert bool(fit.ok)
        np.testing.assert_allclose(fit.r, r, atol=1e-5)
        np.testing.assert_allclose(fit.t, t, atol=1e-5)
        assert float(fit.rmse) < 1e-5

    def test_kabsch_batched(self):
        probs = [make_rigid_problem(seed=s) for s in range(4)]
        p1 = jnp.stack([p[0] for p in probs])
        p2 = jnp.stack([p[1] for p in probs])
        fit = jax.jit(kabsch)(p1, p2)
        for i, (_, _, r, t, _) in enumerate(probs):
            np.testing.assert_allclose(fit.r[i], r, atol=1e-5)
            np.testing.assert_allclose(fit.t[i], t, atol=1e-5)

    def test_kabsch_weighted_ignores_outliers(self):
        p1, p2, r, t, out_idx = make_rigid_problem(outlier_frac=0.3, seed=1)
        w = np.ones(p1.shape[0], np.float32)
        w[out_idx] = 0.0
        fit = kabsch(p1, p2, jnp.asarray(w))
        np.testing.assert_allclose(fit.r, r, atol=1e-5)
        np.testing.assert_allclose(fit.t, t, atol=1e-5)

    def test_kabsch_degenerate_collinear(self):
        # collinear points: rotation unobservable → ok must be False
        line = jnp.asarray(
            np.outer(np.linspace(0, 1, 10), [1.0, 0, 0]), jnp.float32
        )
        fit = kabsch(line + 1.0, line)
        assert not bool(fit.ok)

    def test_horn_matches_kabsch(self):
        p1, p2, r, t, _ = make_rigid_problem(noise=0.01, seed=2)
        fk = kabsch(p1, p2)
        fh = horn_quaternion(p1, p2)
        np.testing.assert_allclose(fh.r, fk.r, atol=1e-3)
        np.testing.assert_allclose(fh.t, fk.t, atol=1e-3)

    def test_never_returns_reflection(self):
        # near-planar data tempts SVD into det=-1 without the fix
        rng = np.random.default_rng(3)
        q = rng.uniform(-1, 1, (20, 3)).astype(np.float32)
        q[:, 2] *= 1e-6  # planar
        from pre3_tpu.data.synthetic import _rodrigues

        r = _rodrigues(np.array([0.1, 0.2, 0.3])).astype(np.float32)
        p = q @ r.T
        fit = kabsch(jnp.asarray(p), jnp.asarray(q))
        assert float(jnp.linalg.det(fit.r)) > 0.9
        np.testing.assert_allclose(fit.r, r, atol=1e-3)


class TestRansac:
    def test_recovers_motion_with_outliers(self):
        p1, p2, r, t, _ = make_rigid_problem(
            n=100, noise=0.003, outlier_frac=0.35, seed=4
        )
        res = ransac_rigid(
            jax.random.PRNGKey(0), p1, p2, jnp.ones(100, bool), batch=512,
            support_threshold=0.001,
        )
        assert bool(res.ok)
        np.testing.assert_allclose(res.r, r, atol=0.02)
        np.testing.assert_allclose(res.t, t, atol=0.02)
        assert int(res.n_inliers) > 50

    def test_respects_valid_mask(self):
        p1, p2, r, t, _ = make_rigid_problem(n=60, seed=5)
        # corrupt half the rows but mark them invalid
        p1 = p1.at[30:].add(5.0)
        valid = jnp.arange(60) < 30
        res = ransac_rigid(
            jax.random.PRNGKey(1), p1, p2, valid, batch=256,
            support_threshold=0.001,
        )
        assert bool(res.ok)
        np.testing.assert_allclose(res.r, r, atol=1e-3)
        assert not np.any(np.asarray(res.inliers[30:]))

    def test_too_few_points_not_ok(self):
        p1, p2, r, t, _ = make_rigid_problem(n=16, seed=6)
        valid = jnp.arange(16) < 2
        res = ransac_rigid(
            jax.random.PRNGKey(2), p1, p2, valid, batch=64,
            support_threshold=0.001,
        )
        assert not bool(res.ok)

    def test_default_threshold_scene_scaled(self):
        """Default gate mirrors ransac_dr_ye.m: 0.001·dist(nearest pt)."""
        p1, p2, r, t, _ = make_rigid_problem(n=80, noise=0.002, seed=7)
        res = ransac_rigid(
            jax.random.PRNGKey(3), p1, p2, jnp.ones(80, bool), batch=512
        )
        assert bool(res.ok)
        np.testing.assert_allclose(res.r, r, atol=0.05)
