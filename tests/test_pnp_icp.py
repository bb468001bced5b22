"""EPnP and ICP tests (the reference's aux PnP solvers and ICP oracle:
aux_code/EPnP_matlab, aux_code/dls_pnp_matlab, TestScripts/ICP_RANSAC*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pre3_tpu.geometry.camera import project, sr4000_camera
from pre3_tpu.geometry.quaternion import e2q, q2r
from pre3_tpu.vo.icp import icp
from pre3_tpu.vo.pnp import epnp, epnp_camera
from pre3_tpu.vo.ransac import ransac_rigid

CAM = sr4000_camera()


def scene(n=40, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([
        rng.uniform(-1.0, 1.0, n), rng.uniform(-0.8, 0.8, n),
        rng.uniform(1.5, 4.0, n),
    ], axis=-1).astype(np.float32)


def pose(seed=1, t_scale=0.3, r_scale=0.15):
    rng = np.random.default_rng(seed)
    r = np.asarray(q2r(e2q(jnp.asarray(
        rng.uniform(-r_scale, r_scale, 3).astype(np.float32)))))
    t = rng.uniform(-t_scale, t_scale, 3).astype(np.float32)
    return r, t


class TestEpnp:
    def test_recovers_pose_clean(self):
        pw = scene()
        r_gt, t_gt = pose()
        pc = pw @ r_gt.T + t_gt  # camera frame
        uv = pc[:, :2] / pc[:, 2:3]
        res = epnp(jnp.asarray(pw), jnp.asarray(uv),
                   jnp.ones(len(pw), bool))
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.r), r_gt, atol=2e-3)
        np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=5e-3)

    def test_masked_points_ignored(self):
        pw = scene()
        r_gt, t_gt = pose(seed=2)
        pc = pw @ r_gt.T + t_gt
        uv = pc[:, :2] / pc[:, 2:3]
        uv2 = uv.copy()
        uv2[30:] = 777.0  # corrupt masked-out entries
        valid = np.ones(len(pw), bool)
        valid[30:] = False
        res = epnp(jnp.asarray(pw), jnp.asarray(uv2), jnp.asarray(valid))
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.r), r_gt, atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=1e-2)

    def test_noisy_pixels_small_error(self):
        pw = scene(n=60, seed=3)
        r_gt, t_gt = pose(seed=4)
        pc = pw @ r_gt.T + t_gt
        uv = pc[:, :2] / pc[:, 2:3]
        uv += np.random.default_rng(5).normal(0, 5e-4, uv.shape)
        res = epnp(jnp.asarray(pw.astype(np.float32)),
                   jnp.asarray(uv.astype(np.float32)),
                   jnp.ones(len(pw), bool))
        assert bool(res.ok)
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(res.r) @ r_gt.T) - 1) / 2, -1, 1)))
        assert ang < 0.5
        assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.02

    def test_pixel_interface(self):
        pw = scene(n=50, seed=6)
        r_gt, t_gt = pose(seed=7, t_scale=0.1, r_scale=0.05)
        pc = pw @ r_gt.T + t_gt
        uv_px = np.asarray(project(CAM, jnp.asarray(pc)))
        inb = ((uv_px[:, 0] > 2) & (uv_px[:, 0] < 173)
               & (uv_px[:, 1] > 2) & (uv_px[:, 1] < 141))
        res = epnp_camera(CAM, jnp.asarray(pw), jnp.asarray(uv_px),
                          jnp.asarray(inb))
        assert bool(res.ok)
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(res.r) @ r_gt.T) - 1) / 2, -1, 1)))
        assert ang < 1.0, ang
        assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.05


class TestIcp:
    def test_aligns_known_transform(self):
        p = scene(n=120, seed=8)
        r_gt, t_gt = pose(seed=9, t_scale=0.08, r_scale=0.06)
        # convention: p ≈ R q + t  →  q = Rᵀ (p − t)
        q = (p - t_gt) @ r_gt
        res = icp(jnp.asarray(p), jnp.asarray(q),
                  jnp.ones(len(p), bool), jnp.ones(len(q), bool))
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.r), r_gt, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=2e-3)
        assert float(res.rmse) < 1e-3

    def test_partial_overlap_and_outliers(self):
        p = scene(n=150, seed=10)
        r_gt, t_gt = pose(seed=11, t_scale=0.05, r_scale=0.04)
        q = (p - t_gt) @ r_gt
        rng = np.random.default_rng(12)
        q[120:] = rng.uniform(-3, 3, (30, 3))  # 20% outliers
        res = icp(jnp.asarray(p), jnp.asarray(q),
                  jnp.ones(len(p), bool), jnp.ones(len(q), bool),
                  trim_dist=0.15)
        assert bool(res.ok)
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(res.r) @ r_gt.T) - 1) / 2, -1, 1)))
        assert ang < 1.0
        assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.02

    def test_cross_checks_ransac_vo(self):
        """The reference's ICP-vs-RANSAC comparison (ICP_RANSAC.m), done
        as an actual assertion: both estimators on the same matched pair
        must agree."""
        p = scene(n=100, seed=13)
        r_gt, t_gt = pose(seed=14, t_scale=0.06, r_scale=0.05)
        q = (p - t_gt) @ r_gt
        q += np.random.default_rng(15).normal(0, 1e-3, q.shape).astype(
            np.float32)
        valid = jnp.ones(len(p), bool)
        rr = ransac_rigid(jax.random.PRNGKey(0), jnp.asarray(p),
                          jnp.asarray(q), valid, batch=256)
        ri = icp(jnp.asarray(p), jnp.asarray(q), valid, valid)
        assert bool(rr.ok) and bool(ri.ok)
        dr = np.asarray(rr.r) @ np.asarray(ri.r).T
        ang = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1)))
        assert ang < 0.5
        assert np.linalg.norm(np.asarray(rr.t) - np.asarray(ri.t)) < 0.01


class TestDlsPnp:
    """Object-space DLS cost minimization (aux_code/dls_pnp_matlab role)."""

    def test_recovers_pose_clean(self):
        from pre3_tpu.vo.pnp import dls_pnp

        pw = scene(seed=5)
        r_gt, t_gt = pose(seed=6)
        pc = pw @ r_gt.T + t_gt
        uv = pc[:, :2] / pc[:, 2:3]
        res = dls_pnp(jnp.asarray(pw), jnp.asarray(uv),
                      jnp.ones(len(pw), bool))
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.r), r_gt, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=2e-3)
        assert float(res.err) < 1e-8

    def test_refines_noisy_epnp(self):
        """With pixel noise, GN on the object-space cost must not be worse
        than its EPnP seed under that cost."""
        from pre3_tpu.vo.pnp import dls_pnp, epnp

        rng = np.random.default_rng(7)
        pw = scene(n=60, seed=8)
        r_gt, t_gt = pose(seed=9)
        pc = pw @ r_gt.T + t_gt
        uv = pc[:, :2] / pc[:, 2:3] + rng.normal(
            scale=2e-3, size=(len(pw), 2)).astype(np.float32)
        valid = jnp.ones(len(pw), bool)
        seed_res = epnp(jnp.asarray(pw), jnp.asarray(uv), valid)
        res = dls_pnp(jnp.asarray(pw), jnp.asarray(uv), valid)

        v = np.concatenate([uv, np.ones((len(pw), 1), np.float32)], axis=-1)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        proj = np.eye(3)[None] - v[:, :, None] * v[:, None, :]

        def cost(r, t):
            e = np.einsum("nij,nj->ni", proj, pw @ np.asarray(r).T
                          + np.asarray(t))
            return float(np.sum(e * e))

        assert cost(res.r, res.t) <= cost(seed_res.r, seed_res.t) + 1e-10
        np.testing.assert_allclose(np.asarray(res.r), r_gt, atol=2e-2)


class TestGicp:
    """Plane-to-plane generalized ICP (the GICP_test_each_camera.m oracle)."""

    def _structured_scene(self, n=160, seed=20):
        """Points on two planes + a ridge — surfaces, so GICP covariances
        are informative (a pure random cloud has no normals)."""
        rng = np.random.default_rng(seed)
        a = np.stack([rng.uniform(-1, 1, n // 2),
                      rng.uniform(-1, 1, n // 2),
                      np.full(n // 2, 2.0)], -1)
        b = np.stack([rng.uniform(-1, 1, n - n // 2),
                      np.full(n - n // 2, 0.8),
                      rng.uniform(1.5, 2.5, n - n // 2)], -1)
        return np.concatenate([a, b]).astype(np.float32)

    def test_aligns_known_transform(self):
        from pre3_tpu.vo.icp import gicp

        p = self._structured_scene()
        r_gt, t_gt = pose(seed=21, t_scale=0.06, r_scale=0.05)
        q = (p - t_gt) @ r_gt
        res = gicp(jnp.asarray(p), jnp.asarray(q),
                   jnp.ones(len(p), bool), jnp.ones(len(q), bool))
        assert bool(res.ok)
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(res.r) @ r_gt.T) - 1) / 2, -1, 1)))
        assert ang < 1.0, ang
        assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.02

    def test_cross_checks_icp_and_ransac(self):
        """GICP_test_each_camera.m as an assertion: GICP, point-to-point
        ICP, and RANSAC VO agree on the same pair."""
        from pre3_tpu.vo.icp import gicp

        p = self._structured_scene(seed=22)
        r_gt, t_gt = pose(seed=23, t_scale=0.05, r_scale=0.04)
        q = (p - t_gt) @ r_gt
        q += np.random.default_rng(24).normal(0, 1e-3, q.shape).astype(
            np.float32)
        valid = jnp.ones(len(p), bool)
        rg = gicp(jnp.asarray(p), jnp.asarray(q), valid, valid)
        ri = icp(jnp.asarray(p), jnp.asarray(q), valid, valid)
        rr = ransac_rigid(jax.random.PRNGKey(2), jnp.asarray(p),
                          jnp.asarray(q), valid, batch=256)
        assert bool(rg.ok) and bool(ri.ok) and bool(rr.ok)
        for other in (np.asarray(ri.r), np.asarray(rr.r)):
            dr = np.asarray(rg.r) @ other.T
            ang = np.degrees(np.arccos(np.clip(
                (np.trace(dr) - 1) / 2, -1, 1)))
            assert ang < 0.5, ang
        assert np.linalg.norm(np.asarray(rg.t) - np.asarray(ri.t)) < 0.01

    def test_gicp_beats_icp_on_sliding_planes(self):
        """The canonical GICP advantage: translation ALONG a plane is
        unconstrained point-to-point but pinned by the plane-to-plane
        metric when a second, differently-oriented surface exists."""
        from pre3_tpu.vo.icp import gicp

        rng = np.random.default_rng(25)
        # dense plane + sparse orthogonal wall: p2p ICP latches onto the
        # dense plane and slides; GICP weights the wall's normals
        a = np.stack([rng.uniform(-1, 1, 200), rng.uniform(-1, 1, 200),
                      np.full(200, 2.0)], -1)
        b = np.stack([np.full(30, 0.9), rng.uniform(-1, 1, 30),
                      rng.uniform(1.6, 2.4, 30)], -1)
        p = np.concatenate([a, b]).astype(np.float32)
        t_gt = np.array([0.05, 0.03, 0.0], np.float32)  # in-plane slide
        q = p - t_gt
        valid = jnp.ones(len(p), bool)
        rg = gicp(jnp.asarray(p), jnp.asarray(q), valid, valid, iters=30)
        err_g = np.linalg.norm(np.asarray(rg.t) - t_gt)
        assert err_g < 0.01, err_g
