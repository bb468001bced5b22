"""Multi-device tests on the 8-device virtual CPU mesh: sharded RANSAC
and landmark-sharded distributed BA must match their single-device
counterparts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pre3_tpu.backend.ba import bundle_adjust
from pre3_tpu.parallel.ba_sharded import bundle_adjust_sharded
from pre3_tpu.parallel.mesh import make_mesh
from pre3_tpu.parallel.vo_sharded import sharded_ransac_rigid
from pre3_tpu.vo.ransac import ransac_rigid
from tests.test_ba import make_ba_problem, CAM
from tests.test_vo import make_rigid_problem


def test_eight_devices_available():
    assert len(jax.devices()) == 8


class TestShardedRansac:
    def test_matches_unsharded_result_quality(self):
        p1, p2, r, t, _ = make_rigid_problem(
            n=96, noise=0.003, outlier_frac=0.3, seed=11
        )
        mesh = make_mesh(8, axis="hyp")
        with jax.set_mesh(mesh):
            res = jax.jit(
                lambda k: sharded_ransac_rigid(
                    mesh, k, p1, p2, jnp.ones(96, bool), batch=512,
                    support_threshold=0.001,
                )
            )(jax.random.PRNGKey(0))
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.r), r, atol=0.02)
        np.testing.assert_allclose(np.asarray(res.t), t, atol=0.02)


class TestDistributedBa:
    def test_matches_single_device(self):
        prob, (gt_t, gt_q, gt_p) = make_ba_problem(
            n_kf=5, n_lm=48, seed=21, t_noise=0.03, p_noise=0.03
        )
        single = bundle_adjust(CAM, prob, iters=8)
        mesh = make_mesh(8, axis="lm")
        dist = bundle_adjust_sharded(mesh, CAM, prob, iters=8)
        # same final accuracy (exact bitwise equality is not expected —
        # psum reorders the f32 reduction)
        assert float(dist.cost[-1]) < 1e-3
        np.testing.assert_allclose(
            np.asarray(dist.kf_t), np.asarray(single.kf_t), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(dist.kf_t), np.asarray(gt_t), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(dist.points), np.asarray(single.points), atol=5e-3
        )

    def test_landmark_padding(self):
        # 41 landmarks does not divide 8 → exercises the pad path
        prob, (gt_t, _, _) = make_ba_problem(
            n_kf=4, n_lm=41, seed=22, t_noise=0.02, p_noise=0.02
        )
        mesh = make_mesh(8, axis="lm")
        dist = bundle_adjust_sharded(mesh, CAM, prob, iters=8)
        assert dist.points.shape[0] == 41
        assert float(dist.cost[-1]) < 1e-3
        np.testing.assert_allclose(
            np.asarray(dist.kf_t), np.asarray(gt_t), atol=5e-3
        )

    def test_matches_single_device_with_odo_factors(self):
        # VERDICT r3 #1: the distributed path must carry the odometry-
        # chain factors (the difference between BA helping and hurting on
        # loop-free sequences, BASELINE.md round 2) — equality vs the
        # single-device backend WITH odo_t/odo_q/odo_w set.
        from pre3_tpu.geometry.quaternion import qconj, qprod, qrotate

        prob, (gt_t, gt_q, _) = make_ba_problem(
            n_kf=5, n_lm=48, seed=24, t_noise=0.03, p_noise=0.03
        )
        odo_t = jnp.stack([
            qrotate(qconj(gt_q[i]), gt_t[i + 1] - gt_t[i])
            for i in range(4)
        ])
        odo_q = jnp.stack(
            [qprod(qconj(gt_q[i]), gt_q[i + 1]) for i in range(4)]
        )
        odo_w = jnp.array([1.0, 1.0, 0.0, 1.0])  # one disabled factor
        prob = prob._replace(odo_t=odo_t, odo_q=odo_q, odo_w=odo_w)

        single = bundle_adjust(CAM, prob, iters=8)
        mesh = make_mesh(8, axis="lm")
        dist = bundle_adjust_sharded(mesh, CAM, prob, iters=8)
        # identical math → identical LM accept/reject decisions; only
        # psum reduction order differs (atol floors the converged-noise
        # tail, which sits at ~5e-11 pure f32 rounding)
        np.testing.assert_allclose(
            np.asarray(dist.cost), np.asarray(single.cost),
            rtol=1e-4, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(dist.kf_t), np.asarray(single.kf_t), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(dist.points), np.asarray(single.points), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(dist.kf_t), np.asarray(gt_t), atol=5e-3
        )

    def test_two_device_submesh(self):
        prob, (gt_t, _, _) = make_ba_problem(
            n_kf=4, n_lm=40, seed=23, t_noise=0.02, p_noise=0.02
        )
        mesh = make_mesh(2, axis="lm")
        dist = bundle_adjust_sharded(mesh, CAM, prob, iters=8)
        assert float(dist.cost[-1]) < 1e-3
