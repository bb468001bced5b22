"""Camera model, SE(3), and inverse-depth tests (reference C18, C19, C7/C11).

The distortion oracle is the reference formula D = 1 + k1 r² + k2 r⁴
applied to normalized undistorted coordinates (distort_fm_my_version.m),
with Newton inversion (undistort_fm_my_version.m:62-71).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.geometry import (
    Pose, pose_apply, pose_compose, pose_delta, pose_from_matrix,
    pose_identity, pose_inverse, pose_to_matrix,
    Camera, sr4000_camera, distort, undistort, project, project_point,
    unproject, in_fov,
    inverse_depth_point, inverse_depth_to_cartesian, linearity_index,
    ray_from_angles,
)
from pre3_tpu.geometry.inverse_depth import (
    angles_from_ray, conversion_jacobian, inverse_depth_camera_ray,
)
from pre3_tpu.geometry.quaternion import qnormalize, qrotate


def rand_pose(n, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.normal(size=(n, 3)).astype(np.float32)
    q = qnormalize(jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)))
    return Pose(t=jnp.asarray(t), q=q)


class TestSE3:
    def test_compose_inverse(self):
        a = rand_pose(8, 0)
        ident = pose_compose(a, pose_inverse(a))
        np.testing.assert_allclose(ident.t, np.zeros((8, 3)), atol=1e-5)
        np.testing.assert_allclose(np.abs(ident.q[:, 0]), np.ones(8), atol=1e-5)

    def test_compose_apply_associativity(self):
        a, b = rand_pose(8, 1), rand_pose(8, 2)
        x = jnp.asarray(np.random.default_rng(3).normal(size=(8, 3)), jnp.float32)
        np.testing.assert_allclose(
            pose_apply(pose_compose(a, b), x),
            pose_apply(a, pose_apply(b, x)),
            atol=1e-4,
        )

    def test_matrix_roundtrip(self):
        a = rand_pose(8, 4)
        h = pose_to_matrix(a)
        b = pose_from_matrix(h)
        np.testing.assert_allclose(b.t, a.t, atol=1e-5)
        q_canon = jnp.where(a.q[:, :1] < 0, -a.q, a.q)
        np.testing.assert_allclose(b.q, q_canon, atol=1e-4)

    def test_delta(self):
        a, b = rand_pose(4, 5), rand_pose(4, 6)
        d = pose_delta(a, b)
        np.testing.assert_allclose(
            pose_to_matrix(pose_compose(a, d)), pose_to_matrix(b), atol=1e-4
        )


class TestCamera:
    def setup_method(self):
        self.cam = sr4000_camera()

    def test_distort_undistort_roundtrip(self):
        rng = np.random.default_rng(0)
        # Pixels across most of the image (center-ish to limit distortion blowup)
        uv = np.stack(
            [rng.uniform(20, 156, 256), rng.uniform(20, 124, 256)], axis=-1
        ).astype(np.float32)
        uvd = distort(self.cam, jnp.asarray(uv))
        back = undistort(self.cam, uvd)
        np.testing.assert_allclose(back, uv, atol=2e-2)

    def test_undistort_distort_roundtrip(self):
        rng = np.random.default_rng(1)
        uvd = np.stack(
            [rng.uniform(10, 166, 256), rng.uniform(10, 134, 256)], axis=-1
        ).astype(np.float32)
        uvu = undistort(self.cam, jnp.asarray(uvd))
        np.testing.assert_allclose(distort(self.cam, uvu), uvd, atol=2e-2)

    def test_principal_point_fixed(self):
        pp = jnp.array([self.cam.cx, self.cam.cy])
        np.testing.assert_allclose(distort(self.cam, pp), pp, atol=1e-5)
        np.testing.assert_allclose(undistort(self.cam, pp), pp, atol=1e-5)

    def test_project_unproject(self):
        rng = np.random.default_rng(2)
        p = np.stack(
            [rng.uniform(-0.5, 0.5, 64), rng.uniform(-0.4, 0.4, 64),
             rng.uniform(1.0, 5.0, 64)],
            axis=-1,
        ).astype(np.float32)
        uvd = project(self.cam, jnp.asarray(p))
        rays = unproject(self.cam, uvd)
        # rays are unit-z; scaling by depth must recover the point
        np.testing.assert_allclose(
            rays * p[:, 2:3], p, atol=5e-3
        )

    def test_reference_distortion_formula(self):
        """Oracle: the exact scalar formula from distort_fm_my_version.m."""
        cam = self.cam
        uv = np.array([[30.0, 100.0], [91.69, 72.27], [160.0, 20.0]], np.float32)
        xu = (uv[:, 0] - float(cam.cx)) / float(cam.f)
        yu = (uv[:, 1] - float(cam.cy)) / float(cam.f)
        r2 = xu**2 + yu**2
        D = 1 + float(cam.k1) * r2 + float(cam.k2) * r2**2
        expect = np.stack(
            [float(cam.cx) + float(cam.f) * xu * D,
             float(cam.cy) + float(cam.f) * yu * D], axis=-1)
        np.testing.assert_allclose(distort(cam, jnp.asarray(uv)), expect, atol=1e-4)

    def test_in_fov(self):
        cam = self.cam
        p_good = jnp.array([0.0, 0.0, 2.0])
        p_behind = jnp.array([0.0, 0.0, -2.0])
        assert bool(in_fov(cam, p_good, project(cam, p_good)))
        assert not bool(in_fov(cam, p_behind, project(cam, p_behind)))

    def test_project_differentiable(self):
        j = jax.jacfwd(lambda p: project(self.cam, p))(jnp.array([0.1, 0.2, 2.0]))
        assert np.all(np.isfinite(np.asarray(j)))


class TestInverseDepth:
    def setup_method(self):
        self.cam = sr4000_camera()

    def test_ray_angles_roundtrip(self):
        rng = np.random.default_rng(0)
        theta = jnp.asarray(rng.uniform(-np.pi, np.pi, 32), jnp.float32)
        phi = jnp.asarray(rng.uniform(-1.4, 1.4, 32), jnp.float32)
        m = ray_from_angles(theta, phi)
        np.testing.assert_allclose(jnp.linalg.norm(m, axis=-1), np.ones(32), atol=1e-6)
        t2, p2 = angles_from_ray(m)
        np.testing.assert_allclose(t2, theta, atol=1e-5)
        np.testing.assert_allclose(p2, phi, atol=1e-5)

    def test_init_then_convert_recovers_point(self):
        """Initialize an inverse-depth landmark from a projection of a known
        3D point with the true inverse depth — converting back to Cartesian
        must recover the point (hinv → inversedepth2cartesian consistency)."""
        pose = rand_pose(1, seed=11)
        pose = Pose(t=pose.t[0], q=pose.q[0])
        p_cam = jnp.array([0.3, -0.2, 2.5])
        p_world = pose_apply(pose, p_cam)
        uvd = project(self.cam, p_cam)
        rho = 1.0 / jnp.linalg.norm(p_cam)
        y = inverse_depth_point(self.cam, uvd, pose.t, pose.q, rho)
        np.testing.assert_allclose(
            inverse_depth_to_cartesian(y), p_world, atol=5e-3
        )

    def test_camera_ray_projects_back(self):
        pose = pose_identity()
        p_cam = jnp.array([0.4, 0.1, 3.0])
        uvd = project(self.cam, p_cam)
        rho = 1.0 / jnp.linalg.norm(p_cam)
        y = inverse_depth_point(self.cam, uvd, pose.t, pose.q, rho)
        hrl = inverse_depth_camera_ray(y, pose.t, pose.q)
        np.testing.assert_allclose(project(self.cam, hrl), uvd, atol=1e-2)

    def test_conversion_jacobian_matches_autodiff(self):
        y = jnp.array([0.1, -0.2, 0.3, 0.4, -0.1, 0.5])
        j_auto = jax.jacfwd(inverse_depth_to_cartesian)(y)
        np.testing.assert_allclose(conversion_jacobian(y), j_auto, atol=1e-4)

    def test_linearity_index_decreases_with_certainty(self):
        y = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.5])
        t = jnp.array([0.1, 0.0, 0.0])
        hi = linearity_index(y, jnp.asarray(0.25), t)
        lo = linearity_index(y, jnp.asarray(0.001), t)
        assert float(lo) < float(hi)
