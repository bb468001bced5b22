"""Warped-patch NCC matching tests (matching.m / pred_patch_fc.m path).

Oracle: an analytically-rendered textured plane — the patch warp's plane
assumption holds exactly, so the predicted appearance must match the
second view's actual patch to high NCC.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.ekf.map_management import add_features
from pre3_tpu.ekf.measurement import predict_measurements
from pre3_tpu.ekf.ncc_matching import search_ic_matches_ncc
from pre3_tpu.ekf.state import init_state
from pre3_tpu.ekf.update import heading_update, iterated_kalman_update
from pre3_tpu.frontend.patch_warp import (
    extract_raw_patches, predict_patch_appearance,
)
from pre3_tpu.frontend.patches import extract_patch_descriptors
from pre3_tpu.geometry.camera import project, sr4000_camera, unproject
from pre3_tpu.geometry.quaternion import e2q, q2e, qconj, qrotate

from test_ekf import bootstrap_state, make_frame_features

CAM = sr4000_camera()
H, W = 144, 176


def texture(x, y):
    return (
        jnp.sin(9.0 * x) + jnp.cos(13.0 * y + 1.0)
        + 0.5 * jnp.sin(21.0 * (x + y)) + 0.3 * jnp.cos(17.0 * (x - 2 * y))
    )


def render_plane(t_w, q_wc, z_plane=2.0):
    """Render the textured world plane z=z_plane from pose (t, q)."""
    uu, vv = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32), indexing="xy")
    uv = jnp.stack([uu, vv], axis=-1)
    d_c = unproject(CAM, uv)  # [H, W, 3]
    d_w = qrotate(q_wc, d_c)
    s = (z_plane - t_w[2]) / jnp.maximum(d_w[..., 2], 1e-6)
    x_w = t_w + s[..., None] * d_w
    return texture(x_w[..., 0], x_w[..., 1])


class TestPatchWarp:
    def test_identity_pose_reproduces_patch(self):
        t = jnp.zeros(3)
        q = jnp.array([1.0, 0, 0, 0])
        img = render_plane(t, q)
        lm_w = jnp.array([0.3, 0.1, 2.0])
        uv = project(CAM, lm_w)  # camera at origin: cam frame == world
        big = extract_raw_patches(img, uv[None], size=21)[0]
        cam7 = jnp.concatenate([t, q])
        pred = predict_patch_appearance(
            CAM, big, uv, cam7, cam7, lm_w, uv, patch=11
        )
        actual = extract_patch_descriptors(img, uv[None], patch=11)[0]
        ncc = jnp.dot(pred, actual)
        assert float(ncc) > 0.995

    def test_moved_camera_high_ncc(self):
        """Init at origin; second view translated+rotated. The warped init
        patch must match the second view's actual patch (plane assumption
        exact up to the normal-along-ray approximation)."""
        t1 = jnp.zeros(3)
        q1 = jnp.array([1.0, 0, 0, 0])
        img1 = render_plane(t1, q1)
        t2 = jnp.array([0.08, -0.04, 0.1])
        q2 = e2q(jnp.array([0.02, -0.03, 0.04]))
        img2 = render_plane(t2, q2)

        lm_w = jnp.array([0.2, -0.1, 2.0])
        uv1 = project(CAM, lm_w)
        big = extract_raw_patches(img1, uv1[None], size=21)[0]
        p_c2 = qrotate(qconj(q2), lm_w - t2)
        uv2 = project(CAM, p_c2)

        pred = predict_patch_appearance(
            CAM, big, uv1, jnp.concatenate([t1, q1]),
            jnp.concatenate([t2, q2]), lm_w, uv2, patch=11,
        )
        actual = extract_patch_descriptors(img2, uv2[None], patch=11)[0]
        ncc = float(jnp.dot(pred, actual))
        assert ncc > 0.9, ncc

    def test_unwarped_patch_is_worse(self):
        """Sanity: warping must beat naive init-patch reuse under rotation."""
        t1 = jnp.zeros(3)
        q1 = jnp.array([1.0, 0, 0, 0])
        img1 = render_plane(t1, q1)
        q2 = e2q(jnp.array([0.0, 0.0, 0.5]))  # 29° roll about z
        t2 = jnp.zeros(3)
        img2 = render_plane(t2, q2)

        lm_w = jnp.array([0.25, 0.15, 2.0])
        uv1 = project(CAM, lm_w)
        big = extract_raw_patches(img1, uv1[None], size=21)[0]
        p_c2 = qrotate(qconj(q2), lm_w - t2)
        uv2 = project(CAM, p_c2)

        pred = predict_patch_appearance(
            CAM, big, uv1, jnp.concatenate([t1, q1]),
            jnp.concatenate([t2, q2]), lm_w, uv2, patch=11,
        )
        actual = extract_patch_descriptors(img2, uv2[None], patch=11)[0]
        naive = extract_patch_descriptors(img1, uv1[None], patch=11)[0]
        ncc_warp = float(jnp.dot(pred, actual))
        ncc_naive = float(jnp.dot(naive, actual))
        assert ncc_warp > ncc_naive + 0.05
        assert ncc_warp > 0.9


class TestNccSearch:
    def _planar_state(self, n=8):
        """EKF state whose landmarks sit on the textured plane, init'd from
        the identity-pose render."""
        t1 = jnp.zeros(3)
        q1 = jnp.array([1.0, 0, 0, 0])
        img1 = render_plane(t1, q1)
        rng = np.random.default_rng(5)
        pts = np.stack([
            rng.uniform(-0.5, 0.5, n), rng.uniform(-0.35, 0.35, n),
            np.full(n, 2.0),
        ], axis=-1).astype(np.float32)
        uvs = np.asarray(project(CAM, jnp.asarray(pts)))
        frame = make_frame_features(uvs, pts, n_slots=16, seed=5)
        state = init_state(n_landmarks=16, desc_dim=frame.desc.shape[-1])
        obs = predict_measurements(CAM, state)
        state = add_features(
            CAM, state, frame, obs.h, jnp.asarray(0, jnp.int32),
            n_measured=jnp.asarray(0, jnp.int32), max_adds=n,
            min_measured=50, image=img1,
        )
        return state, img1, pts

    def test_matches_under_motion(self):
        state, img1, pts = self._planar_state()
        t2 = jnp.array([0.03, -0.02, 0.05])
        q2 = e2q(jnp.array([0.01, -0.015, 0.02]))
        img2 = render_plane(t2, q2)

        # move the camera state to the true second pose; depth priors make
        # landmark estimates accurate, so predicted h ≈ true pixel
        x = state.x.at[0:3].set(t2).at[3:7].set(q2)
        state = state._replace(x=x)
        obs = predict_measurements(CAM, state)
        obs = search_ic_matches_ncc(CAM, obs, state, img2)

        n_ic = int(jnp.sum(obs.ic))
        assert n_ic >= 5, n_ic
        # matched pixels must agree with the true projections
        p_c2 = qrotate(qconj(q2), jnp.asarray(pts) - t2)
        uv_true = project(CAM, p_c2)
        # slots were filled in add order 0..n-1
        err = jnp.linalg.norm(obs.z[:8] - uv_true, axis=-1)
        err = jnp.where(obs.ic[:8], err, 0.0)
        assert float(jnp.max(err)) < 1.5

    def test_rejects_textureless(self):
        state, img1, _ = self._planar_state()
        flat = jnp.zeros_like(img1)
        obs = predict_measurements(CAM, state)
        obs = search_ic_matches_ncc(CAM, obs, state, flat)
        assert int(jnp.sum(obs.ic)) == 0


class TestHeadingUpdate:
    def test_pulls_yaw_toward_observation(self):
        state, _, _ = bootstrap_state()
        # inflate yaw uncertainty so the update has authority
        p = state.p.at[3:7, 3:7].add(jnp.eye(4) * 1e-2)
        state = state._replace(p=p)
        yaw0 = float(q2e(state.x[3:7])[2])
        z = jnp.asarray(yaw0 + 0.1)
        new = heading_update(state, z, std_heading=0.01)
        yaw1 = float(q2e(new.x[3:7])[2])
        assert abs(yaw1 - (yaw0 + 0.1)) < abs(yaw1 - yaw0)
        assert float(jnp.linalg.norm(new.x[3:7])) == jnp.asarray(1.0)

    def test_wraps_innovation(self):
        state, _, _ = bootstrap_state()
        yaw0 = float(q2e(state.x[3:7])[2])
        # observation 2π away is a zero innovation — state unchanged
        new = heading_update(state, jnp.asarray(yaw0 + 2 * jnp.pi))
        np.testing.assert_allclose(
            np.asarray(new.x), np.asarray(state.x), atol=1e-5
        )


class TestIteratedUpdate:
    def test_improves_over_prior(self):
        state, frame, pts = bootstrap_state()
        # perturb the camera, keep measurements at the true projections
        x = state.x.at[0:3].add(jnp.array([0.05, -0.03, 0.02]))
        p = state.p.at[0:3, 0:3].add(jnp.eye(3) * 0.01)
        st = state._replace(x=x, p=p)
        uv_true = project(CAM, jnp.asarray(pts))
        z = jnp.zeros((st.n_landmarks, 2)).at[: len(pts)].set(uv_true)
        use = jnp.arange(st.n_landmarks) < len(pts)
        post = iterated_kalman_update(CAM, st, z, use, n_iters=3)
        err0 = float(jnp.linalg.norm(x[0:3]))
        err1 = float(jnp.linalg.norm(post.x[0:3]))
        assert err1 < 0.5 * err0
        # posterior covariance symmetric and reduced on camera block
        np.testing.assert_allclose(
            np.asarray(post.p), np.asarray(post.p.T), atol=1e-6
        )
        assert float(jnp.trace(post.p[0:3, 0:3])) < float(
            jnp.trace(p[0:3, 0:3])
        )
