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


def _tilted_floor_xyz(tilt_deg=-20.0):
    """Vectorized tilted-floor xyz image: lower rows see the floor plane
    1 m below, upper rows a wall 4 m ahead (same geometry as
    test_initial_orientation_levels_floor, full-resolution)."""
    from pre3_tpu.data.synthetic import _rodrigues

    h, w = 144, 176
    tilt = _rodrigues(np.array([np.radians(tilt_deg), 0, 0]))
    up_world = np.array([0.0, -1.0, 0.0])
    up_cam = tilt.T @ up_world
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    rays = np.stack(
        [(cc - 88) / 250.0, (rr - 72) / 250.0, np.ones_like(cc, float)],
        axis=-1,
    )
    denom = rays @ up_cam
    hits = denom < -1e-3
    s = -1.0 / np.where(hits, denom, -1.0)
    floor = rays * s[..., None]
    is_floor = (rr > h * 0.55) & hits & (s > 0) & (s < 8)
    xyz = np.where(is_floor[..., None], floor, rays * 4.0)
    return xyz.astype(np.float32), up_cam


# ---- wiring: SlamConfig.initial_orientation + heading update (VERDICT
# r3 #4 — the reference's default startup, initialize_x_and_p.m:35-37) ----


def test_attitude_update_converges_small_error():
    from pre3_tpu.data.synthetic import _rodrigues
    from pre3_tpu.ekf.state import init_state
    from pre3_tpu.ekf.update import attitude_update
    from pre3_tpu.geometry.quaternion import qconj, r2q

    # filter carries a 2° attitude error about x; the floor observation
    # is exact → the update must shrink the error
    r_err = _rodrigues(np.array([np.radians(2.0), 0, 0]))
    q_est = r2q(jnp.asarray(r_err, jnp.float32))
    state = init_state(n_landmarks=4, q0=q_est)
    # init_state's eps pose prior would zero the gain; model an
    # uncertain attitude (σ_q ≈ 0.1, the post-drift regime the online
    # correction exists for)
    d = np.arange(3, 7)
    state = state._replace(p=state.p.at[d, d].set(1e-2))
    up_world = jnp.array([0.0, -1.0, 0.0])
    up_cam_true = up_world  # true camera is level
    st2 = attitude_update(state, up_cam_true)
    err0 = float(jnp.linalg.norm(
        qrotate(qconj(state.x[3:7]), up_world) - up_cam_true))
    err1 = float(jnp.linalg.norm(
        qrotate(qconj(st2.x[3:7]), up_world) - up_cam_true))
    assert err1 < 0.2 * err0, (err0, err1)


def test_attitude_update_gates_large_innovation():
    from pre3_tpu.ekf.state import init_state
    from pre3_tpu.ekf.update import attitude_update

    state = init_state(n_landmarks=4)
    # 90°-off observation (a wall normal) must be rejected outright
    st2 = attitude_update(state, jnp.array([0.0, 0, 1.0]))
    np.testing.assert_array_equal(np.asarray(st2.x), np.asarray(state.x))
    # and ok=False must also be a no-op even for a small innovation
    st3 = attitude_update(state, jnp.array([0.0, -1.0, 0.01]), ok=False)
    np.testing.assert_array_equal(np.asarray(st3.x), np.asarray(state.x))


def test_run_slam_initial_orientation_prior():
    """Gravity-aligned start: frame 0 of the trajectory carries the
    plane-fit q0 (not identity) and levels the tilted floor."""
    from pre3_tpu.data.synthetic import render_sequence
    from pre3_tpu.ekf.slam import SlamConfig, run_slam
    from pre3_tpu.frontend.pipeline import extract_features
    from pre3_tpu.geometry.camera import sr4000_camera

    frames, _, _ = render_sequence(n_frames=4, n_points=250, noise=0.004)
    feats = jax.tree.map(lambda *xs: jnp.stack(xs), *[
        extract_features(
            jnp.asarray(f.intensity), jnp.asarray(f.xyz),
            jnp.asarray(f.confidence), threshold=0.05, max_features=96,
        )
        for f in frames
    ])
    floor_xyz, up_cam = _tilted_floor_xyz()
    xyz_imgs = jnp.asarray(np.stack([floor_xyz] * 4))
    out = run_slam(
        sr4000_camera(), feats, jax.random.PRNGKey(0),
        cfg=SlamConfig(initial_orientation=True), n_landmarks=24,
        xyz_imgs=xyz_imgs,
    )
    q0 = np.asarray(out.q[0])
    assert abs(q0[0]) < 0.999, "prior not applied — q0 is identity"
    up_rot = np.asarray(qrotate(jnp.asarray(q0),
                                jnp.asarray(up_cam, jnp.float32)))
    assert float(up_rot @ np.array([0.0, -1.0, 0.0])) > 0.99


def test_heading_update_gated_on_wall_scene():
    """On the standard wall scene the floor fit finds the wall (90° off),
    so every periodic heading update must be angle-gated → the trajectory
    is bit-identical to heading-off (also pins that the kv/kr/ka PRNG
    streams are untouched by the heading wiring)."""
    from pre3_tpu.data.synthetic import render_sequence
    from pre3_tpu.ekf.slam import SlamConfig, run_slam
    from pre3_tpu.frontend.pipeline import extract_features
    from pre3_tpu.geometry.camera import sr4000_camera

    frames, _, _ = render_sequence(n_frames=5, n_points=250, noise=0.004)
    feats = jax.tree.map(lambda *xs: jnp.stack(xs), *[
        extract_features(
            jnp.asarray(f.intensity), jnp.asarray(f.xyz),
            jnp.asarray(f.confidence), threshold=0.05, max_features=96,
        )
        for f in frames
    ])
    xyz_imgs = jnp.asarray(np.nan_to_num(
        np.stack([f.xyz for f in frames]))).astype(jnp.float32)
    base = run_slam(
        sr4000_camera(), feats, jax.random.PRNGKey(0),
        cfg=SlamConfig(), n_landmarks=24,
    )
    with_hu = run_slam(
        sr4000_camera(), feats, jax.random.PRNGKey(0),
        cfg=SlamConfig(heading_update_every=2), n_landmarks=24,
        xyz_imgs=xyz_imgs,
    )
    np.testing.assert_array_equal(np.asarray(base.t), np.asarray(with_hu.t))
    np.testing.assert_array_equal(np.asarray(base.q), np.asarray(with_hu.q))


def test_wall_only_scene_rejected_by_tilt_gate():
    """A wall fills the lower region (no floor): the fit finds a plane,
    but its 'up' is ~90° from plausible gravity → the max-tilt gate must
    reject it (identity prior) instead of leveling the wall."""
    h, w = 144, 176
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    rays = np.stack(
        [(cc - 88) / 250.0, (rr - 72) / 250.0, np.ones_like(cc, float)],
        axis=-1,
    )
    xyz = (rays * 3.0).astype(np.float32)  # flat wall at z = 3 m
    q0, ok = initial_orientation_from_floor(
        jax.random.PRNGKey(5), jnp.asarray(xyz)
    )
    assert not bool(ok)
    np.testing.assert_allclose(np.asarray(q0), [1, 0, 0, 0])
