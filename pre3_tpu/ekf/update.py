"""EKF update kernels: masked batch Kalman update + quaternion renorm.

Re-design of update.m:27-56 (K = P Hᵀ S⁻¹, symmetrized posterior,
normJac quaternion renormalization). The reference stacks only the inlier
measurements (variable-size); here excluded measurements are zero-padded:
zero H rows and zero innovation with unit R make a measurement exactly
no-op in the update (K gets zero columns for it), so the full [2K, D]
system has a static shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pre3_tpu.ekf.state import CAM_DIM, LM_DIM, EkfState
from pre3_tpu.ekf.measurement import Observations
from pre3_tpu.geometry.quaternion import qnormalize


def assemble_h(obs: Observations, use: jnp.ndarray) -> jnp.ndarray:
    """Dense stacked H [K·2, D] with rows zeroed outside `use`.

    Landmark j's block column position is static (slot j), so assembly is
    a set on the [K, 2, K, 6] diagonal — no dynamic scatter.
    """
    k = obs.h.shape[0]
    d = CAM_DIM + k * LM_DIM
    hc = jnp.where(use[:, None, None], obs.hc, 0.0)  # [K, 2, 13]
    hl = jnp.where(use[:, None, None], obs.hl, 0.0)  # [K, 2, 6]
    hlm = jnp.zeros((k, 2, k, LM_DIM))
    hlm = hlm.at[jnp.arange(k), :, jnp.arange(k), :].set(hl)
    h = jnp.concatenate([hc, hlm.reshape(k, 2, k * LM_DIM)], axis=-1)
    return h.reshape(k * 2, d)


def kalman_update(
    state: EkfState,
    obs: Observations,
    use: jnp.ndarray,  # [K] bool — which measurements to apply
    std_z: float = 1.0,
    max_slots: int | None = None,
) -> EkfState:
    """Batch KF update over the selected measurements (update.m:27-56).

    H is never materialized: row block i of H has nonzeros only in the
    camera block (2×13) and landmark-i block (2×6), so P·Hᵀ and S = H·P·Hᵀ
    are assembled from per-slot strip einsums — O(K·D) instead of the
    O(K·D²) dense [2K,D] matmuls. The posterior P = P − Y·Yᵀ with
    Y = P·Hᵀ·L⁻ᵀ (S = L·Lᵀ Cholesky) keeps the one unavoidable O(D²·2K)
    product and guarantees the downdate is symmetric PSD.

    max_slots: bound the measurement stack to the M used slots (top_k on
    the mask gathers every used slot first — ties keep index order). The
    O(D²·2K) downdate becomes O(D²·2M): at K=512 only tens of slots
    measure per frame, so M=128 cuts the dominant update FLOPs 4× and is
    EXACT in real arithmetic whenever ≤ M measurements are in use (the
    zero rows it drops are algebraic no-ops; fp results differ ~1e-8
    because the Cholesky processes the compacted system in a different
    row order). With > M in
    use the weakest-indexed surplus is dropped — bound M by the expected
    inlier count (n_li ≈ 20-40 at the bench operating point). None =
    full-width exact path.
    """
    k = obs.h.shape[0]
    d = state.x.shape[0]
    if max_slots is not None and max_slots < k:
        m = max_slots
        _, sel = jax.lax.top_k(use.astype(jnp.int32), m)  # used first
        sel_use = use[sel]  # [M]
        hc = jnp.where(sel_use[:, None, None], obs.hc[sel], 0.0)
        hl = jnp.where(sel_use[:, None, None], obs.hl[sel], 0.0)
        nu = jnp.where(
            sel_use[:, None], (obs.z - obs.h)[sel], 0.0
        ).reshape(-1)  # [2M]
        pc = state.p[:, :CAM_DIM]  # [D, 13]
        pl = state.p[:, CAM_DIM:].reshape(d, k, LM_DIM)[:, sel, :]
        ph = jnp.einsum("dc,kec->dke", pc, hc) + jnp.einsum(
            "dkl,kel->dke", pl, hl
        )  # [D, M, 2]
        ph2 = ph.reshape(d, 2 * m)
        phc = ph2[:CAM_DIM]  # [13, 2M]
        # landmark rows of P·Hᵀ for the SELECTED slots only
        phl = ph2[CAM_DIM:].reshape(k, LM_DIM, 2 * m)[sel]  # [M, 6, 2M]
        s = (
            jnp.einsum("kec,cm->kem", hc, phc)
            + jnp.einsum("kel,klm->kem", hl, phl)
        ).reshape(2 * m, 2 * m)
        n_rows = 2 * m
    else:
        hc = jnp.where(use[:, None, None], obs.hc, 0.0)  # [K, 2, 13]
        hl = jnp.where(use[:, None, None], obs.hl, 0.0)  # [K, 2, 6]
        nu = jnp.where(use[:, None], obs.z - obs.h, 0.0).reshape(-1)
        pc = state.p[:, :CAM_DIM]  # [D, 13]
        pl = state.p[:, CAM_DIM:].reshape(d, k, LM_DIM)  # [D, K, 6]
        ph = jnp.einsum("dc,kec->dke", pc, hc) + jnp.einsum(
            "dkl,kel->dke", pl, hl
        )  # [D, K, 2] = P Hᵀ in per-slot layout
        ph2 = ph.reshape(d, 2 * k)
        phc = ph2[:CAM_DIM]  # [13, 2K]
        phl = ph2[CAM_DIM:].reshape(k, LM_DIM, 2 * k)  # [K, 6, 2K]
        s = (
            jnp.einsum("kec,cm->kem", hc, phc)
            + jnp.einsum("kel,klm->kem", hl, phl)
        ).reshape(2 * k, 2 * k)
        n_rows = 2 * k
    s = 0.5 * (s + s.T) + (std_z**2) * jnp.eye(n_rows)
    # zeroed (unused) measurement rows leave σ² on the S diagonal and a
    # zero P·Hᵀ column → exact no-ops in the update, as before.
    c, low = jax.scipy.linalg.cho_factor(s, lower=True)
    x_new = state.x + ph2 @ jax.scipy.linalg.cho_solve((c, low), nu)
    y = jax.scipy.linalg.solve_triangular(c, ph2.T, lower=True)  # [2M, D]
    p_new = state.p - y.T @ y
    p_new = 0.5 * (p_new + p_new.T)
    x_new, p_new = renormalize_quaternion(x_new, p_new)
    return state._replace(x=x_new, p=p_new)


def heading_update(
    state: EkfState,
    z_heading: jnp.ndarray,  # [] observed yaw, radians
    std_heading: float = 0.0349,  # ≈2° (ekf_heading_update.m noise)
) -> EkfState:
    """Scalar heading (yaw) observation update.

    The reference's (optional) compass/plane-fit heading correction
    (@ekf_filter/ekf_heading_update.m:26-52 + aux_code/
    observe_heading_func.m / observe_heading_jac.m — symbolic h and H
    there, autodiff here). Innovation is angle-wrapped to (−π, π].
    """
    from pre3_tpu.geometry.quaternion import q2e

    def h_of(x):
        return q2e(x[3:7])[2]

    h = h_of(state.x)
    hrow = jax.grad(h_of)(state.x)[None, :]  # [1, D]
    nu = jnp.mod(z_heading - h + jnp.pi, 2 * jnp.pi) - jnp.pi
    s = (hrow @ state.p @ hrow.T)[0, 0] + std_heading**2
    kgain = (state.p @ hrow.T)[:, 0] / s  # [D]
    x_new = state.x + kgain * nu
    p_new = state.p - s * jnp.outer(kgain, kgain)
    p_new = 0.5 * (p_new + p_new.T)
    x_new, p_new = renormalize_quaternion(x_new, p_new)
    return state._replace(x=x_new, p=p_new)


def attitude_update(
    state: EkfState,
    up_cam: jnp.ndarray,  # [3] observed camera-frame 'up' (floor normal)
    ok: jnp.ndarray | bool = True,  # [] observation validity gate
    std_up: float = 0.0175,  # ≈1° direction noise (z_euler_noise_
    # covariance = (π/180)² per axis, ekf_heading_update.m:38)
    max_angle_deg: float = 4.0,
) -> EkfState:
    """Gravity-direction observation update from a per-frame floor-plane
    fit — the reference's online 'heading' correction
    (@ekf_filter/ekf_heading_update.m:28-52, invoked—commented—at
    mono_slam.m:189-193): there z = R_plane(:,2) (the camera-frame up
    axis observed by the plane fit) is compared against
    h = observe_heading_func(q) (the same axis predicted from the filter
    orientation). Innovations beyond max_angle_deg are rejected outright
    (find_angle_bw_2_vecs gate), protecting against wrong plane fits.
    """
    up_world = jnp.array([0.0, -1.0, 0.0])  # y-down convention

    def h_of(q):
        from pre3_tpu.geometry.quaternion import qconj, qrotate

        return qrotate(qconj(q), up_world)

    q = state.x[3:7]
    h = h_of(q)
    jq = jax.jacfwd(h_of)(q)  # [3, 4]
    d = state.x.shape[0]
    hrow = jnp.zeros((3, d)).at[:, 3:7].set(jq)
    z = up_cam / jnp.maximum(jnp.linalg.norm(up_cam), 1e-9)
    nu = z - h
    angle = jnp.arccos(jnp.clip(jnp.dot(z, h), -1.0, 1.0))
    gate = angle < jnp.radians(max_angle_deg)

    s = hrow @ state.p @ hrow.T + (std_up**2) * jnp.eye(3)
    kgain = jnp.linalg.solve(s, hrow @ state.p).T  # [D, 3]
    x_new = state.x + kgain @ nu
    p_new = state.p - kgain @ s @ kgain.T
    p_new = 0.5 * (p_new + p_new.T)
    x_new, p_new = renormalize_quaternion(x_new, p_new)
    apply = jnp.asarray(ok) & gate
    return state._replace(
        x=jnp.where(apply, x_new, state.x),
        p=jnp.where(apply, p_new, state.p),
    )


def iterated_kalman_update(
    cam_model,
    state: EkfState,
    z: jnp.ndarray,  # [K, 2] measurements
    use: jnp.ndarray,  # [K] bool
    n_iters: int = 3,
    std_z: float = 1.0,
) -> EkfState:
    """Iterated EKF update: re-linearize h/H at the running posterior mean.

    The reference declares this path but never implemented it
    (@ekf_filter/ekf_update_iterated.m:27-29 calls a nonexistent
    `update_iterated` — dead code); this is the working realization.
    Classic IEKF: x_{j+1} = x̂ + K_j (ν_j − H_j (x̂ − x_j)), covariance
    from the final linearization.
    """
    from pre3_tpu.ekf.measurement import predict_measurements

    x_prior, p_prior = state.x, state.p
    st_j = state
    for _ in range(n_iters):
        obs_j = predict_measurements(cam_model, st_j, std_z=std_z)
        h = assemble_h(obs_j, use)  # [2K, D]
        nu = jnp.where(use[:, None], z - obs_j.h, 0.0).reshape(-1)
        k2 = h.shape[0]
        r = (std_z**2) * jnp.eye(k2)
        ph_t = p_prior @ h.T
        s = h @ ph_t + r
        kt = jnp.linalg.solve(s, ph_t.T)  # [2K, D]
        dx = kt.T @ (nu - h @ (x_prior - st_j.x))
        st_j = st_j._replace(x=x_prior + dx)
    p_new = p_prior - kt.T @ s @ kt
    p_new = 0.5 * (p_new + p_new.T)
    x_new, p_new = renormalize_quaternion(st_j.x, p_new)
    return state._replace(x=x_new, p=p_new)


def renormalize_quaternion(x: jnp.ndarray, p: jnp.ndarray):
    """Normalize the state quaternion and propagate its Jacobian through P
    (update.m:43-55 / normJac)."""
    q = x[3:7]
    jn = jax.jacfwd(qnormalize)(q)
    d = x.shape[0]
    x = x.at[3:7].set(qnormalize(q))
    # P ← J P Jᵀ with J = I except the q block: apply as strip updates.
    pq = jn @ p[3:7, :]  # [4, D]
    p = p.at[3:7, :].set(pq)
    p = p.at[:, 3:7].set(p[:, 3:7] @ jn.T)
    return x, p
