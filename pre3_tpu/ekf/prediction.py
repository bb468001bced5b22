"""EKF prediction with odometry (VO) control input.

Re-design of predict_state_and_covariance.m:27-143 + fv.m + aux_code/
odometry_model.m: the camera pose is propagated by the frame-to-frame VO
increment u = (dX, dq); landmarks are static. The reference's hand-coded
F, G Jacobians (odometry_model.m:62-68) are obtained by jax.jacfwd of the
13-dim transition; covariance propagation is done blockwise so the
landmark-landmark block (the O(N²) bulk) is never multiplied by an
identity — only the camera row/column strips are touched, which is both
exactly the reference's block structure (predict_state_and_covariance.m:
131) and the cheap way on TPU.

Process noise mirrors the reference's hand-tuned values
(predict_state_and_covariance.m:98-102): cov_dX = diag((0.01/3)²) and
cov_dq from Euler noise 0.24°/2·[1, 0.1, 1] pushed through e2q.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.ekf.state import CAM_DIM, EkfState
from pre3_tpu.geometry.quaternion import e2q, qnormalize, qprod, qrotate


def camera_transition(cam: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """13-dim camera state transition under odometry control u = [dX(3),
    dq(4)] (odometry_model.m:1-70): r' = r + R(q)·dX, q' = q ⊗ dq;
    velocity states pass through (they are carried but unused in odometry
    mode, as in the reference)."""
    r, q = cam[0:3], cam[3:7]
    dx, dq = u[0:3], u[3:7]
    r_new = r + qrotate(q, dx)
    q_new = qprod(q, dq)
    return jnp.concatenate([r_new, q_new, cam[7:13]])


def process_noise_u() -> np.ndarray:
    """[7, 7] control-space noise Pn (static constant)."""
    cov_dx = np.diag(np.full(3, (0.01 / 3.0) ** 2, np.float64))
    e = 0.24 / 2.0 * np.pi / 180.0 * np.array([1.0, 0.1, 1.0])
    # Qe = ∂q/∂e at the nominal Euler noise point (reference builds cov_dq
    # = Qe diag(e²) Qeᵀ with Qe evaluated at e itself)
    qe = np.asarray(jax.jacfwd(e2q)(jnp.asarray(e, jnp.float32)), np.float64)
    cov_dq = qe @ np.diag(e**2) @ qe.T
    pn = np.zeros((7, 7))
    pn[:3, :3] = cov_dx
    pn[3:, 3:] = cov_dq
    return pn.astype(np.float32)


# Kept as numpy: a device-array closure constant would be hoisted as an
# extra executable parameter (see geometry/camera.py::sr4000_camera).
_PN = process_noise_u()


def _norm_jac(q: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of quaternion normalization (the reference's normJac)."""
    return jax.jacfwd(qnormalize)(q)


@jax.jit
def predict(
    state: EkfState, u: jnp.ndarray, pn: jnp.ndarray | None = None
) -> EkfState:
    """One EKF prediction. u = [dX(3), dq(4)] VO increment (identity when
    VO failed, matching Calculate_V_Omega_RANSAC_dr_ye.m:41-45).

    pn: optional [7, 7] control-space noise. Default is the reference's
    hand-tuned constant; pass the estimated VO covariance
    (vo/covariance.py, mapped to u-space) for a principled process noise —
    the improvement the reference left commented out
    (predict_state_and_covariance.m:104 `Pn = calc_cov_RANSAC_dr_ye`)."""
    if pn is None:
        pn = _PN
    cam = state.x[:CAM_DIM]
    f_fn = lambda c: camera_transition(c, u)
    g_fn = lambda uu: camera_transition(cam, uu)
    cam_new = f_fn(cam)
    f = jax.jacfwd(f_fn)(cam)  # [13, 13]
    g = jax.jacfwd(g_fn)(u)  # [13, 7]
    q_block = g @ pn @ g.T  # [13, 13]

    p = state.p
    pcc = p[:CAM_DIM, :CAM_DIM]
    pcl = p[:CAM_DIM, CAM_DIM:]
    pll = p[CAM_DIM:, CAM_DIM:]
    pcc_n = f @ pcc @ f.T + q_block
    pcl_n = f @ pcl
    # quaternion renormalization Jacobian applied to the q rows/cols
    # (predict_state_and_covariance.m:137-143)
    jn = _norm_jac(cam_new[3:7])
    jfull = jnp.eye(CAM_DIM).at[3:7, 3:7].set(jn)
    pcc_n = jfull @ pcc_n @ jfull.T
    pcl_n = jfull @ pcl_n
    p_new = jnp.block([[pcc_n, pcl_n], [pcl_n.T, pll]])
    p_new = 0.5 * (p_new + p_new.T)

    cam_new = cam_new.at[3:7].set(qnormalize(cam_new[3:7]))
    x_new = state.x.at[:CAM_DIM].set(cam_new)
    return state._replace(x=x_new, p=p_new)
