"""Masked fixed-capacity EKF-SLAM state.

Re-design of the reference's dynamically-sized filter
(@ekf_filter/ekf_filter.m fields x_k_k/p_k_k + the features_info struct
array): the state vector grows/shrinks per frame there
(delete_a_feature.m, add_features_inverse_depth.m:46); here the layout is
static for XLA — a fixed capacity of K landmark slots, each 6-wide:

  x: [D] with D = 13 + 6K
     camera: r(0:3) position, q(3:7) quaternion wxyz, v(7:10), ω(10:13)
     landmark slot i: x[13+6i : 19+6i]
       inverse-depth: [x0, y0, z0, θ, φ, ρ] (hinv_my_version.m)
       cartesian:     [X, Y, Z, 0, 0, 0]   (after linearity conversion)
  p: [D, D] dense covariance (inactive slots carry zero rows/cols)

plus SoA per-slot metadata replacing features_info
(add_feature_to_info_vector_my_version_sift.m:45-80). Add/delete are mask
flips + block writes; compaction never happens (free slots are reused).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

CAM_DIM = 13
LM_DIM = 6


class EkfState(NamedTuple):
    x: jnp.ndarray  # [D]
    p: jnp.ndarray  # [D, D]
    active: jnp.ndarray  # [K] bool
    is_id: jnp.ndarray  # [K] bool — inverse-depth vs cartesian param'n
    desc: jnp.ndarray  # [K, DD] stored descriptor per landmark
    times_predicted: jnp.ndarray  # [K] int32
    times_measured: jnp.ndarray  # [K] int32
    init_frame: jnp.ndarray  # [K] int32
    last_visible: jnp.ndarray  # [K] int32
    # Init-appearance record for warped-patch NCC matching (the reference
    # feature record's patch_when_initialized + r_wc/R_wc when initialized,
    # add_feature_to_info_vector_my_version_sift.m:45-80). Zero-filled and
    # unused in descriptor-matching mode.
    init_patch: jnp.ndarray  # [K, PB, PB] raw intensity patch at init
    init_uv: jnp.ndarray  # [K, 2] pixel at init
    init_cam: jnp.ndarray  # [K, 7] (t_w, q_wc) camera pose at init

    @property
    def n_landmarks(self) -> int:
        return self.active.shape[0]

    @property
    def cam(self) -> jnp.ndarray:
        return self.x[:CAM_DIM]

    @property
    def r_wc(self) -> jnp.ndarray:
        return self.x[0:3]

    @property
    def q_wc(self) -> jnp.ndarray:
        return self.x[3:7]

    @property
    def landmarks(self) -> jnp.ndarray:
        """[K, 6] landmark parameter blocks."""
        return self.x[CAM_DIM:].reshape(-1, LM_DIM)


def init_state(
    n_landmarks: int = 64,
    desc_dim: int = 128,
    q0: jnp.ndarray | None = None,
    std_v0: float = 0.025,
    std_w0: float = 0.025,
    patch_big: int = 21,
    dtype=jnp.float32,
) -> EkfState:
    """x₀/P₀ per initialize_x_and_p.m:27-55: zero pose (optionally a
    plane-fit orientation prior via q0), eps on pose covariance, 0.025² on
    velocity covariances."""
    k = n_landmarks
    d = CAM_DIM + LM_DIM * k
    x = jnp.zeros((d,), dtype)
    if q0 is None:
        x = x.at[3].set(1.0)
    else:
        x = x.at[3:7].set(q0)
    x = x.at[10:13].set(1e-15)  # w_0, matching the reference's tiny epsilon
    pdiag = jnp.zeros((d,), dtype)
    eps = 1e-7
    pdiag = pdiag.at[0:7].set(eps)
    pdiag = pdiag.at[7:10].set(std_v0**2)
    pdiag = pdiag.at[10:13].set(std_w0**2)
    p = jnp.diag(pdiag)
    zi = jnp.zeros((k,), jnp.int32)
    return EkfState(
        x=x, p=p,
        active=jnp.zeros((k,), bool),
        is_id=jnp.zeros((k,), bool),
        desc=jnp.zeros((k, desc_dim), dtype),
        times_predicted=zi, times_measured=zi, init_frame=zi,
        last_visible=zi,
        init_patch=jnp.zeros((k, patch_big, patch_big), dtype),
        init_uv=jnp.zeros((k, 2), dtype),
        init_cam=jnp.zeros((k, 7), dtype),
    )
