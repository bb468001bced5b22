"""Point-to-point ICP, batched and fixed-iteration.

The reference cross-checks its RANSAC VO against ICP/GICP
(TestScripts/ICP_RANSAC{,2,3}.m, GICP_test_each_camera.m,
icp_with_init.m) — ICP is its verification oracle, not its estimator.
Same role here: a jit-compatible ICP usable in tests and as a VO refiner.

TPU shape: nearest neighbors = one [N, M] distance matrix per iteration
(an MXU matmul via the ‖a‖² − 2a·b + ‖b‖² expansion), correspondence
trimming by distance threshold, Kabsch refit (ops/svd3), fixed iteration
count under lax.scan — no data-dependent control flow.

Convention matches vo/rigid.py: solves P ≈ R·Q + t (frame-2 → frame-1).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pre3_tpu.vo.rigid import kabsch


class IcpResult(NamedTuple):
    r: jnp.ndarray  # [3, 3]
    t: jnp.ndarray  # [3]
    ok: jnp.ndarray  # [] bool
    rmse: jnp.ndarray  # [] inlier RMS distance
    n_inliers: jnp.ndarray  # [] int32


def _nn(a: jnp.ndarray, b: jnp.ndarray, valid_b: jnp.ndarray):
    """For each row of a [N,3], index+distance of nearest valid b [M,3]."""
    d2 = (
        jnp.sum(a * a, -1)[:, None]
        - 2.0 * a @ b.T
        + jnp.sum(b * b, -1)[None, :]
    )
    d2 = jnp.where(valid_b[None, :], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=-1)
    return idx, jnp.sqrt(jnp.maximum(jnp.take_along_axis(
        d2, idx[:, None], axis=-1)[:, 0], 0.0))


@partial(jax.jit, static_argnames=("iters",))
def icp(
    p: jnp.ndarray,  # [N, 3] target (frame 1)
    q: jnp.ndarray,  # [M, 3] source (frame 2)
    valid_p: jnp.ndarray,
    valid_q: jnp.ndarray,
    iters: int = 20,
    trim_dist: float = 0.25,
    r0: jnp.ndarray | None = None,
    t0: jnp.ndarray | None = None,
    min_inliers: int = 6,
) -> IcpResult:
    """Align q onto p. Optional initial guess (icp_with_init.m)."""
    r = jnp.eye(3) if r0 is None else r0
    t = jnp.zeros(3) if t0 is None else t0

    def body(carry, _):
        r, t = carry
        q_w = q @ r.T + t  # source moved into frame 1
        idx, dist = _nn(q_w, p, valid_p)
        w = (
            valid_q
            & (dist < trim_dist)
        ).astype(p.dtype)
        fit = kabsch(p[idx], q, w)
        r_new = jnp.where(fit.ok, fit.r, r)
        t_new = jnp.where(fit.ok, fit.t, t)
        return (r_new, t_new), None

    (r, t), _ = jax.lax.scan(body, (r, t), None, length=iters)

    q_w = q @ r.T + t
    idx, dist = _nn(q_w, p, valid_p)
    inl = valid_q & (dist < trim_dist)
    n_inl = jnp.sum(inl)
    rmse = jnp.sqrt(
        jnp.sum(jnp.where(inl, dist * dist, 0.0))
        / jnp.maximum(n_inl, 1)
    )
    return IcpResult(
        r=r, t=t, ok=n_inl >= min_inliers, rmse=rmse,
        n_inliers=n_inl.astype(jnp.int32),
    )
