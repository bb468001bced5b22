"""Distributed bundle adjustment: landmark blocks sharded over a device
mesh (BASELINE config #5).

The map is partitioned by landmarks across the mesh axis "lm" (the
keyframe-block sharding of SURVEY §2.4): every device linearizes and
eliminates ITS landmark shard locally (batched 3×3 inverses), the reduced
camera system — small, [6F, 6F] — is summed across devices with one psum
riding ICI, solved redundantly on every device (cheaper than scattering a
tiny solve), and landmark updates back-substitute locally with zero
further communication. Per GN iteration the only collective traffic is
the psum of S [6F·6F] and rhs [6F].

Implemented with jax.shard_map over the normal-equation build + Schur
elimination; the outer GN loop stays in the (sharded) jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pre3_tpu.backend.ba import (
    BaProblem, BaResult, _build_normal_eqs, _cost,
)
from pre3_tpu.parallel.distributed import globalize_replicated
from pre3_tpu.geometry.camera import Camera
from pre3_tpu.geometry.quaternion import qnormalize, qprod, v2q


def _pad_landmarks(problem: BaProblem, n_devices: int) -> tuple[BaProblem, int]:
    """Pad the landmark axis to a multiple of the mesh size."""
    f, l = problem.mask.shape
    lp = (l + n_devices - 1) // n_devices * n_devices
    if lp == l:
        return problem, l
    padl = lp - l

    def pad(x, axis):
        if x is None:
            return None
        width = [(0, 0)] * x.ndim
        width[axis] = (0, padl)
        return jnp.pad(x, width)

    return (
        problem._replace(
            obs_uv=pad(problem.obs_uv, 1),
            mask=pad(problem.mask, 1),
            points=pad(problem.points, 0),
            obs_xyz=pad(problem.obs_xyz, 1),
            mask_xyz=pad(problem.mask_xyz, 1),
        ),
        l,
    )


def bundle_adjust_sharded(
    mesh: Mesh,
    cam: Camera,
    problem: BaProblem,
    iters: int = 10,
    damping: float = 1e-3,
    depth_weight: float = 50.0,
    axis: str = "lm",
) -> BaResult:
    """Landmark-sharded BA. Numerically identical to backend.ba.
    bundle_adjust (same math, the psum just reorders the reduction)."""
    n_dev = mesh.shape[axis]
    problem, l_orig = _pad_landmarks(problem, n_dev)
    f, l = problem.mask.shape

    obs_xyz = (
        problem.obs_xyz
        if problem.obs_xyz is not None
        else jnp.zeros((f, l, 3), problem.obs_uv.dtype)
    )
    mask_xyz = (
        problem.mask_xyz if problem.mask_xyz is not None else problem.mask
    )
    w_xyz_fl = (problem.mask & mask_xyz).astype(
        problem.obs_uv.dtype
    ) * depth_weight

    lm_spec = P(None, axis)  # [F, L*] tensors
    pt_spec = P(axis)  # [L*, ...] tensors
    rep = P()

    def local_step(kf_t, kf_q, points_l, obs_uv_l, mask_l, obs_xyz_l,
                   w_xyz_l, lam):
        """Runs per device on its landmark shard."""
        hcc, hpp, wcp, bc, bp = _build_normal_eqs(
            cam, kf_t, kf_q, points_l, obs_uv_l, mask_l, obs_xyz_l,
            w_xyz_l, lam,
        )
        # local Schur contribution
        hpp_inv = jnp.linalg.inv(hpp)
        whw = jnp.einsum("flab,lbc,gldc->fagd", wcp, hpp_inv, wcp)
        rhs_local = bc - jnp.einsum("flab,lbc,lc->fa", wcp, hpp_inv, bp)
        # psum over the landmark mesh axis → every device holds the full
        # reduced system. NOTE: hcc (damping included) is summed too, so
        # divide the per-device copy... hcc depends only on local shard's
        # factors; damping must be added once → subtract extras.
        s_local = -whw
        s_local = s_local.at[jnp.arange(f), :, jnp.arange(f), :].add(hcc)
        s_full = jax.lax.psum(s_local, axis)
        rhs_full = jax.lax.psum(rhs_local, axis)
        # damping was added on every device: correct to a single copy
        extra = (n_dev - 1) * lam
        diag_idx = jnp.arange(f)
        s_full = s_full.at[diag_idx, :, diag_idx, :].add(
            -extra * jnp.eye(6)[None]
        )
        # gauge: freeze keyframe 0
        keep = jnp.ones((f,)).at[0].set(0.0)
        s_full = (
            s_full * keep[:, None, None, None] * keep[None, None, :, None]
        )
        s_full = s_full.at[0, :, 0, :].set(jnp.eye(6))
        rhs_full = rhs_full * keep[:, None]

        sd = s_full.reshape(f * 6, f * 6)
        d = jnp.sqrt(jnp.maximum(jnp.diagonal(sd), 1e-12))
        sn = sd / d[:, None] / d[None, :]
        y = jnp.linalg.solve(sn, rhs_full.reshape(-1) / d)
        dc = (y / d).reshape(f, 6)
        # local back-substitution
        dp_l = jnp.einsum(
            "lab,lb->la", hpp_inv,
            bp - jnp.einsum("flab,fa->lb", wcp, dc),
        )
        return dc, dp_l

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(rep, rep, pt_spec, lm_spec, lm_spec, lm_spec, lm_spec,
                  rep),
        out_specs=(rep, pt_spec),
    )

    # All tensors enter `run` as explicit (replicated global) arguments —
    # device-array closures would become process-local hoisted constants,
    # which cannot feed a computation spanning a multi-process mesh. The
    # shard_map in_specs distribute the landmark axis from the replicated
    # copies (a local slice, no communication).
    @jax.jit
    def run(kf_t, kf_q, points, obs_uv, mask, obs_xyz, w_xyz_fl):
        def gn_step(carry, _):
            kf_t, kf_q, points, lam = carry
            c0 = _cost(cam, kf_t, kf_q, points, obs_uv, mask,
                       obs_xyz, w_xyz_fl)
            dc, dp = sharded(
                kf_t, kf_q, points, obs_uv, mask, obs_xyz, w_xyz_fl, lam,
            )
            t2 = kf_t + dc[:, :3]
            q2 = qnormalize(qprod(kf_q, v2q(dc[:, 3:])))
            p2 = points + dp
            c1 = _cost(cam, t2, q2, p2, obs_uv, mask, obs_xyz, w_xyz_fl)
            better = c1 < c0
            # LM damping schedule — identical to backend.ba.bundle_adjust
            lam = jnp.where(
                better,
                jnp.maximum(lam * 0.5, 1e-8),
                jnp.minimum(lam * 10.0, 1e6),
            )
            return (
                jnp.where(better, t2, kf_t),
                jnp.where(better, q2, kf_q),
                jnp.where(better, p2, points),
                lam,
            ), jnp.where(better, c1, c0)

        cost0 = _cost(cam, kf_t, kf_q, points, obs_uv, mask, obs_xyz,
                      w_xyz_fl)
        lam0 = jnp.asarray(damping, kf_t.dtype)
        (t, q, p, _lam), costs = jax.lax.scan(
            gn_step, (kf_t, kf_q, points, lam0), None, length=iters
        )
        # gather the landmark shards so every process can read the result
        p = jax.lax.with_sharding_constraint(p, NamedSharding(mesh, P()))
        return t, q, p[:l_orig], jnp.concatenate([cost0[None], costs])

    g = partial(globalize_replicated, mesh)
    with jax.set_mesh(mesh):
        kf_t, kf_q, points, costs = run(
            g(problem.kf_t), g(problem.kf_q), g(problem.points),
            g(problem.obs_uv), g(problem.mask), g(obs_xyz), g(w_xyz_fl),
        )
    return BaResult(kf_t=kf_t, kf_q=kf_q, points=points, cost=costs)
