"""Pose-sharded (keyframe-block) distributed bundle adjustment.

parallel/ba_sharded.py shards the LANDMARK axis and replicates every
pose: each GN iteration psums the dense [6F, 6F] reduced camera system,
which scales as F² — fine at F = 64, a wall at pose-graph scale (F = 1024
would psum 151 MB/iteration). This module is the block-sparse design
SURVEY §2.4 names in its halo-exchange row: the TRAJECTORY is partitioned
into contiguous keyframe blocks, one per device,

  * each block owns its poses and the landmarks whose observations fall
    inside its WINDOW (own poses ± `sep` separator poses on each side —
    keyframe locality makes landmark observation spans short, so
    out-of-window observations are rare; they are dropped and counted),
  * linearization + landmark Schur elimination are block-local; the
    reduced camera system is never materialized globally — it exists
    only as per-block [W·6, W·6] window operators whose overlaps tile a
    block-banded global matrix,
  * the Gauss-Newton step solves that system with distributed
    block-Jacobi-preconditioned conjugate gradients: each matvec is one
    local window-operator product plus a HALO EXCHANGE of the separator
    poses with the two neighboring blocks (jax.lax.ppermute, the
    boundary-exchange collective), and each dot product is one scalar
    psum. Per CG iteration the traffic is 4 ppermutes of [sep, 6] and
    3 scalar psums — independent of F per device,
  * landmark back-substitution is block-local, zero communication.

Same LM damping schedule and factor set as backend.ba.bundle_adjust
(reprojection + depth + odometry-chain + loop-closure-unHuberized), so
on a window-local problem the two optimizers agree to CG tolerance —
pinned by tests/test_distributed.py::TestPoseShardedBa.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pre3_tpu.backend.ba import (
    BaProblem, BaResult, _build_normal_eqs, _cost_sums, _odo_cost_sums,
    _odo_terms,
)
from pre3_tpu.geometry.camera import Camera
from pre3_tpu.geometry.quaternion import qnormalize, qprod, v2q


def _partition(problem: BaProblem, n_dev: int, sep: int):
    """Host-side block partition of a BaProblem (numpy; shapes depend on
    the data). Returns per-block tensors with leading axis n_dev plus a
    report dict."""
    f, l = problem.mask.shape
    fb = (f + n_dev - 1) // n_dev  # owned poses per block
    fpad = fb * n_dev
    w = fb + 2 * sep  # window width

    mask = np.asarray(problem.mask)
    obs_uv = np.asarray(problem.obs_uv)
    obs_xyz = (
        np.asarray(problem.obs_xyz)
        if problem.obs_xyz is not None
        else np.zeros((f, l, 3), np.float32)
    )
    mask_xyz = (
        np.asarray(problem.mask_xyz)
        if problem.mask_xyz is not None else mask
    )
    lc = (
        np.asarray(problem.lc_lm)
        if problem.lc_lm is not None else np.zeros(l, bool)
    )

    # landmark home block = block of its median observing keyframe
    obs_any = mask.any(axis=0)
    first_f = np.argmax(mask, axis=0)
    med_f = np.array([
        int(np.median(np.nonzero(mask[:, j])[0])) if obs_any[j] else 0
        for j in range(l)
    ])
    home = np.clip(med_f // fb, 0, n_dev - 1)

    # window pose range per block (global indices, clipped mask)
    win_lo = np.array([b * fb - sep for b in range(n_dev)])
    # per-block landmark lists, padded to a common Lb
    blocks = [np.nonzero(obs_any & (home == b))[0] for b in range(n_dev)]
    lb = max(1, max(len(bl) for bl in blocks))

    b_uv = np.zeros((n_dev, w, lb, 2), np.float32)
    b_xyz = np.zeros((n_dev, w, lb, 3), np.float32)
    b_mask = np.zeros((n_dev, w, lb), bool)
    b_mask_xyz = np.zeros((n_dev, w, lb), bool)
    b_lc = np.zeros((n_dev, lb), bool)
    b_lidx = np.zeros((n_dev, lb), np.int64)  # global landmark index
    b_lvalid = np.zeros((n_dev, lb), bool)
    dropped = 0
    total_obs = int(mask.sum())
    for b in range(n_dev):
        lo = win_lo[b]
        for jj, j in enumerate(blocks[b]):
            b_lidx[b, jj] = j
            b_lvalid[b, jj] = True
            b_lc[b, jj] = lc[j]
            rows = np.nonzero(mask[:, j])[0]
            for r in rows:
                wi = r - lo
                if 0 <= wi < w and r < f:
                    b_uv[b, wi, jj] = obs_uv[r, j]
                    b_xyz[b, wi, jj] = obs_xyz[r, j]
                    b_mask[b, wi, jj] = True
                    b_mask_xyz[b, wi, jj] = mask_xyz[r, j]
                else:
                    dropped += 1

    # odometry-chain factors: factor i (pose i → i+1) owned by the block
    # owning pose i; window positions (i−lo, i−lo+1) — inside the window
    # for sep ≥ 1 even at the block boundary
    odo_t = (
        np.asarray(problem.odo_t)
        if problem.odo_t is not None else np.zeros((0, 3), np.float32)
    )
    odo_q = (
        np.asarray(problem.odo_q)
        if problem.odo_q is not None
        else np.zeros((0, 4), np.float32)
    )
    odo_w = (
        np.asarray(problem.odo_w)
        if problem.odo_w is not None
        else np.ones(len(odo_t), np.float32)
    )
    b_odo_t = np.zeros((n_dev, fb, 3), np.float32)
    b_odo_q = np.tile(
        np.array([1.0, 0, 0, 0], np.float32), (n_dev, fb, 1)
    )
    b_odo_w = np.zeros((n_dev, fb), np.float32)
    for i in range(min(len(odo_t), f - 1)):
        b = i // fb
        b_odo_t[b, i - b * fb] = odo_t[i]
        b_odo_q[b, i - b * fb] = odo_q[i]
        b_odo_w[b, i - b * fb] = odo_w[i]

    # initial poses, padded; per-block window validity / ownership masks
    kf_t = np.zeros((fpad, 3), np.float32)
    kf_t[:f] = np.asarray(problem.kf_t)
    kf_q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (fpad, 1))
    kf_q[:f] = np.asarray(problem.kf_q)
    # padded landmark slots sit at a safe z=2 point: a (0,0,0) pad would
    # project as 0/0 → NaN, and NaN·0 mask products poison the whole block
    points = np.tile(np.array([0.0, 0, 2.0], np.float32), (n_dev, lb, 1))
    pall = np.asarray(problem.points)
    for b in range(n_dev):
        for jj, j in enumerate(blocks[b]):
            points[b, jj] = pall[j]

    win_valid = np.zeros((n_dev, w), bool)
    for b in range(n_dev):
        gi = win_lo[b] + np.arange(w)
        win_valid[b] = (gi >= 0) & (gi < f)

    report = {"dropped_obs": dropped, "total_obs": total_obs,
              "blocks_lb": lb, "window": w, "fb": fb}
    return (
        dict(
            b_uv=b_uv, b_xyz=b_xyz, b_mask=b_mask, b_mask_xyz=b_mask_xyz,
            b_lc=b_lc, b_lidx=b_lidx, b_lvalid=b_lvalid,
            b_odo_t=b_odo_t, b_odo_q=b_odo_q, b_odo_w=b_odo_w,
            kf_t=kf_t.reshape(n_dev, fb, 3),
            kf_q=kf_q.reshape(n_dev, fb, 4),
            points=points, win_valid=win_valid,
        ),
        report,
    )


def bundle_adjust_pose_sharded(
    mesh: Mesh,
    cam: Camera,
    problem: BaProblem,
    iters: int = 10,
    cg_iters: int = 128,
    sep: int = 3,
    damping: float = 1e-3,
    depth_weight: float = 50.0,
    odo_weight_t: float = 20.0,
    odo_weight_r: float = 50.0,
    axis: str = "blk",
) -> tuple[BaResult, dict]:
    """Keyframe-block-sharded BA. Returns (BaResult, report) where
    report["dropped_obs"] counts observations outside their landmark's
    home window (0 on keyframe-local problems — then the factor set is
    identical to backend.ba.bundle_adjust)."""
    n_dev = mesh.shape[axis]
    f_true, l_true = problem.mask.shape
    data, report = _partition(problem, n_dev, sep)
    fb = report["fb"]
    w = report["window"]
    lb = report["blocks_lb"]

    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    put = lambda x: jax.device_put(jnp.asarray(x), sh)  # noqa: E731

    dd = {k: put(v) for k, v in data.items()}
    hub_b = jnp.where(  # [n_dev, 1, Lb] broadcastable Huber deltas
        dd["b_lc"][:, None, :], 1e6, 3.0
    )
    w_xyz_b = (
        (dd["b_mask"] & dd["b_mask_xyz"]).astype(jnp.float32)
        * depth_weight
    )
    gauge_own = jnp.asarray(  # owned-pose gauge mask: pose 0 is frozen
        np.concatenate([
            np.zeros((1,), np.float32), np.ones((fb * n_dev - 1,),
                                                np.float32)
        ]).reshape(n_dev, fb)
    )
    gauge_own = jax.device_put(gauge_own, sh)
    own_valid = jax.device_put(jnp.asarray(
        (np.arange(fb * n_dev) < f_true).reshape(n_dev, fb)
        .astype(np.float32)
    ), sh)

    def halo_exchange(x_own):
        """[Fb, ...] owned values → [W, ...] window values via two
        ppermutes of the sep-wide separator slabs (SURVEY §2.4 halo row:
        boundary exchange of separator poses between neighbor blocks)."""
        right_of_left = jax.lax.ppermute(  # my left halo
            x_own[-sep:], axis,
            [(i, (i + 1) % n_dev) for i in range(n_dev)],
        )
        left_of_right = jax.lax.ppermute(  # my right halo
            x_own[:sep], axis,
            [(i, (i - 1) % n_dev) for i in range(n_dev)],
        )
        return jnp.concatenate([right_of_left, x_own, left_of_right])

    def halo_reduce(y_win):
        """[W, ...] window contributions → [Fb, ...] owned sums: my own
        slice plus the neighbors' contributions to my boundary poses."""
        to_left = jax.lax.ppermute(  # my first sep rows → left owner
            y_win[:sep], axis,
            [(i, (i - 1) % n_dev) for i in range(n_dev)],
        )
        to_right = jax.lax.ppermute(  # my last sep rows → right owner
            y_win[-sep:], axis,
            [(i, (i + 1) % n_dev) for i in range(n_dev)],
        )
        own = y_win[sep:sep + fb]
        own = own.at[-sep:].add(to_left)
        own = own.at[:sep].add(to_right)
        return own

    def _win_poses(t_own, q_own):
        return halo_exchange(t_own), halo_exchange(q_own)

    def local_linearize(t_win, q_win, pts, lam, uv, m, xyz, wx, hub,
                        win_ok):
        m_eff = m & win_ok[:, None]
        hcc, hpp, wcp, bc, bp = _build_normal_eqs(
            cam, t_win, q_win, pts, uv, m_eff,
            xyz, wx * win_ok[:, None].astype(wx.dtype), lam,
            huber_delta=hub,
        )
        hpp_inv = jnp.linalg.inv(hpp)
        # window operator: S_b = diag(hcc) − W Hpp⁻¹ Wᵀ  [W,6,W,6]
        whw = jnp.einsum("flab,lbc,gldc->fagd", wcp, hpp_inv, wcp)
        s_win = -whw
        s_win = s_win.at[jnp.arange(w), :, jnp.arange(w), :].add(hcc)
        rhs_win = bc - jnp.einsum("flab,lbc,lc->fa", wcp, hpp_inv, bp)
        return s_win, rhs_win, hpp_inv, wcp, bp

    def gn_body(carry_t, carry_q, pts, lam, dd, spmd_axis=axis):
        """One Gauss-Newton step, executed inside shard_map (per block).
        carry_t/q are OWNED poses [Fb, ...]; pts the block's landmarks."""
        t_win, q_win = _win_poses(carry_t, carry_q)
        win_ok = dd["win_valid"]

        # per-block odo terms live on the window: factor i at window
        # position (sep + i_local, sep + i_local + 1)
        s_win, rhs_win, hpp_inv, wcp, bp = local_linearize(
            t_win, q_win, pts, lam, dd["b_uv"], dd["b_mask"],
            dd["b_xyz"], dd["w_xyz"], dd["hub"], win_ok,
        )
        # odo factors on the window slice [sep : sep+fb+1]
        t_o = jax.lax.dynamic_slice_in_dim(t_win, sep, fb + 1, 0)
        q_o = jax.lax.dynamic_slice_in_dim(q_win, sep, fb + 1, 0)
        s_add, rhs_add, _, _ = _odo_terms(
            t_o, q_o, dd["b_odo_t"], dd["b_odo_q"], odo_weight_t,
            odo_weight_r, dd["b_odo_w"],
        )  # [(Fb+1), 6, (Fb+1), 6]
        s_win = jax.lax.dynamic_update_slice(
            s_win,
            jax.lax.dynamic_slice(
                s_win, (sep, 0, sep, 0), (fb + 1, 6, fb + 1, 6)
            ) + s_add,
            (sep, 0, sep, 0),
        )
        rhs_win = jax.lax.dynamic_update_slice_in_dim(
            rhs_win,
            jax.lax.dynamic_slice_in_dim(rhs_win, sep, fb + 1, 0)
            + rhs_add,
            sep, 0,
        )

        # gauge + validity: zero rows/cols of frozen/padded poses.
        # keep[w]: window pose participates in the solve. win_valid also
        # kills the wraparound halos of the chain's end blocks (ppermute
        # rings; the first block's left halo is the last block's tail)
        keep_own = dd["gauge_own"] * dd["own_valid"]  # [Fb]
        keep_win = halo_exchange(keep_own) * dd["win_valid"]  # [W]
        s_win = (
            s_win * keep_win[:, None, None, None]
            * keep_win[None, None, :, None]
        )
        rhs_win = rhs_win * keep_win[:, None]

        # assemble the global (distributed) rhs and Jacobi blocks
        rhs_own = halo_reduce(rhs_win)  # [Fb, 6]
        diag_win = s_win[jnp.arange(w), :, jnp.arange(w), :]  # [W, 6, 6]
        diag_own = halo_reduce(diag_win)
        prec = jnp.linalg.inv(
            diag_own + 1e-8 * jnp.eye(6)[None]
            + (1.0 - keep_own)[:, None, None] * jnp.eye(6)[None]
        )  # frozen poses get identity

        def matvec(x_own):  # [Fb, 6] → [Fb, 6]
            x_win = halo_exchange(x_own * keep_own[:, None])
            y_win = jnp.einsum("fagb,gb->fa", s_win, x_win)
            return halo_reduce(y_win) * keep_own[:, None]

        def pdot(a, b):
            return jax.lax.psum(jnp.sum(a * b), spmd_axis)

        # block-Jacobi PCG, fixed trip count. pvary: the zero initial
        # iterate must carry the mesh-axis varying type the ppermute-fed
        # updates have, or the scan carry types mismatch under shard_map
        x0 = jax.lax.pcast(jnp.zeros((fb, 6)), (spmd_axis,),
                           to='varying')
        r0 = rhs_own * keep_own[:, None]
        z0 = jnp.einsum("fab,fb->fa", prec, r0)
        p0 = z0
        rz0 = pdot(r0, z0)

        def cg_step(c, _):
            x, r, p, rz = c
            ap = matvec(p)
            denom = pdot(p, ap)
            alpha = rz / jnp.maximum(denom, 1e-30)
            x = x + alpha * p
            r = r - alpha * ap
            z = jnp.einsum("fab,fb->fa", prec, r)
            rz_new = pdot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta * p
            return (x, r, p, rz_new), None

        (dc_own, _, _, _), _ = jax.lax.scan(
            cg_step, (x0, r0, p0, rz0), None, length=cg_iters
        )

        # landmark back-substitution (block-local)
        dc_win = halo_exchange(dc_own)
        dp = jnp.einsum(
            "lab,lb->la", hpp_inv,
            bp - jnp.einsum("flab,fa->lb", wcp, dc_win),
        )
        return dc_own, dp

    def block_cost(t_own, q_own, pts, dd, spmd_axis=axis):
        t_win, q_win = _win_poses(t_own, q_own)
        win_ok = dd["win_valid"][:, None].astype(jnp.float32)
        tot, n = _cost_sums(
            cam, t_win, q_win, pts, dd["b_uv"],
            dd["b_mask"] & dd["win_valid"][:, None],
            dd["b_xyz"], dd["w_xyz"] * win_ok, huber_delta=dd["hub"],
        )
        t_o = jax.lax.dynamic_slice_in_dim(t_win, sep, fb + 1, 0)
        q_o = jax.lax.dynamic_slice_in_dim(q_win, sep, fb + 1, 0)
        ot, on = _odo_cost_sums(
            t_o, q_o,
            (dd["b_odo_t"], dd["b_odo_q"], odo_weight_t, odo_weight_r,
             dd["b_odo_w"]),
        )
        tot = jax.lax.psum(tot + ot, spmd_axis)
        n = jax.lax.psum(n + on, spmd_axis)
        return tot / jnp.maximum(n, 1)

    spec_map = dict(
        b_uv=P(axis), b_mask=P(axis), b_xyz=P(axis), w_xyz=P(axis),
        hub=P(axis), b_odo_t=P(axis), b_odo_q=P(axis), b_odo_w=P(axis),
        win_valid=P(axis), gauge_own=P(axis), own_valid=P(axis),
    )
    dd_in = dict(
        b_uv=dd["b_uv"], b_mask=dd["b_mask"], b_xyz=dd["b_xyz"],
        w_xyz=w_xyz_b, hub=hub_b, b_odo_t=dd["b_odo_t"],
        b_odo_q=dd["b_odo_q"], b_odo_w=dd["b_odo_w"],
        win_valid=dd["win_valid"], gauge_own=gauge_own,
        own_valid=own_valid,
    )

    def step_all(t_own, q_own, pts, lam, dd):
        # shard_map keeps the sharded leading axis as a local length-1
        # dim — strip it for the block-local math, restore on output
        t_own, q_own, pts = t_own[0], q_own[0], pts[0]
        dd = {k: v[0] for k, v in dd.items()}
        c0 = block_cost(t_own, q_own, pts, dd)
        dc, dp = gn_body(t_own, q_own, pts, lam, dd)
        t2 = t_own + dc[:, :3]
        q2 = jax.vmap(lambda q, d: qnormalize(qprod(q, v2q(d))))(
            q_own, dc[:, 3:]
        )
        p2 = pts + dp
        c1 = block_cost(t2, q2, p2, dd)
        better = c1 < c0
        return (
            jnp.where(better, t2, t_own)[None],
            jnp.where(better, q2, q_own)[None],
            jnp.where(better, p2, pts)[None],
            jnp.where(
                better, jnp.maximum(lam * 0.5, 1e-8),
                jnp.minimum(lam * 10.0, 1e6),
            ),
            jnp.where(better, c1, c0),
        )

    sharded_step = jax.shard_map(
        step_all,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(),
                  {k: spec_map[k] for k in dd_in}),
        out_specs=(P(axis), P(axis), P(axis), P(), P()),
    )

    @jax.jit
    def run(t_own, q_own, pts, dd):
        def body(carry, _):
            t, q, p, lam = carry
            t, q, p, lam, c = sharded_step(t, q, p, lam, dd)
            return (t, q, p, lam), c

        (t, q, p, _lam), costs = jax.lax.scan(
            body, (t_own, q_own, pts, jnp.asarray(damping)), None,
            length=iters,
        )
        return t, q, p, costs

    with jax.set_mesh(mesh):
        t_fin, q_fin, p_fin, costs = run(
            dd["kf_t"], dd["kf_q"], dd["points"], dd_in
        )
        t_fin = jax.device_put(t_fin, rep)
        q_fin = jax.device_put(q_fin, rep)
        p_fin = jax.device_put(p_fin, rep)

    # un-partition back to the problem's global indexing
    t_np = np.asarray(t_fin).reshape(-1, 3)[:f_true]
    q_np = np.asarray(q_fin).reshape(-1, 4)[:f_true]
    pts_np = np.asarray(problem.points).copy()
    p_blocks = np.asarray(p_fin)
    lidx = data["b_lidx"]
    lvalid = data["b_lvalid"]
    for b in range(n_dev):
        for jj in range(lb):
            if lvalid[b, jj]:
                pts_np[lidx[b, jj]] = p_blocks[b, jj]
    res = BaResult(
        kf_t=jnp.asarray(t_np), kf_q=jnp.asarray(q_np),
        points=jnp.asarray(pts_np), cost=jnp.asarray(np.asarray(costs)),
    )
    return res, report
