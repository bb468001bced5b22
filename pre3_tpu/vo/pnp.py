"""EPnP: camera pose from 3D–2D correspondences.

The reference vendors and experiments with two PnP solvers —
Lepetit/Moreno-Noguer EPnP (aux_code/EPnP_matlab/EPnP/, called from the
commented block RANSAC_CALC_VER2.m:187-191) and Hesch/Roumeliotis DLS-PnP
(aux_code/dls_pnp_matlab/) — as alternatives to 3D-3D alignment when depth
is unavailable for one frame. This is a from-scratch, static-shape EPnP:

  1. control points = centroid + principal axes of the world points,
  2. barycentric coordinates per point,
  3. M x = 0 (M: [2N, 12]) solved by eigendecomposition of MᵀM (12×12),
  4. β for the 1- and 2-null-vector cases closed-form + Gauss–Newton
     refinement on the control-point distance constraints,
  5. Kabsch (ops/svd3) world→camera from recovered control points,
  6. best case picked by masked reprojection error.

Fully jit/vmap-compatible: masked points, fixed iteration counts, no
data-dependent shapes. Usable as a RANSAC hypothesis kernel (vmap over
minimal 6-point subsets) or as a refiner.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pre3_tpu.vo.rigid import kabsch


class PnpResult(NamedTuple):
    r: jnp.ndarray  # [3, 3] world→camera rotation
    t: jnp.ndarray  # [3] camera-frame translation: x_c = R x_w + t
    ok: jnp.ndarray  # [] bool
    err: jnp.ndarray  # [] mean masked reprojection error (normalized coords)


def _control_points(pw: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[4, 3] control points: weighted centroid + scaled principal axes."""
    wn = w / jnp.maximum(jnp.sum(w), 1e-12)
    c0 = jnp.sum(pw * wn[:, None], axis=0)
    d = (pw - c0) * jnp.sqrt(wn)[:, None]
    cov = d.T @ d
    eva, eve = jnp.linalg.eigh(cov)  # ascending
    scale = jnp.sqrt(jnp.maximum(eva, 1e-10))
    axes = eve.T * scale[:, None]  # [3, 3] rows
    return jnp.concatenate([c0[None], c0[None] + axes], axis=0)


def _barycentric(pw: jnp.ndarray, cps: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] coordinates s.t. pw = Σ α_j c_j, Σ α_j = 1."""
    base = jnp.concatenate([cps.T, jnp.ones((1, 4))], axis=0)  # [4, 4]
    rhs = jnp.concatenate([pw.T, jnp.ones((1, pw.shape[0]))], axis=0)
    return jnp.linalg.solve(base, rhs).T


def _rho(cps: jnp.ndarray) -> jnp.ndarray:
    """[6] squared distances between the 4 control points."""
    i, j = jnp.triu_indices(4, k=1)
    d = cps[i] - cps[j]
    return jnp.sum(d * d, axis=-1)


def _cc_dists2(v: jnp.ndarray) -> jnp.ndarray:
    """v: [12] stacked camera-frame control points → [6] squared dists."""
    c = v.reshape(4, 3)
    i, j = jnp.triu_indices(4, k=1)
    d = c[i] - c[j]
    return jnp.sum(d * d, axis=-1)


@partial(jax.jit, static_argnames=("gn_iters",))
def epnp(
    pw: jnp.ndarray,  # [N, 3] world points
    uv_norm: jnp.ndarray,  # [N, 2] normalized image coords (x/z, y/z)
    valid: jnp.ndarray,  # [N] bool
    gn_iters: int = 5,
) -> PnpResult:
    n = pw.shape[0]
    w = valid.astype(pw.dtype)
    cps = _control_points(pw, w)
    alpha = _barycentric(pw, cps)  # [N, 4]

    # M rows (normalized intrinsics: fu=fv=1, uc=vc=0)
    u, v = uv_norm[:, 0], uv_norm[:, 1]
    zero = jnp.zeros_like(alpha)
    m_u = jnp.stack([alpha, zero, -alpha * u[:, None]], axis=-1)  # [N,4,3]
    m_v = jnp.stack([zero, alpha, -alpha * v[:, None]], axis=-1)
    m = jnp.concatenate([m_u, m_v], axis=0).reshape(2 * n, 12)
    m = m * jnp.concatenate([w, w])[:, None]

    mtm = m.T @ m
    eva, eve = jnp.linalg.eigh(mtm)  # ascending: first columns ≈ kernel
    vkern = eve[:, :4]  # [12, 4] null-space basis (v1 = vkern[:, 0])

    rho = _rho(cps)

    def betas_case1(vk):
        v1 = vk[:, 0]
        num = jnp.sum(jnp.sqrt(_cc_dists2(v1) * rho))
        den = jnp.maximum(jnp.sum(_cc_dists2(v1)), 1e-12)
        return jnp.array([num / den, 0.0, 0.0, 0.0])

    def betas_case2(vk):
        # distances are quadratic in (β1, β2): L [6,3] @ (β1², β1β2, β2²)
        c1 = vk[:, 0].reshape(4, 3)
        c2 = vk[:, 1].reshape(4, 3)
        i, j = jnp.triu_indices(4, k=1)
        d1 = c1[i] - c1[j]
        d2 = c2[i] - c2[j]
        ll = jnp.stack([
            jnp.sum(d1 * d1, -1), 2 * jnp.sum(d1 * d2, -1),
            jnp.sum(d2 * d2, -1),
        ], axis=-1)  # [6, 3]
        sol = jnp.linalg.lstsq(ll, rho)[0]  # [β1², β1β2, β2²]
        b1 = jnp.sqrt(jnp.abs(sol[0]))
        b2 = jnp.sqrt(jnp.abs(sol[2])) * jnp.sign(sol[1]) * jnp.sign(
            jnp.where(sol[0] >= 0, 1.0, -1.0)
        )
        return jnp.array([b1, b2, 0.0, 0.0])

    def gauss_newton(betas):
        def resid(b):
            x = vkern @ b
            return _cc_dists2(x) - rho

        def body(b, _):
            r = resid(b)
            jac = jax.jacfwd(resid)(b)  # [6, 4]
            jtj = jac.T @ jac + 1e-9 * jnp.eye(4)
            step = jnp.linalg.solve(jtj, jac.T @ r)
            return b - step, None

        b, _ = jax.lax.scan(body, betas, None, length=gn_iters)
        return b

    def solve_case(betas):
        b = gauss_newton(betas)
        x = vkern @ b  # [12] camera-frame control points
        cc = x.reshape(4, 3)
        # fix sign: points must be in front of the camera (positive z)
        pc = alpha @ cc  # [N, 3]
        zmean = jnp.sum(pc[:, 2] * w) / jnp.maximum(jnp.sum(w), 1e-9)
        cc = cc * jnp.sign(zmean)
        pc = pc * jnp.sign(zmean)
        # world→camera via Kabsch: pc ≈ R pw + t
        fit = kabsch(pc, pw, w)
        proj = pw @ fit.r.T + fit.t
        uvp = proj[:, :2] / jnp.maximum(proj[:, 2:3], 1e-9)
        err = jnp.sum(
            jnp.linalg.norm(uvp - uv_norm, axis=-1) * w
        ) / jnp.maximum(jnp.sum(w), 1e-9)
        return fit, err

    fit1, err1 = solve_case(betas_case1(vkern))
    fit2, err2 = solve_case(betas_case2(vkern))
    pick2 = (err2 < err1) & fit2.ok
    r = jnp.where(pick2, fit2.r, fit1.r)
    t = jnp.where(pick2, fit2.t, fit1.t)
    err = jnp.where(pick2, err2, err1)
    ok = (fit1.ok | fit2.ok) & (jnp.sum(w) >= 6)
    return PnpResult(r=r, t=t, ok=ok, err=err)


def epnp_camera(cam, pw, uv_px, valid, **kw) -> PnpResult:
    """EPnP from *distorted pixel* measurements using the SR4000 camera
    model (undistort + normalize), the form the reference's EPnP
    experiment consumed."""
    from pre3_tpu.geometry.camera import undistort

    uv = undistort(cam, uv_px)
    xn = (uv[:, 0] - cam.cx) / cam.f
    yn = (uv[:, 1] - cam.cy) / cam.f
    return epnp(pw, jnp.stack([xn, yn], axis=-1), valid, **kw)


def dls_pnp(
    pw: jnp.ndarray,  # [N, 3] world points
    uv_n: jnp.ndarray,  # [N, 2] normalized image coords
    valid: jnp.ndarray,  # [N] bool
    iters: int = 10,
) -> PnpResult:
    """Direct least-squares PnP: minimize the object-space error
    Σ‖(I − v̂ᵢv̂ᵢᵀ)(R pᵢ + t)‖² over SE(3) — the cost the reference's
    second PnP solver (Hesch/Roumeliotis DLS, aux_code/dls_pnp_matlab/,
    experimental/commented like EPnP) minimizes. The reference solves it
    globally via a Macaulay polynomial resolution; here the same cost is
    minimized by fixed-iteration Gauss–Newton on the manifold
    (axis-angle left-increment), seeded by EPnP — compiler-friendly
    (static 6×6 solves, no eigendecomposition of a 27×27 system) and
    exact at the same optimum for the seeds EPnP provides.
    """
    seed = epnp(pw, uv_n, valid)
    w = valid.astype(pw.dtype)
    v = jnp.concatenate([uv_n, jnp.ones_like(uv_n[:, :1])], axis=-1)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)  # [N, 3] bearings
    proj = jnp.eye(3)[None] - v[:, :, None] * v[:, None, :]  # I − v̂v̂ᵀ

    def residuals(r, t):
        pc = pw @ r.T + t  # [N, 3]
        return jnp.einsum("nij,nj->ni", proj, pc) * w[:, None]  # [N, 3]

    def body(carry, _):
        r, t = carry
        res = residuals(r, t)  # [N, 3]
        # Jacobian of (I−v̂v̂ᵀ)(exp([δθ]×)·Rp + t + δt) wrt [δθ, δt]:
        # d/dδθ = (I−v̂v̂ᵀ)·(−[Rp]×)  (left increment acts on Rp, not Rp+t)
        rp = pw @ r.T
        skew = jnp.stack([
            jnp.stack([jnp.zeros_like(rp[:, 0]), rp[:, 2], -rp[:, 1]], -1),
            jnp.stack([-rp[:, 2], jnp.zeros_like(rp[:, 0]), rp[:, 0]], -1),
            jnp.stack([rp[:, 1], -rp[:, 0], jnp.zeros_like(rp[:, 0])], -1),
        ], axis=1)  # [N, 3, 3] = −[Rp]×
        j_rot = jnp.einsum("nij,njk->nik", proj, skew)
        j_trn = proj
        jac = jnp.concatenate([j_rot, j_trn], axis=-1)  # [N, 3, 6]
        jac = jac * w[:, None, None]
        jtj = jnp.einsum("nij,nik->jk", jac, jac) + 1e-9 * jnp.eye(6)
        jtr = jnp.einsum("nij,ni->j", jac, res)
        delta = -jnp.linalg.solve(jtj, jtr)
        dth, dt = delta[:3], delta[3:]
        ang = jnp.linalg.norm(dth) + 1e-12
        axis = dth / ang
        k = jnp.stack([
            jnp.stack([jnp.zeros(()), -axis[2], axis[1]]),
            jnp.stack([axis[2], jnp.zeros(()), -axis[0]]),
            jnp.stack([-axis[1], axis[0], jnp.zeros(())]),
        ])
        dr = (jnp.eye(3) + jnp.sin(ang) * k
              + (1.0 - jnp.cos(ang)) * (k @ k))  # Rodrigues
        return (dr @ r, t + dt), None

    (r, t), _ = jax.lax.scan(body, (seed.r, seed.t), None, length=iters)
    res = residuals(r, t)
    err = jnp.sum(res * res) / jnp.maximum(jnp.sum(w), 1.0)
    return PnpResult(r=r, t=t, ok=seed.ok, err=err)
