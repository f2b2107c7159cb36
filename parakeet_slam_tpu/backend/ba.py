"""Bundle adjustment: Schur-complement reduced camera system, solved by PCG
with an implicit operator — the TPU-native large-scale design.

SURVEY.md §3 backend contract: minimize Σ ρ(‖π(T_c, X_p) − u‖²) over camera
poses T (SE(3) tangent steps) and points X. Normal equations
[B E; Eᵀ C][δc; δp] = -[v; w] with C block-diagonal (3×3 per landmark).
Schur: (B − E C⁻¹ Eᵀ) δc = -v + E C⁻¹ w, then δp = -C⁻¹(w + Eᵀ δc).

TPU-first choices (cf. MegBA, PAPERS.md:9, for the distributed pattern):
- The reduced camera matrix S = B − E C⁻¹ Eᵀ is **never materialized**.
  PCG needs only S·x, computed per-observation with gathers + segment-sums:
      S·x = B·x − Jcᵀ(Jp(C⁻¹(Jpᵀ(Jc·x))))
  Every term is a dense batched einsum over the observation axis — MXU/VPU
  work with static shapes, no irregular camera-pair assembly.
- C⁻¹ is the closed-form batched 3×3 inverse (`core/linalg.inv3`) — the
  `kernels/schur` op. No linalg.solve anywhere.
- Robust Huber weights fold into the residual/Jacobian weighting.
- Distribution (SURVEY.md §2b "map-block parallelism"): observations and
  landmark blocks shard over the `dcn` mesh axis; each shard computes its
  partial Jcᵀ(...) contraction and a `psum` assembles the full [C, 6]
  vector — see `dist/dist_ba.py`. The math here is written as pure
  per-observation maps + segment reductions precisely so the sharded
  version is the same code under `shard_map`.
- Jacobians via one vmapped `jax.jacfwd` over the 9-dim (camera-tangent,
  point) perturbation of a single reprojection — one fused XLA op for all
  observations.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from parakeet_slam_tpu.core import geometry, linalg
from parakeet_slam_tpu.backend.graph import BAProblem


class BAResult(NamedTuple):
    problem: BAProblem
    costs: jax.Array        # [iters]
    pcg_residuals: jax.Array  # [iters]


def _project_residual(camera, delta, cam_pose, point, uv):
    """Reprojection residual for one observation, with 6-dof camera tangent
    and 3-dof point perturbations baked in (delta = [δc(6), δp(3)])."""
    pose = geometry.se3_compose(cam_pose, geometry.se3_exp(delta[:6]))
    p_cam = geometry.se3_apply_inverse(pose, point + delta[6:])
    pred = camera.project(p_cam)
    if hasattr(camera, "residual"):
        return camera.residual(uv, pred)
    return uv - pred


def linearize(camera, prob: BAProblem, huber_delta: float):
    """Residuals + Jacobians for all observations.

    Returns (r [O, Dz], Jc [O, Dz, 6], Jp [O, Dz, 3], w [O]) where w folds
    validity and the Huber robust weight.
    """
    cam = prob.cam_pose[prob.obs_cam]
    pt = prob.points[prob.obs_pt]
    zero = jnp.zeros((9,))

    def one(c, p, uv):
        r = _project_residual(camera, zero, c, p, uv)
        J = jax.jacfwd(_project_residual, argnums=1)(camera, zero, c, p, uv)
        return r, J

    r, J = jax.vmap(one)(cam, pt, prob.obs_uv)
    Jc, Jp = J[..., :6], J[..., 6:]
    # Huber: w = min(1, delta / ||r||)  (applied as scalar per observation)
    rnorm = jnp.linalg.norm(r, axis=-1)
    w_huber = jnp.minimum(1.0, huber_delta / jnp.maximum(rnorm, 1e-9))
    w = w_huber * prob.obs_valid.astype(r.dtype)
    return r, Jc, Jp, w


def _build_blocks(prob, r, Jc, Jp, w, lam):
    """Per-camera B blocks, per-point C blocks (damped), gradient halves."""
    C_, P_ = prob.num_cams, prob.num_points
    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]
    # B = Σ Jcᵀ W Jc per camera; C = Σ Jpᵀ W Jp per point
    Bo = jnp.einsum("oki,okj->oij", Jc, wJc)
    Co = jnp.einsum("oki,okj->oij", Jp, wJp)
    B = jnp.zeros((C_, 6, 6)).at[prob.obs_cam].add(Bo)
    C = jnp.zeros((P_, 3, 3)).at[prob.obs_pt].add(Co)
    # gradient: v = Σ Jcᵀ W r, w_g = Σ Jpᵀ W r
    v = jnp.zeros((C_, 6)).at[prob.obs_cam].add(
        jnp.einsum("oki,ok->oi", wJc, r)
    )
    wg = jnp.zeros((P_, 3)).at[prob.obs_pt].add(
        jnp.einsum("oki,ok->oi", wJp, r)
    )
    # LM damping (additive, keeps blocks PD); fixed cameras get huge damping
    eye6 = jnp.eye(6)
    eye3 = jnp.eye(3)
    cam_damp = jnp.where(prob.cam_fixed | ~prob.cam_valid, 1e12, lam)
    B = B + cam_damp[:, None, None] * eye6
    pt_damp = jnp.where(prob.pt_valid, lam, 1e12)
    C = C + pt_damp[:, None, None] * eye3 + 1e-6 * eye3
    return B, C, v, wg


def _schur_matvec(x, prob, B, Cinv, Jc, Jp, w):
    """S·x = B·x − Jcᵀ W Jp C⁻¹ Jpᵀ W Jc x, all per-observation."""
    Bx = jnp.einsum("cij,cj->ci", B, x)
    # t = W Jc x  per obs [O, Dz]
    t = jnp.einsum("okj,oj->ok", Jc, x[prob.obs_cam]) * w[:, None]
    # u = Jpᵀ t aggregated per point [P, 3]
    u = jnp.zeros((prob.num_points, 3)).at[prob.obs_pt].add(
        jnp.einsum("oki,ok->oi", Jp, t)
    )
    y = jnp.einsum("pij,pj->pi", Cinv, u)
    # back: s = W Jp y per obs, then Jcᵀ s per camera
    s = jnp.einsum("oki,oi->ok", Jp, y[prob.obs_pt]) * w[:, None]
    ECEx = jnp.zeros((prob.num_cams, 6)).at[prob.obs_cam].add(
        jnp.einsum("oki,ok->oi", Jc, s)
    )
    return Bx - ECEx


def _pcg(matvec: Callable, b, Minv, iters: int, tol: float):
    """Preconditioned conjugate gradients on the reduced camera system."""
    x0 = jnp.zeros_like(b)
    r0 = b - matvec(x0)
    z0 = jnp.einsum("cij,cj->ci", Minv, r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        denom = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = jnp.einsum("cij,cj->ci", Minv, r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        p = z + beta * p
        return (x, r, p, rz_new), jnp.sqrt(jnp.sum(r * r))

    (x, r, _, _), res = jax.lax.scan(body, (x0, r0, p0, rz0), None, length=iters)
    return x, res[-1]


def ba_cost(camera, prob: BAProblem, huber_delta: float) -> jax.Array:
    cam = prob.cam_pose[prob.obs_cam]
    pt = prob.points[prob.obs_pt]
    zero = jnp.zeros((9,))
    r = jax.vmap(lambda c, p, uv: _project_residual(camera, zero, c, p, uv))(
        cam, pt, prob.obs_uv
    )
    n = jnp.linalg.norm(r, axis=-1)
    # Huber cost
    quad = 0.5 * n * n
    lin = huber_delta * (n - 0.5 * huber_delta)
    rho = jnp.where(n <= huber_delta, quad, lin)
    return jnp.sum(rho * prob.obs_valid)


@partial(jax.jit, static_argnames=("camera", "iters", "pcg_iters", "solver"))
def optimize_ba(
    camera,
    prob: BAProblem,
    iters: int = 10,
    lam: float = 1e-4,
    pcg_iters: int = 50,
    pcg_tol: float = 1e-6,
    huber_delta: float = 2.0,
    solver: str = "pcg",
) -> BAResult:
    """Levenberg-damped GN with Schur elimination of the landmark blocks."""

    def step(carry, _):
        cam_pose, points, lam_t = carry
        p = prob.replace(cam_pose=cam_pose, points=points)
        r, Jc, Jp, w = linearize(camera, p, huber_delta)
        B, C, v, wg = _build_blocks(p, r, Jc, Jp, w, lam_t)
        Cinv, _ = linalg.inv3(C)
        # rhs = -v + E C⁻¹ w_g ; E x = Jcᵀ W Jp x pattern as in matvec
        s = jnp.einsum("oki,oi->ok", Jp, jnp.einsum(
            "pij,pj->pi", Cinv, wg)[p.obs_pt]) * w[:, None]
        ECw = jnp.zeros((p.num_cams, 6)).at[p.obs_cam].add(
            jnp.einsum("oki,ok->oi", Jc, s)
        )
        rhs = -v + ECw

        matvec = lambda x: _schur_matvec(x, p, B, Cinv, Jc, Jp, w)
        if solver == "pcg":
            Binv, _ = linalg.inv_psd(B) if B.shape[-1] <= 3 else (None, None)
            # block-Jacobi preconditioner = B⁻¹ (6x6 -> use jnp solve once)
            Minv = jnp.linalg.inv(B)
            dc, pcg_res = _pcg(matvec, rhs, Minv, pcg_iters, pcg_tol)
        else:
            # dense reduced system (small C): build S column by column
            S = jax.vmap(
                lambda e: matvec(e.reshape(p.num_cams, 6)), in_axes=1, out_axes=2
            )(jnp.eye(p.num_cams * 6)).reshape(p.num_cams * 6, p.num_cams * 6)
            dc = jnp.linalg.solve(S.T, rhs.reshape(-1)).reshape(p.num_cams, 6)
            pcg_res = jnp.float32(0.0)

        # back-substitute points: δp = -C⁻¹(w_g + Eᵀ δc)
        t = jnp.einsum("okj,oj->ok", Jc, dc[p.obs_cam]) * w[:, None]
        Etdc = jnp.zeros((p.num_points, 3)).at[p.obs_pt].add(
            jnp.einsum("oki,ok->oi", Jp, t)
        )
        dp = -jnp.einsum("pij,pj->pi", Cinv, wg + Etdc)

        new_cam = jax.vmap(
            lambda po, d: geometry.se3_compose(po, geometry.se3_exp(d))
        )(cam_pose, dc)
        new_cam = jnp.where(prob.cam_fixed[:, None], cam_pose, new_cam)
        new_points = points + dp * prob.pt_valid[:, None]

        old_cost = ba_cost(camera, p, huber_delta)
        new_cost = ba_cost(
            camera, p.replace(cam_pose=new_cam, points=new_points), huber_delta
        )
        accept = new_cost < old_cost
        cam_out = jnp.where(accept, new_cam, cam_pose)
        pts_out = jnp.where(accept, new_points, points)
        lam_next = jnp.where(accept, lam_t * 0.5, lam_t * 4.0)
        return (cam_out, pts_out, lam_next), (new_cost, pcg_res)

    # fp32 accumulation discipline (SURVEY.md §8): TPU's default bf16 matmul
    # precision corrupts the normal equations enough to stall/diverge LM —
    # observed on-device with the pose graph; same physics applies here.
    with jax.default_matmul_precision("highest"):
        (cam_f, pts_f, _), (costs, pcg_res) = jax.lax.scan(
            step, (prob.cam_pose, prob.points, jnp.float32(lam)), None,
            length=iters,
        )
    return BAResult(
        problem=prob.replace(cam_pose=cam_f, points=pts_f),
        costs=costs,
        pcg_residuals=pcg_res,
    )


def window_problem(prob: BAProblem, window: int) -> BAProblem:
    """Sliding-window (local) BA: keep only the newest `window` cameras
    free; older cameras are frozen (cam_fixed) but their observations still
    constrain the shared points — the keyframe-window blocking analog of
    long-context processing (SURVEY.md §6). Shapes are unchanged, so the
    same jitted optimizer serves full and windowed BA."""
    C = prob.num_cams
    last_valid = jnp.where(prob.cam_valid, jnp.arange(C), -1).max()
    frozen = jnp.arange(C) <= (last_valid - window)
    return prob.replace(cam_fixed=prob.cam_fixed | frozen)
