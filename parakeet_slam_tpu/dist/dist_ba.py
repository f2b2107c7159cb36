"""Distributed bundle adjustment: landmark blocks sharded per host.

BASELINE.json:5 / SURVEY.md §2b "map-block parallelism": observations and
landmark (point) blocks are partitioned over the `dcn` mesh axis — each
shard owns a contiguous point range and ALL observations of those points,
so the block-diagonal C matrix and the point back-substitution are fully
shard-local. Camera state is replicated (small). Per GN iteration the only
collectives are:

- one `psum` assembling B (per-camera 6x6 blocks) and the gradient,
- one `psum` per PCG iteration assembling the E C⁻¹ Eᵀ x partial products
  into the reduced-camera-system matvec.

This is exactly the MegBA-style distributed Schur pattern (PAPERS.md:9)
expressed with JAX collectives instead of NCCL. The per-shard math reuses
`backend/ba.py`'s observation-major formulation verbatim; point indices are
simply rebased to shard-local coordinates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map as shard_map_fn
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as shard_map_fn

from parakeet_slam_tpu.backend import ba as ba_mod
from parakeet_slam_tpu.backend.graph import BAProblem
from parakeet_slam_tpu.kernels import schur
from parakeet_slam_tpu.core import geometry, linalg
from parakeet_slam_tpu.dist.mesh import MAP_AXIS


def shard_problem(prob: BAProblem, n_shards: int) -> BAProblem:
    """Host-side re-layout: points padded to a multiple of n_shards and
    partitioned contiguously; observations sorted by point and padded so
    every shard owns an equal count of them (invalid padding rows).

    After this, shard s owns points [s*Lp, (s+1)*Lp) and exactly the
    observations referencing them.
    """
    S = n_shards
    Lm = prob.num_points
    Lp = ((Lm + S - 1) // S) * S // S  # points per shard
    Lm_pad = Lp * S

    points = np.asarray(prob.points)
    pt_valid = np.asarray(prob.pt_valid)
    points = np.pad(points, ((0, Lm_pad - Lm), (0, 0)))
    pt_valid = np.pad(pt_valid, (0, Lm_pad - Lm))

    obs_pt = np.asarray(prob.obs_pt)
    obs_cam = np.asarray(prob.obs_cam)
    obs_uv = np.asarray(prob.obs_uv)
    obs_valid = np.asarray(prob.obs_valid)

    shard_of = obs_pt // Lp
    counts = np.bincount(shard_of[obs_valid], minlength=S)
    O_l = int(max(counts.max(), 1))

    uv_dim = obs_uv.shape[1]
    new_cam = np.zeros((S, O_l), np.int32)
    new_pt = np.zeros((S, O_l), np.int32)
    new_uv = np.zeros((S, O_l, uv_dim), obs_uv.dtype)
    new_valid = np.zeros((S, O_l), bool)
    for s in range(S):
        rows = np.where(obs_valid & (shard_of == s))[0]
        n = len(rows)
        new_cam[s, :n] = obs_cam[rows]
        new_pt[s, :n] = obs_pt[rows]
        new_uv[s, :n] = obs_uv[rows]
        new_valid[s, :n] = True
        new_pt[s, n:] = s * Lp  # padding points inside this shard's range

    return prob.replace(
        points=jnp.asarray(points),
        pt_valid=jnp.asarray(pt_valid),
        obs_cam=jnp.asarray(new_cam.reshape(-1)),
        obs_pt=jnp.asarray(new_pt.reshape(-1)),
        obs_uv=jnp.asarray(new_uv.reshape(S * O_l, uv_dim)),
        obs_valid=jnp.asarray(new_valid.reshape(-1)),
    )


def optimize_ba_distributed(
    camera,
    prob: BAProblem,
    mesh,
    iters: int = 10,
    lam: float = 1e-4,
    pcg_iters: int = 50,
    huber_delta: float = 2.0,
):
    """Distributed LM-damped GN; `prob` must come from `shard_problem` with
    n_shards == mesh.shape[MAP_AXIS]. Returns a BAResult-compatible tuple.
    """
    S = mesh.shape[MAP_AXIS]
    Lp = prob.num_points // S
    C_ = prob.num_cams
    ax = MAP_AXIS

    def body(cam_pose, points_l, obs_cam_l, obs_pt_l, obs_uv_l, obs_valid_l,
             pt_valid_l, cam_fixed):
        me = jax.lax.axis_index(ax)
        pt_local = obs_pt_l - me * Lp  # rebased indices into this shard

        def linearize(cam_pose, points_l):
            cam = cam_pose[obs_cam_l]
            pt = points_l[pt_local]
            zero = jnp.zeros((9,))

            def one(c, p, uv):
                r = ba_mod._project_residual(camera, zero, c, p, uv)
                J = jax.jacfwd(ba_mod._project_residual, argnums=1)(
                    camera, zero, c, p, uv
                )
                return r, J

            r, J = jax.vmap(one)(cam, pt, obs_uv_l)
            Jc, Jp = J[..., :6], J[..., 6:]
            rnorm = jnp.linalg.norm(r, axis=-1)
            w_h = jnp.minimum(1.0, huber_delta / jnp.maximum(rnorm, 1e-9))
            w = w_h * obs_valid_l.astype(r.dtype)
            return r, Jc, Jp, w

        def cost_of(cam_pose, points_l):
            cam = cam_pose[obs_cam_l]
            pt = points_l[pt_local]
            zero = jnp.zeros((9,))
            r = jax.vmap(
                lambda c, p, uv: ba_mod._project_residual(camera, zero, c, p, uv)
            )(cam, pt, obs_uv_l)
            n = jnp.linalg.norm(r, axis=-1)
            rho = jnp.where(
                n <= huber_delta,
                0.5 * n * n,
                huber_delta * (n - 0.5 * huber_delta),
            )
            return jax.lax.psum(jnp.sum(rho * obs_valid_l), ax)

        def step(carry, _):
            cam_pose, points_l, lam_t = carry
            r, Jc, Jp, w = linearize(cam_pose, points_l)
            wJc = Jc * w[:, None, None]
            wJp = Jp * w[:, None, None]
            # B, v: partial per shard -> psum (cameras are global)
            B = jax.lax.psum(
                jnp.zeros((C_, 6, 6)).at[obs_cam_l].add(
                    jnp.einsum("oki,okj->oij", Jc, wJc)
                ),
                ax,
            )
            v = jax.lax.psum(
                jnp.zeros((C_, 6)).at[obs_cam_l].add(
                    jnp.einsum("oki,ok->oi", wJc, r)
                ),
                ax,
            )
            # C, w_g: fully local (points shard-local)
            Cb = jnp.zeros((Lp, 3, 3)).at[pt_local].add(
                jnp.einsum("oki,okj->oij", Jp, wJp)
            )
            wg = jnp.zeros((Lp, 3)).at[pt_local].add(
                jnp.einsum("oki,ok->oi", wJp, r)
            )
            eye6, eye3 = jnp.eye(6), jnp.eye(3)
            cam_damp = jnp.where(cam_fixed, 1e12, lam_t)
            B = B + cam_damp[:, None, None] * eye6
            pt_damp = jnp.where(pt_valid_l, lam_t, 1e12)
            Cb = Cb + pt_damp[:, None, None] * eye3 + 1e-6 * eye3

            def ece_partial(x):
                t = jnp.einsum("okj,oj->ok", Jc, x[obs_cam_l]) * w[:, None]
                u = jnp.zeros((Lp, 3)).at[pt_local].add(
                    jnp.einsum("oki,ok->oi", Jp, t)
                )
                y = schur.cinv_apply(Cb, u)
                s = jnp.einsum("oki,oi->ok", Jp, y[pt_local]) * w[:, None]
                return jnp.zeros((C_, 6)).at[obs_cam_l].add(
                    jnp.einsum("oki,ok->oi", Jc, s)
                )

            def matvec(x):
                Bx = jnp.einsum("cij,cj->ci", B, x)
                return Bx - jax.lax.psum(ece_partial(x), ax)

            # rhs = -v + psum(E C⁻¹ w_g)
            s = jnp.einsum(
                "oki,oi->ok", Jp, schur.cinv_apply(Cb, wg)[pt_local]
            ) * w[:, None]
            ECw = jax.lax.psum(
                jnp.zeros((C_, 6)).at[obs_cam_l].add(
                    jnp.einsum("oki,ok->oi", Jc, s)
                ),
                ax,
            )
            rhs = -v + ECw

            Minv = jnp.linalg.inv(B)
            dc, _ = ba_mod._pcg(matvec, rhs, Minv, pcg_iters, 1e-6)

            # back-substitute local points
            t = jnp.einsum("okj,oj->ok", Jc, dc[obs_cam_l]) * w[:, None]
            Etdc = jnp.zeros((Lp, 3)).at[pt_local].add(
                jnp.einsum("oki,ok->oi", Jp, t)
            )
            dp = -schur.cinv_apply(Cb, wg + Etdc)

            new_cam = jax.vmap(
                lambda po, d: geometry.se3_compose(po, geometry.se3_exp(d))
            )(cam_pose, dc)
            new_cam = jnp.where(cam_fixed[:, None], cam_pose, new_cam)
            new_pts = points_l + dp * pt_valid_l[:, None]

            old_cost = cost_of(cam_pose, points_l)
            new_cost = cost_of(new_cam, new_pts)
            accept = new_cost < old_cost
            cam_out = jnp.where(accept, new_cam, cam_pose)
            pts_out = jnp.where(accept, new_pts, points_l)
            lam_next = jnp.where(accept, lam_t * 0.5, lam_t * 4.0)
            return (cam_out, pts_out, lam_next), new_cost

        (cam_f, pts_f, _), costs = jax.lax.scan(
            step, (cam_pose, points_l, jnp.float32(lam)), None, length=iters
        )
        return cam_f, pts_f, costs

    sharded = shard_map_fn(
        body,
        mesh=mesh,
        in_specs=(
            P(), P(ax), P(ax), P(ax), P(ax), P(ax), P(ax), P(),
        ),
        out_specs=(P(), P(ax), P()),
        check_vma=False,
    )
    cam_f, pts_f, costs = jax.jit(sharded)(
        prob.cam_pose, prob.points, prob.obs_cam, prob.obs_pt,
        prob.obs_uv, prob.obs_valid, prob.pt_valid, prob.cam_fixed,
    )
    return prob.replace(cam_pose=cam_f, points=pts_f), costs


# ---------------------------------------------------------------------------
# 2-D sharded BA: keyframe (camera) axis over `dcn`, point blocks over `ici`
# (SURVEY.md §2b trajectory/keyframe sharding). Observations are bucketed by
# (camera shard, point shard): device (i, j) owns exactly the observations
# whose camera falls in dcn-range i AND whose point falls in ici-range j, so
# the O(obs) linearization work AND the Jacobian storage split across BOTH
# axes. Point C-blocks are ici-local (psum over dcn assembles each block's
# full sum); the reduced camera system stays replicated — it is [C*6] tiny
# (the MegBA pattern: shard the observation/landmark work, replicate the
# camera state).
# ---------------------------------------------------------------------------


def shard_problem_2d(prob: BAProblem, n_cam_shards: int, n_pt_shards: int):
    """Host-side re-layout for the 2-D sharded solver: points padded to a
    multiple of n_pt_shards and partitioned contiguously over `ici`;
    observations bucketed by (camera shard, point shard) with equal padded
    counts, laid out [Sc*Sp*O_l] so a leading-axis P(("dcn","ici")) spec
    lands bucket (i, j) on device (i, j)."""
    Sc, Sp = n_cam_shards, n_pt_shards
    Lm = prob.num_points
    C_ = prob.num_cams
    Lp = (Lm + Sp - 1) // Sp
    Lm_pad = Lp * Sp
    cam_chunk = (C_ + Sc - 1) // Sc

    points = np.asarray(prob.points)
    pt_valid = np.asarray(prob.pt_valid)
    points = np.pad(points, ((0, Lm_pad - Lm), (0, 0)))
    pt_valid = np.pad(pt_valid, (0, Lm_pad - Lm))

    obs_pt = np.asarray(prob.obs_pt)
    obs_cam = np.asarray(prob.obs_cam)
    obs_uv = np.asarray(prob.obs_uv)
    obs_valid = np.asarray(prob.obs_valid)

    cam_shard = obs_cam // cam_chunk
    pt_shard = obs_pt // Lp
    counts = np.zeros((Sc, Sp), np.int64)
    for i in range(Sc):
        for j in range(Sp):
            counts[i, j] = int(
                np.sum(obs_valid & (cam_shard == i) & (pt_shard == j))
            )
    O_l = int(max(counts.max(), 1))

    uv_dim = obs_uv.shape[1]
    new_cam = np.zeros((Sc, Sp, O_l), np.int32)
    new_pt = np.zeros((Sc, Sp, O_l), np.int32)
    new_uv = np.zeros((Sc, Sp, O_l, uv_dim), obs_uv.dtype)
    new_valid = np.zeros((Sc, Sp, O_l), bool)
    for i in range(Sc):
        for j in range(Sp):
            rows = np.where(obs_valid & (cam_shard == i) & (pt_shard == j))[0]
            n = len(rows)
            new_cam[i, j, :n] = obs_cam[rows]
            new_pt[i, j, :n] = obs_pt[rows]
            new_uv[i, j, :n] = obs_uv[rows]
            new_valid[i, j, :n] = True
            new_cam[i, j, n:] = min(i * cam_chunk, C_ - 1)
            new_pt[i, j, n:] = j * Lp
    return prob.replace(
        points=jnp.asarray(points),
        pt_valid=jnp.asarray(pt_valid),
        obs_cam=jnp.asarray(new_cam.reshape(-1)),
        obs_pt=jnp.asarray(new_pt.reshape(-1)),
        obs_uv=jnp.asarray(new_uv.reshape(Sc * Sp * O_l, uv_dim)),
        obs_valid=jnp.asarray(new_valid.reshape(-1)),
    )


def optimize_ba_distributed_2d(
    camera,
    prob: BAProblem,
    mesh,
    iters: int = 10,
    lam: float = 1e-4,
    pcg_iters: int = 50,
    huber_delta: float = 2.0,
):
    """2-D sharded LM-damped GN; `prob` must come from `shard_problem_2d`
    with (n_cam_shards, n_pt_shards) == mesh.shape over (dcn, ici).
    Per GN iteration the collectives are: one both-axes psum assembling
    B/v, one dcn-psum assembling the point C-blocks and gradients, one
    both-axes psum per PCG iteration for the E C⁻¹ Eᵀ x partials, and a
    dcn-psum for the point back-substitution."""
    from parakeet_slam_tpu.dist.mesh import MAP_AXIS, PARTICLE_AXIS

    Sc = mesh.shape[MAP_AXIS]
    Sp = mesh.shape[PARTICLE_AXIS]
    Lp = prob.num_points // Sp
    C_ = prob.num_cams
    both = (MAP_AXIS, PARTICLE_AXIS)

    def body(cam_pose, points_l, obs_cam_l, obs_pt_l, obs_uv_l, obs_valid_l,
             pt_valid_l, cam_fixed):
        mj = jax.lax.axis_index(PARTICLE_AXIS)
        pt_local = obs_pt_l - mj * Lp

        def linearize(cam_pose, points_l):
            cam = cam_pose[obs_cam_l]
            pt = points_l[pt_local]
            zero = jnp.zeros((9,))

            def one(c, p, uv):
                r = ba_mod._project_residual(camera, zero, c, p, uv)
                J = jax.jacfwd(ba_mod._project_residual, argnums=1)(
                    camera, zero, c, p, uv
                )
                return r, J

            r, J = jax.vmap(one)(cam, pt, obs_uv_l)
            Jc, Jp = J[..., :6], J[..., 6:]
            rnorm = jnp.linalg.norm(r, axis=-1)
            w_h = jnp.minimum(1.0, huber_delta / jnp.maximum(rnorm, 1e-9))
            return r, Jc, Jp, w_h * obs_valid_l.astype(r.dtype)

        def cost_of(cam_pose, points_l):
            cam = cam_pose[obs_cam_l]
            pt = points_l[pt_local]
            zero = jnp.zeros((9,))
            r = jax.vmap(
                lambda c, p, uv: ba_mod._project_residual(camera, zero, c, p, uv)
            )(cam, pt, obs_uv_l)
            n = jnp.linalg.norm(r, axis=-1)
            rho = jnp.where(
                n <= huber_delta,
                0.5 * n * n,
                huber_delta * (n - 0.5 * huber_delta),
            )
            return jax.lax.psum(jnp.sum(rho * obs_valid_l), both)

        def step(carry, _):
            cam_pose, points_l, lam_t = carry
            r, Jc, Jp, w = linearize(cam_pose, points_l)
            wJc = Jc * w[:, None, None]
            wJp = Jp * w[:, None, None]
            B = jax.lax.psum(
                jnp.zeros((C_, 6, 6)).at[obs_cam_l].add(
                    jnp.einsum("oki,okj->oij", Jc, wJc)
                ),
                both,
            )
            v = jax.lax.psum(
                jnp.zeros((C_, 6)).at[obs_cam_l].add(
                    jnp.einsum("oki,ok->oi", wJc, r)
                ),
                both,
            )
            Cb = jax.lax.psum(
                jnp.zeros((Lp, 3, 3)).at[pt_local].add(
                    jnp.einsum("oki,okj->oij", Jp, wJp)
                ),
                MAP_AXIS,
            )
            wg = jax.lax.psum(
                jnp.zeros((Lp, 3)).at[pt_local].add(
                    jnp.einsum("oki,ok->oi", wJp, r)
                ),
                MAP_AXIS,
            )
            eye6, eye3 = jnp.eye(6), jnp.eye(3)
            cam_damp = jnp.where(cam_fixed, 1e12, lam_t)
            B = B + cam_damp[:, None, None] * eye6
            pt_damp = jnp.where(pt_valid_l, lam_t, 1e12)
            Cb = Cb + pt_damp[:, None, None] * eye3 + 1e-6 * eye3

            def matvec(x):
                Bx = jnp.einsum("cij,cj->ci", B, x)
                t = jnp.einsum("okj,oj->ok", Jc, x[obs_cam_l]) * w[:, None]
                u = jax.lax.psum(
                    jnp.zeros((Lp, 3)).at[pt_local].add(
                        jnp.einsum("oki,ok->oi", Jp, t)
                    ),
                    MAP_AXIS,
                )
                y = schur.cinv_apply(Cb, u)
                s = jnp.einsum("oki,oi->ok", Jp, y[pt_local]) * w[:, None]
                return Bx - jax.lax.psum(
                    jnp.zeros((C_, 6)).at[obs_cam_l].add(
                        jnp.einsum("oki,ok->oi", Jc, s)
                    ),
                    both,
                )

            s = jnp.einsum(
                "oki,oi->ok", Jp, schur.cinv_apply(Cb, wg)[pt_local]
            ) * w[:, None]
            ECw = jax.lax.psum(
                jnp.zeros((C_, 6)).at[obs_cam_l].add(
                    jnp.einsum("oki,ok->oi", Jc, s)
                ),
                both,
            )
            rhs = -v + ECw

            Minv = jnp.linalg.inv(B)
            dc, _ = ba_mod._pcg(matvec, rhs, Minv, pcg_iters, 1e-6)

            t = jnp.einsum("okj,oj->ok", Jc, dc[obs_cam_l]) * w[:, None]
            Etdc = jax.lax.psum(
                jnp.zeros((Lp, 3)).at[pt_local].add(
                    jnp.einsum("oki,ok->oi", Jp, t)
                ),
                MAP_AXIS,
            )
            dp = -schur.cinv_apply(Cb, wg + Etdc)

            new_cam = jax.vmap(
                lambda po, d: geometry.se3_compose(po, geometry.se3_exp(d))
            )(cam_pose, dc)
            new_cam = jnp.where(cam_fixed[:, None], cam_pose, new_cam)
            new_pts = points_l + dp * pt_valid_l[:, None]

            old_cost = cost_of(cam_pose, points_l)
            new_cost = cost_of(new_cam, new_pts)
            accept = new_cost < old_cost
            cam_out = jnp.where(accept, new_cam, cam_pose)
            pts_out = jnp.where(accept, new_pts, points_l)
            lam_next = jnp.where(accept, lam_t * 0.5, lam_t * 4.0)
            return (cam_out, pts_out, lam_next), new_cost

        (cam_f, pts_f, _), costs = jax.lax.scan(
            step, (cam_pose, points_l, jnp.float32(lam)), None, length=iters
        )
        return cam_f, pts_f, costs

    ax2 = (MAP_AXIS, PARTICLE_AXIS)
    sharded = shard_map_fn(
        body,
        mesh=mesh,
        in_specs=(
            P(), P(PARTICLE_AXIS), P(ax2), P(ax2), P(ax2), P(ax2),
            P(PARTICLE_AXIS), P(),
        ),
        out_specs=(P(), P(PARTICLE_AXIS), P()),
        check_vma=False,
    )
    cam_f, pts_f, costs = jax.jit(sharded)(
        prob.cam_pose, prob.points, prob.obs_cam, prob.obs_pt,
        prob.obs_uv, prob.obs_valid, prob.pt_valid, prob.cam_fixed,
    )
    return prob.replace(cam_pose=cam_f, points=pts_f), costs
