"""Pose-graph optimization: Levenberg-damped Gauss-Newton on SE(3).

SURVEY.md §3 backend contract: minimize
    Σ_e ‖ log( Z_e⁻¹ · T_i⁻¹ · T_j ) ‖²_Λe
over keyframe poses by GN with left-multiplied tangent perturbations
(T ← T·exp(δ)), first valid node gauge-fixed.

TPU formulation: residual Jacobians per edge come from one `jax.jacfwd`
over the 12-dim (δi, δj) edge perturbation — batched over ALL edges with
vmap, so the linearization is a single fused XLA op; the normal system is
assembled densely ([K*6, K*6]) with scatter-adds and solved by Cholesky.
Dense is right-sized here: K ≤ a few hundred keyframes is the online
regime; the 50k-landmark scale lives in `backend/ba.py`'s Schur/PCG path
instead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from parakeet_slam_tpu.core import geometry
from parakeet_slam_tpu.backend.graph import PoseGraph


def edge_residual(pose_i, pose_j, rel):
    """r = log(rel⁻¹ · pose_i⁻¹ · pose_j) ∈ R⁶."""
    between = geometry.se3_between(pose_i, pose_j)
    err = geometry.se3_compose(geometry.se3_inverse(rel), between)
    return geometry.se3_log(err)


def _edge_residual_perturbed(delta, pose_i, pose_j, rel):
    """Residual with tangent perturbations applied: T·exp(δ)."""
    di, dj = delta[:6], delta[6:]
    pi = geometry.se3_compose(pose_i, geometry.se3_exp(di))
    pj = geometry.se3_compose(pose_j, geometry.se3_exp(dj))
    return edge_residual(pi, pj, rel)


def graph_cost(g: PoseGraph) -> jax.Array:
    pi = g.poses[g.edge_ij[:, 0]]
    pj = g.poses[g.edge_ij[:, 1]]
    r = jax.vmap(edge_residual)(pi, pj, g.edge_rel)
    w = g.edge_valid[:, None] * g.edge_info
    return 0.5 * jnp.sum(w * r * r)


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(
    g: PoseGraph, iters: int = 10, damping: float = 1e-6
) -> tuple[PoseGraph, jax.Array]:
    """Run damped GN; returns (graph with optimized poses, per-iter costs)."""
    K = g.max_nodes
    # Gauge: fix the first valid node.
    first = jnp.argmax(g.node_valid)
    free = g.node_valid & (jnp.arange(K) != first)

    def linearize(poses):
        pi = poses[g.edge_ij[:, 0]]
        pj = poses[g.edge_ij[:, 1]]
        zero = jnp.zeros((12,))
        r = jax.vmap(lambda a, b, z: _edge_residual_perturbed(zero, a, b, z))(
            pi, pj, g.edge_rel
        )
        J = jax.vmap(
            lambda a, b, z: jax.jacfwd(_edge_residual_perturbed)(zero, a, b, z)
        )(pi, pj, g.edge_rel)  # [E, 6, 12]
        return r, J[..., :6], J[..., 6:]

    def step(poses, _):
        r, Ji, Jj = linearize(poses)
        w = (g.edge_valid[:, None] * g.edge_info)  # [E, 6]
        wr = w * r
        # Assemble H [K, 6, K, 6] and b [K, 6] with scatter-adds.
        JiW = Ji * w[:, :, None]  # information-weighted
        JjW = Jj * w[:, :, None]
        Hii = jnp.einsum("eki,ekj->eij", Ji, JiW)
        Hjj = jnp.einsum("eki,ekj->eij", Jj, JjW)
        Hij = jnp.einsum("eki,ekj->eij", Ji, JjW)
        bi = jnp.einsum("eki,ek->ei", Ji, wr)
        bj = jnp.einsum("eki,ek->ei", Jj, wr)
        ii = g.edge_ij[:, 0]
        jj = g.edge_ij[:, 1]
        H = jnp.zeros((K, 6, K, 6))
        H = H.at[ii, :, ii, :].add(Hii)
        H = H.at[jj, :, jj, :].add(Hjj)
        H = H.at[ii, :, jj, :].add(Hij)
        H = H.at[jj, :, ii, :].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((K, 6)).at[ii].add(bi).at[jj].add(bj)

        # Gauge + invalid nodes: project out their DOFs.
        mask = free.astype(poses.dtype)
        Hm = H * mask[:, None, None, None] * mask[None, None, :, None]
        Hm = Hm.reshape(K * 6, K * 6)
        bm = (b * mask[:, None]).reshape(K * 6)
        # Unit diagonal on fixed DOFs keeps the system nonsingular.
        diag_fix = (1.0 - jnp.repeat(mask, 6)) + damping
        Hm = Hm + jnp.diag(diag_fix)
        delta = -jnp.linalg.solve(Hm, bm).reshape(K, 6)
        delta = delta * mask[:, None]
        new_poses = jax.vmap(
            lambda p, d: geometry.se3_compose(p, geometry.se3_exp(d))
        )(poses, delta)
        cost = 0.5 * jnp.sum(w * r * r)
        return new_poses, cost

    poses, costs = jax.lax.scan(step, g.poses, None, length=iters)
    return g.replace(poses=poses), costs
