"""Fixed-capacity keyframe / factor-graph state containers.

Backend counterpart of `core/state.py`: keyframes, pose-graph edges, and BA
observations are dense masked arrays with static capacities so the whole
optimizer is one jitted program (SURVEY.md §2c `backend/posegraph`,
`backend/ba`). Keyframe insertion and edge insertion are masked writes at a
cursor — the same capacity discipline as the filter's landmark table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from parakeet_slam_tpu.core import geometry


@struct.dataclass
class PoseGraph:
    """SE(3) pose graph: nodes + relative-pose edges.

    poses      [K, 7]  keyframe poses (world-from-keyframe)
    node_valid [K]
    edge_ij    [E, 2]  int32 endpoints (i observes j: Z_ij ≈ T_i⁻¹ T_j)
    edge_rel   [E, 7]  measured relative pose Z_ij
    edge_info  [E, 6]  diagonal information (per-tangent-dim weights)
    edge_valid [E]
    n_nodes, n_edges   int32 cursors
    """

    poses: jax.Array
    node_valid: jax.Array
    edge_ij: jax.Array
    edge_rel: jax.Array
    edge_info: jax.Array
    edge_valid: jax.Array
    n_nodes: jax.Array
    n_edges: jax.Array

    @property
    def max_nodes(self) -> int:
        return self.poses.shape[0]

    @property
    def max_edges(self) -> int:
        return self.edge_ij.shape[0]


def make_pose_graph(max_nodes: int, max_edges: int) -> PoseGraph:
    identity = jnp.zeros((7,)).at[6].set(1.0)
    return PoseGraph(
        poses=jnp.tile(identity, (max_nodes, 1)),
        node_valid=jnp.zeros((max_nodes,), bool),
        edge_ij=jnp.zeros((max_edges, 2), jnp.int32),
        edge_rel=jnp.tile(identity, (max_edges, 1)),
        edge_info=jnp.ones((max_edges, 6)),
        edge_valid=jnp.zeros((max_edges,), bool),
        n_nodes=jnp.int32(0),
        n_edges=jnp.int32(0),
    )


def add_node(g: PoseGraph, pose: jax.Array) -> PoseGraph:
    """Masked append (no-op when full)."""
    k = g.n_nodes
    ok = k < g.max_nodes
    kc = jnp.clip(k, 0, g.max_nodes - 1)
    return g.replace(
        poses=g.poses.at[kc].set(jnp.where(ok, pose, g.poses[kc])),
        node_valid=g.node_valid.at[kc].set(ok | g.node_valid[kc]),
        n_nodes=k + ok.astype(jnp.int32),
    )


def add_edge(g: PoseGraph, i, j, rel: jax.Array, info=None, valid=True) -> PoseGraph:
    e = g.n_edges
    ok = (e < g.max_edges) & jnp.asarray(valid)
    ec = jnp.clip(e, 0, g.max_edges - 1)
    if info is None:
        info = jnp.ones((6,))
    return g.replace(
        edge_ij=g.edge_ij.at[ec].set(
            jnp.where(ok, jnp.stack([jnp.int32(i), jnp.int32(j)]), g.edge_ij[ec])
        ),
        edge_rel=g.edge_rel.at[ec].set(jnp.where(ok, rel, g.edge_rel[ec])),
        edge_info=g.edge_info.at[ec].set(jnp.where(ok, info, g.edge_info[ec])),
        edge_valid=g.edge_valid.at[ec].set(ok | g.edge_valid[ec]),
        n_edges=e + ok.astype(jnp.int32),
    )


@struct.dataclass
class BAProblem:
    """Bundle-adjustment problem: cameras, points, projections.

    cam_pose  [C, 7]  world-from-camera SE(3)
    cam_valid [C]
    points    [Lm, 3] world landmarks
    pt_valid  [Lm]
    obs_cam   [O]     int32 camera index per observation
    obs_pt    [O]     int32 point index
    obs_uv    [O, Dz] measured projection (2 for mono/equirect, 3 stereo)
    obs_valid [O]
    cam_fixed [C]     gauge-fixing mask (first camera typically)
    """

    cam_pose: jax.Array
    cam_valid: jax.Array
    points: jax.Array
    pt_valid: jax.Array
    obs_cam: jax.Array
    obs_pt: jax.Array
    obs_uv: jax.Array
    obs_valid: jax.Array
    cam_fixed: jax.Array

    @property
    def num_cams(self) -> int:
        return self.cam_pose.shape[0]

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    @property
    def num_obs(self) -> int:
        return self.obs_cam.shape[0]


def make_ba_problem(
    cam_pose, points, obs_cam, obs_pt, obs_uv,
    cam_valid=None, pt_valid=None, obs_valid=None, cam_fixed=None,
) -> BAProblem:
    cam_pose = jnp.asarray(cam_pose)
    points = jnp.asarray(points)
    C, Lm, O = cam_pose.shape[0], points.shape[0], obs_cam.shape[0]
    if cam_valid is None:
        cam_valid = jnp.ones((C,), bool)
    if pt_valid is None:
        pt_valid = jnp.ones((Lm,), bool)
    if obs_valid is None:
        obs_valid = jnp.ones((O,), bool)
    if cam_fixed is None:
        cam_fixed = jnp.zeros((C,), bool).at[0].set(True)
    return BAProblem(
        cam_pose=cam_pose, cam_valid=cam_valid,
        points=points, pt_valid=pt_valid,
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(obs_uv),
        obs_valid=obs_valid, cam_fixed=cam_fixed,
    )


def estimate_relative_pose_3d3d(pa: jax.Array, pb: jax.Array, valid: jax.Array):
    """SE(3) T such that pa ≈ T(pb), from masked 3-D correspondences
    (Horn/Umeyama closed form, weights = valid mask). Used to turn loop-
    closure landmark matches into pose-graph edge measurements."""
    w = valid.astype(pa.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu_a = jnp.sum(pa * w[:, None], axis=0) / n
    mu_b = jnp.sum(pb * w[:, None], axis=0) / n
    xa = (pa - mu_a) * w[:, None]
    xb = (pb - mu_b) * w[:, None]
    cov = xa.T @ xb / n
    U, _, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) @ jnp.linalg.det(Vt)) if False else jnp.sign(
        jnp.linalg.det(U) * jnp.linalg.det(Vt)
    )
    D = jnp.ones((3,)).at[2].set(d)
    R = (U * D[None, :]) @ Vt
    t = mu_a - R @ mu_b
    q = geometry.matrix_to_quat(R)
    return jnp.concatenate([t, q])
