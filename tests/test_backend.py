"""Backend tests: pose-graph GN convergence, BA Schur/PCG convergence,
loop-closure relative-pose estimation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_slam_tpu.backend import ba as ba_mod
from parakeet_slam_tpu.backend import graph as graph_mod
from parakeet_slam_tpu.backend import posegraph as pg_mod
from parakeet_slam_tpu.core import geometry as g
from parakeet_slam_tpu.frontend.camera import Pinhole


def _noisy_pose(key, pose, t_sig=0.1, r_sig=0.05):
    kt, kr = jax.random.split(key)
    xi = jnp.concatenate(
        [t_sig * jax.random.normal(kt, (3,)), r_sig * jax.random.normal(kr, (3,))]
    )
    return g.se3_compose(pose, g.se3_exp(xi))


def _circle_poses(n, radius=5.0):
    """Ground-truth poses around a circle (SE(3), yaw-only)."""
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    poses = []
    for t in th:
        se2 = jnp.array([radius * np.cos(t), radius * np.sin(t), t + np.pi / 2])
        poses.append(g.se2_to_se3(se2))
    return jnp.stack(poses)


class TestPoseGraph:
    def test_odometry_chain_with_loop_closure(self):
        """Classic: drifted odometry chain + one loop closure edge -> GN
        pulls the loop shut."""
        n = 16
        gt = _circle_poses(n)
        graph = graph_mod.make_pose_graph(max_nodes=n, max_edges=2 * n)

        # nodes initialized from noisy odometry integration
        key = jax.random.PRNGKey(0)
        est = [gt[0]]
        for i in range(1, n):
            rel_true = g.se3_between(gt[i - 1], gt[i])
            key, k = jax.random.split(key)
            rel_noisy = g.se3_compose(
                rel_true,
                g.se3_exp(0.03 * jax.random.normal(k, (6,))),
            )
            est.append(g.se3_compose(est[-1], rel_noisy))
            graph = graph_mod.add_node(graph, est[-2]) if i == 1 else graph
        for i, p in enumerate(est):
            if i > 0:
                pass
        graph = graph_mod.make_pose_graph(max_nodes=n, max_edges=2 * n)
        for p in est:
            graph = graph_mod.add_node(graph, p)
        # odometry edges use the TRUE relative poses (measurements)
        for i in range(1, n):
            graph = graph_mod.add_edge(
                graph, i - 1, i, g.se3_between(gt[i - 1], gt[i])
            )
        # loop closure: last -> first
        graph = graph_mod.add_edge(graph, n - 1, 0, g.se3_between(gt[-1], gt[0]))

        cost0 = float(pg_mod.graph_cost(graph))
        opt, costs = pg_mod.optimize_pose_graph(graph, iters=10)
        cost1 = float(pg_mod.graph_cost(opt))
        assert cost1 < cost0 * 1e-2, (cost0, cost1)
        # absolute recovery up to the fixed-gauge first pose
        err = np.linalg.norm(
            np.asarray(opt.poses[:, :3]) - np.asarray(gt[:, :3]), axis=1
        )
        assert err.max() < 0.15, err.max()

    def test_identity_graph_zero_cost(self):
        graph = graph_mod.make_pose_graph(4, 4)
        p = jnp.zeros((7,)).at[6].set(1.0)
        for _ in range(3):
            graph = graph_mod.add_node(graph, p)
        graph = graph_mod.add_edge(graph, 0, 1, p)
        assert float(pg_mod.graph_cost(graph)) < 1e-10

    def test_capacity_overflow_safe(self):
        graph = graph_mod.make_pose_graph(2, 1)
        p = jnp.zeros((7,)).at[6].set(1.0)
        for _ in range(5):
            graph = graph_mod.add_node(graph, p)
        assert int(graph.n_nodes) == 2


def _look_at_pose(position, target, up=np.array([0.0, 0.0, 1.0])):
    """World-from-camera pose with camera +z (optical axis) toward target."""
    position = np.asarray(position, np.float64)
    fwd = np.asarray(target) - position
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_wc = np.stack([right, down, fwd], axis=1)  # columns = cam axes in world
    q = g.matrix_to_quat(jnp.asarray(R_wc)[None])[0]
    return jnp.concatenate([jnp.asarray(position, jnp.float32), q])


def _circle_lookat_poses(n, radius=4.0):
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return jnp.stack(
        [
            _look_at_pose(
                [radius * np.cos(t), radius * np.sin(t), 0.5], [0.0, 0.0, 0.0]
            )
            for t in th
        ]
    )


def _make_ba_problem(key, C=8, P=60, noise_px=0.5):
    cam = Pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
    gt_poses = _circle_lookat_poses(C, radius=4.0)
    kp = jax.random.PRNGKey(7)
    pts = jax.random.uniform(kp, (P, 3), minval=-1.5, maxval=1.5)

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(C):
        p_cam = jax.vmap(lambda x: g.se3_apply_inverse(gt_poses[c], x))(pts)
        uv = cam.project(p_cam)
        vis = np.asarray((p_cam[:, 2] > 0.5) & cam.in_image(uv))
        for p in np.where(vis)[0]:
            obs_cam.append(c)
            obs_pt.append(int(p))
            obs_uv.append(np.asarray(uv[p]))
    obs_uv = jnp.asarray(np.stack(obs_uv)) + noise_px * jax.random.normal(
        key, (len(obs_cam), 2)
    )
    # initial guess: noisy poses + noisy points. First TWO cameras fixed at
    # truth: monocular BA has a 7-dof gauge (incl. scale) — one fixed camera
    # pins only 6.
    keys = jax.random.split(jax.random.fold_in(key, 1), C)
    init_poses = jnp.stack(
        [
            gt_poses[0],
            gt_poses[1],
            *[_noisy_pose(keys[c], gt_poses[c], 0.1, 0.03) for c in range(2, C)],
        ]
    )
    init_pts = pts + 0.1 * jax.random.normal(jax.random.fold_in(key, 2), pts.shape)
    cam_fixed = jnp.zeros((C,), bool).at[0].set(True).at[1].set(True)
    prob = graph_mod.make_ba_problem(
        init_poses, init_pts, jnp.asarray(obs_cam), jnp.asarray(obs_pt), obs_uv,
        cam_fixed=cam_fixed,
    )
    return cam, prob, gt_poses, pts


class TestBA:
    @pytest.mark.parametrize("solver", ["pcg", "dense"])
    def test_ba_reduces_cost_and_recovers_geometry(self, solver):
        cam, prob, gt_poses, gt_pts = _make_ba_problem(jax.random.PRNGKey(3))
        cost0 = float(ba_mod.ba_cost(cam, prob, 2.0))
        res = ba_mod.optimize_ba(
            cam, prob, iters=8, pcg_iters=60, solver=solver, huber_delta=50.0
        )
        cost1 = float(ba_mod.ba_cost(cam, res.problem, 2.0))
        assert cost1 < cost0 * 0.05, (cost0, cost1)
        # camera positions recovered (gauge = first camera fixed)
        err = np.linalg.norm(
            np.asarray(res.problem.cam_pose[:, :3] - gt_poses[:, :3]), axis=1
        )
        assert err.max() < 0.05, err.max()

    def test_ba_huber_downweights_outliers(self):
        cam, prob, gt_poses, _ = _make_ba_problem(jax.random.PRNGKey(4))
        # corrupt 5% of observations badly
        O = prob.num_obs
        k = jax.random.PRNGKey(9)
        n_bad = max(1, O // 20)
        bad = jax.random.choice(k, O, (n_bad,), replace=False)
        uv_bad = prob.obs_uv.at[bad].add(150.0)
        prob_bad = prob.replace(obs_uv=uv_bad)
        res = ba_mod.optimize_ba(
            cam, prob_bad, iters=8, pcg_iters=60, huber_delta=3.0
        )
        err = np.linalg.norm(
            np.asarray(res.problem.cam_pose[:, :3] - gt_poses[:, :3]), axis=1
        )
        assert err.max() < 0.1, err.max()


class TestRelativePose:
    def test_horn_alignment(self):
        key = jax.random.PRNGKey(0)
        pb = jax.random.normal(key, (20, 3))
        T = g.se3_exp(jnp.array([0.5, -0.2, 0.1, 0.2, -0.1, 0.3]))
        pa = jax.vmap(lambda x: g.se3_apply(T, x))(pb)
        valid = jnp.ones((20,), bool)
        T_est = graph_mod.estimate_relative_pose_3d3d(pa, pb, valid)
        np.testing.assert_allclose(np.asarray(T_est[:3]), np.asarray(T[:3]), atol=1e-4)
        dot = abs(float(jnp.sum(T_est[3:] * T[3:])))
        assert dot > 1.0 - 1e-5

    def test_masked_outliers_ignored(self):
        key = jax.random.PRNGKey(1)
        pb = jax.random.normal(key, (20, 3))
        T = g.se3_exp(jnp.array([0.3, 0.1, -0.2, -0.1, 0.2, 0.1]))
        pa = jax.vmap(lambda x: g.se3_apply(T, x))(pb)
        pa = pa.at[0].set(100.0)  # wild outlier, masked out
        valid = jnp.ones((20,), bool).at[0].set(False)
        T_est = graph_mod.estimate_relative_pose_3d3d(pa, pb, valid)
        np.testing.assert_allclose(np.asarray(T_est[:3]), np.asarray(T[:3]), atol=1e-4)


class TestGraphConstrainedBA:
    def test_pose_edges_fused_and_anchor_geometry(self):
        """Graph-constrained BA (backend/ba.py pose_edges): relative-pose
        edges between consecutive cameras enter the reduced system; with
        gt-consistent edges the solver must still converge to the gt ring
        AND descend the fused cost."""
        cam, prob, gt_poses, _ = _make_ba_problem(jax.random.PRNGKey(5))
        C = prob.num_cams
        ij = jnp.asarray(
            np.stack([np.arange(C - 1), np.arange(1, C)], 1), jnp.int32
        )
        rel = jax.vmap(
            lambda a, b: g.se3_between(a, b)
        )(gt_poses[:-1], gt_poses[1:])
        info = jnp.full((C - 1, 6), 100.0)
        valid = jnp.ones((C - 1,), bool)
        res = ba_mod.optimize_ba(
            cam, prob, iters=10, pcg_iters=60, solver="pcg",
            pose_edges=(ij, rel, info, valid),
        )
        c = np.asarray(res.costs)
        assert c[-1] < c[0]
        err = np.linalg.norm(
            np.asarray(res.problem.cam_pose[:, :3] - gt_poses[:, :3]), axis=1
        )
        assert err.max() < 0.05, err.max()

    def test_pose_edges_pin_gauge_against_bad_observations(self):
        """With CORRUPTED reprojection targets for one camera, strong pose
        edges must keep that camera near its odometry-consistent pose
        (pure-reprojection BA would follow the corrupted measurements)."""
        cam, prob, gt_poses, _ = _make_ba_problem(jax.random.PRNGKey(6))
        C = prob.num_cams
        # corrupt all observations of camera 3 by a constant 40 px shift
        oc = np.asarray(prob.obs_cam)
        uv = np.array(prob.obs_uv)
        uv[oc == 3] += 40.0
        prob_bad = prob.replace(obs_uv=jnp.asarray(uv))
        ij = jnp.asarray(
            np.stack([np.arange(C - 1), np.arange(1, C)], 1), jnp.int32
        )
        rel = jax.vmap(
            lambda a, b: g.se3_between(a, b)
        )(gt_poses[:-1], gt_poses[1:])
        info = jnp.full((C - 1, 6), 1e4)
        valid = jnp.ones((C - 1,), bool)
        res = ba_mod.optimize_ba(
            cam, prob_bad, iters=10, pcg_iters=60, solver="pcg",
            pose_edges=(ij, rel, info, valid),
        )
        err3 = float(
            np.linalg.norm(
                np.asarray(res.problem.cam_pose[3, :3] - gt_poses[3, :3])
            )
        )
        assert err3 < 0.1, err3
