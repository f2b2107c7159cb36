"""Visual SLAM system: frontend -> particle filter -> keyframe backend.

The user-facing integration layer (reference analog: the ROS node wrapper,
SURVEY.md §1 L4 / §4.1 — but here the per-frame path is one jitted device
program and the backend is a real pose-graph/BA optimizer instead of rviz
markers).

Per frame (`process_frame`):
  1. detect + describe on the grayscale image (frontend, jitted),
  2. assemble a fixed-capacity Observation (pixel measurement + packed
     BRIEF descriptor per keypoint),
  3. FastSLAM step (motion propagate + fused measurement update),
  4. keyframe decision by motion threshold; on keyframe: snapshot the best
     particle's landmark cloud (positions in keyframe frame + descriptors),
     add an odometry edge, and attempt loop closure by Hamming-matching
     descriptor sets against stored keyframes (the tiled matcher kernel);
     accepted closures become pose-graph edges via Horn 3D-3D alignment,
  5. on loop closure: optimize the pose graph and apply the resulting
     correction of the latest keyframe to every particle (left-multiply).

Host-side control flow handles only the keyframe bookkeeping (rare,
data-dependent); all dense math runs on device.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from parakeet_slam_tpu.backend import ba as ba_mod
from parakeet_slam_tpu.backend import graph as graph_mod
from parakeet_slam_tpu.backend import posegraph as pg_mod
from parakeet_slam_tpu.core import geometry
from parakeet_slam_tpu.core.config import SLAMConfig
from parakeet_slam_tpu.core.state import make_observation
from parakeet_slam_tpu.filter import make_filter
from parakeet_slam_tpu.frontend import camera as camera_mod
from parakeet_slam_tpu.frontend.describe import describe
from parakeet_slam_tpu.frontend.detect import detect
from parakeet_slam_tpu.kernels import match as match_mod
from parakeet_slam_tpu.utils.metrics_log import MetricsLogger


@dataclass
class Keyframe:
    index: int
    pose: np.ndarray          # [7] filter estimate at creation (world-from-kf)
    points_kf: np.ndarray     # [F, 3] landmark positions in keyframe frame
    desc: np.ndarray          # [F, W] packed descriptors
    valid: np.ndarray         # [F]


@dataclass
class SLAMSystem:
    cfg: SLAMConfig

    def __post_init__(self):
        fe = self.cfg.frontend
        self.slam = make_filter(self.cfg.filter, fe)
        self.camera = camera_mod.from_config(fe)
        self.wrap_x = fe.camera == "equirect"
        self.keyframes: list[Keyframe] = []
        self.graph = graph_mod.make_pose_graph(
            self.cfg.backend.max_keyframes, 4 * self.cfg.backend.max_keyframes
        )
        self.state = self.slam.init_state()
        self.key = jax.random.PRNGKey(self.cfg.filter.seed)
        self.frame_idx = 0
        self.last_kf_pose = None
        self.metrics = MetricsLogger(self.cfg.metrics_path or None)
        self.loop_closures: list[tuple[int, int]] = []
        self._frontend_jit = jax.jit(self._frontend, static_argnums=())

    # -- frontend ---------------------------------------------------------

    def _frontend(self, img):
        fe = self.cfg.frontend
        xy, score, valid = detect(
            img,
            max_features=fe.max_features,
            detector=fe.detector,
            threshold=fe.fast_threshold,
            nms_radius=fe.nms_radius,
            wrap_x=self.wrap_x,
        )
        desc = describe(img, xy, valid, wrap_x=self.wrap_x)
        return xy, desc, valid

    def _to_observation(self, z, desc, valid):
        """Keypoint measurements -> fixed-capacity filter Observation."""
        Z = self.cfg.filter.max_observations
        z = z[:Z]
        desc = desc[:Z]
        valid = valid[:Z]
        pad = Z - z.shape[0]
        if pad > 0:
            z = jnp.pad(z, ((0, pad), (0, 0)))
            desc = jnp.pad(desc, ((0, pad), (0, 0)))
            valid = jnp.pad(valid, (0, pad))
        return make_observation(z, desc=desc, valid=valid)

    # -- keyframe / loop closure -----------------------------------------

    def _motion_since_kf(self, pose) -> tuple[float, float]:
        if self.last_kf_pose is None:
            return np.inf, np.inf
        rel = geometry.se3_between(jnp.asarray(self.last_kf_pose), jnp.asarray(pose))
        xi = geometry.se3_log(rel)
        return float(jnp.linalg.norm(xi[:3])), float(jnp.linalg.norm(xi[3:]))

    def _make_keyframe(self, est_pose):
        """Snapshot the best particle's map into the keyframe store."""
        means, valid = self.slam.best_particle_map(self.state)
        best = int(jnp.argmax(self.state.log_w))
        desc = self.state.lm_desc[best]
        F = min(self.cfg.frontend.max_features, means.shape[0])
        pts_kf = jax.vmap(
            lambda m: geometry.se3_apply_inverse(jnp.asarray(est_pose), m)
        )(means[:F])
        kf = Keyframe(
            index=len(self.keyframes),
            pose=np.asarray(est_pose),
            points_kf=np.asarray(pts_kf),
            desc=np.asarray(desc[:F]),
            valid=np.asarray(valid[:F]),
        )
        self.keyframes.append(kf)
        self.graph = graph_mod.add_node(self.graph, jnp.asarray(est_pose))
        if kf.index > 0:
            prev = self.keyframes[kf.index - 1]
            rel = geometry.se3_between(
                jnp.asarray(prev.pose), jnp.asarray(est_pose)
            )
            self.graph = graph_mod.add_edge(self.graph, kf.index - 1, kf.index, rel)
        return kf

    def _try_loop_closure(self, kf: Keyframe, min_matches: int = 12):
        """Match this keyframe's descriptors against older keyframes
        (skipping recent neighbors); add a graph edge on success.

        Correspondences are mutually cross-checked (forward+reverse NN must
        agree — the one-directional ratio test alone lets many query rows
        collapse onto one train row and feeds Horn garbage), then the Horn
        fit is iterated on inliers and the closure rejected unless a tight
        consensus remains."""
        use_pallas = jax.devices()[0].platform == "tpu"
        best_pair = None
        for old in self.keyframes[: max(0, kf.index - 3)]:
            idx, dist = match_mod.match(
                jnp.asarray(kf.desc), jnp.asarray(kf.valid),
                jnp.asarray(old.desc), jnp.asarray(old.valid),
                ratio=self.cfg.frontend.match_ratio,
                use_pallas=use_pallas, interpret=False,
            )
            ridx, _ = match_mod.match(
                jnp.asarray(old.desc), jnp.asarray(old.valid),
                jnp.asarray(kf.desc), jnp.asarray(kf.valid),
                ratio=self.cfg.frontend.match_ratio,
                use_pallas=use_pallas, interpret=False,
            )
            idx, ridx = np.asarray(idx), np.asarray(ridx)
            rows = np.arange(len(idx))
            mutual = (idx >= 0) & (ridx[np.clip(idx, 0, len(ridx) - 1)] == rows)
            n = int(mutual.sum())
            if n >= min_matches and (best_pair is None or n > best_pair[0]):
                best_pair = (n, old, idx, mutual)
        if best_pair is None:
            return False
        n, old, idx, mutual = best_pair
        rows = np.where(mutual)[0]
        pa = jnp.asarray(kf.points_kf[rows])          # in kf frame
        pb = jnp.asarray(old.points_kf[idx[rows]])    # in old-kf frame
        valid = np.ones((len(rows),), bool)
        # T such that p_old ≈ T(p_kf)  => Z_{old,kf} = T_old⁻¹ T_kf measured
        rel = None
        for _ in range(3):  # Horn + inlier re-fit (RANSAC-lite consensus)
            if int(valid.sum()) < max(min_matches, 4):
                return False
            rel = graph_mod.estimate_relative_pose_3d3d(
                pb, pa, jnp.asarray(valid)
            )
            fit = jax.vmap(lambda p: geometry.se3_apply(rel, p))(pa)
            res = np.linalg.norm(np.asarray(fit) - np.asarray(pb), axis=1)
            valid = res < self.cfg.backend.loop_inlier_radius
        n_in = int(valid.sum())
        if n_in < max(min_matches, 4):
            return False
        self.graph = graph_mod.add_edge(
            self.graph, old.index, kf.index, rel,
            info=jnp.full((6,), float(n_in)),
        )
        self.loop_closures.append((old.index, kf.index))
        return True

    def _optimize_and_correct(self):
        self.graph, _ = pg_mod.optimize_pose_graph(
            self.graph, iters=self.cfg.backend.gn_iters
        )
        k = len(self.keyframes) - 1
        opt_pose = self.graph.poses[k]
        est_pose = jnp.asarray(self.keyframes[k].pose)
        # left-correction mapping the filter estimate onto the optimized pose
        corr = geometry.se3_compose(opt_pose, geometry.se3_inverse(est_pose))
        self.state = self.state.replace(
            pose=jax.vmap(lambda p: geometry.se3_compose(corr, p))(self.state.pose),
            lm_mean=jax.vmap(
                jax.vmap(lambda m: geometry.se3_apply(corr, m), in_axes=0)
            )(self.state.lm_mean),
        )
        for i, kf in enumerate(self.keyframes):
            kf.pose = np.asarray(self.graph.poses[i])

    # -- main entry -------------------------------------------------------

    def process_frame(self, img, odom_u) -> np.ndarray:
        """One camera frame + odometry increment. Returns pose estimate [7]."""
        self.key, k_step = jax.random.split(self.key)
        xy, desc, valid = self._frontend_jit(jnp.asarray(img))
        obs = self._to_observation(xy, desc, valid)
        return self._step_with_obs(obs, odom_u, k_step)

    def process_obs(self, obs, odom_u) -> np.ndarray:
        """Bypass the image frontend with a ready Observation (simulation,
        or an external detector)."""
        self.key, k_step = jax.random.split(self.key)
        return self._step_with_obs(obs, odom_u, k_step)

    def process_stereo_frame(self, img_left, img_right, odom_u) -> np.ndarray:
        """Stereo pair (KITTI config 3): detect/describe on the left image,
        SAD disparity against the right, feed [u, v, d] observations to the
        stereo_3d measurement model."""
        from parakeet_slam_tpu.frontend.stereo import keypoint_disparity

        if self.cfg.filter.obs_dim != 3:
            raise ValueError("stereo frames need obs_dim=3 (stereo_3d model)")
        self.key, k_step = jax.random.split(self.key)
        img_left = jnp.asarray(img_left)
        xy, desc, valid = self._frontend_jit(img_left)
        Z = self.cfg.filter.max_observations
        xy, desc, valid = xy[:Z], desc[:Z], valid[:Z]
        disp, dvalid = keypoint_disparity(
            img_left, jnp.asarray(img_right), xy, valid
        )
        uvd = jnp.concatenate([xy, disp[:, None]], axis=1)
        obs = self._to_observation(uvd, desc, valid & dvalid)
        return self._step_with_obs(obs, odom_u, k_step)

    def _step_with_obs(self, obs, odom_u, k_step):
        self.state, metrics = self.slam.step(
            self.state, jnp.asarray(odom_u), obs, k_step
        )
        est = self.slam.estimate_pose(self.state)
        self.frame_idx += 1
        trans, rot = self._motion_since_kf(est)
        be = self.cfg.backend
        if trans > be.keyframe_translation or rot > be.keyframe_rotation:
            kf = self._make_keyframe(est)
            self.last_kf_pose = np.asarray(est)
            if self._try_loop_closure(kf):
                self._optimize_and_correct()
                est = self.slam.estimate_pose(self.state)
            ce = self.cfg.checkpoint_every
            if ce > 0 and self.cfg.checkpoint_dir and len(self.keyframes) % ce == 0:
                self.save_checkpoint(
                    f"{self.cfg.checkpoint_dir}/ckpt_{self.frame_idx:08d}"
                )
        self.metrics.log(
            self.frame_idx,
            ess=float(metrics.ess),
            landmarks=float(metrics.num_landmarks),
            match_frac=float(metrics.match_frac),
            resampled=bool(metrics.resampled),
            keyframes=len(self.keyframes),
        )
        return np.asarray(est)

    # -- checkpoint / resume (SURVEY.md §6) --------------------------------

    def save_checkpoint(self, path_prefix: str):
        """Snapshot filter state + pose graph (+ host-side keyframe store,
        RNG key, cursors) so a killed run resumes bit-identically."""
        from parakeet_slam_tpu.utils import checkpoint as ckpt

        ckpt.save_checkpoint(
            path_prefix + ".state.npz",
            {"state": self.state, "graph": self.graph, "key": self.key},
            step=self.frame_idx,
        )
        kfs = self.keyframes
        np.savez(
            path_prefix + ".kf.npz",
            n=np.int32(len(kfs)),
            frame_idx=np.int32(self.frame_idx),
            last_kf_pose=(
                self.last_kf_pose
                if self.last_kf_pose is not None
                else np.full((7,), np.nan, np.float32)
            ),
            loop_closures=np.asarray(self.loop_closures, np.int32).reshape(-1, 2),
            pose=np.stack([k.pose for k in kfs]) if kfs else np.zeros((0, 7), np.float32),
            points=np.stack([k.points_kf for k in kfs]) if kfs else np.zeros((0, 0, 3), np.float32),
            desc=np.stack([k.desc for k in kfs]) if kfs else np.zeros((0, 0, 1), np.uint32),
            valid=np.stack([k.valid for k in kfs]) if kfs else np.zeros((0, 0), bool),
        )

    def load_checkpoint(self, path_prefix: str):
        """Restore a `save_checkpoint` snapshot into this system."""
        from parakeet_slam_tpu.utils import checkpoint as ckpt

        tree, step = ckpt.load_checkpoint(
            path_prefix + ".state.npz",
            {"state": self.state, "graph": self.graph, "key": self.key},
        )
        self.state, self.graph, self.key = tree["state"], tree["graph"], tree["key"]
        data = np.load(path_prefix + ".kf.npz")
        self.frame_idx = int(data["frame_idx"])
        lkp = data["last_kf_pose"]
        self.last_kf_pose = None if np.isnan(lkp).any() else lkp
        self.loop_closures = [tuple(r) for r in data["loop_closures"]]
        self.keyframes = [
            Keyframe(
                index=i, pose=data["pose"][i], points_kf=data["points"][i],
                desc=data["desc"][i], valid=data["valid"][i],
            )
            for i in range(int(data["n"]))
        ]

    # -- offline refinement ----------------------------------------------

    def build_ba_problem(self) -> graph_mod.BAProblem | None:
        """Assemble a BA problem from the keyframe stores: cameras =
        keyframe poses; points = union of keyframe landmark snapshots
        deduplicated by descriptor matching; observations = projections."""
        if len(self.keyframes) < 2:
            return None
        cam_pose = jnp.asarray(np.stack([kf.pose for kf in self.keyframes]))
        pts, obs_cam, obs_pt, obs_uv = [], [], [], []
        pt_desc = []
        for kf in self.keyframes:
            rows = np.where(kf.valid)[0]
            world = np.asarray(
                jax.vmap(lambda p: geometry.se3_apply(jnp.asarray(kf.pose), p))(
                    jnp.asarray(kf.points_kf[rows])
                )
            )
            for r, w in zip(rows, world):
                # dedup: match descriptor against existing points
                pid = None
                if pt_desc:
                    d = np.asarray(pt_desc, np.uint32)
                    ham = np.unpackbits(
                        (d ^ kf.desc[r][None]).view(np.uint8), axis=1
                    ).sum(1)
                    j = int(ham.argmin())
                    if ham[j] < 40:
                        pid = j
                if pid is None:
                    pid = len(pts)
                    pts.append(w)
                    pt_desc.append(kf.desc[r])
                p_cam = geometry.se3_apply_inverse(
                    jnp.asarray(kf.pose), jnp.asarray(pts[pid])
                )
                uv = self.camera.project(p_cam)
                obs_cam.append(kf.index)
                obs_pt.append(pid)
                obs_uv.append(np.asarray(uv))
        cam_fixed = jnp.zeros((len(self.keyframes),), bool).at[0].set(True)
        if len(self.keyframes) > 1:
            cam_fixed = cam_fixed.at[1].set(True)  # pin monocular scale gauge
        return graph_mod.make_ba_problem(
            cam_pose, jnp.asarray(np.stack(pts)),
            jnp.asarray(obs_cam), jnp.asarray(obs_pt),
            jnp.asarray(np.stack(obs_uv)), cam_fixed=cam_fixed,
        )

    def run_ba(self, iters: int | None = None):
        prob = self.build_ba_problem()
        if prob is None:
            return None
        be = self.cfg.backend
        res = ba_mod.optimize_ba(
            self.camera, prob,
            iters=iters or be.gn_iters,
            pcg_iters=be.pcg_iters,
            huber_delta=be.huber_delta,
            solver=be.solver if be.solver in ("pcg", "dense") else "pcg",
        )
        for i, kf in enumerate(self.keyframes):
            kf.pose = np.asarray(res.problem.cam_pose[i])
        return res
