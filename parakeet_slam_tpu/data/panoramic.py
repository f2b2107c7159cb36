"""Synthetic panoramic 360° world (driver benchmark config 5) + synthetic
pinhole/stereo 3-D worlds.

Renders equirectangular (or pinhole/stereo) frames of a random landmark
field as Gaussian blob images, so the ENTIRE vision pipeline — detect →
describe → match → filter → backend — runs end-to-end with ground truth
available and zero external data (the container has no dataset downloads).
Each landmark gets a stable random texture patch so BRIEF descriptors are
repeatable across frames.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from parakeet_slam_tpu.core import geometry
import jax.numpy as jnp


@dataclass
class SyntheticWorld:
    landmarks: np.ndarray     # [N, 3]
    gt_pose: np.ndarray       # [T, 7] world-from-camera SE(3)
    odom: np.ndarray          # [T, 6] noisy twist increments
    image_size: tuple[int, int]  # (H, W)
    camera: str               # equirect | pinhole
    seed: int

    def __len__(self):
        return self.gt_pose.shape[0]

    def render(self, i: int) -> np.ndarray:
        """Render frame i as a grayscale [H, W] image."""
        return _render_frame(
            self.landmarks, self.gt_pose[i], self.image_size, self.camera,
            self.seed,
        )

    def render_stereo(self, i: int, baseline: float = 0.3):
        """(left, right) pair: right camera displaced by `baseline` along
        the camera x-axis (pinhole worlds only)."""
        assert self.camera == "pinhole"
        left = self.render(i)
        pose = jnp.asarray(self.gt_pose[i])
        offset = geometry.se3_apply(pose, jnp.array([baseline, 0.0, 0.0]))
        right_pose = np.asarray(pose).copy()
        right_pose[:3] = np.asarray(offset)
        right = _render_frame(
            self.landmarks, right_pose, self.image_size, self.camera, self.seed
        )
        return left, right


def _project_equirect(p_cam, H, W):
    r = np.linalg.norm(p_cam, axis=-1) + 1e-9
    az = np.arctan2(p_cam[:, 1], p_cam[:, 0])
    el = np.arcsin(np.clip(p_cam[:, 2] / r, -1, 1))
    u = (az + np.pi) / (2 * np.pi) * W
    v = (np.pi / 2 - el) / np.pi * H
    return u, v, r


def _render_frame(landmarks, pose, image_size, camera, seed):
    H, W = image_size
    img = np.zeros((H, W), np.float32)
    # transform to camera frame
    t, q = pose[:3], pose[3:]
    p_cam = np.asarray(
        geometry.quat_rotate(
            jnp.asarray(geometry.quat_conjugate(jnp.asarray(q)))[None],
            jnp.asarray(landmarks - t),
        )
    )
    rng_tex = np.random.default_rng(seed + 99)
    # stable per-landmark blob signature: size + two satellite offsets makes
    # local BRIEF patterns distinct per landmark
    sizes = rng_tex.uniform(1.5, 3.0, len(landmarks))
    sat = rng_tex.uniform(-6, 6, (len(landmarks), 2, 2))
    sat_amp = rng_tex.uniform(0.3, 0.9, (len(landmarks), 2))

    if camera == "equirect":
        u, v, r = _project_equirect(p_cam, H, W)
        vis = r < 40.0
    else:
        fx = fy = 0.6 * W
        cx, cy = W / 2, H / 2
        z = p_cam[:, 2]
        vis = z > 0.3
        zs = np.where(vis, z, 1.0)
        u = fx * p_cam[:, 0] / zs + cx
        v = fy * p_cam[:, 1] / zs + cy
        vis &= (u >= -8) & (u < W + 8) & (v >= -8) & (v < H + 8)

    ys, xs = np.mgrid[0:H, 0:W]
    for j in np.where(vis)[0]:
        for du, dv, amp in (
            (0.0, 0.0, 1.0),
            (sat[j, 0, 0], sat[j, 0, 1], sat_amp[j, 0]),
            (sat[j, 1, 0], sat[j, 1, 1], sat_amp[j, 1]),
        ):
            uu = u[j] + du
            vv = v[j] + dv
            if camera == "equirect":
                dx = np.abs(xs - uu)
                dx = np.minimum(dx, W - dx)  # azimuth wrap
            else:
                dx = xs - uu
            d2 = dx * dx + (ys - vv) ** 2
            img += amp * np.exp(-d2 / (2 * sizes[j] ** 2))
    return np.clip(img, 0.0, 1.0)


def make_panoramic_world(
    num_landmarks: int = 300,
    num_steps: int = 40,
    image_size: tuple[int, int] = (128, 256),
    camera: str = "equirect",
    radius: float = 8.0,
    odom_noise: tuple[float, float] = (0.01, 0.005),
    seed: int = 11,
) -> SyntheticWorld:
    """Camera walks a circle inside a shell of landmarks, looking outward
    (panoramic) — every frame sees all azimuths; loop closure is implicit."""
    rng = np.random.default_rng(seed)
    # landmark shell around the trajectory
    dirs = rng.normal(size=(num_landmarks, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs[:, 2] *= 0.4  # flatten vertically so most are near the horizon
    dist = rng.uniform(radius * 1.5, radius * 3.0, num_landmarks)
    landmarks = dirs * dist[:, None]

    th = np.linspace(0, 2 * np.pi, num_steps, endpoint=False)
    poses = []
    # Pinhole cameras project along +z (y down), so tilt the yaw-only body
    # pose into an optical frame whose z-axis points along the heading.
    # R_bc maps cam axes into body: x_cam→-y, y_cam→-z, z_cam→x.
    q_bc = jnp.array([-0.5, 0.5, -0.5, 0.5])
    for t in th:
        se2 = jnp.array(
            [0.3 * radius * np.cos(t), 0.3 * radius * np.sin(t), t + np.pi / 2]
        )
        pose = geometry.se2_to_se3(se2)
        if camera == "pinhole":
            q = geometry.quat_multiply(pose[3:], q_bc)
            pose = jnp.concatenate([pose[:3], q])
        poses.append(np.asarray(pose))
    gt = np.stack(poses).astype(np.float32)

    odom = np.zeros((num_steps, 6), np.float32)
    for i in range(1, num_steps):
        rel = np.asarray(
            geometry.se3_log(
                geometry.se3_between(jnp.asarray(gt[i - 1]), jnp.asarray(gt[i]))
            )
        )
        noise = np.concatenate(
            [rng.normal(0, odom_noise[0], 3), rng.normal(0, odom_noise[1], 3)]
        )
        odom[i] = rel + noise
    return SyntheticWorld(
        landmarks=landmarks.astype(np.float32), gt_pose=gt, odom=odom,
        image_size=image_size, camera=camera, seed=seed,
    )
