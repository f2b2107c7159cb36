"""Stereo + pinhole system paths on synthetic worlds; windowed BA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_slam_tpu.backend import ba as ba_mod
from parakeet_slam_tpu.core.config import (
    BackendConfig, FilterConfig, FrontendConfig, SLAMConfig,
)
from parakeet_slam_tpu.data.panoramic import make_panoramic_world
from parakeet_slam_tpu.system import SLAMSystem


def _stereo_cfg(H=96, W=160, baseline=0.3):
    fx = 0.6 * W
    return SLAMConfig(
        filter=FilterConfig(
            num_particles=16, max_landmarks=128, max_observations=16,
            lm_dim=3, obs_dim=3, pose_dim=7, sig_dim=0, desc_words=8,
            measurement_model="stereo_3d", motion_model="se3_odometry",
            motion_noise=(0.02, 0.01),
            meas_noise=(2.0, 2.0, 1.5),
            new_landmark_loglik=-14.0, max_range=45.0,
        ),
        frontend=FrontendConfig(
            detector="fast", max_features=48, fast_threshold=0.12,
            camera="stereo", baseline=baseline,
            intrinsics=(fx, fx, W / 2, H / 2), image_size=(H, W),
        ),
        backend=BackendConfig(max_keyframes=16, keyframe_translation=1.0),
    )


class TestStereoPipeline:
    def test_stereo_frames_track(self):
        world = make_panoramic_world(
            num_landmarks=80, num_steps=10, image_size=(96, 160),
            camera="pinhole", radius=6.0, seed=13,
        )
        sys_ = SLAMSystem(_stereo_cfg())
        est = []
        for t in range(10):
            left, right = world.render_stereo(t, baseline=0.3)
            est.append(sys_.process_stereo_frame(left, right, world.odom[t]))
        est = np.stack(est)
        assert np.isfinite(est).all()
        # landmarks were created with observable depth
        n_lm = int(jnp.mean(sys_.state.num_landmarks()))
        assert n_lm >= 3
        # The filter's gauge is its identity start; compose with gt[0].
        from parakeet_slam_tpu.core import geometry

        est_world = np.asarray(
            geometry.se3_compose(jnp.asarray(world.gt_pose[0]), jnp.asarray(est[-1]))
        )
        drift = np.linalg.norm(est_world[:3] - world.gt_pose[-1, :3])
        assert drift < 2.0, drift


class TestWindowedBA:
    def test_window_freezes_old_cameras(self):
        from tests.test_backend import _make_ba_problem

        cam, prob, gt_poses, _ = _make_ba_problem(jax.random.PRNGKey(5))
        wp = ba_mod.window_problem(prob, window=3)
        C = prob.num_cams
        frozen = np.asarray(wp.cam_fixed)
        assert frozen[: C - 3].all()
        assert not frozen[C - 2 :].any()
        # optimization still converges on the free tail; the error floor is
        # the frozen cameras' init noise (0.1), which biases the points.
        cost0 = float(ba_mod.ba_cost(cam, wp, 50.0))
        res = ba_mod.optimize_ba(cam, wp, iters=6, pcg_iters=60, huber_delta=50.0)
        assert float(ba_mod.ba_cost(cam, res.problem, 50.0)) < 0.5 * cost0
        err = np.linalg.norm(
            np.asarray(res.problem.cam_pose[-2:, :3] - gt_poses[-2:, :3]), axis=1
        )
        assert err.max() < 0.15, err.max()
        # frozen cameras untouched
        np.testing.assert_array_equal(
            np.asarray(res.problem.cam_pose[0]), np.asarray(prob.cam_pose[0])
        )
