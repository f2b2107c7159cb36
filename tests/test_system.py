"""Full-pipeline system tests: synthetic panoramic world through detect ->
describe -> filter -> keyframes -> loop closure (SURVEY.md §5 golden
integration for the vision path)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_slam_tpu.core.config import (
    BackendConfig, DataConfig, FilterConfig, FrontendConfig, SLAMConfig,
)
from parakeet_slam_tpu.data.panoramic import make_panoramic_world
from parakeet_slam_tpu.system import SLAMSystem


def _pano_cfg(**fe_kw):
    H, W = 128, 256
    return SLAMConfig(
        filter=FilterConfig(
            num_particles=32, max_landmarks=256, max_observations=24,
            lm_dim=3, obs_dim=2, pose_dim=7, sig_dim=0, desc_words=8,
            measurement_model="equirect_3d", motion_model="se3_odometry",
            motion_noise=(0.02, 0.01),
            meas_noise=(3.0, 3.0),
            init_range_prior=14.0, init_range_sigma=8.0,
            new_landmark_loglik=-14.0, max_range=45.0,
            desc_weight=0.05,
        ),
        frontend=FrontendConfig(
            detector="fast", max_features=64, fast_threshold=0.12,
            nms_radius=4, camera="equirect", image_size=(H, W), **fe_kw,
        ),
        backend=BackendConfig(
            max_keyframes=32, keyframe_translation=1.0, keyframe_rotation=0.4,
            gn_iters=8,
        ),
    )


@pytest.fixture(scope="module")
def pano_world():
    return make_panoramic_world(
        num_landmarks=120, num_steps=24, image_size=(128, 256), seed=11
    )


class TestPanoramicPipeline:
    def test_frontend_finds_blobs(self, pano_world):
        sys_ = SLAMSystem(_pano_cfg())
        img = jnp.asarray(pano_world.render(0))
        xy, desc, valid = sys_._frontend_jit(img)
        assert int(valid.sum()) >= 10  # plenty of blobs visible
        assert desc.shape[1] == 8

    def test_online_run_tracks_and_closes_loop(self, pano_world):
        sys_ = SLAMSystem(_pano_cfg())
        est = []
        for t in range(len(pano_world)):
            img = pano_world.render(t)
            est.append(sys_.process_frame(img, pano_world.odom[t]))
        est = np.stack(est)
        gt = pano_world.gt_pose
        # position error bounded (panoramic bearing-only init is coarse;
        # this asserts the pipeline is functional, not cm-accurate)
        err = np.linalg.norm(est[:, :3] - gt[:, :3], axis=1)
        assert np.isfinite(err).all()
        assert len(sys_.keyframes) >= 2
        # chaotic single-seed metric: bound is functional, not accuracy
        # (measured 2.5-3.1 across CPU microarchitectures; ATE-grade
        # accuracy is asserted by the seed-averaged corridor regression)
        drift = np.linalg.norm(est[-1, :3] - gt[-1, :3])
        assert drift < 3.5, drift

    def test_pyramid_frontend_runs(self, pano_world):
        """frontend.pyramid_levels > 1 routes detection through
        detect_pyramid (multi-scale); the full frame step must still run
        and produce valid features."""
        sys_ = SLAMSystem(_pano_cfg(pyramid_levels=2))
        img = jnp.asarray(pano_world.render(0))
        xy, desc, valid = sys_._frontend_jit(img)
        assert int(valid.sum()) >= 10
        est = sys_.process_frame(pano_world.render(0), pano_world.odom[0])
        assert np.isfinite(np.asarray(est)).all()

    def test_corrected_trajectory_reanchors_segments(self, pano_world):
        """corrected_trajectory maps online estimates onto the optimized
        keyframe graph: frames before the first keyframe are unchanged;
        with no optimization applied (pose == anchor) the map is identity;
        after perturbing a keyframe's pose its whole segment moves by the
        same left-correction."""
        from parakeet_slam_tpu.core import geometry

        sys_ = SLAMSystem(_pano_cfg())
        est = []
        for t in range(8):
            est.append(sys_.process_frame(pano_world.render(t), pano_world.odom[t]))
        est = np.stack(est)
        sys_.flush_flags()
        assert len(sys_.keyframes) >= 1
        out = sys_.corrected_trajectory(est, final_optimize=False)
        assert out.shape == est.shape and np.isfinite(out).all()
        # pose == anchor (no closure ran) -> identity re-anchoring
        np.testing.assert_allclose(out, est, atol=1e-5)
        # perturb the first keyframe's optimized pose by a translation
        kf = sys_.keyframes[0]
        kf.pose = kf.pose.copy()
        kf.pose[:3] += np.array([1.0, -2.0, 0.5], np.float32)
        out2 = sys_.corrected_trajectory(est, final_optimize=False)
        moved = np.arange(1, 9) >= kf.frame
        corr = np.asarray(
            geometry.se3_compose(
                jnp.asarray(kf.pose),
                geometry.se3_inverse(jnp.asarray(kf.anchor)),
            )
        )
        exp = np.asarray(
            jax.vmap(lambda e: geometry.se3_compose(jnp.asarray(corr), e))(
                jnp.asarray(est)
            )
        )
        kf2 = sys_.keyframes[1].frame if len(sys_.keyframes) > 1 else 9
        seg0 = moved & (np.arange(1, 9) < kf2)
        np.testing.assert_allclose(out2[seg0], exp[seg0], atol=1e-5)

    def test_metrics_logged(self, tmp_path, pano_world):
        cfg = dataclasses.replace(
            _pano_cfg(), metrics_path=str(tmp_path / "m.jsonl")
        )
        sys_ = SLAMSystem(cfg)
        for t in range(3):
            sys_.process_frame(pano_world.render(t), pano_world.odom[t])
        sys_.flush_metrics()
        sys_.metrics.flush()
        lines = (tmp_path / "m.jsonl").read_text().strip().splitlines()
        assert len(lines) == 3
        import json

        rec = json.loads(lines[0])
        assert {"frame", "ess", "landmarks", "keyframes"} <= set(rec)
