"""System-level checkpoint/resume: a resumed run continues bit-identically
with an uninterrupted one (SURVEY.md §6 restart-based recovery, §5
determinism)."""

import numpy as np

from parakeet_slam_tpu.core.config import (
    BackendConfig, FilterConfig, FrontendConfig, SLAMConfig,
)
from parakeet_slam_tpu.data.panoramic import make_panoramic_world
from parakeet_slam_tpu.system import SLAMSystem


def _cfg(H=64, W=128, **kw):
    return SLAMConfig(
        filter=FilterConfig(
            num_particles=8, max_landmarks=64, max_observations=8,
            lm_dim=3, obs_dim=2, pose_dim=7, sig_dim=0, desc_words=8,
            measurement_model="equirect_3d", motion_model="se3_odometry",
            motion_noise=(0.02, 0.01), meas_noise=(2.0, 2.0),
            new_landmark_loglik=-12.0, max_range=60.0,
        ),
        frontend=FrontendConfig(
            detector="fast", max_features=16, fast_threshold=0.12,
            camera="equirect", image_size=(H, W),
        ),
        backend=BackendConfig(max_keyframes=16, keyframe_translation=0.6),
        **kw,
    )


def test_resume_bit_identical(tmp_path):
    world = make_panoramic_world(
        num_landmarks=60, num_steps=10, image_size=(64, 128), seed=3
    )

    # Uninterrupted run.
    a = SLAMSystem(_cfg())
    est_a = [a.process_frame(world.render(t), world.odom[t]) for t in range(10)]

    # Run 6 frames, checkpoint, resume in a FRESH system, run the rest.
    b1 = SLAMSystem(_cfg())
    for t in range(6):
        b1.process_frame(world.render(t), world.odom[t])
    prefix = str(tmp_path / "snap")
    b1.save_checkpoint(prefix)

    b2 = SLAMSystem(_cfg())
    b2.load_checkpoint(prefix)
    est_b = [b2.process_frame(world.render(t), world.odom[t]) for t in range(6, 10)]

    np.testing.assert_array_equal(np.stack(est_a[6:]), np.stack(est_b))
    assert b2.frame_idx == a.frame_idx
    assert len(b2.keyframes) == len(a.keyframes)


def test_resume_any_frame_same_keyframes(tmp_path):
    """Keyframe cadence must be independent of checkpoint timing: resuming
    from a snapshot taken at ANY frame index yields the same keyframe set
    and bit-identical estimates as the uninterrupted run (the keyframe flag
    is latched device-side and the un-flushed flag window is persisted —
    round-3 regression where mid-window flushes changed the cadence)."""
    T = 10
    world = make_panoramic_world(
        num_landmarks=60, num_steps=T, image_size=(64, 128), seed=3
    )
    a = SLAMSystem(_cfg())
    est_a = [a.process_frame(world.render(t), world.odom[t]) for t in range(T)]
    a.flush_flags()
    kf_a = [(k.index, tuple(np.round(k.pose, 6))) for k in a.keyframes]

    for cut in range(1, T):
        b1 = SLAMSystem(_cfg())
        for t in range(cut):
            b1.process_frame(world.render(t), world.odom[t])
        prefix = str(tmp_path / f"snap{cut}")
        b1.save_checkpoint(prefix)
        b2 = SLAMSystem(_cfg())
        b2.load_checkpoint(prefix)
        est_b = [
            b2.process_frame(world.render(t), world.odom[t])
            for t in range(cut, T)
        ]
        b2.flush_flags()
        np.testing.assert_array_equal(
            np.stack(est_a[cut:]), np.stack(est_b), err_msg=f"cut={cut}"
        )
        kf_b = [(k.index, tuple(np.round(k.pose, 6))) for k in b2.keyframes]
        assert kf_b == kf_a, f"cut={cut}: keyframe sets differ"


def test_auto_checkpoint_written(tmp_path):
    cfg = _cfg(checkpoint_every=1, checkpoint_dir=str(tmp_path))
    world = make_panoramic_world(
        num_landmarks=60, num_steps=6, image_size=(64, 128), seed=3
    )
    s = SLAMSystem(cfg)
    for t in range(6):
        s.process_frame(world.render(t), world.odom[t])
    snaps = list(tmp_path.glob("ckpt_*.state.npz"))
    assert snaps, "auto-checkpointing wrote nothing"
