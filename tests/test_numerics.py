"""Numerical-hygiene tests: the filter step under jax_debug_nans (the
sanitizer analog, SURVEY.md §6 "race detection/sanitizers"), covariance
positive-definiteness over long runs, and scaling-harness smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_slam_tpu.core.config import FilterConfig
from parakeet_slam_tpu.core.state import make_observation
from parakeet_slam_tpu.data import make_corridor
from parakeet_slam_tpu.filter import FastSLAM


def test_filter_step_no_nans_under_debug_flag():
    """jax_debug_nans raises on ANY NaN produced inside jit — run a few
    frames with it enabled."""
    sim = make_corridor(num_landmarks=20, num_steps=10, max_obs=6, seed=2)
    cfg = FilterConfig(
        num_particles=16, max_landmarks=32, max_observations=6, sig_dim=3,
        motion_noise=(0.3, 0.1, 0.3, 0.1), meas_noise=(0.1, 0.03),
        max_range=6.5, fov_half_angle=2.5,
    )
    slam = FastSLAM(cfg)
    state = slam.init_state(init_pose=jnp.asarray(sim.gt_pose[0]))
    key = jax.random.PRNGKey(0)
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        for t in range(10):
            key, k = jax.random.split(key)
            obs = make_observation(
                jnp.asarray(sim.obs_z[t]), sig=jnp.asarray(sim.obs_sig[t]),
                valid=jnp.asarray(sim.obs_valid[t]),
            )
            state, _ = slam.step(state, jnp.asarray(sim.odom[t]), obs, k)
    finally:
        jax.config.update("jax_debug_nans", old)
    assert np.isfinite(np.asarray(state.pose)).all()


def test_covariances_stay_pd():
    """Landmark covariances must remain (semi-)positive-definite through
    repeated EKF updates."""
    sim = make_corridor(num_landmarks=30, num_steps=60, max_obs=8, seed=4)
    cfg = FilterConfig(
        num_particles=16, max_landmarks=64, max_observations=8, sig_dim=3,
        motion_noise=(0.3, 0.1, 0.3, 0.1), meas_noise=(0.1, 0.03),
        max_range=6.5, fov_half_angle=2.5,
    )
    slam = FastSLAM(cfg)
    state = slam.init_state(init_pose=jnp.asarray(sim.gt_pose[0]))
    key = jax.random.PRNGKey(1)
    for t in range(60):
        key, k = jax.random.split(key)
        obs = make_observation(
            jnp.asarray(sim.obs_z[t]), sig=jnp.asarray(sim.obs_sig[t]),
            valid=jnp.asarray(sim.obs_valid[t]),
        )
        state, _ = slam.step(state, jnp.asarray(sim.odom[t]), obs, k)
    cov = np.asarray(state.lm_cov)
    valid = np.asarray(state.lm_valid)
    eigs = np.linalg.eigvalsh(cov[valid])
    assert eigs.min() > -1e-6, eigs.min()
    # and they should have contracted well below the init covariance
    assert np.median(eigs) < 0.05


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multiple devices")
def test_scaling_harness_smoke():
    from parakeet_slam_tpu.eval.scaling import _filter_throughput

    fps = _filter_throughput(2, particles_per_device=16, max_landmarks=64, steps=3)
    assert fps > 0


def test_profiling_timed():
    from parakeet_slam_tpu.eval.profiling import timed

    f = jax.jit(lambda x: x * 2.0)
    dt, out = timed(f, jnp.ones((8,)), reps=3, warmup=1)
    assert dt > 0 and float(out[0]) == 2.0
