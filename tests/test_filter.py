"""FastSLAM engine tests: unit behaviors + the corridor golden regression
(SURVEY.md §5 'golden/integration' anchor)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_slam_tpu.core.config import FilterConfig
from parakeet_slam_tpu.core.state import make_observation
from parakeet_slam_tpu.data import make_corridor
from parakeet_slam_tpu.eval import ate_rmse
from parakeet_slam_tpu.filter import FastSLAM, run_sequence


def small_cfg(**kw):
    defaults = dict(
        num_particles=8, max_landmarks=16, max_observations=4,
        sig_dim=0, meas_noise=(0.1, 0.03), motion_noise=(0.1, 0.05, 0.1, 0.05),
    )
    defaults.update(kw)
    return FilterConfig(**defaults)


class TestBasics:
    def test_init_state_shapes(self):
        slam = FastSLAM(small_cfg())
        st = slam.init_state()
        assert st.pose.shape == (8, 3)
        assert st.lm_mean.shape == (8, 16, 2)
        assert st.lm_cov.shape == (8, 16, 2, 2)
        assert not bool(jnp.any(st.lm_valid))

    def test_motion_update_spreads_particles(self):
        slam = FastSLAM(small_cfg(num_particles=128))
        st = slam.init_state()
        st = slam.motion_update(st, jnp.array([1.0, 0.0, 0.1]), jax.random.PRNGKey(0))
        pose = np.asarray(st.pose)
        assert pose[:, 0].std() > 0.01  # noise applied
        np.testing.assert_allclose(pose[:, 0].mean(), 1.0, atol=0.05)

    def test_new_landmark_created(self):
        slam = FastSLAM(small_cfg())
        st = slam.init_state()
        obs = make_observation(
            jnp.tile(jnp.array([[2.0, 0.5]]), (4, 1)),
            valid=jnp.array([True, False, False, False]),
        )
        st, m = slam.measurement_update(st, obs, jax.random.PRNGKey(1))
        assert np.all(np.asarray(st.num_landmarks()) == 1)
        # landmark placed at the observed range/bearing from each pose
        ang = np.asarray(st.pose[:, 2]) + 0.5
        expect = np.asarray(st.pose[:, :2]) + 2.0 * np.stack(
            [np.cos(ang), np.sin(ang)], axis=1
        )
        got = np.asarray(st.lm_mean[np.arange(8), np.asarray(st.lm_valid).argmax(1)])
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_reobservation_updates_not_duplicates(self):
        slam = FastSLAM(small_cfg())
        st = slam.init_state()
        obs = make_observation(jnp.array([[2.0, 0.5]]))
        key = jax.random.PRNGKey(2)
        st, _ = slam.measurement_update(st, obs, key)
        cov0 = np.asarray(st.lm_cov[0, 0])
        st, _ = slam.measurement_update(st, obs, key)
        assert np.all(np.asarray(st.num_landmarks()) == 1)  # associated, not new
        cov1 = np.asarray(st.lm_cov[0, 0])
        assert np.trace(cov1) < np.trace(cov0)  # EKF contracted uncertainty

    def test_distinct_landmarks_separate_slots(self):
        slam = FastSLAM(small_cfg())
        st = slam.init_state()
        obs = make_observation(jnp.array([[2.0, 0.5], [4.0, -1.0]]))
        st, _ = slam.measurement_update(st, obs, jax.random.PRNGKey(3))
        assert np.all(np.asarray(st.num_landmarks()) == 2)

    def test_weight_rewards_consistency(self):
        """Particle at the true pose should out-weigh a displaced one."""
        cfg = small_cfg(num_particles=2, cull_enabled=False, resample_frac=0.0)
        slam = FastSLAM(cfg)
        st = slam.init_state()
        st = st.replace(pose=jnp.array([[0.0, 0.0, 0.0], [0.6, -0.4, 0.3]]))
        obs = make_observation(jnp.array([[2.0, 0.5]]))
        st, _ = slam.measurement_update(st, obs, jax.random.PRNGKey(4))
        # both created the landmark; re-observe from origin-truth geometry
        st2 = st.replace(pose=jnp.array([[0.5, 0.0, 0.0], [1.1, -0.4, 0.3]]))
        d = np.array([2.0 * np.cos(0.5) - 0.5, 2.0 * np.sin(0.5)])
        z2 = np.array([np.hypot(*d), np.arctan2(d[1], d[0])])
        obs2 = make_observation(jnp.asarray(z2)[None])
        st2, _ = slam.measurement_update(st2, obs2, jax.random.PRNGKey(5))
        lw = np.asarray(st2.log_w)
        assert lw[0] > lw[1]

    def test_culling_frees_unseen_landmarks(self):
        cfg = small_cfg(cull_enabled=True, max_range=10.0, resample_frac=0.0)
        slam = FastSLAM(cfg)
        st = slam.init_state()
        obs = make_observation(jnp.array([[2.0, 0.0]]))
        st, _ = slam.measurement_update(st, obs, jax.random.PRNGKey(6))
        assert np.all(np.asarray(st.num_landmarks()) == 1)
        # now repeatedly observe elsewhere; count decays below zero -> culled
        far = make_observation(jnp.array([[5.0, 2.0]]))
        for i in range(6):
            st, _ = slam.measurement_update(st, far, jax.random.PRNGKey(10 + i))
        assert np.all(np.asarray(st.num_landmarks()) == 1)  # old culled, far kept

    def test_capacity_full_no_overflow(self):
        cfg = small_cfg(max_landmarks=2, cull_enabled=False)
        slam = FastSLAM(cfg)
        st = slam.init_state()
        for i, z in enumerate([[2.0, 0.0], [3.0, 1.0], [4.0, -1.0], [5.0, 2.0]]):
            st, _ = slam.measurement_update(
                st, make_observation(jnp.array([z])), jax.random.PRNGKey(i)
            )
        assert np.all(np.asarray(st.num_landmarks()) <= 2)

    def test_likelihood_temper_scales_weight_increment(self):
        """config.likelihood_temper divides the frame's log-weight delta by
        T (before resampling), the ESS-collapse lever for dense visual
        frames. Map updates must be unchanged."""
        obs = make_observation(
            jnp.array([[2.0, 0.5], [3.0, -0.4], [1.5, 1.1], [2.5, 0.0]])
        )
        key = jax.random.PRNGKey(7)

        def run(T):
            slam = FastSLAM(small_cfg(likelihood_temper=T, resample_frac=0.0))
            st = slam.init_state()
            st = slam.motion_update(st, jnp.array([0.5, 0.0, 0.1]), key)
            st, _ = slam.measurement_update(st, obs, jax.random.PRNGKey(8))
            # second frame: re-observe so the delta is likelihood-driven
            st2, _ = slam.measurement_update(st, obs, jax.random.PRNGKey(9))
            return st, st2

        st1_a, st2_a = run(1.0)
        st1_b, st2_b = run(4.0)
        d_a = np.asarray(st2_a.log_w - st1_a.log_w)
        d_b = np.asarray(st2_b.log_w - st1_b.log_w)
        np.testing.assert_allclose(d_b, d_a / 4.0, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(st2_b.lm_mean), np.asarray(st2_a.lm_mean),
            rtol=1e-5, atol=1e-6,
        )

    def test_resample_triggers_on_degenerate_weights(self):
        cfg = small_cfg(resample_frac=0.5)
        slam = FastSLAM(cfg)
        st = slam.init_state()
        st = st.replace(log_w=jnp.full((8,), -100.0).at[3].set(0.0))
        obs = make_observation(jnp.zeros((1, 2)), valid=jnp.array([False]))
        st2, m = slam.measurement_update(st, obs, jax.random.PRNGKey(7))
        assert bool(m.resampled)
        np.testing.assert_allclose(np.asarray(st2.log_w), 0.0)


class TestCorridorGolden:
    """The regression anchor: synthetic corridor, fixed seeds, ATE bound."""

    @pytest.mark.slow
    def test_corridor_ate_bound(self):
        sim = make_corridor(num_landmarks=60, num_steps=150, max_obs=12, seed=7)
        cfg = FilterConfig(
            num_particles=64, max_landmarks=128, max_observations=12,
            sig_dim=3, motion_noise=(0.3, 0.1, 0.3, 0.1),
            meas_noise=(0.1, 0.03), sig_noise=0.5,
            max_range=6.5, fov_half_angle=2.5,
        )
        slam = FastSLAM(cfg)
        state = slam.init_state(init_pose=jnp.asarray(sim.gt_pose[0]))
        _, est, metrics = run_sequence(
            slam, state, jnp.asarray(sim.odom), jnp.asarray(sim.obs_z),
            jnp.asarray(sim.obs_sig), jnp.asarray(sim.obs_valid),
            jax.random.PRNGKey(0),
        )
        ate = float(ate_rmse(est[:, :2], sim.gt_pose[:, :2]))
        assert ate < 0.5, f"corridor ATE regression: {ate}"

    def test_determinism(self):
        sim = make_corridor(num_landmarks=30, num_steps=40, max_obs=8, seed=3)
        cfg = FilterConfig(
            num_particles=16, max_landmarks=64, max_observations=8, sig_dim=3,
            motion_noise=(0.3, 0.1, 0.3, 0.1), meas_noise=(0.1, 0.03),
            max_range=6.5, fov_half_angle=2.5,
        )
        slam = FastSLAM(cfg)
        outs = []
        for _ in range(2):
            state = slam.init_state(init_pose=jnp.asarray(sim.gt_pose[0]))
            _, est, _ = run_sequence(
                slam, state, jnp.asarray(sim.odom), jnp.asarray(sim.obs_z),
                jnp.asarray(sim.obs_sig), jnp.asarray(sim.obs_valid),
                jax.random.PRNGKey(0),
            )
            outs.append(np.asarray(est))
        np.testing.assert_array_equal(outs[0], outs[1])
