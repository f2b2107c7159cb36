"""Parity tests: fused Pallas measurement-update kernel vs the plain-JAX
FastSLAM path (SURVEY.md §5: kernels tested against pure-JAX references in
interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_slam_tpu.core.config import FilterConfig
from parakeet_slam_tpu.core.state import make_observation
from parakeet_slam_tpu.filter import FastSLAM
from parakeet_slam_tpu.kernels import ekf_update


def _cfg(**kw):
    d = dict(
        num_particles=8, max_landmarks=16, max_observations=4, sig_dim=3,
        meas_noise=(0.1, 0.03), max_range=6.5, fov_half_angle=2.5,
    )
    d.update(kw)
    return FilterConfig(**d)


def _kernel_call(cfg, st, obs):
    return ekf_update.measurement_update_2d(
        st.pose, st.log_w, st.lm_mean, st.lm_cov, st.lm_sig,
        st.lm_valid, st.lm_count, obs.z, obs.sig, obs.valid,
        sig_dim=cfg.sig_dim,
        r_var=(cfg.meas_noise[0] ** 2, cfg.meas_noise[1] ** 2),
        sig_var=cfg.sig_noise**2,
        log_p0=cfg.new_landmark_loglik,
        init_infl=cfg.init_cov_inflation,
        max_range=cfg.max_range,
        fov_half=cfg.fov_half_angle,
        cull=cfg.cull_enabled,
        interpret=True,
    )


def _rand_obs(key, n_valid, n_total, sig_dim):
    kr, kp, ks = jax.random.split(key, 3)
    r = jax.random.uniform(kr, (n_total,), minval=1.0, maxval=5.0)
    phi = jax.random.uniform(kp, (n_total,), minval=-2.0, maxval=2.0)
    sig = jax.random.uniform(ks, (n_total, sig_dim))
    valid = jnp.arange(n_total) < n_valid
    return make_observation(jnp.stack([r, phi], axis=1), sig=sig, valid=valid)


class TestKernelParity:
    @pytest.mark.parametrize("frames", [1, 3])
    def test_matches_xla_path(self, frames):
        """Kernel vs the XLA reference path (`measurement_core` with
        use_pallas=False) — both implement the v2 batched-association
        semantics (see kernels/ekf_update.py docstring)."""
        cfg = _cfg(use_pallas=False)
        slam = FastSLAM(cfg)
        st_x = slam.init_state()
        st_p = slam.init_state()
        for f in range(frames):
            key = jax.random.PRNGKey(100 + f)
            obs = _rand_obs(key, n_valid=3, n_total=4, sig_dim=3)
            # scatter particles so poses differ
            st_x = st_x.replace(
                pose=st_x.pose + 0.1 * jax.random.normal(key, st_x.pose.shape)
            )
            st_p = st_p.replace(pose=st_x.pose)

            # XLA reference path: measurement_core (association + EKF + cull,
            # no resample)
            st_x, _ = slam.measurement_core(st_x, obs)

            # Pallas path
            logw, mean, cov, sig, valid, count, _ = _kernel_call(cfg, st_p, obs)
            st_p = st_p.replace(
                log_w=logw, lm_mean=mean, lm_cov=cov, lm_sig=sig,
                lm_valid=valid, lm_count=count,
            )

            np.testing.assert_array_equal(
                np.asarray(st_x.lm_valid), np.asarray(st_p.lm_valid)
            )
            np.testing.assert_array_equal(
                np.asarray(st_x.lm_count), np.asarray(st_p.lm_count)
            )
            v = np.asarray(st_x.lm_valid)
            np.testing.assert_allclose(
                np.asarray(st_x.lm_mean)[v], np.asarray(st_p.lm_mean)[v],
                rtol=1e-5, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(st_x.lm_cov)[v], np.asarray(st_p.lm_cov)[v],
                rtol=1e-4, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(st_x.lm_sig)[v], np.asarray(st_p.lm_sig)[v],
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(st_x.log_w), np.asarray(st_p.log_w), rtol=1e-5, atol=1e-4
            )

    def test_sig_dim_zero(self):
        cfg = _cfg(sig_dim=0)
        slam = FastSLAM(cfg)
        st = slam.init_state()
        obs = make_observation(jnp.array([[2.0, 0.5], [3.0, -0.7]]))
        logw, mean, cov, sig, valid, count, nm = _kernel_call(cfg, st, obs)
        assert int(valid.sum()) == 2 * cfg.num_particles
        np.testing.assert_allclose(np.asarray(nm), 2.0)

    def test_full_filter_with_pallas_flag(self):
        """End-to-end: use_pallas config routes through the kernel and the
        trajectory matches the XLA path."""
        from parakeet_slam_tpu.data import make_corridor
        from parakeet_slam_tpu.filter import run_sequence

        sim = make_corridor(num_landmarks=30, num_steps=30, max_obs=8, seed=3)
        outs = {}
        for flag in (False, True):
            cfg = FilterConfig(
                num_particles=16, max_landmarks=64, max_observations=8,
                sig_dim=3, motion_noise=(0.3, 0.1, 0.3, 0.1),
                meas_noise=(0.1, 0.03), max_range=6.5, fov_half_angle=2.5,
                use_pallas=flag,
            )
            slam = FastSLAM(cfg)
            state = slam.init_state(init_pose=jnp.asarray(sim.gt_pose[0]))
            _, est, _ = run_sequence(
                slam, state, jnp.asarray(sim.odom), jnp.asarray(sim.obs_z),
                jnp.asarray(sim.obs_sig), jnp.asarray(sim.obs_valid),
                jax.random.PRNGKey(0),
            )
            outs[flag] = np.asarray(est)
        np.testing.assert_allclose(outs[False], outs[True], rtol=1e-4, atol=1e-4)


class TestWeightSuppressedParity:
    def test_fs2_map_pass_matches_xla(self):
        """weight_matched=False (FastSLAM 2.0 map pass): Pallas and XLA
        paths must produce identical maps and UNCHANGED log-weights."""
        cfg_x = _cfg(use_pallas=False)
        cfg_p = _cfg(use_pallas=True)
        slam_x = FastSLAM(cfg_x)
        slam_p = FastSLAM(cfg_p)
        st_x = slam_x.init_state()
        st_p = slam_p.init_state()
        key = jax.random.PRNGKey(7)
        # scatter poses + seed a map with one FS1 frame first
        poses = jax.random.uniform(key, st_x.pose.shape, minval=-1.0, maxval=1.0)
        st_x = st_x.replace(pose=poses)
        st_p = st_p.replace(pose=poses)
        obs0 = _rand_obs(jax.random.PRNGKey(8), n_valid=3, n_total=4, sig_dim=3)
        st_x, _ = slam_x.measurement_core(st_x, obs0)
        st_p, _ = slam_p.measurement_core(st_p, obs0)

        obs = _rand_obs(jax.random.PRNGKey(9), n_valid=4, n_total=4, sig_dim=3)
        lw_before_x = np.asarray(st_x.log_w)
        lw_before_p = np.asarray(st_p.log_w)
        new_x, nm_x = slam_x.measurement_core(st_x, obs, weight_matched=False)
        new_p, nm_p = slam_p.measurement_core(st_p, obs, weight_matched=False)

        np.testing.assert_array_equal(np.asarray(new_x.log_w), lw_before_x)
        np.testing.assert_array_equal(np.asarray(new_p.log_w), lw_before_p)
        np.testing.assert_array_equal(
            np.asarray(new_x.lm_valid), np.asarray(new_p.lm_valid)
        )
        mask = np.asarray(new_x.lm_valid)[..., None]
        np.testing.assert_allclose(
            np.where(mask, np.asarray(new_x.lm_mean), 0),
            np.where(mask, np.asarray(new_p.lm_mean), 0),
            atol=5e-6,
        )
        np.testing.assert_allclose(float(nm_x), float(nm_p))
