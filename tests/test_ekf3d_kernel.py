"""Parity tests: fused 3-D vision-model Pallas kernel vs the plain-JAX
FastSLAM path (SURVEY.md §5: kernels tested against pure-JAX references in
interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_slam_tpu.core.config import FilterConfig, FrontendConfig
from parakeet_slam_tpu.core.state import make_observation
from parakeet_slam_tpu.filter import FastSLAM
from parakeet_slam_tpu.kernels import ekf_update_3d

H_IMG, W_IMG = 96, 160
FX = 0.6 * W_IMG

MODELS = {
    "pinhole_3d": 2,
    "stereo_3d": 3,
    "equirect_3d": 2,
}


def _cfgs(model, Dz):
    # desc_weight 0.5: a re-observation (few flipped bits) scores ~-2 on the
    # appearance term while a random descriptor scores ~-64, so the
    # new-vs-update decision at log_p0=-30 is decisive in both paths and the
    # parity comparison never sits on an fp boundary.
    fc = FilterConfig(
        num_particles=8, max_landmarks=32, max_observations=4,
        lm_dim=3, obs_dim=Dz, pose_dim=7, sig_dim=0, desc_words=8,
        desc_weight=0.5,
        measurement_model=model, motion_model="se3_odometry",
        motion_noise=(0.02, 0.01),
        meas_noise=(2.0, 2.0, 1.5)[:Dz],
        new_landmark_loglik=-30.0, max_range=50.0,
    )
    fe = FrontendConfig(
        camera="stereo" if model == "stereo_3d" else "pinhole",
        baseline=0.3, intrinsics=(FX, FX, W_IMG / 2, H_IMG / 2),
        image_size=(H_IMG, W_IMG),
    )
    return fc, fe


def _kernel_call(slam, st, obs):
    c = slam.cfg
    fe = slam.fe_cfg
    par = (
        ("fx", float(fe.intrinsics[0])), ("fy", float(fe.intrinsics[1])),
        ("cx", float(fe.intrinsics[2])), ("cy", float(fe.intrinsics[3])),
        ("baseline", float(fe.baseline)),
        ("img_w", float(fe.image_size[1])), ("img_h", float(fe.image_size[0])),
    )
    return ekf_update_3d.measurement_update_3d(
        st.pose, st.log_w, st.lm_mean, st.lm_cov, st.lm_desc,
        st.lm_valid, st.lm_count, obs.z, obs.desc, obs.valid,
        model=slam.model.name, desc_words=c.desc_words, par=par,
        r_var=tuple(float(v) ** 2 for v in c.meas_noise[: c.obs_dim]),
        desc_weight=float(c.desc_weight),
        log_p0=float(c.new_landmark_loglik),
        init_infl=float(c.init_cov_inflation),
        init_range_prior=float(c.init_range_prior),
        init_range_sigma=float(c.init_range_sigma),
        max_range=float(c.max_range), cull=c.cull_enabled,
        cull_unseen=c.cull_unseen, interpret=True,
    )


def _scatter_poses(key, P, scale=1e-3):
    """Near-identical particle poses: decisions agree across particles, so
    structural (new-vs-update) parity is deterministic while the EKF math
    still runs on distinct values."""
    kt, kq = jax.random.split(key)
    t = jax.random.uniform(kt, (P, 3), minval=-scale, maxval=scale)
    v = jax.random.normal(kq, (P, 4)) * jnp.array(
        [scale, scale, scale, 1.0]
    )
    q = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    return jnp.concatenate([t, q], axis=1)


def _rand_obs(key, model, Dz, n_valid, n_total, desc_words):
    ku, kv, kd, kc = jax.random.split(key, 4)
    u = jax.random.uniform(ku, (n_total,), minval=20.0, maxval=W_IMG - 20)
    v = jax.random.uniform(kv, (n_total,), minval=20.0, maxval=H_IMG - 20)
    cols = [u, v]
    if Dz == 3:
        cols.append(jax.random.uniform(kd, (n_total,), minval=2.0, maxval=12.0))
    z = jnp.stack(cols, axis=1)
    desc = jax.random.randint(
        kc, (n_total, desc_words), 0, 2**31 - 1, dtype=jnp.int32
    ).astype(jnp.uint32)
    valid = jnp.arange(n_total) < n_valid
    return make_observation(z, desc=desc, valid=valid)


def _reobserve(key, slam, st, n_total, desc_words, flip_bits=2):
    """Observations that re-see particle 0's existing landmarks: projected
    measurement + the stored descriptor with a couple of bits flipped —
    decisively an update, never a borderline new-landmark call."""
    pose0 = st.pose[0]
    means = st.lm_mean[0]
    valid = st.lm_valid[0]
    idx = jnp.nonzero(valid, size=n_total, fill_value=0)[0]
    z = jax.vmap(lambda m: slam.model.h(pose0, m))(means[idx])
    desc = st.lm_desc[0][idx]
    flips = jax.random.randint(
        key, (n_total, flip_bits), 0, 32, dtype=jnp.int32
    )
    for b in range(flip_bits):
        bit = (jnp.uint32(1) << flips[:, b].astype(jnp.uint32))
        desc = desc.at[:, b % desc.shape[1]].set(
            jnp.bitwise_xor(desc[:, b % desc.shape[1]], bit)
        )
    ovalid = jnp.arange(n_total) < jnp.minimum(
        jnp.sum(valid), n_total
    )
    return make_observation(z, desc=desc, valid=ovalid)


class TestKernel3DParity:
    @pytest.mark.parametrize("model", list(MODELS))
    def test_matches_xla_path(self, model):
        Dz = MODELS[model]
        fc, fe = _cfgs(model, Dz)
        slam = FastSLAM(fc, fe)
        st_x = slam.init_state()
        st_p = slam.init_state()
        for f in range(4):
            key = jax.random.PRNGKey(200 + f)
            kp, ko = jax.random.split(key)
            pose = _scatter_poses(kp, fc.num_particles)
            st_x = st_x.replace(pose=pose)
            st_p = st_p.replace(pose=pose)
            if f % 2 == 0:
                obs = _rand_obs(ko, model, Dz, n_valid=3, n_total=4,
                                desc_words=fc.desc_words)
            else:  # re-observe existing landmarks -> exercises EKF updates
                obs = _reobserve(ko, slam, st_x, 4, fc.desc_words)
            st_x, _ = slam.measurement_core(st_x, obs)  # XLA (use_pallas off)
            (lw, lm, lc_, ld, lv, lcnt, nm) = _kernel_call(slam, st_p, obs)
            st_p = st_p.replace(
                log_w=lw, lm_mean=lm, lm_cov=lc_, lm_desc=ld,
                lm_valid=lv, lm_count=lcnt,
            )
            np.testing.assert_array_equal(
                np.asarray(st_p.lm_valid), np.asarray(st_x.lm_valid),
                err_msg=f"{model} frame {f} valid mask",
            )
            np.testing.assert_allclose(
                np.asarray(st_p.log_w), np.asarray(st_x.log_w),
                rtol=1e-3, atol=1e-2, err_msg=f"{model} frame {f} log_w",
            )
            vm = np.asarray(st_x.lm_valid)
            np.testing.assert_allclose(
                np.asarray(st_p.lm_mean)[vm], np.asarray(st_x.lm_mean)[vm],
                rtol=1e-3, atol=1e-3, err_msg=f"{model} frame {f} means",
            )
            np.testing.assert_allclose(
                np.asarray(st_p.lm_cov)[vm], np.asarray(st_x.lm_cov)[vm],
                rtol=2e-3, atol=2e-3, err_msg=f"{model} frame {f} covs",
            )
            np.testing.assert_array_equal(
                np.asarray(st_p.lm_count), np.asarray(st_x.lm_count),
                err_msg=f"{model} frame {f} counts",
            )
            np.testing.assert_array_equal(
                np.asarray(st_p.lm_desc)[vm], np.asarray(st_x.lm_desc)[vm],
                err_msg=f"{model} frame {f} descriptors",
            )

    def test_odd_capacity_chunking(self):
        """Lp=1152 (not a multiple of the 1024 chunk) must still score every
        landmark lane — regression for NC = Lp // chunk truncation leaving
        stale scratch to win the association argmax."""
        import dataclasses

        fc, fe = _cfgs("pinhole_3d", 2)
        fc = dataclasses.replace(fc, max_landmarks=1100)
        slam = FastSLAM(fc, fe)
        st_x = slam.init_state()
        st_p = slam.init_state()
        # Pre-fill slots near the END of the table so association must look
        # past lane 1024.
        key = jax.random.PRNGKey(9)
        pose = _scatter_poses(key, fc.num_particles)
        st_x = st_x.replace(pose=pose)
        st_p = st_p.replace(pose=pose)
        obs1 = _rand_obs(jax.random.PRNGKey(10), "pinhole_3d", 2, 4, 4,
                         fc.desc_words)
        hi = jnp.arange(1100) >= 1096  # occupy slots 1096..1099
        mk = lambda st: st.replace(
            lm_valid=jnp.broadcast_to(hi, st.lm_valid.shape),
            lm_mean=st.lm_mean + 5.0,
            lm_cov=jnp.broadcast_to(0.5 * jnp.eye(3), st.lm_cov.shape) + 0.0,
        )
        st_x, st_p = mk(st_x), mk(st_p)
        st_x, _ = slam.measurement_core(st_x, obs1)
        (lw, lm, lc_, ld, lv, lcnt, nm) = _kernel_call(slam, st_p, obs1)
        np.testing.assert_array_equal(np.asarray(lv), np.asarray(st_x.lm_valid))
        np.testing.assert_allclose(
            np.asarray(lw), np.asarray(st_x.log_w), rtol=1e-3, atol=1e-2
        )

    def test_filter_route_uses_kernel(self):
        """use_pallas=True on a 3-D model routes through the fused kernel
        and produces a valid step (smoke, interpret mode)."""
        import dataclasses

        fc, fe = _cfgs("stereo_3d", 3)
        fc = dataclasses.replace(fc, use_pallas=True)
        slam = FastSLAM(fc, fe)
        st = slam.init_state()
        obs = _rand_obs(jax.random.PRNGKey(1), "stereo_3d", 3, 3, 4,
                        fc.desc_words)
        st2, metrics = slam.step(st, jnp.zeros(6), obs, jax.random.PRNGKey(2))
        assert np.isfinite(np.asarray(st2.log_w)).all()
        assert int(np.asarray(st2.lm_valid).sum()) > 0


class TestWeightSuppressed3D:
    @pytest.mark.parametrize("model", ["pinhole_3d", "stereo_3d"])
    def test_fs2_map_pass_matches_xla(self, model):
        """weight_matched=False (FastSLAM 2.0 map pass) through the 3-D
        kernel: maps match the XLA path, log-weights unchanged."""
        Dz = MODELS[model]
        fc, fe = _cfgs(model, Dz)
        slam_x = FastSLAM(fc, fe)
        slam_p = FastSLAM(fc.replace(use_pallas=True) if hasattr(fc, "replace")
                          else FilterConfig(**{**fc.__dict__, "use_pallas": True}), fe)
        key = jax.random.PRNGKey(11)
        poses = _scatter_poses(key, fc.num_particles)
        st_x = slam_x.init_state().replace(pose=poses)
        st_p = slam_p.init_state().replace(pose=poses)
        obs0 = _rand_obs(jax.random.PRNGKey(12), model, Dz, 3, 4, fc.desc_words)
        st_x, _ = slam_x.measurement_core(st_x, obs0)
        st_p, _ = slam_p.measurement_core(st_p, obs0)

        obs = _reobserve(jax.random.PRNGKey(13), slam_x, st_x, 4, fc.desc_words)
        lw_x = np.asarray(st_x.log_w)
        lw_p = np.asarray(st_p.log_w)
        new_x, _ = slam_x.measurement_core(st_x, obs, weight_matched=False)
        new_p, _ = slam_p.measurement_core(st_p, obs, weight_matched=False)

        np.testing.assert_array_equal(np.asarray(new_x.log_w), lw_x)
        np.testing.assert_array_equal(np.asarray(new_p.log_w), lw_p)
        np.testing.assert_array_equal(
            np.asarray(new_x.lm_valid), np.asarray(new_p.lm_valid)
        )
        mask = np.asarray(new_x.lm_valid)[..., None]
        np.testing.assert_allclose(
            np.where(mask, np.asarray(new_x.lm_mean), 0),
            np.where(mask, np.asarray(new_p.lm_mean), 0),
            atol=1e-4,
        )


class TestCullUnseenParity:
    def test_decay_eviction_matches_xla_and_frees_lanes(self):
        """cull_unseen: unmatched lanes age regardless of visibility, so an
        out-of-view landmark decays and frees its lane; Pallas and XLA
        paths agree exactly on the decayed validity."""
        import dataclasses

        fc, fe = _cfgs("pinhole_3d", 2)
        fc = dataclasses.replace(fc, cull_unseen=True)
        slam = FastSLAM(fc, fe)
        st_x = slam.init_state()
        # plant a landmark BEHIND the camera (z < 0: never in FOV) with a
        # small count, and one in front with a big count
        st_x = st_x.replace(
            lm_mean=st_x.lm_mean.at[:, 0].set(jnp.array([0.0, 0.0, -5.0]))
                     .at[:, 1].set(jnp.array([0.0, 0.0, 8.0])),
            lm_valid=st_x.lm_valid.at[:, :2].set(True),
            lm_count=st_x.lm_count.at[:, 0].set(1).at[:, 1].set(50),
        )
        st_p = st_x
        obs = _rand_obs(jax.random.PRNGKey(3), "pinhole_3d", 2, 2, 4, 8)
        for f in range(3):
            st_x, _ = slam.measurement_core(st_x, obs)
            out = _kernel_call(slam, st_p, obs)
            st_p = st_p.replace(
                log_w=out[0], lm_mean=out[1], lm_cov=out[2], lm_desc=out[3],
                lm_valid=out[4], lm_count=out[5],
            )
            np.testing.assert_array_equal(
                np.asarray(st_p.lm_valid), np.asarray(st_x.lm_valid),
                err_msg=f"frame {f}",
            )
        # the behind-camera landmark decayed away (count 1 -> gone);
        # without cull_unseen it would have lived forever
        assert not bool(st_x.lm_valid[:, 0].any())
        assert bool(st_x.lm_valid[:, 1].all())
