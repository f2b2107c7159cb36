"""On-device Pallas-vs-XLA parity sweep.

The pytest suite pins an 8-virtual-device CPU platform (tests/conftest.py)
and exercises the Pallas kernels in interpret mode; this script is the
real-hardware complement (SURVEY.md §5 "on-device"): run every fused kernel
with interpret=False on the default backend (the TPU in this container) and
compare against the plain-JAX/XLA reference path.

Usage:
    python -m parakeet_slam_tpu.eval.tpu_parity

Exits non-zero on any mismatch. Checks:
  * 2-D range-bearing fused measurement update (new landmarks + EKF updates)
  * 3-D vision-model fused update (pinhole / stereo / equirectangular)
  * odd landmark capacity (Lp not a multiple of the VMEM chunk) — regression
    for the NC = Lp // chunk truncation bug
  * tiled Hamming top-2 matcher
  * resampling payload-gather kernel
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from parakeet_slam_tpu.core.config import FilterConfig, FrontendConfig
from parakeet_slam_tpu.core.state import make_observation
from parakeet_slam_tpu.filter import FastSLAM
from parakeet_slam_tpu.kernels import ekf_update, ekf_update_3d, match
from parakeet_slam_tpu.kernels import resample_pallas

H_IMG, W_IMG = 96, 160
FX = 0.6 * W_IMG
FAILURES: list[str] = []


def _check(name, fn):
    try:
        fn()
    except AssertionError as e:
        FAILURES.append(name)
        lines = [ln for ln in str(e).splitlines() if ln.strip()]
        print(f"FAIL  {name}:")
        for ln in lines[:12]:
            print(f"      {ln}")
    except Exception as e:  # noqa: BLE001 - report, keep sweeping
        FAILURES.append(name)
        print(f"ERROR {name}: {type(e).__name__}: {e}")
    else:
        print(f"ok    {name}")


# ---------------------------------------------------------------- 2-D kernel
def _kernel_call_2d(cfg, st, obs):
    return ekf_update.measurement_update_2d(
        st.pose, st.log_w, st.lm_mean, st.lm_cov, st.lm_sig,
        st.lm_valid, st.lm_count, obs.z, obs.sig, obs.valid,
        sig_dim=cfg.sig_dim,
        r_var=(cfg.meas_noise[0] ** 2, cfg.meas_noise[1] ** 2),
        sig_var=cfg.sig_noise ** 2,
        log_p0=cfg.new_landmark_loglik,
        init_infl=cfg.init_cov_inflation,
        max_range=cfg.max_range, fov_half=cfg.fov_half_angle,
        cull=cfg.cull_enabled, interpret=False,
    )


def check_2d():
    cfg = FilterConfig(
        num_particles=64, max_landmarks=192, max_observations=8, sig_dim=3,
        meas_noise=(0.1, 0.03), max_range=6.5, fov_half_angle=2.5,
    )
    slam = FastSLAM(cfg)
    st_x = slam.init_state()
    st_p = slam.init_state()
    for f in range(4):
        key = jax.random.PRNGKey(100 + f)
        kr, kp, ks, kx = jax.random.split(key, 4)
        n = cfg.max_observations
        r = jax.random.uniform(kr, (n,), minval=1.0, maxval=5.0)
        phi = jax.random.uniform(kp, (n,), minval=-2.0, maxval=2.0)
        sig = jax.random.uniform(ks, (n, 3))
        obs = make_observation(
            jnp.stack([r, phi], axis=1), sig=sig, valid=jnp.arange(n) < n - 1
        )
        pose = st_x.pose + 0.1 * jax.random.normal(kx, st_x.pose.shape)
        st_x = st_x.replace(pose=pose)
        st_p = st_p.replace(pose=pose)
        st_x, _ = slam.measurement_core(st_x, obs)
        lw, lm, lc, ls, lv, lcnt, _ = _kernel_call_2d(cfg, st_p, obs)
        st_p = st_p.replace(
            log_w=lw, lm_mean=lm, lm_cov=lc, lm_sig=ls,
            lm_valid=lv, lm_count=lcnt,
        )
        np.testing.assert_array_equal(
            np.asarray(st_p.lm_valid), np.asarray(st_x.lm_valid),
            err_msg=f"frame {f} valid",
        )
        np.testing.assert_allclose(
            np.asarray(st_p.log_w), np.asarray(st_x.log_w),
            rtol=1e-3, atol=1e-2, err_msg=f"frame {f} log_w",
        )
        vm = np.asarray(st_x.lm_valid)
        np.testing.assert_allclose(
            np.asarray(st_p.lm_mean)[vm], np.asarray(st_x.lm_mean)[vm],
            rtol=1e-3, atol=1e-3, err_msg=f"frame {f} means",
        )


# ---------------------------------------------------------------- 3-D kernel
def _cfgs_3d(model, Dz, **kw):
    fc = FilterConfig(
        num_particles=16, max_landmarks=64, max_observations=4,
        lm_dim=3, obs_dim=Dz, pose_dim=7, sig_dim=0, desc_words=8,
        desc_weight=0.5,
        measurement_model=model, motion_model="se3_odometry",
        motion_noise=(0.02, 0.01), meas_noise=(2.0, 2.0, 1.5)[:Dz],
        new_landmark_loglik=-30.0, max_range=50.0, **kw,
    )
    fe = FrontendConfig(
        camera="stereo" if model == "stereo_3d" else "pinhole",
        baseline=0.3, intrinsics=(FX, FX, W_IMG / 2, H_IMG / 2),
        image_size=(H_IMG, W_IMG),
    )
    return fc, fe


def _kernel_call_3d(slam, st, obs):
    c, fe = slam.cfg, slam.fe_cfg
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
        max_range=float(c.max_range), cull=c.cull_enabled, interpret=False,
    )


def _scatter_poses(key, P, scale=1e-3):
    kt, kq = jax.random.split(key)
    t = jax.random.uniform(kt, (P, 3), minval=-scale, maxval=scale)
    v = jax.random.normal(kq, (P, 4)) * jnp.array([scale, scale, scale, 1.0])
    q = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    return jnp.concatenate([t, q], axis=1)


def _rand_obs_3d(key, Dz, n_valid, n_total, desc_words):
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
    return make_observation(z, desc=desc, valid=jnp.arange(n_total) < n_valid)


def _compare_3d(st_p, st_x, tag):
    np.testing.assert_array_equal(
        np.asarray(st_p.lm_valid), np.asarray(st_x.lm_valid),
        err_msg=f"{tag} valid",
    )
    np.testing.assert_allclose(
        np.asarray(st_p.log_w), np.asarray(st_x.log_w),
        rtol=1e-3, atol=1e-2, err_msg=f"{tag} log_w",
    )
    vm = np.asarray(st_x.lm_valid)
    np.testing.assert_allclose(
        np.asarray(st_p.lm_mean)[vm], np.asarray(st_x.lm_mean)[vm],
        rtol=1e-3, atol=1e-3, err_msg=f"{tag} means",
    )
    np.testing.assert_allclose(
        np.asarray(st_p.lm_cov)[vm], np.asarray(st_x.lm_cov)[vm],
        rtol=2e-3, atol=2e-3, err_msg=f"{tag} covs",
    )


def check_3d(model, Dz):
    fc, fe = _cfgs_3d(model, Dz)
    slam = FastSLAM(fc, fe)
    st_x = slam.init_state()
    st_p = slam.init_state()
    for f in range(3):
        key = jax.random.PRNGKey(200 + f)
        kp, ko = jax.random.split(key)
        pose = _scatter_poses(kp, fc.num_particles)
        st_x = st_x.replace(pose=pose)
        st_p = st_p.replace(pose=pose)
        obs = _rand_obs_3d(ko, Dz, 3, 4, fc.desc_words)
        st_x, _ = slam.measurement_core(st_x, obs)
        lw, lm, lc, ld, lv, lcnt, _ = _kernel_call_3d(slam, st_p, obs)
        st_p = st_p.replace(
            log_w=lw, lm_mean=lm, lm_cov=lc, lm_desc=ld,
            lm_valid=lv, lm_count=lcnt,
        )
        _compare_3d(st_p, st_x, f"{model} frame {f}")


def check_odd_capacity():
    fc, fe = _cfgs_3d("pinhole_3d", 2)
    fc = dataclasses.replace(fc, max_landmarks=1100)
    slam = FastSLAM(fc, fe)
    st_x = slam.init_state()
    st_p = slam.init_state()
    pose = _scatter_poses(jax.random.PRNGKey(9), fc.num_particles)
    st_x = st_x.replace(pose=pose)
    st_p = st_p.replace(pose=pose)
    obs = _rand_obs_3d(jax.random.PRNGKey(10), 2, 4, 4, fc.desc_words)
    hi = jnp.arange(1100) >= 1096
    mk = lambda st: st.replace(  # noqa: E731
        lm_valid=jnp.broadcast_to(hi, st.lm_valid.shape),
        lm_mean=st.lm_mean + 5.0,
        lm_cov=jnp.broadcast_to(0.5 * jnp.eye(3), st.lm_cov.shape) + 0.0,
    )
    st_x, st_p = mk(st_x), mk(st_p)
    st_x, _ = slam.measurement_core(st_x, obs)
    lw, lm, lc, ld, lv, lcnt, _ = _kernel_call_3d(slam, st_p, obs)
    np.testing.assert_array_equal(np.asarray(lv), np.asarray(st_x.lm_valid))
    np.testing.assert_allclose(
        np.asarray(lw), np.asarray(st_x.log_w), rtol=1e-3, atol=1e-2
    )


# ------------------------------------------------------------------- matcher
def check_match(n=300, mm=700):
    key = jax.random.PRNGKey(3)
    kq, kd, kv = jax.random.split(key, 3)
    qd = jax.random.randint(kq, (n, 8), 0, 2**31 - 1, jnp.int32).astype(
        jnp.uint32
    )
    db = jax.random.randint(kd, (mm, 8), 0, 2**31 - 1, jnp.int32).astype(
        jnp.uint32
    )
    dbv = jax.random.bernoulli(kv, 0.9, (mm,))
    bi_p, b1_p, b2_p = match.hamming_top2(qd, db, dbv, interpret=False)
    bi_x, b1_x, b2_x = match.hamming_top2_xla(qd, db, dbv)
    np.testing.assert_array_equal(np.asarray(b1_p), np.asarray(b1_x))
    np.testing.assert_array_equal(np.asarray(b2_p), np.asarray(b2_x))
    np.testing.assert_array_equal(np.asarray(bi_p), np.asarray(bi_x))


# ------------------------------------------------------------------ resample
def check_resample_gather():
    key = jax.random.PRNGKey(5)
    a = jax.random.normal(key, (256, 1536), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(6), (256,), 0, 256, jnp.int32)
    out = resample_pallas.gather_rows(a, idx, interpret=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(a)[np.asarray(idx)])


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev} (platform={dev.platform})")
    if dev.platform != "tpu":
        print("warning: default backend is not TPU; parity still checked "
              "with interpret=False on this backend")
    _check("ekf_update_2d fused kernel", check_2d)
    for model, dz in (("pinhole_3d", 2), ("stereo_3d", 3), ("equirect_3d", 2)):
        _check(f"ekf_update_3d[{model}]", lambda m=model, d=dz: check_3d(m, d))
    _check("ekf_update_3d odd capacity (Lp % chunk != 0)", check_odd_capacity)
    _check("hamming_top2 matcher", check_match)
    # multi-tile merge: N > TN(256), M > TM(4096) — the round-3 kernel read
    # back revisited output blocks here (unsupported on real TPUs)
    _check(
        "hamming_top2 matcher multi-tile", lambda: check_match(600, 9000)
    )
    _check("resample gather_rows", check_resample_gather)
    if FAILURES:
        print(f"\n{len(FAILURES)} parity check(s) FAILED: {FAILURES}")
        return 1
    print("\nall on-device parity checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
