"""Measurement-model consistency: analytic Jacobians vs autodiff, init
inverts h, residual wrap behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_slam_tpu.core.config import FilterConfig, FrontendConfig
from parakeet_slam_tpu.core.geometry import quat_normalize
from parakeet_slam_tpu.filter import models


def _cfg(name, obs_dim, lm_dim, **kw):
    return FilterConfig(
        measurement_model=name, obs_dim=obs_dim, lm_dim=lm_dim,
        meas_noise=(0.1, 0.05, 0.1)[:max(obs_dim, 2)], **kw,
    )


CASES = [
    ("range_bearing_2d", 2, 2, 3),
    ("bearing_2d", 1, 2, 3),
    ("pinhole_3d", 2, 3, 7),
    ("stereo_3d", 3, 3, 7),
    ("equirect_3d", 2, 3, 7),
]


def _rand_pose(key, pose_dim):
    if pose_dim == 3:
        return jax.random.normal(key, (3,))
    t = jax.random.normal(key, (3,)) * 0.5
    q = quat_normalize(jax.random.normal(jax.random.fold_in(key, 1), (4,)))
    return jnp.concatenate([t, q])


def _rand_lm(key, pose, model, fe):
    """Sample a landmark in front of the sensor (valid for all models)."""
    if model.lm_dim == 2:
        ang = jax.random.uniform(key, (), minval=-1.0, maxval=1.0)
        r = jax.random.uniform(jax.random.fold_in(key, 1), (), minval=1.0, maxval=5.0)
        d = r * jnp.stack([jnp.cos(pose[2] + ang), jnp.sin(pose[2] + ang)])
        return pose[:2] + d
    from parakeet_slam_tpu.core import geometry

    p_c = jnp.array([0.3, -0.2, 3.0]) + 0.3 * jax.random.normal(key, (3,))
    return geometry.se3_apply(pose, p_c)


@pytest.mark.parametrize("name,obs_dim,lm_dim,pose_dim", CASES)
def test_jacobian_matches_autodiff(name, obs_dim, lm_dim, pose_dim):
    fe = FrontendConfig(baseline=0.5)
    cfg = _cfg(name, obs_dim, lm_dim)
    model = models.get_measurement_model(cfg, fe)
    for i in range(5):
        key = jax.random.PRNGKey(i)
        pose = _rand_pose(key, pose_dim)
        lm = _rand_lm(jax.random.fold_in(key, 7), pose, model, fe)
        H_analytic = model.jac(pose, lm)
        H_auto = jax.jacfwd(lambda l: model.h(pose, l))(lm)
        np.testing.assert_allclose(
            np.asarray(H_analytic), np.asarray(H_auto), rtol=2e-3, atol=2e-3
        )


@pytest.mark.parametrize("name,obs_dim,lm_dim,pose_dim", CASES)
def test_init_inverts_h(name, obs_dim, lm_dim, pose_dim):
    """h(pose, init(pose, z).mean) should reproduce z (up to range prior for
    bearing-only/monocular models, where only the observable part matches)."""
    fe = FrontendConfig(baseline=0.5)
    cfg = _cfg(name, obs_dim, lm_dim)
    model = models.get_measurement_model(cfg, fe)
    key = jax.random.PRNGKey(0)
    pose = _rand_pose(key, pose_dim)
    lm = _rand_lm(jax.random.fold_in(key, 3), pose, model, fe)
    z = model.h(pose, lm)
    mean, cov = model.init(pose, z)
    z2 = model.h(pose, mean)
    nu = model.residual(z, z2)
    if name in ("range_bearing_2d", "stereo_3d"):
        np.testing.assert_allclose(np.asarray(nu), 0.0, atol=1e-3)
    else:
        # depth-unobservable: bearing/pixel part still consistent
        np.testing.assert_allclose(np.asarray(nu), 0.0, atol=1.0)
    # covariance symmetric positive definite
    c = np.asarray(cov)
    np.testing.assert_allclose(c, c.T, atol=1e-5)
    assert np.all(np.linalg.eigvalsh(c) > 0)


def test_bearing_residual_wraps():
    cfg = _cfg("bearing_2d", 1, 2)
    model = models.get_measurement_model(cfg)
    nu = model.residual(jnp.array([3.1]), jnp.array([-3.1]))
    assert abs(float(nu[0])) < 0.2


def test_equirect_residual_wraps():
    fe = FrontendConfig(image_size=(512, 1024))
    cfg = _cfg("equirect_3d", 2, 3)
    model = models.get_measurement_model(cfg, fe)
    nu = model.residual(jnp.array([1020.0, 100.0]), jnp.array([4.0, 100.0]))
    assert abs(float(nu[0])) < 10.0  # wraps around the seam, not 1016 px


def test_motion_model_zero_noise_deterministic():
    pose = jnp.array([[1.0, 2.0, 0.5]] * 4)
    u = jnp.array([0.3, 0.0, 0.1])
    out = models.sample_odometry_2d(
        jax.random.PRNGKey(0), pose, u, (1e-9, 1e-9, 1e-9, 1e-9)
    )
    expected_x = 1.0 + 0.3 * np.cos(0.5)
    expected_y = 2.0 + 0.3 * np.sin(0.5)
    np.testing.assert_allclose(np.asarray(out[:, 0]), expected_x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[:, 1]), expected_y, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[:, 2]), 0.6, atol=1e-4)
