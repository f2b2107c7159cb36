import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_slam_tpu.core import linalg


def _rand_psd(key, n, d):
    a = jax.random.normal(key, (n, d, d))
    return a @ jnp.swapaxes(a, -1, -2) + 0.1 * jnp.eye(d)


@pytest.mark.parametrize("d", [1, 2, 3])
def test_inv_psd_matches_numpy(d):
    m = _rand_psd(jax.random.PRNGKey(d), 64, d)
    inv, det = linalg.inv_psd(m)
    np.testing.assert_allclose(
        np.asarray(inv), np.linalg.inv(np.asarray(m)), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(det), np.linalg.det(np.asarray(m)), rtol=1e-3
    )


@pytest.mark.parametrize("d", [1, 2, 3])
def test_solve_psd(d):
    m = _rand_psd(jax.random.PRNGKey(10 + d), 32, d)
    b = jax.random.normal(jax.random.PRNGKey(20 + d), (32, d))
    x = linalg.solve_psd_small(m, b)
    np.testing.assert_allclose(
        np.asarray((m @ x[..., None])[..., 0]), np.asarray(b), rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize("d", [1, 2, 3])
def test_gaussian_loglik_matches_scipy(d):
    from scipy.stats import multivariate_normal

    m = _rand_psd(jax.random.PRNGKey(30 + d), 16, d)
    nu = jax.random.normal(jax.random.PRNGKey(40 + d), (16, d))
    ll = linalg.gaussian_loglik(m, nu)
    expected = [
        multivariate_normal.logpdf(np.asarray(nu[i]), np.zeros(d), np.asarray(m[i]))
        for i in range(16)
    ]
    np.testing.assert_allclose(np.asarray(ll), expected, rtol=1e-3, atol=1e-4)
