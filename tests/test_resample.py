import jax
import jax.numpy as jnp
import numpy as np

from parakeet_slam_tpu.core.state import make_particle_state
from parakeet_slam_tpu.kernels import resample


def test_indices_uniform_weights_identity_like():
    P = 64
    log_w = jnp.zeros((P,))
    idx = resample.systematic_resample_indices(jax.random.PRNGKey(0), log_w)
    # uniform weights -> every particle kept exactly once
    np.testing.assert_array_equal(np.sort(np.asarray(idx)), np.arange(P))


def test_indices_concentrated_weight():
    P = 32
    log_w = jnp.full((P,), -1e9).at[7].set(0.0)
    idx = resample.systematic_resample_indices(jax.random.PRNGKey(1), log_w)
    np.testing.assert_array_equal(np.asarray(idx), 7)


def test_indices_proportional():
    """Counts match expected multiplicity within +-1 (systematic property)."""
    P = 1000
    w = np.random.default_rng(0).uniform(0.1, 1.0, P)
    log_w = jnp.log(jnp.asarray(w / w.sum()))
    idx = np.asarray(
        resample.systematic_resample_indices(jax.random.PRNGKey(2), log_w)
    )
    counts = np.bincount(idx, minlength=P)
    expected = P * w / w.sum()
    assert np.all(np.abs(counts - expected) <= 1.0 + 1e-6)


def test_gather_particles_moves_maps():
    state = make_particle_state(4, 8, lm_dim=2, sig_dim=2)
    state = state.replace(
        lm_mean=jnp.arange(4 * 8 * 2, dtype=jnp.float32).reshape(4, 8, 2),
        log_w=jnp.array([0.0, -1e9, -1e9, -1e9]),
        lm_valid=jnp.ones((4, 8), bool),
    )
    idx = jnp.array([0, 0, 0, 0])
    out = resample.gather_particles(state, idx)
    for p in range(4):
        np.testing.assert_array_equal(
            np.asarray(out.lm_mean[p]), np.asarray(state.lm_mean[0])
        )
    np.testing.assert_array_equal(np.asarray(out.log_w), 0.0)


def test_ess():
    assert float(resample.effective_sample_size(jnp.zeros(16))) == 16.0
    concentrated = jnp.full((16,), -1e9).at[0].set(0.0)
    assert float(resample.effective_sample_size(concentrated)) == 1.0
