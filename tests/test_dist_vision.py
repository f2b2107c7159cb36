"""Sharded filter x 3-D vision models x fused Pallas kernel: the panoramic
production path (config 5) — particle axis sharded over 8 virtual devices,
measurement update routed through kernels/ekf_update_3d (interpret mode on
CPU), ring-permute resampling."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from parakeet_slam_tpu.dist.mesh import make_mesh
from parakeet_slam_tpu.dist.sharded_filter import ShardedFastSLAM
from parakeet_slam_tpu.filter import FastSLAM
from tests.test_ekf3d_kernel import _cfgs, _rand_obs, _scatter_poses


def _run(use_pallas: bool, frames=3):
    fc, fe = _cfgs("equirect_3d", 2)
    fc = dataclasses.replace(
        fc, num_particles=16, max_landmarks=32, use_pallas=use_pallas,
    )
    slam = FastSLAM(fc, fe)
    mesh = make_mesh(n_devices=8)
    sharded = ShardedFastSLAM(slam, mesh)
    state = sharded.init_state()
    state = state.replace(pose=_scatter_poses(jax.random.PRNGKey(0), 16))
    u = jnp.zeros((6,))
    for f in range(frames):
        obs = _rand_obs(
            jax.random.PRNGKey(300 + f), "equirect_3d", 2, 4, 4, fc.desc_words
        )
        state, metrics = sharded.step(state, u, obs, jax.random.PRNGKey(f))
    return state, metrics


class TestShardedVisionKernel:
    def test_pallas_matches_xla_under_shard_map(self):
        st_p, m_p = _run(use_pallas=True)
        st_x, m_x = _run(use_pallas=False)
        np.testing.assert_array_equal(
            np.asarray(st_p.lm_valid), np.asarray(st_x.lm_valid)
        )
        np.testing.assert_allclose(
            np.asarray(st_p.log_w), np.asarray(st_x.log_w), rtol=1e-3,
            atol=1e-2,
        )
        vm = np.asarray(st_x.lm_valid)
        np.testing.assert_allclose(
            np.asarray(st_p.lm_mean)[vm], np.asarray(st_x.lm_mean)[vm],
            rtol=1e-3, atol=1e-3,
        )
        assert np.isfinite(float(m_p.ess))
        assert int(np.asarray(st_p.lm_valid).sum()) > 0
