"""all_to_all landmark-major -> camera-major observation reshard
(SURVEY.md §2b Ulysses analog) on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as shard_map_fn
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as shard_map_fn

from parakeet_slam_tpu.dist import reshard


class TestBucketBy:
    def test_buckets_and_overflow(self):
        dest = jnp.array([0, 1, 0, 2, 1, 0, 0], jnp.int32)
        rows = {"x": jnp.arange(7, dtype=jnp.float32)}
        out, valid, overflow = reshard.bucket_by(dest, rows, 3, capacity=3)
        assert out["x"].shape == (3, 3)
        v = np.asarray(valid)
        # bucket 0 has 4 rows, capacity 3 -> one overflow
        assert int(overflow) == 1
        assert v[0].sum() == 3 and v[1].sum() == 2 and v[2].sum() == 1
        # bucket contents preserve values (stable order)
        np.testing.assert_array_equal(
            np.asarray(out["x"][1])[v[1]], [1.0, 4.0]
        )


class TestAllToAllReshard:
    def test_landmark_to_camera_roundtrip(self):
        S = 8
        mesh = Mesh(np.array(jax.devices()[:S]), ("m",))
        O_l = 16      # landmark-major rows per shard
        CAP = 32      # camera-major capacity per (src, dst) bucket
        n_cams = 16
        cams_per_shard = n_cams // S
        key = jax.random.PRNGKey(0)
        obs_cam = jax.random.randint(key, (S * O_l,), 0, n_cams, jnp.int32)
        obs_pt = jnp.arange(S * O_l, dtype=jnp.int32)
        obs_uv = jax.random.normal(jax.random.fold_in(key, 1), (S * O_l, 2))
        obs_valid = jax.random.bernoulli(
            jax.random.fold_in(key, 2), 0.9, (S * O_l,)
        )

        def body(cam_l, pt_l, uv_l, valid_l):
            c, p, uv, v, ovf = reshard.reshard_landmark_to_camera(
                cam_l, pt_l, uv_l, valid_l,
                n_shards=S, cams_per_shard=cams_per_shard,
                capacity=CAP, axis_name="m",
            )
            return c, p, uv, v, ovf[None]

        fn = jax.jit(shard_map_fn(
            body, mesh=mesh,
            in_specs=(P("m"), P("m"), P("m"), P("m")),
            out_specs=(P("m"), P("m"), P("m"), P("m"), P("m")),
            check_vma=False,
        ))
        c2, p2, uv2, v2, ovf = fn(obs_cam, obs_pt, obs_uv, obs_valid)
        assert int(jnp.sum(ovf)) == 0

        c2, p2, uv2, v2 = map(np.asarray, (c2, p2, uv2, v2))
        obs_cam_n, obs_pt_n = np.asarray(obs_cam), np.asarray(obs_pt)
        obs_valid_n = np.asarray(obs_valid)

        # Every valid input row lands exactly once, on the shard owning its
        # camera.
        assert v2.sum() == obs_valid_n.sum()
        rows_per_shard = len(c2) // S
        for i in np.where(v2)[0]:
            shard = i // rows_per_shard
            assert c2[i] // cams_per_shard == shard
        # Row payloads survive the transpose intact (match by unique pt id).
        got = {int(p2[i]): (int(c2[i]), tuple(np.round(uv2[i], 5)))
               for i in np.where(v2)[0]}
        for r in np.where(obs_valid_n)[0]:
            assert int(obs_pt_n[r]) in got
            c_got, uv_got = got[int(obs_pt_n[r])]
            assert c_got == int(obs_cam_n[r])
