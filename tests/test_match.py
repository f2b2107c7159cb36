"""Descriptor matcher tests: Pallas kernel vs XLA reference + ratio logic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_slam_tpu.kernels import match as m


def _rand_desc(key, n, w=8):
    return jax.random.randint(key, (n, w), 0, 2**31 - 1, dtype=jnp.int32).astype(
        jnp.uint32
    )


class TestHamming:
    def test_xla_distance_simple(self):
        a = jnp.array([[0b1010]], dtype=jnp.uint32)
        b = jnp.array([[0b0110], [0b1010]], dtype=jnp.uint32)
        d = m.hamming_distance_xla(a, b)
        np.testing.assert_array_equal(np.asarray(d), [[2, 0]])

    @pytest.mark.parametrize("n,mm", [(5, 7), (128, 128), (200, 300)])
    def test_pallas_matches_xla(self, n, mm):
        kq, kd = jax.random.split(jax.random.PRNGKey(n * 1000 + mm))
        qd = _rand_desc(kq, n)
        db = _rand_desc(kd, mm)
        valid = jnp.arange(mm) % 5 != 3  # some invalid entries
        bi_x, b1_x, b2_x = m.hamming_top2_xla(qd, db, valid)
        bi_p, b1_p, b2_p = m.hamming_top2(qd, db, valid, interpret=True)
        np.testing.assert_array_equal(np.asarray(b1_x), np.asarray(b1_p))
        np.testing.assert_array_equal(np.asarray(b2_x), np.asarray(b2_p))
        # best index may differ only on exact ties
        ties = np.asarray(b1_x) == np.asarray(b2_x)
        np.testing.assert_array_equal(
            np.asarray(bi_x)[~ties], np.asarray(bi_p)[~ties]
        )

    def test_pallas_multi_tile_merge(self):
        """N > TN(256) and M > TM(4096) exercises the cross-tile top-2
        merge — the round-3 kernel read back revisited output blocks here
        (unsupported on real TPUs -> stale merges; advisor r3 high)."""
        kq, kd = jax.random.split(jax.random.PRNGKey(99))
        n, mm = 272, 4224  # 2 query tiles x 2 db tiles
        qd = _rand_desc(kq, n)
        db = _rand_desc(kd, mm)
        valid = jnp.arange(mm) % 7 != 3
        bi_x, b1_x, b2_x = m.hamming_top2_xla(qd, db, valid)
        bi_p, b1_p, b2_p = m.hamming_top2(qd, db, valid, interpret=True)
        np.testing.assert_array_equal(np.asarray(b1_x), np.asarray(b1_p))
        np.testing.assert_array_equal(np.asarray(b2_x), np.asarray(b2_p))
        ties = np.asarray(b1_x) == np.asarray(b2_x)
        np.testing.assert_array_equal(
            np.asarray(bi_x)[~ties], np.asarray(bi_p)[~ties]
        )

    def test_identical_descriptor_found(self):
        key = jax.random.PRNGKey(0)
        db = _rand_desc(key, 64)
        qd = db[10:13]
        bi, b1, b2 = m.hamming_top2(qd, db, jnp.ones(64, bool), interpret=True)
        np.testing.assert_array_equal(np.asarray(bi), [10, 11, 12])
        np.testing.assert_array_equal(np.asarray(b1), 0)


class TestL2:
    def test_l2_matches_bruteforce(self):
        kq, kd = jax.random.split(jax.random.PRNGKey(3))
        q = jax.random.normal(kq, (10, 32))
        d = jax.random.normal(kd, (20, 32))
        dist = m.l2_distance_xla(q, d)
        expected = np.sum(
            (np.asarray(q)[:, None, :] - np.asarray(d)[None, :, :]) ** 2, axis=-1
        )
        np.testing.assert_allclose(np.asarray(dist), expected, rtol=1e-3, atol=1e-3)


class TestMatchFrontDoor:
    def test_ratio_test_rejects_ambiguous(self):
        base = _rand_desc(jax.random.PRNGKey(1), 1)
        # db: two near-identical entries (ambiguous) + distinct ones
        db = jnp.concatenate([base, base, _rand_desc(jax.random.PRNGKey(2), 6)])
        idx, dist = m.match(
            base, jnp.ones(1, bool), db, jnp.ones(8, bool),
            use_pallas=True, interpret=True,
        )
        assert int(idx[0]) == -1  # best==second -> ratio test fails

    def test_unique_match_accepted(self):
        db = _rand_desc(jax.random.PRNGKey(4), 32)
        q = db[5:6]
        idx, dist = m.match(
            q, jnp.ones(1, bool), db, jnp.ones(32, bool),
            use_pallas=True, interpret=True,
        )
        assert int(idx[0]) == 5
        assert int(dist[0]) == 0

    def test_invalid_query_rejected(self):
        db = _rand_desc(jax.random.PRNGKey(5), 16)
        idx, _ = m.match(
            db[:2], jnp.array([True, False]), db, jnp.ones(16, bool),
            use_pallas=True, interpret=True,
        )
        assert int(idx[1]) == -1
