import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_slam_tpu.core import geometry as g


def rand_se2(key, n):
    k1, k2 = jax.random.split(key)
    xy = jax.random.normal(k1, (n, 2)) * 5
    th = jax.random.uniform(k2, (n,), minval=-np.pi, maxval=np.pi)
    return jnp.concatenate([xy, th[:, None]], axis=-1)


def rand_se3(key, n):
    k1, k2 = jax.random.split(key)
    t = jax.random.normal(k1, (n, 3)) * 5
    q = g.quat_normalize(jax.random.normal(k2, (n, 4)))
    return jnp.concatenate([t, q], axis=-1)


class TestSE2:
    def test_compose_inverse_identity(self):
        p = rand_se2(jax.random.PRNGKey(0), 32)
        ident = g.se2_compose(p, g.se2_inverse(p))
        np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-5)

    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
        xi = xi.at[:, 2].multiply(0.5)
        np.testing.assert_allclose(
            np.asarray(g.se2_log(g.se2_exp(xi))), np.asarray(xi), atol=1e-5
        )

    def test_exp_small_angle(self):
        xi = jnp.array([[0.1, -0.2, 1e-9], [0.1, -0.2, 0.0]])
        out = g.se2_exp(xi)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-6)

    def test_apply_roundtrip(self):
        key = jax.random.PRNGKey(2)
        p = rand_se2(key, 8)
        pts = jax.random.normal(jax.random.PRNGKey(3), (8, 2))
        back = g.se2_apply_inverse(p, g.se2_apply(p, pts))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)

    def test_between(self):
        a = rand_se2(jax.random.PRNGKey(4), 8)
        b = rand_se2(jax.random.PRNGKey(5), 8)
        rel = g.se2_between(a, b)
        np.testing.assert_allclose(
            np.asarray(g.se2_compose(a, rel)), np.asarray(b), atol=1e-5
        )


class TestQuaternion:
    def test_rotate_matches_matrix(self):
        q = g.quat_normalize(jax.random.normal(jax.random.PRNGKey(0), (16, 4)))
        v = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
        r1 = g.quat_rotate(q, v)
        r2 = (g.quat_to_matrix(q) @ v[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)

    def test_matrix_quat_roundtrip(self):
        q = g.quat_normalize(jax.random.normal(jax.random.PRNGKey(2), (64, 4)))
        q2 = g.matrix_to_quat(g.quat_to_matrix(q))
        # q and -q are the same rotation
        dot = jnp.abs(jnp.sum(q * q2, axis=-1))
        np.testing.assert_allclose(np.asarray(dot), 1.0, atol=1e-5)

    def test_matrix_quat_near_identity_and_pi(self):
        eye = jnp.eye(3)[None]
        q = g.matrix_to_quat(eye)
        np.testing.assert_allclose(np.asarray(q[0]), [0, 0, 0, 1], atol=1e-6)
        # 180-degree rotation about x: trace = -1, exercises pivot selection
        m = jnp.diag(jnp.array([1.0, -1.0, -1.0]))[None]
        q = g.matrix_to_quat(m)
        np.testing.assert_allclose(jnp.abs(q[0]), [1, 0, 0, 0], atol=1e-6)


class TestSE3:
    def test_compose_inverse(self):
        p = rand_se3(jax.random.PRNGKey(0), 16)
        ident = g.se3_compose(p, g.se3_inverse(p))
        np.testing.assert_allclose(np.asarray(ident[:, :3]), 0.0, atol=1e-4)
        np.testing.assert_allclose(
            np.abs(np.asarray(ident[:, 6])), 1.0, atol=1e-5
        )

    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(1), (32, 6))
        xi = xi.at[:, 3:].multiply(0.4)
        np.testing.assert_allclose(
            np.asarray(g.se3_log(g.se3_exp(xi))), np.asarray(xi), atol=1e-4
        )

    def test_exp_zero(self):
        p = g.se3_exp(jnp.zeros((1, 6)))
        np.testing.assert_allclose(np.asarray(p[0]), [0, 0, 0, 0, 0, 0, 1], atol=1e-6)

    def test_apply_roundtrip(self):
        p = rand_se3(jax.random.PRNGKey(2), 8)
        pts = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
        back = g.se3_apply_inverse(p, g.se3_apply(p, pts))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)

    def test_se2_lift(self):
        p2 = rand_se2(jax.random.PRNGKey(4), 8)
        p3 = g.se2_to_se3(p2)
        pts = jnp.concatenate(
            [jax.random.normal(jax.random.PRNGKey(5), (8, 2)), jnp.zeros((8, 1))],
            axis=-1,
        )
        out2 = g.se2_apply(p2, pts[:, :2])
        out3 = g.se3_apply(p3, pts)
        np.testing.assert_allclose(np.asarray(out3[:, :2]), np.asarray(out2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out3[:, 2]), 0.0, atol=1e-6)


class TestUmeyama:
    @pytest.mark.parametrize("with_scale", [False, True])
    def test_recovers_transform(self, with_scale):
        key = jax.random.PRNGKey(0)
        src = jax.random.normal(key, (50, 3))
        q = g.quat_normalize(jnp.array([0.1, -0.3, 0.2, 0.9]))
        R_true = g.quat_to_matrix(q)
        s_true = 1.7 if with_scale else 1.0
        t_true = jnp.array([1.0, -2.0, 0.5])
        dst = s_true * src @ R_true.T + t_true
        s, R, t = g.umeyama(src, dst, with_scale=with_scale)
        aligned = s * src @ R.T + t
        np.testing.assert_allclose(np.asarray(aligned), np.asarray(dst), atol=1e-4)


class TestAngles:
    def test_wrap(self):
        th = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 7.0, -7.0])
        w = g.wrap_angle(th)
        assert np.all(np.abs(np.asarray(w)) <= np.pi + 1e-6)
        np.testing.assert_allclose(np.sin(np.asarray(w)), np.sin(np.asarray(th)), atol=1e-6)
