"""Vision frontend tests: detection finds synthetic corners, descriptors are
stable/discriminative, camera models roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parakeet_slam_tpu.core.config import FrontendConfig
from parakeet_slam_tpu.frontend import camera as cam
from parakeet_slam_tpu.frontend.describe import describe
from parakeet_slam_tpu.frontend.detect import detect, fast_score, nms


def _square_grid(H=96, W=96, sq=10, pitch=24):
    """Isolated bright squares on black: their corners are L-junctions,
    which the FAST segment test is designed to fire on (X-corners like a
    checkerboard's are invisible to FAST by construction)."""
    img = np.zeros((H, W), np.float32)
    for y0 in range(12, H - sq, pitch):
        for x0 in range(12, W - sq, pitch):
            img[y0 : y0 + sq, x0 : x0 + sq] = 1.0
    return img


class TestDetect:
    def test_fast_finds_square_corners(self):
        img = jnp.asarray(_square_grid())
        xy, score, valid = detect(img, max_features=128, threshold=0.3)
        n = int(valid.sum())
        assert n >= 9  # 3x3 squares, at least one corner each
        # every detection is near a square corner (grid pitch 24, size 10)
        pts = np.asarray(xy)[np.asarray(valid)]
        corners = []
        for y0 in range(12, 96 - 10, 24):
            for x0 in range(12, 96 - 10, 24):
                corners += [
                    (x0, y0), (x0 + 9, y0), (x0, y0 + 9), (x0 + 9, y0 + 9)
                ]
        corners = np.array(corners, np.float32)
        d = np.min(
            np.linalg.norm(pts[:, None, :] - corners[None, :, :], axis=-1), axis=1
        )
        assert np.all(d <= 3.0)

    def test_blank_image_no_detections(self):
        img = jnp.zeros((64, 64))
        _, _, valid = detect(img, max_features=32, threshold=0.1)
        assert int(valid.sum()) == 0

    def test_nms_keeps_single_peak(self):
        score = jnp.zeros((32, 32)).at[10, 10].set(5.0).at[10, 12].set(3.0)
        out = nms(score, radius=3)
        assert float(out[10, 10]) == 5.0
        assert float(out[10, 12]) == 0.0

    def test_wrap_x_detects_at_seam(self):
        """A corner pattern straddling the azimuth seam is found only with
        wrap_x=True."""
        img = np.zeros((64, 64), np.float32)
        # bright square crossing the x=0/63 seam
        img[20:36, :8] = 1.0
        img[20:36, 56:] = 1.0
        j = jnp.asarray(img)
        _, _, v_wrap = detect(j, max_features=32, threshold=0.3, wrap_x=True)
        xy, _, v = detect(j, max_features=32, threshold=0.3, wrap_x=False)
        # with wrap, the seam corners (x near 0/63) are detectable
        assert int(v_wrap.sum()) >= int(v.sum())


class TestDescribe:
    def test_descriptor_deterministic_and_discriminative(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (96, 96)).astype(np.float32))
        xy = jnp.array([[40.0, 40.0], [41.0, 40.0], [70.0, 30.0]])
        valid = jnp.ones((3,), bool)
        d1 = describe(img, xy, valid)
        d2 = describe(img, xy, valid)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

        def ham(a, b):
            return int(
                jax.lax.population_count(jnp.bitwise_xor(a, b)).sum()
            )

        # neighboring keypoint: similar; distant keypoint: ~128 (random)
        assert ham(d1[0], d1[1]) < 60
        assert ham(d1[0], d1[2]) > 70

    def test_invalid_keypoints_zeroed(self):
        img = jnp.ones((64, 64)) * 0.5
        xy = jnp.array([[10.0, 10.0]])
        d = describe(img, xy, jnp.array([False]))
        np.testing.assert_array_equal(np.asarray(d), 0)

    def test_oriented_rotation_tolerance(self):
        """ORB-style steering: descriptor of a rotated patch stays closer to
        the original than an unrelated patch."""
        rng = np.random.default_rng(1)
        base = rng.uniform(0, 1, (41, 41)).astype(np.float32)
        from scipy.ndimage import rotate

        img0 = np.zeros((96, 96), np.float32)
        img0[28:69, 28:69] = base
        img90 = np.zeros((96, 96), np.float32)
        img90[28:69, 28:69] = rotate(base, 90, reshape=False, order=1)
        kp = jnp.array([[48.0, 48.0]])
        v = jnp.ones((1,), bool)
        d0 = describe(jnp.asarray(img0), kp, v, oriented=True)
        d90 = describe(jnp.asarray(img90), kp, v, oriented=True)
        rng2 = np.random.default_rng(2)
        other = describe(
            jnp.asarray(rng2.uniform(0, 1, (96, 96)).astype(np.float32)), kp, v,
            oriented=True,
        )

        def ham(a, b):
            return int(jax.lax.population_count(jnp.bitwise_xor(a, b)).sum())

        assert ham(d0[0], d90[0]) < ham(d0[0], other[0])


class TestCameras:
    def test_pinhole_roundtrip(self):
        c = cam.Pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
        p = jnp.array([[0.5, -0.3, 2.0], [0.1, 0.2, 5.0]])
        uv = c.project(p)
        back = c.unproject(uv, p[..., 2])
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), rtol=1e-5)

    def test_pinhole_jacobian(self):
        c = cam.Pinhole(500.0, 400.0, 320.0, 240.0, 640, 480)
        p = jnp.array([0.5, -0.3, 2.0])
        J = c.jac_project(p)
        J_auto = jax.jacfwd(c.project)(p)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), rtol=1e-4)

    def test_stereo_roundtrip(self):
        c = cam.Stereo(700.0, 700.0, 600.0, 180.0, 0.54, 1241, 376)
        p = jnp.array([[1.0, 0.5, 10.0]])
        uvd = c.project(p)
        back = c.unproject(uvd)
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), rtol=1e-5)

    def test_equirect_roundtrip_and_wrap(self):
        c = cam.Equirect(2048, 1024)
        p = jnp.array([[1.0, 0.5, 0.3], [-2.0, -0.1, 1.0]])
        uv = c.project(p)
        depth = jnp.linalg.norm(p, axis=-1)
        back = c.unproject(uv, depth)
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), rtol=1e-4, atol=1e-5)
        # wrap: residual across the seam is small
        r = c.residual(jnp.array([[2040.0, 100.0]]), jnp.array([[8.0, 100.0]]))
        assert abs(float(r[0, 0])) <= 16.0

    def test_from_config(self):
        fe = FrontendConfig(camera="equirect", image_size=(512, 1024))
        c = cam.from_config(fe)
        assert isinstance(c, cam.Equirect) and c.width == 1024
