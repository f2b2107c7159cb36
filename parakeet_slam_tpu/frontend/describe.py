"""Binary descriptors: BRIEF-256 / steered (ORB-style) BRIEF, packed uint32.

256 intensity-comparison pairs sampled once from a seeded Gaussian pattern
(classic BRIEF), evaluated on a box-smoothed image and packed to 8 uint32
words — the layout `kernels/match` consumes (XOR + popcount Hamming).
Rotation invariance ("orb" mode): per-keypoint orientation from the
intensity centroid of a patch, pattern rotated per keypoint before the
comparisons. All gathers are flat-index `jnp.take` on static-capacity
keypoint arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DESC_BITS = 256
DESC_WORDS = 8  # 256 / 32


def make_pattern(patch_half: int = 15, seed: int = 42) -> np.ndarray:
    """BRIEF sampling pattern [256, 4] = (ax, ay, bx, by), Gaussian, clipped."""
    rng = np.random.default_rng(seed)
    sigma = patch_half / 2.0
    pts = rng.normal(0.0, sigma, size=(DESC_BITS, 4))
    return np.clip(np.round(pts), -patch_half, patch_half).astype(np.float32)


_DEFAULT_PATTERN = make_pattern()


def smooth(img: jax.Array, radius: int = 2) -> jax.Array:
    """Box smoothing (separable reduce_window mean)."""
    w = 2 * radius + 1
    padded = jnp.pad(img.astype(jnp.float32), radius, mode="edge")
    s = jax.lax.reduce_window(padded, 0.0, jax.lax.add, (w, w), (1, 1), "VALID")
    return s / (w * w)


def _orientation(img, xy, patch_half):
    """Intensity-centroid orientation per keypoint (ORB): atan2(m01, m10)."""
    H, W = img.shape
    r = patch_half
    dy, dx = jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        indexing="ij",
    )
    # circular mask for isotropy
    mask = (dx * dx + dy * dy) <= r * r

    def one(kp):
        ys = jnp.clip(kp[1] + dy, 0, H - 1).astype(jnp.int32)
        xs = jnp.clip(kp[0] + dx, 0, W - 1).astype(jnp.int32)
        patch = jnp.take(img.reshape(-1), ys * W + xs) * mask
        m10 = jnp.sum(patch * dx)
        m01 = jnp.sum(patch * dy)
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(xy)


@partial(jax.jit, static_argnames=("oriented", "patch_half", "wrap_x"))
def describe(
    img: jax.Array,
    xy: jax.Array,
    valid: jax.Array,
    pattern: jax.Array | None = None,
    oriented: bool = False,
    patch_half: int = 15,
    wrap_x: bool = False,
):
    """BRIEF descriptors for keypoints.

    img [H, W] grayscale, xy [K, 2] (x, y) float. Returns packed [K, 8]
    uint32 (invalid keypoints get zero descriptors).
    """
    if pattern is None:
        pattern = jnp.asarray(_DEFAULT_PATTERN)
    H, W = img.shape
    smoothed = smooth(img)
    flat = smoothed.reshape(-1)

    if oriented:
        theta = _orientation(smoothed, xy, patch_half)  # [K]
        c, s = jnp.cos(theta), jnp.sin(theta)
        ax = c[:, None] * pattern[None, :, 0] - s[:, None] * pattern[None, :, 1]
        ay = s[:, None] * pattern[None, :, 0] + c[:, None] * pattern[None, :, 1]
        bx = c[:, None] * pattern[None, :, 2] - s[:, None] * pattern[None, :, 3]
        by = s[:, None] * pattern[None, :, 2] + c[:, None] * pattern[None, :, 3]
    else:
        K = xy.shape[0]
        ax = jnp.broadcast_to(pattern[None, :, 0], (K, DESC_BITS))
        ay = jnp.broadcast_to(pattern[None, :, 1], (K, DESC_BITS))
        bx = jnp.broadcast_to(pattern[None, :, 2], (K, DESC_BITS))
        by = jnp.broadcast_to(pattern[None, :, 3], (K, DESC_BITS))

    def sample(px, py):
        # px, py: [K, 256] absolute float coords
        if wrap_x:
            xs = jnp.mod(jnp.round(px).astype(jnp.int32), W)
        else:
            xs = jnp.clip(jnp.round(px).astype(jnp.int32), 0, W - 1)
        ys = jnp.clip(jnp.round(py).astype(jnp.int32), 0, H - 1)
        return jnp.take(flat, ys * W + xs)

    ia = sample(xy[:, 0:1] + ax, xy[:, 1:2] + ay)
    ib = sample(xy[:, 0:1] + bx, xy[:, 1:2] + by)
    bits = (ia < ib).astype(jnp.uint32)  # [K, 256]

    # pack 32 bits per word, LSB-first
    K = xy.shape[0]
    bits = bits.reshape(K, DESC_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
    return jnp.where(valid[:, None], words, 0)
