"""Stereo disparity for detected keypoints (KITTI config 3 path).

Per left-image keypoint, search a horizontal disparity range in the right
image by SAD block matching over a small patch — formulated as a dense
gather-free scan: for each candidate disparity d the right image is shifted
by d and patch SADs are computed for all keypoints at once (vmapped over
keypoints, scanned over disparities). Sub-pixel refinement by parabola fit
over the SAD minimum. Static shapes throughout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_disp", "patch"))
def keypoint_disparity(
    left: jax.Array,
    right: jax.Array,
    xy: jax.Array,
    valid: jax.Array,
    max_disp: int = 64,
    patch: int = 4,
):
    """Returns (disparity [K] float32, dvalid [K] bool).

    left/right [H, W] grayscale; xy [K, 2] (x, y) in the left image.
    """
    H, W = left.shape
    K = xy.shape[0]
    r = patch
    dy, dx = jnp.meshgrid(
        jnp.arange(-r, r + 1), jnp.arange(-r, r + 1), indexing="ij"
    )

    xi = jnp.round(xy[:, 0]).astype(jnp.int32)
    yi = jnp.round(xy[:, 1]).astype(jnp.int32)

    def patch_at(img, cx, cy):
        xs = jnp.clip(cx + dx, 0, W - 1)
        ys = jnp.clip(cy + dy, 0, H - 1)
        return jnp.take(img.reshape(-1), ys * W + xs)

    left_patches = jax.vmap(lambda cx, cy: patch_at(left, cx, cy))(xi, yi)  # [K, P, P]

    def sad_for_disp(d):
        rp = jax.vmap(lambda cx, cy: patch_at(right, cx - d, cy))(xi, yi)
        return jnp.sum(jnp.abs(left_patches - rp), axis=(1, 2))  # [K]

    sads = jax.vmap(sad_for_disp)(jnp.arange(max_disp))  # [D, K]
    best = jnp.argmin(sads, axis=0)                      # [K]
    best_sad = jnp.min(sads, axis=0)

    # sub-pixel parabola on (d-1, d, d+1)
    dm = jnp.clip(best - 1, 0, max_disp - 1)
    dp = jnp.clip(best + 1, 0, max_disp - 1)
    s0 = jnp.take_along_axis(sads, dm[None, :], axis=0)[0]
    s1 = best_sad
    s2 = jnp.take_along_axis(sads, dp[None, :], axis=0)[0]
    denom = s0 - 2 * s1 + s2
    offset = jnp.where(
        jnp.abs(denom) > 1e-6, 0.5 * (s0 - s2) / jnp.maximum(denom, 1e-6), 0.0
    )
    disp = best.astype(jnp.float32) + jnp.clip(offset, -1.0, 1.0)

    # validity: in-range, not at the search edge, decent contrast ratio
    patch_energy = jnp.sum(jnp.abs(left_patches), axis=(1, 2)) + 1e-6
    ok = (
        valid
        & (best > 0)
        & (best < max_disp - 1)
        & (xi - best >= -2)
        & (best_sad / patch_energy < 0.35)
    )
    return jnp.where(ok, disp, 0.0), ok
