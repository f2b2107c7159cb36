"""Image pyramid for multi-scale detection (SURVEY.md §8 layer L2).

2x decimation with a pre-blur (aliasing control), all via reduce_window —
no gathers. `detect_pyramid` runs the detector per level and merges
keypoints back into level-0 coordinates with a per-level scale tag, under
one fixed total feature capacity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from parakeet_slam_tpu.frontend.describe import smooth
from parakeet_slam_tpu.frontend.detect import detect


def downsample2(img: jax.Array) -> jax.Array:
    """Blur + 2x2 average-pool decimation."""
    blurred = smooth(img, radius=1)
    H, W = blurred.shape
    H2, W2 = (H // 2) * 2, (W // 2) * 2
    return jax.lax.reduce_window(
        blurred[:H2, :W2], 0.0, jax.lax.add, (2, 2), (2, 2), "VALID"
    ) / 4.0


def build_pyramid(img: jax.Array, levels: int) -> list[jax.Array]:
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(downsample2(pyr[-1]))
    return pyr


@partial(jax.jit, static_argnames=("levels", "max_features", "detector", "nms_radius", "wrap_x"))
def detect_pyramid(
    img: jax.Array,
    levels: int = 3,
    max_features: int = 512,
    detector: str = "fast",
    threshold: float = 0.08,
    nms_radius: int = 4,
    wrap_x: bool = False,
):
    """Multi-scale detection. Returns (xy [K, 2] level-0 coords, score [K],
    level [K] int32, valid [K]) with K = max_features total across levels.
    Features are budgeted per level proportional to pixel count."""
    pyr = build_pyramid(img, levels)
    total_px = sum(p.size for p in pyr)
    xs, ss, ls, vs = [], [], [], []
    remaining = max_features
    for lvl, p in enumerate(pyr):
        if lvl == levels - 1:
            k = remaining
        else:
            k = max(8, int(max_features * p.size / total_px))
            k = min(k, remaining)
        remaining -= k
        if k <= 0:
            continue
        xy, score, valid = detect(
            p, max_features=k, detector=detector, threshold=threshold,
            nms_radius=max(1, nms_radius >> lvl), wrap_x=wrap_x,
        )
        scale = float(2**lvl)
        xs.append(xy * scale)
        ss.append(score)
        ls.append(jnp.full((k,), lvl, jnp.int32))
        vs.append(valid)
    return (
        jnp.concatenate(xs, axis=0),
        jnp.concatenate(ss, axis=0),
        jnp.concatenate(ls, axis=0),
        jnp.concatenate(vs, axis=0),
    )
