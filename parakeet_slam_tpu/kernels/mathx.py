"""Pallas-safe transcendental helpers.

Mosaic TPU lowering has no `atan2`/`arctan` primitive, but the FastSLAM
EKF kernel needs bearings. `atan2` here is the standard octant-reduced
polynomial evaluation: odd-power Chebyshev-fitted atan on [0, 1] (max err
~1e-7 rad, far below the ~0.02 rad bearing noise floor), plus quadrant
fix-ups — all ops (mul/add/div/abs/where/floor) lower fine on the VPU.
Used by both the Pallas kernel and (for bit-parity testing) its XLA twin.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_PI = float(np.pi)


def _fit_atan_coeffs(terms: int = 8) -> np.ndarray:
    """Least-squares fit of atan(x) on [0, 1] over odd powers x^1..x^(2T-1)."""
    x = np.linspace(0.0, 1.0, 4096)[1:]
    powers = np.stack([x ** (2 * k + 1) for k in range(terms)], axis=1)
    coeffs, *_ = np.linalg.lstsq(powers, np.arctan(x), rcond=None)
    return coeffs.astype(np.float32)


_ATAN_COEFFS = _fit_atan_coeffs()


def _atan01(a):
    """atan(a) for a in [0, 1] via the fitted odd polynomial (Horner)."""
    s = a * a
    acc = jnp.full_like(a, float(_ATAN_COEFFS[-1]))
    for c in _ATAN_COEFFS[-2::-1]:
        acc = acc * s + float(c)
    return acc * a


def atan2(y, x):
    """Pallas-safe atan2 matching jnp.arctan2 semantics to ~1e-6 rad."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    a = lo / jnp.maximum(hi, 1e-30)
    r = _atan01(a)
    r = jnp.where(ay > ax, _PI / 2 - r, r)
    r = jnp.where(x < 0, _PI - r, r)
    r = jnp.where(y < 0, -r, r)
    # atan2(0, x<0) = pi (the y<0 flip above keeps +pi for +0)
    return jnp.where((ay == 0) & (x >= 0), jnp.zeros_like(r), r)


def wrap_angle(a):
    """Wrap to [-pi, pi) without atan2 (floor-based, Pallas-safe)."""
    return a - 2.0 * _PI * jnp.floor((a + _PI) / (2.0 * _PI))
