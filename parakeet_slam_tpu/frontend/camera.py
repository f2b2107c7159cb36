"""Camera models: pinhole, stereo, equirectangular — batched project /
unproject shared by the frontend, the filter's measurement models, and the
BA backend's reprojection residuals.

All functions are shape-polymorphic over leading batch dims and jit-safe.
Points are in the CAMERA frame here; world<->camera transforms live in
`core/geometry` (SE(3)) so the same projections serve per-particle filters
and per-keyframe BA.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Pinhole:
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    def project(self, p: jax.Array) -> jax.Array:
        """[..., 3] camera-frame points -> [..., 2] pixels."""
        z = jnp.clip(p[..., 2], 1e-3)
        u = self.fx * p[..., 0] / z + self.cx
        v = self.fy * p[..., 1] / z + self.cy
        return jnp.stack([u, v], axis=-1)

    def unproject(self, uv: jax.Array, depth: jax.Array) -> jax.Array:
        """[..., 2] pixels + [...] depths -> [..., 3] camera-frame points."""
        x = (uv[..., 0] - self.cx) / self.fx * depth
        y = (uv[..., 1] - self.cy) / self.fy * depth
        return jnp.stack([x, y, depth], axis=-1)

    def in_image(self, uv: jax.Array, margin: float = 0.0) -> jax.Array:
        return (
            (uv[..., 0] >= margin)
            & (uv[..., 0] < self.width - margin)
            & (uv[..., 1] >= margin)
            & (uv[..., 1] < self.height - margin)
        )

    def jac_project(self, p: jax.Array) -> jax.Array:
        """d project / d p_cam, [..., 2, 3]."""
        z = jnp.clip(p[..., 2], 1e-3)
        zero = jnp.zeros_like(z)
        row_u = jnp.stack([self.fx / z, zero, -self.fx * p[..., 0] / (z * z)], axis=-1)
        row_v = jnp.stack([zero, self.fy / z, -self.fy * p[..., 1] / (z * z)], axis=-1)
        return jnp.stack([row_u, row_v], axis=-2)


@dataclass(frozen=True)
class Stereo:
    """Rectified stereo: z = (u_left, v, disparity)."""

    fx: float
    fy: float
    cx: float
    cy: float
    baseline: float
    width: int
    height: int

    def project(self, p: jax.Array) -> jax.Array:
        z = jnp.clip(p[..., 2], 1e-3)
        u = self.fx * p[..., 0] / z + self.cx
        v = self.fy * p[..., 1] / z + self.cy
        d = self.fx * self.baseline / z
        return jnp.stack([u, v, d], axis=-1)

    def unproject(self, uvd: jax.Array) -> jax.Array:
        depth = self.fx * self.baseline / jnp.clip(uvd[..., 2], 1e-3)
        x = (uvd[..., 0] - self.cx) / self.fx * depth
        y = (uvd[..., 1] - self.cy) / self.fy * depth
        return jnp.stack([x, y, depth], axis=-1)

    def in_image(self, uvd: jax.Array, margin: float = 0.0) -> jax.Array:
        return (
            (uvd[..., 0] >= margin)
            & (uvd[..., 0] < self.width - margin)
            & (uvd[..., 1] >= margin)
            & (uvd[..., 1] < self.height - margin)
            & (uvd[..., 2] > 0)
        )

    def jac_project(self, p: jax.Array) -> jax.Array:
        """d project / d p_cam, [..., 3, 3]."""
        z = jnp.clip(p[..., 2], 1e-3)
        iz = 1.0 / z
        iz2 = iz * iz
        zero = jnp.zeros_like(z)
        row_u = jnp.stack([self.fx * iz, zero, -self.fx * p[..., 0] * iz2], axis=-1)
        row_v = jnp.stack([zero, self.fy * iz, -self.fy * p[..., 1] * iz2], axis=-1)
        row_d = jnp.stack([zero, zero, -self.fx * self.baseline * iz2], axis=-1)
        return jnp.stack([row_u, row_v, row_d], axis=-2)


@dataclass(frozen=True)
class Equirect:
    """Equirectangular panoramic camera; u wraps in azimuth."""

    width: int
    height: int

    def project(self, p: jax.Array) -> jax.Array:
        r = jnp.linalg.norm(p, axis=-1) + 1e-9
        az = jnp.arctan2(p[..., 1], p[..., 0])
        el = jnp.arcsin(jnp.clip(p[..., 2] / r, -1.0, 1.0))
        u = (az + jnp.pi) / (2 * jnp.pi) * self.width
        v = (jnp.pi / 2 - el) / jnp.pi * self.height
        return jnp.stack([u, v], axis=-1)

    def unproject(self, uv: jax.Array, depth: jax.Array) -> jax.Array:
        az = uv[..., 0] / self.width * 2 * jnp.pi - jnp.pi
        el = jnp.pi / 2 - uv[..., 1] / self.height * jnp.pi
        ray = jnp.stack(
            [
                jnp.cos(el) * jnp.cos(az),
                jnp.cos(el) * jnp.sin(az),
                jnp.sin(el),
            ],
            axis=-1,
        )
        return ray * depth[..., None]

    def residual(self, uv_obs: jax.Array, uv_pred: jax.Array) -> jax.Array:
        """Pixel residual with azimuth wrap-around on u."""
        du = uv_obs[..., 0] - uv_pred[..., 0]
        du = du - self.width * jnp.round(du / self.width)
        return jnp.stack([du, uv_obs[..., 1] - uv_pred[..., 1]], axis=-1)

    def in_image(self, uv: jax.Array, margin: float = 0.0) -> jax.Array:
        return (uv[..., 1] >= margin) & (uv[..., 1] < self.height - margin)

    def jac_project(self, p: jax.Array) -> jax.Array:
        """d project / d p_cam, [..., 2, 3] (u-wrap is measure-zero)."""
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        rho2 = x * x + y * y + 1e-9
        r2 = rho2 + z * z
        rho = jnp.sqrt(rho2)
        ku = self.width / (2.0 * jnp.pi)
        kv = self.height / jnp.pi
        zero = jnp.zeros_like(x)
        row_u = jnp.stack([-ku * y / rho2, ku * x / rho2, zero], axis=-1)
        s = kv / (r2 * rho)
        row_v = jnp.stack([x * z * s, y * z * s, -rho2 * s], axis=-1)
        return jnp.stack([row_u, row_v], axis=-2)


def from_config(fe_cfg):
    """Build the camera model named in a FrontendConfig."""
    H, W = fe_cfg.image_size
    if fe_cfg.camera == "pinhole":
        fx, fy, cx, cy = fe_cfg.intrinsics[:4]
        return Pinhole(fx, fy, cx, cy, W, H)
    if fe_cfg.camera == "stereo":
        fx, fy, cx, cy = fe_cfg.intrinsics[:4]
        return Stereo(fx, fy, cx, cy, fe_cfg.baseline, W, H)
    if fe_cfg.camera == "equirect":
        return Equirect(W, H)
    raise KeyError(f"unknown camera {fe_cfg.camera!r}")
