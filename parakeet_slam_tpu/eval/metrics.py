"""Trajectory evaluation: ATE / RPE (standard SLAM metrics, SURVEY.md §2c).

ATE RMSE follows the TUM benchmark convention: rigid (optionally Sim(3))
Umeyama alignment of estimated to ground-truth positions, then RMSE of the
residual translations. Pure JAX so it runs on any backend.
"""

from __future__ import annotations

import jax.numpy as jnp

from parakeet_slam_tpu.core.geometry import umeyama, wrap_angle


def ate_rmse(est_xy, gt_xy, with_scale: bool = False):
    """Absolute trajectory error RMSE after Umeyama alignment.

    est_xy, gt_xy: [T, D] positions (D = 2 or 3). Returns scalar RMSE.
    """
    est_xy = jnp.asarray(est_xy)
    gt_xy = jnp.asarray(gt_xy)
    s, R, t = umeyama(est_xy, gt_xy, with_scale=with_scale)
    aligned = s * est_xy @ R.T + t
    err = aligned - gt_xy
    return jnp.sqrt(jnp.mean(jnp.sum(err * err, axis=-1)))


def rpe_rmse(est_pose, gt_pose, delta: int = 1):
    """Relative pose error (translation RMSE) over stride `delta` for SE(2)
    pose arrays [T, 3]."""
    est_pose = jnp.asarray(est_pose)
    gt_pose = jnp.asarray(gt_pose)

    def rel(p):
        a, b = p[:-delta], p[delta:]
        c, s = jnp.cos(a[:, 2]), jnp.sin(a[:, 2])
        dx = b[:, 0] - a[:, 0]
        dy = b[:, 1] - a[:, 1]
        return jnp.stack(
            [c * dx + s * dy, -s * dx + c * dy, wrap_angle(b[:, 2] - a[:, 2])], axis=1
        )

    d = rel(est_pose) - rel(gt_pose)
    return jnp.sqrt(jnp.mean(d[:, 0] ** 2 + d[:, 1] ** 2))
