"""all_to_all resharding between landmark-major and camera-major
observation layouts — the SLAM analog of Ulysses-style sequence-parallel
head/sequence resharding (SURVEY.md §2b / §6 "long context").

Distributed BA (dist/dist_ba.py) keeps observations landmark-major: shard s
owns point block s and every observation of those points, so C⁻¹ and the
point back-substitution are shard-local while camera-side products are
psum-assembled. Some phases want the TRANSPOSED layout instead — camera-
major, where shard s owns camera block s and every observation OF those
cameras (per-camera Schur blocks, covisibility counting, keyframe-window
extraction). Moving between the two is a single `jax.lax.all_to_all` on a
[S, O_bucket] bucketed layout: every shard splits its rows by destination
bucket and the collective transposes shard <-> bucket in one shot — the
same total bytes as an all_gather but with each shard receiving only what
it owns.

`bucket_by` does the shard-local bucketing with static capacity (masked,
jit-safe); `all_to_all_rows` wraps the collective for a pytree of row
arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bucket_by(dest: jax.Array, rows, n_buckets: int, capacity: int):
    """Scatter rows into [n_buckets, capacity] by destination id.

    dest [N] int32 in [0, n_buckets); rows: pytree of [N, ...] arrays.
    Returns (bucketed pytree of [n_buckets, capacity, ...], valid mask
    [n_buckets, capacity], overflow count [scalar]). Rows beyond a bucket's
    capacity are dropped and counted in overflow (callers size capacity so
    this is zero; it is reported, never silent).
    """
    N = dest.shape[0]
    # Rank of each row within its destination bucket (stable order).
    order = jnp.argsort(dest, stable=True)
    sorted_dest = dest[order]
    start = jnp.searchsorted(sorted_dest, jnp.arange(n_buckets))
    rank_sorted = jnp.arange(N) - start[sorted_dest]
    rank = jnp.zeros((N,), jnp.int32).at[order].set(rank_sorted.astype(jnp.int32))

    keep = rank < capacity
    overflow = jnp.sum(~keep)
    flat_idx = jnp.where(keep, dest * capacity + rank, n_buckets * capacity)

    def scatter(a):
        out = jnp.zeros((n_buckets * capacity + 1,) + a.shape[1:], a.dtype)
        out = out.at[flat_idx].set(a)
        return out[:-1].reshape((n_buckets, capacity) + a.shape[1:])

    bucketed = jax.tree_util.tree_map(scatter, rows)
    valid = jnp.zeros((n_buckets * capacity + 1,), bool).at[flat_idx].set(
        True
    )[:-1].reshape(n_buckets, capacity)
    return bucketed, valid, overflow


def all_to_all_rows(bucketed, axis_name: str):
    """Inside shard_map: transpose bucket <-> shard.

    bucketed: pytree of [S, C, ...] (bucket-major on each shard). Returns
    the same pytree where this shard now holds the rows every OTHER shard
    bucketed for it: out[s, c] = bucketed_on_shard_s[me, c].
    """
    return jax.tree_util.tree_map(
        lambda a: jax.lax.all_to_all(a, axis_name, 0, 0, tiled=False),
        bucketed,
    )


def reshard_landmark_to_camera(
    obs_cam, obs_pt, obs_uv, obs_valid, *, n_shards: int, cams_per_shard: int,
    capacity: int, axis_name: str,
):
    """Inside shard_map on the map axis: take this shard's landmark-major
    observation rows and return the camera-major rows it owns (cameras
    [me*cams_per_shard, (me+1)*cams_per_shard)).

    Returns (obs_cam, obs_pt, obs_uv, valid [S*C]) flattened back to rows,
    plus the overflow count from bucketing.
    """
    dest = jnp.clip(obs_cam // cams_per_shard, 0, n_shards - 1)
    # Invalid rows route to shard 0's bucket but carry valid=False through.
    rows = {"cam": obs_cam, "pt": obs_pt, "uv": obs_uv,
            "v": obs_valid.astype(jnp.int32)}
    bucketed, slot_valid, overflow = bucket_by(
        jnp.where(obs_valid, dest, 0), rows, n_shards, capacity
    )
    keep = slot_valid & (bucketed["v"] > 0)

    out = all_to_all_rows(bucketed, axis_name)
    keep_t = all_to_all_rows({"v": keep}, axis_name)["v"]
    S, C = keep_t.shape
    return (
        out["cam"].reshape(S * C),
        out["pt"].reshape(S * C),
        out["uv"].reshape(S * C, -1),
        keep_t.reshape(S * C),
        overflow,
    )
