"""Shared in-kernel machinery for the fused FastSLAM measurement-update
kernels (2-D range-bearing + 3-D vision models): free-slot discovery and
the vectorized batched-association narrow phase.

Both kernels implement the v2 semantics documented in
`kernels/ekf_update.py`: parallel pre-frame association + per-lane
sequential composition. The helpers here operate on the kernels' shared
plane/narrow scratch layout ([Pt, Lp] landmark planes, [Pt, Zp] narrow
rows) and are traced INSIDE the Pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30
_BIG_LANE = 2**30


def fill_free_slots(fs_s, lv_o, lane_c, *, chunk, nca, hi_c, num_landmarks,
                    n_fs, obs_lane):
    """Fill fs_s[:, :n_fs] with the first n_fs free lanes in ascending
    order: holes (culled slots below the active watermark) by iterated
    masked-min, then the virgin tail [hi_c, ...) arithmetically. Ordering
    is identical to a per-observation first-free scan.

    The per-slot hole sweeps (n_fs full passes over the active planes —
    the single most expensive fixed cost of the v2 kernels) are guarded:
    one counting pass finds how many holes exist, and sweep j only runs
    when some particle actually has a j-th hole.  Maps without holes (the
    common case — holes only appear after culls) pay one pass total."""
    P = fs_s.shape[0]
    fs_s[:, :] = jnp.full(fs_s.shape, jnp.float32(_BIG_LANE))

    def count_chunk(c, acc):
        sl = pl.ds(c * chunk, chunk)
        lanes = lane_c + c * chunk
        free = (lv_o[:, sl] < 0.5) & (lanes < num_landmarks)
        return acc + jnp.sum(free.astype(jnp.float32), axis=1, keepdims=True)

    hcnt = jax.lax.fori_loop(
        0, nca, count_chunk, jnp.zeros((P, 1), jnp.float32), unroll=False
    )
    hmax = jnp.max(hcnt)
    # number of fs entries that will be holes, per particle (exact: the
    # iterated-min would find exactly min(hcnt, n_fs) holes)
    nhole = jnp.minimum(hcnt, float(n_fs))

    for j in range(n_fs):
        @pl.when(hmax > float(j))
        def _(j=j):
            prev = (
                jnp.full((P, 1), -1.0)
                if j == 0
                else fs_s[:, j - 1 : j]
            )

            def hole_chunk(c, best):
                sl = pl.ds(c * chunk, chunk)
                lanes = lane_c + c * chunk
                free = (
                    (lv_o[:, sl] < 0.5)
                    & (lanes < num_landmarks)
                    & (lanes.astype(jnp.float32) > prev)
                )
                cand = jnp.min(
                    jnp.where(free, lanes, _BIG_LANE), axis=1, keepdims=True
                ).astype(jnp.float32)
                return jnp.minimum(best, cand)

            best = jax.lax.fori_loop(
                0, nca, hole_chunk, jnp.full((P, 1), jnp.float32(_BIG_LANE)),
                unroll=False,
            )
            found = best < float(_BIG_LANE) / 2
            fs_s[:, j : j + 1] = jnp.where(found, best, fs_s[:, j : j + 1])

    tail_lane = hi_c.astype(jnp.float32) + (
        obs_lane.astype(jnp.float32) - nhole
    )
    use_tail = (
        (obs_lane.astype(jnp.float32) >= nhole)
        & (tail_lane < float(num_landmarks))
        & (obs_lane < n_fs)
    )
    fs_s[:, :] = jnp.where(use_tail, tail_lane, fs_s[:, :])


def associate(top_ll, top_ix, fs_s, tgt_s, new_s, done_s, vz_ref, obs_lane,
              *, num_obs, n_fs, log_p0):
    """Vectorized association decisions over [Pt, Zp] (no sequential obs
    loop): new-landmark test, free-slot allocation ranks in observation
    order, target lanes. Writes tgt_s/new_s/done_s; returns
    (valid_obs, is_new, ll1, n_assoc [Pt, 1])."""
    P = top_ll.shape[0]
    Z = num_obs
    vz = jnp.zeros(top_ll.shape, jnp.float32)
    for i in range(Z):
        vz = jnp.where(obs_lane == i, vz_ref[i].astype(jnp.float32), vz)
    valid_obs = vz > 0
    ll1 = top_ll[:, :]
    any_cand = ll1 > _NEG_INF / 2
    is_new = (ll1 < log_p0) | ~any_cand
    do_new = is_new & valid_obs
    newf = do_new.astype(jnp.float32)
    # exclusive allocation rank per obs (manual prefix sum, Z static steps)
    arank = jnp.zeros(top_ll.shape, jnp.float32)
    running = jnp.zeros((P, 1), jnp.float32)
    for i in range(Z):
        arank = jnp.where(obs_lane == i, running, arank)
        running = running + newf[:, i : i + 1]
    slot = jnp.full(top_ll.shape, jnp.float32(_BIG_LANE))
    for j in range(n_fs):
        slot = jnp.where(arank == j, fs_s[:, j : j + 1], slot)
    has_free = slot < float(_BIG_LANE) / 2
    do_alloc = do_new & has_free
    do_upd = ~is_new & valid_obs
    tgt = jnp.where(
        do_upd, top_ix[:, :], jnp.where(do_alloc, slot, jnp.float32(-1.0))
    )
    tgt_s[:, :] = tgt
    new_s[:, :] = do_new.astype(jnp.float32)
    done_s[:, :] = jnp.where(tgt >= 0.0, 0.0, 1.0)
    n_assoc = jnp.sum(
        (do_upd | do_alloc).astype(jnp.float32), axis=1, keepdims=True
    )
    return valid_obs, is_new, ll1, n_assoc
