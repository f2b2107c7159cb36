"""Pallas resampling gather: copy whole particle payloads by index.

SURVEY.md §3 "Resampling": after systematic index selection, each surviving
particle's ENTIRE state — pose plus its full landmark map (means, covs,
signatures, descriptors, masks, counters) — is copied to its new slot. At
[P=2048, Lmax=10k] that is ~1.7 GB of pure data movement: a bandwidth-bound
gather with zero compute.

Kernel shape: `PrefetchScalarGridSpec` with the resampling indices as the
scalar-prefetch argument; the input BlockSpec's index_map reads `idx[i]`,
so the Mosaic pipeliner turns the whole gather into double-buffered
HBM->HBM row DMAs chosen per grid step — no VPU work at all. One
pallas_call per state leaf (leaves flattened to [P, K] rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, in_ref, out_ref):
    del idx_ref  # consumed by the index_map, not the body
    out_ref[:, :, :] = in_ref[:, :, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(a: jax.Array, idx: jax.Array, interpret: bool = False):
    """out[i, :] = a[idx[i], :] for a [P, K], idx [P] int32.

    Rows are viewed as [P, 1, K] so the (1, 1, K) row block satisfies the
    Mosaic tiling rule (last two block dims equal the array dims).
    """
    P, K = a.shape
    a3 = a.reshape(P, 1, K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, K), lambda i, idx_ref: (idx_ref[i], 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, K), lambda i, idx_ref: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 1, K), a.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), a3)
    return out.reshape(P, K)


def gather_state(state, idx: jax.Array, interpret: bool | None = None):
    """Gather every leaf of a ParticleState-like pytree along axis 0.

    Leaves are viewed as [P, K] rows (trailing dims flattened); bool leaves
    ride as int8 through the kernel. Falls back to interpret mode off-TPU.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    def gather_leaf(a):
        P = a.shape[0]
        trailing = a.shape[1:]
        flat = a.reshape(P, -1)
        if flat.shape[1] == 0:
            return a  # zero-width leaf (e.g. desc_words=0)
        if a.dtype == jnp.bool_:
            out = gather_rows(flat.astype(jnp.int8), idx, interpret=interpret)
            return out.astype(jnp.bool_).reshape(P, *trailing)
        out = gather_rows(flat, idx, interpret=interpret)
        return out.reshape(P, *trailing)

    return jax.tree_util.tree_map(gather_leaf, state)
