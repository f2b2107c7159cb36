"""Multi-chip FastSLAM: particle axis sharded over the `ici` mesh axis.

SURVEY.md §2b "particle-parallelism": every stage of the filter step is
per-particle (motion sampling, association, EKF updates, map management) so
it runs UNCHANGED inside `shard_map` on a particle-sharded state — zero
communication. The only collective points are:

1. **Weight reduction** (cheap): `all_gather` of the [P] log-weights to
   compute the global ESS and, when resampling triggers, the global
   systematic-resampling indices (identical on all shards — same key).
2. **Payload exchange** (the bandwidth cost): surviving particles' full
   states move between shards. Implemented as a RING: each shard's payload
   block rotates around the `ici` axis via `jax.lax.ppermute`; at step s a
   shard copies the rows it needs whose source block is currently resident.
   S-1 permute steps, peak memory 2x a shard block, total bytes = one
   all_gather but streamed and overlapped by XLA — the SPMD analog of the
   reference's Python `deepcopy` resample (SURVEY.md §4.1 entry 4).

RNG discipline: per-shard motion noise keys are folded with the shard
index (distinct streams); the resampling key is NOT folded (every shard
must draw the same systematic offset).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 moved shard_map out of experimental
    from jax import shard_map as _shard_map_mod  # noqa: F401
    from jax import shard_map as shard_map_fn
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as shard_map_fn

from parakeet_slam_tpu.core.state import Observation, ParticleState
from parakeet_slam_tpu.dist.mesh import PARTICLE_AXIS
from parakeet_slam_tpu.filter.fastslam import FastSLAM, StepMetrics
from parakeet_slam_tpu.filter.fastslam2 import FastSLAM2
from parakeet_slam_tpu.kernels import resample as resample_kernel


def ring_gather_rows(payload, global_idx, axis_name: str):
    """Inside shard_map: out[i] = global_payload[global_idx[i]] where
    payload is this shard's [Pl, ...] block of a [P, ...] array.

    Rotates the payload around the ring; each shard picks up rows whose
    source block is currently resident.
    """
    S = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    Pl = jax.tree_util.tree_leaves(payload)[0].shape[0]

    out0 = jax.tree_util.tree_map(jnp.zeros_like, payload)
    perm = [(i, (i + 1) % S) for i in range(S)]

    def body(s, carry):
        rot, out = carry
        # After s right-rotations, the block resident here came from me - s.
        src = (me - s) % S
        sel = (global_idx // Pl) == src
        local_rows = jnp.clip(global_idx - src * Pl, 0, Pl - 1)

        def take(rot_leaf, out_leaf):
            vals = jnp.take(rot_leaf, local_rows, axis=0)
            mask = sel.reshape((-1,) + (1,) * (vals.ndim - 1))
            return jnp.where(mask, vals, out_leaf)

        out = jax.tree_util.tree_map(take, rot, out)
        rot = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, axis_name, perm), rot
        )
        return rot, out

    _, out = jax.lax.fori_loop(0, S, body, (payload, out0))
    return out


class ShardedFastSLAM:
    """Drives a FastSLAM instance with the particle axis sharded on `mesh`.

    The total particle count is cfg.num_particles; each of the S devices
    on the particle axis owns P/S of them.
    """

    def __init__(self, slam: FastSLAM, mesh):
        self.slam = slam
        self.mesh = mesh
        self.axis = PARTICLE_AXIS
        S = mesh.shape[self.axis]
        if slam.cfg.num_particles % S != 0:
            raise ValueError(
                f"num_particles={slam.cfg.num_particles} not divisible by "
                f"particle-axis size {S}"
            )
        state_spec = P(self.axis)
        rep = P()
        other_axes = tuple(a for a in mesh.axis_names if a != self.axis)

        def sharded_step(state, u, obs, key):
            slam_ = self.slam
            cfg = slam_.cfg
            me = jax.lax.axis_index(self.axis)
            k_motion, k_resample = jax.random.split(key)
            k_motion = jax.random.fold_in(k_motion, me)
            log_w0 = state.log_w

            if isinstance(slam_, FastSLAM2):
                # FastSLAM 2.0: the optimal-proposal stage is per-particle
                # (pose-Gaussian refinement + sampling), so it shards with
                # zero extra communication; weights are fully applied there
                # and the map pass reuses the proposal's association scores.
                state, scores = slam_._propose(state, u, obs, k_motion)
                state, mean_match_local = slam_.measurement_core(
                    state, obs, weight_matched=False, scores=scores
                )
            else:
                state = slam_.motion_update(state, u, k_motion)
                state, mean_match_local = slam_.measurement_core(state, obs)
            # likelihood tempering, per shard (advisor r4: the sharded step
            # ignored the knob, so a sharded run diverged from the
            # single-device run for the same config)
            state = slam_._temper(state, log_w0)

            # --- global weights / ESS ---------------------------------
            lw_all = jax.lax.all_gather(
                state.log_w, self.axis, tiled=True
            )  # [P]
            w = jax.nn.softmax(lw_all)
            ess = 1.0 / jnp.sum(w * w)
            Ptot = lw_all.shape[0]
            need = ess < cfg.resample_frac * Ptot

            def do_resample(st):
                idx = resample_kernel.systematic_resample_indices(
                    k_resample, lw_all
                )  # [P] global, identical on all shards
                Pl = st.log_w.shape[0]
                my_idx = jax.lax.dynamic_slice_in_dim(idx, me * Pl, Pl)
                gathered = ring_gather_rows(st, my_idx, self.axis)
                return gathered.replace(log_w=jnp.zeros_like(st.log_w))

            state = jax.lax.cond(need, do_resample, lambda s: s, state)

            n_obs = jnp.maximum(jnp.sum(obs.valid.astype(jnp.float32)), 1.0)
            metrics = StepMetrics(
                ess=ess,
                num_landmarks=jax.lax.pmean(
                    jnp.mean(state.num_landmarks().astype(jnp.float32)),
                    self.axis,
                ),
                match_frac=jax.lax.pmean(mean_match_local, self.axis) / n_obs,
                resampled=need,
            )
            return state, metrics

        in_specs = (state_spec, rep, rep, rep)
        out_specs = (state_spec, rep)
        fn = shard_map_fn(
            sharded_step,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )
        # Replicate over any non-particle mesh axes too.
        self._step = jax.jit(fn)

    def init_state(self, init_pose=None) -> ParticleState:
        state = self.slam.init_state(init_pose)
        sh = NamedSharding(self.mesh, P(self.axis))
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sh) if a.ndim else a, state
        )

    def step(self, state: ParticleState, u, obs: Observation, key):
        return self._step(state, u, obs, key)

    def estimate_pose(self, state: ParticleState):
        return self.slam.estimate_pose(state)
