"""Dense-batched FastSLAM engine (Rao-Blackwellized particle filter).

Implements SURVEY.md §3 exactly — sampled motion update, per-particle
maximum-likelihood data association, per-landmark EKF updates, importance
weighting, adaptive systematic resampling, and counter-based map management
— but TPU-first: where the reference iterates Python dicts per particle
(SURVEY.md §4.1 entry 2, the O(particles x landmarks) interpreted hot
loop), every step here is one batched XLA program over dense
[P, Lmax] arrays with validity masks. Map growth/culling are masked
writes; capacities are static so one jit covers the whole run.

Observation batches are processed with `lax.scan` over the fixed Zmax
capacity: sequential in z (association for obs i sees the map updated by
obs i-1 — the textbook FastSLAM formulation) but fully parallel over
particles and landmarks inside each scan step.

The per-(particle x landmark) likelihood + EKF math can optionally route
through the fused Pallas kernel (`kernels/ekf_update`) with
`FilterConfig.use_pallas=True`; the plain-JAX path below is the reference
semantics both for tests and for CPU execution.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from parakeet_slam_tpu.core import linalg
from parakeet_slam_tpu.core.config import FilterConfig, FrontendConfig
from parakeet_slam_tpu.core.geometry import wrap_angle
from parakeet_slam_tpu.core.state import Observation, ParticleState, make_particle_state
from parakeet_slam_tpu.filter import models as model_zoo
from parakeet_slam_tpu.kernels import resample as resample_kernel

_NEG_INF = -1e30


class StepMetrics(NamedTuple):
    """Per-frame observability metrics (SURVEY.md §6 'metrics/logging')."""

    ess: jax.Array            # effective sample size
    num_landmarks: jax.Array  # mean live landmarks per particle
    match_frac: jax.Array     # fraction of valid observations associated
    resampled: jax.Array      # bool


class FastSLAM:
    """Config-specialized FastSLAM filter; all public methods are jittable."""

    def __init__(self, cfg: FilterConfig, fe_cfg: FrontendConfig | None = None):
        self.cfg = cfg
        self.fe_cfg = fe_cfg
        self.model = model_zoo.get_measurement_model(cfg, fe_cfg)
        self.motion = model_zoo.get_motion_model(cfg.motion_model)
        if cfg.obs_dim != self.model.obs_dim or cfg.lm_dim != self.model.lm_dim:
            raise ValueError(
                f"config dims ({cfg.obs_dim},{cfg.lm_dim}) do not match model "
                f"{self.model.name} ({self.model.obs_dim},{self.model.lm_dim})"
            )

    # -- state ------------------------------------------------------------

    def init_state(self, init_pose=None) -> ParticleState:
        c = self.cfg
        return make_particle_state(
            c.num_particles, c.max_landmarks, c.lm_dim, c.sig_dim,
            c.desc_words, c.pose_dim, init_pose,
        )

    # -- motion update (SURVEY.md §3) -------------------------------------

    def motion_update(self, state: ParticleState, u, key) -> ParticleState:
        noise = self.cfg.motion_noise
        pose = self.motion(key, state.pose, jnp.asarray(u), noise)
        return state.replace(pose=pose)

    # -- measurement update ------------------------------------------------

    def _per_pair_stats(self, pose, lm_mean, lm_cov, z):
        """Likelihood ingredients for one (particle pose, landmark, z):
        returns (nu, Q, H, loglik_geometric)."""
        R = jnp.diag(
            jnp.asarray(self.cfg.meas_noise[: self.cfg.obs_dim], pose.dtype) ** 2
        )
        zhat = self.model.h(pose, lm_mean)
        H = self.model.jac(pose, lm_mean)
        nu = self.model.residual(z, zhat)
        Q = H @ lm_cov @ H.T + R
        ll = linalg.gaussian_loglik(Q, nu)
        return nu, Q, H, ll

    def _appearance_loglik(self, obs_sig, obs_desc, lm_sig, lm_desc, dtype):
        """Signature (float) + descriptor (Hamming) likelihood terms,
        broadcast over [P, L]."""
        c = self.cfg
        ll = jnp.zeros(lm_sig.shape[:2], dtype)
        if c.sig_dim > 0:
            var = jnp.asarray(c.sig_noise, dtype) ** 2
            d2 = jnp.sum((lm_sig - obs_sig[None, None, :]) ** 2, axis=-1)
            ll = ll - 0.5 * d2 / var
        if c.desc_words > 0:
            x = jnp.bitwise_xor(lm_desc, obs_desc[None, None, :])
            ham = jnp.sum(
                jax.lax.population_count(x).astype(jnp.int32), axis=-1
            ).astype(dtype)
            ll = ll - c.desc_weight * ham
        return ll

    def _process_observation(
        self, state: ParticleState, matched, obs_row, weight_matched: bool = True
    ):
        """One observation against every particle's map. Returns updated
        (state, matched-mask [P, L], did_match [P]).

        `weight_matched=False` suppresses ALL importance-weight updates
        (matched likelihood and new-landmark log p0): FastSLAM 2.0 accounts
        for every observation in its proposal stage instead
        (filter/fastslam2.py), and this pass only updates the maps."""
        c = self.cfg
        z, sig, desc, valid = obs_row
        P, L = state.lm_valid.shape
        dtype = state.pose.dtype

        # Likelihoods + EKF ingredients for all (particle, landmark) pairs.
        pair_fn = jax.vmap(  # over landmarks
            lambda pose, m, cov: self._per_pair_stats(pose, m, cov, z),
            in_axes=(None, 0, 0),
        )
        pair_fn = jax.vmap(pair_fn, in_axes=(0, 0, 0))  # over particles
        nu, Q, H, ll_geom = pair_fn(state.pose, state.lm_mean, state.lm_cov)

        ll = ll_geom + self._appearance_loglik(sig, desc, state.lm_sig, state.lm_desc, dtype)
        # Non-finite likelihoods (fp32 overflow in Q for degenerate geometry)
        # must lose the association argmax, not win it via NaN comparisons.
        ll = jnp.where(state.lm_valid & jnp.isfinite(ll), ll, _NEG_INF)

        best = jnp.argmax(ll, axis=-1)                      # [P]
        best_ll = jnp.take_along_axis(ll, best[:, None], axis=1)[:, 0]
        any_valid = jnp.any(state.lm_valid, axis=-1)
        is_new = (best_ll < c.new_landmark_loglik) | ~any_valid
        do_update = valid & ~is_new                         # [P]
        do_new = valid & is_new

        # --- EKF update of the associated landmark (masked scatter) ------
        take = lambda a: jnp.take_along_axis(
            a, best.reshape(P, *([1] * (a.ndim - 1))), axis=1
        )[:, 0]
        nu_b, Q_b, H_b = take(nu), take(Q), take(H)
        cov_b = take(state.lm_cov)
        mean_b = take(state.lm_mean)
        Qinv_b, _ = linalg.inv_psd(Q_b)
        K = cov_b @ jnp.swapaxes(H_b, -1, -2) @ Qinv_b      # [P, Dl, Dz]
        mean_new = mean_b + (K @ nu_b[..., None])[..., 0]
        eye = jnp.eye(c.lm_dim, dtype=dtype)
        cov_new = (eye - K @ H_b) @ cov_b
        # Joseph-lite symmetrization for numerical hygiene.
        cov_new = 0.5 * (cov_new + jnp.swapaxes(cov_new, -1, -2))

        onehot_best = jax.nn.one_hot(best, L, dtype=bool) & do_update[:, None]
        state = state.replace(
            lm_mean=jnp.where(onehot_best[..., None], mean_new[:, None, :], state.lm_mean),
            lm_cov=jnp.where(
                onehot_best[..., None, None], cov_new[:, None, :, :], state.lm_cov
            ),
            lm_count=state.lm_count + 2 * onehot_best.astype(jnp.int32),
        )
        if c.sig_dim > 0:
            # Running-average appearance update (reference-style blob color).
            sig_b = take(state.lm_sig)
            cnt_b = jnp.maximum(take(state.lm_count).astype(dtype), 1.0)
            sig_upd = sig_b + (sig[None, :] - sig_b) / cnt_b[:, None]
            state = state.replace(
                lm_sig=jnp.where(onehot_best[..., None], sig_upd[:, None, :], state.lm_sig)
            )
        if c.desc_words > 0:
            # Latest-wins binary descriptor refresh.
            state = state.replace(
                lm_desc=jnp.where(onehot_best[..., None], desc[None, None, :], state.lm_desc)
            )

        # --- new-landmark allocation (first free slot, masked write) -----
        init_fn = jax.vmap(lambda pose: self.model.init(pose, z))
        mean0, cov0 = init_fn(state.pose)                   # [P, Dl], [P, Dl, Dl]
        free_slot = jnp.argmin(state.lm_valid, axis=-1)     # first False
        has_free = ~jnp.all(state.lm_valid, axis=-1)
        do_alloc = do_new & has_free
        onehot_free = jax.nn.one_hot(free_slot, L, dtype=bool) & do_alloc[:, None]
        state = state.replace(
            lm_mean=jnp.where(onehot_free[..., None], mean0[:, None, :], state.lm_mean),
            lm_cov=jnp.where(
                onehot_free[..., None, None], cov0[:, None, :, :], state.lm_cov
            ),
            lm_valid=state.lm_valid | onehot_free,
            lm_count=jnp.where(onehot_free, 1, state.lm_count),
        )
        if c.sig_dim > 0:
            state = state.replace(
                lm_sig=jnp.where(onehot_free[..., None], sig[None, None, :], state.lm_sig)
            )
        if c.desc_words > 0:
            state = state.replace(
                lm_desc=jnp.where(onehot_free[..., None], desc[None, None, :], state.lm_desc)
            )

        # --- importance weights ------------------------------------------
        if weight_matched:
            log_w = state.log_w + jnp.where(
                valid,
                jnp.where(is_new, c.new_landmark_loglik, best_ll),
                0.0,
            )
        else:
            log_w = state.log_w
        state = state.replace(log_w=log_w)

        matched = matched | onehot_best | onehot_free
        return state, matched, do_update | do_alloc

    def _measurement_update_pallas(
        self, state: ParticleState, obs: Observation, weight_matched: bool = True
    ):
        """Route the whole frame through the fused Pallas kernel
        (`kernels/ekf_update`). Semantics-identical to the XLA path (parity
        tested in tests/test_ekf_kernel.py). `weight_matched=False` runs the
        kernel with weight updates suppressed (FastSLAM 2.0 map pass)."""
        from parakeet_slam_tpu.kernels import ekf_update

        c = self.cfg
        interpret = jax.devices()[0].platform != "tpu"
        (log_w, lm_mean, lm_cov, lm_sig, lm_valid, lm_count, n_match) = (
            ekf_update.measurement_update_2d(
                state.pose, state.log_w, state.lm_mean, state.lm_cov,
                state.lm_sig, state.lm_valid, state.lm_count,
                obs.z, obs.sig, obs.valid,
                sig_dim=c.sig_dim,
                r_var=(c.meas_noise[0] ** 2, c.meas_noise[1] ** 2),
                sig_var=c.sig_noise**2,
                log_p0=c.new_landmark_loglik,
                init_infl=c.init_cov_inflation,
                max_range=c.max_range,
                fov_half=c.fov_half_angle,
                cull=c.cull_enabled,
                interpret=interpret,
                update_weights=weight_matched,
            )
        )
        state = state.replace(
            log_w=log_w, lm_mean=lm_mean, lm_cov=lm_cov, lm_sig=lm_sig,
            lm_valid=lm_valid, lm_count=lm_count,
        )
        return state, jnp.mean(n_match)

    def _measurement_update_pallas_3d(
        self, state: ParticleState, obs: Observation, weight_matched: bool = True
    ):
        """Route a frame through the fused 3-D vision-model Pallas kernel
        (`kernels/ekf_update_3d`). Parity with the XLA path is tested in
        tests/test_ekf3d_kernel.py. `weight_matched=False` suppresses the
        in-kernel weight updates (FastSLAM 2.0 map pass)."""
        from parakeet_slam_tpu.kernels import ekf_update_3d

        c = self.cfg
        fe = self.fe_cfg
        interpret = jax.devices()[0].platform != "tpu"
        fx, fy, cx, cy = (fe.intrinsics[:4] if fe else (500.0, 500.0, 320.0, 240.0))
        H_img, W_img = fe.image_size if fe else (480, 640)
        par = (
            ("fx", float(fx)), ("fy", float(fy)),
            ("cx", float(cx)), ("cy", float(cy)),
            ("baseline", float(fe.baseline if fe else 0.1)),
            ("img_w", float(W_img)), ("img_h", float(H_img)),
        )
        (log_w, lm_mean, lm_cov, lm_desc, lm_valid, lm_count, n_match) = (
            ekf_update_3d.measurement_update_3d(
                state.pose, state.log_w, state.lm_mean, state.lm_cov,
                state.lm_desc, state.lm_valid, state.lm_count,
                obs.z, obs.desc, obs.valid,
                model=self.model.name,
                desc_words=c.desc_words,
                par=par,
                r_var=tuple(float(v) ** 2 for v in c.meas_noise[: c.obs_dim]),
                desc_weight=float(c.desc_weight),
                log_p0=float(c.new_landmark_loglik),
                init_infl=float(c.init_cov_inflation),
                init_range_prior=float(c.init_range_prior),
                init_range_sigma=float(c.init_range_sigma),
                max_range=float(c.max_range),
                cull=c.cull_enabled,
                interpret=interpret,
                update_weights=weight_matched,
            )
        )
        state = state.replace(
            log_w=log_w, lm_mean=lm_mean, lm_cov=lm_cov, lm_desc=lm_desc,
            lm_valid=lm_valid, lm_count=lm_count,
        )
        return state, jnp.mean(n_match)

    def measurement_update(
        self, state: ParticleState, obs: Observation, key=None
    ) -> tuple[ParticleState, StepMetrics]:
        """Process a frame's observation batch; cull; adaptively resample."""
        state, mean_match = self.measurement_core(state, obs)
        return self._resample_and_metrics(state, obs, mean_match, key)

    def measurement_core(
        self, state: ParticleState, obs: Observation, weight_matched: bool = True
    ) -> tuple[ParticleState, jax.Array]:
        """Association + EKF updates + map management WITHOUT resampling —
        purely per-particle, so it runs unchanged inside `shard_map` with
        the particle axis sharded (dist/sharded_filter.py). Returns
        (state, mean associated-observation count)."""
        c = self.cfg
        P, L = state.lm_valid.shape

        if c.use_pallas and self.model.name == "range_bearing_2d":
            return self._measurement_update_pallas(state, obs, weight_matched)
        if (
            c.use_pallas
            and c.sig_dim == 0
            and self.model.name in ("pinhole_3d", "stereo_3d", "equirect_3d")
        ):
            return self._measurement_update_pallas_3d(state, obs, weight_matched)

        def scan_body(carry, obs_row):
            st, matched, n_match = carry
            st, matched, did = self._process_observation(
                st, matched, obs_row, weight_matched
            )
            return (st, matched, n_match + did.astype(jnp.float32)), None

        matched0 = jnp.zeros((P, L), bool)
        # fp32 discipline: the EKF small-matrix matmuls (H Σ Hᵀ, K ν, (I−KH)Σ)
        # are batched dot_generals that TPU lowers to bf16-input MXU passes at
        # default precision — enough error (~1% on covariances) to break
        # parity with the elementwise-exact Pallas kernel. These ops are tiny
        # relative to the frame, so force full fp32 like backend/ba.py does.
        with jax.default_matmul_precision("highest"):
            (state, matched, n_match), _ = jax.lax.scan(
                scan_body,
                (state, matched0, jnp.zeros((P,), jnp.float32)),
                (obs.z, obs.sig, obs.desc, obs.valid),
            )

        # --- map management: decrement in-FOV-but-unmatched, cull ---------
        if c.cull_enabled:
            fov_fn = jax.vmap(jax.vmap(self.model.in_fov, in_axes=(None, 0)), in_axes=(0, 0))
            in_fov = fov_fn(state.pose, state.lm_mean)
            decrement = state.lm_valid & in_fov & ~matched
            count = state.lm_count - decrement.astype(jnp.int32)
            alive = state.lm_valid & (count >= 0)
            state = state.replace(lm_count=count, lm_valid=alive)

        return state, jnp.mean(n_match)

    def _resample_and_metrics(self, state, obs, mean_match, key):
        """Shared tail of the measurement update: adaptive systematic
        resampling + per-frame metrics."""
        c = self.cfg
        P = state.num_particles
        ess = state.effective_sample_size()
        need = ess < c.resample_frac * P
        if key is None:
            key = jax.random.PRNGKey(0)

        def do_resample(st):
            idx = resample_kernel.systematic_resample_indices(key, st.log_w)
            return resample_kernel.gather_particles(st, idx, use_pallas=c.use_pallas)

        state = jax.lax.cond(need, do_resample, lambda st: st, state)

        n_obs = jnp.maximum(jnp.sum(obs.valid.astype(jnp.float32)), 1.0)
        metrics = StepMetrics(
            ess=ess,
            num_landmarks=jnp.mean(state.num_landmarks().astype(jnp.float32)),
            match_frac=mean_match / n_obs,
            resampled=need,
        )
        return state, metrics

    # -- full step ---------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def step(self, state: ParticleState, u, obs: Observation, key):
        """One SLAM frame: motion propagate + measurement update."""
        k_motion, k_resample = jax.random.split(key)
        state = self.motion_update(state, u, k_motion)
        return self.measurement_update(state, obs, k_resample)

    # -- estimates ----------------------------------------------------------

    def estimate_pose(self, state: ParticleState) -> jax.Array:
        """Weighted-mean pose (angle-aware for SE(2))."""
        w = state.normalized_weights()
        if self.cfg.pose_dim == 3:
            xy = jnp.sum(w[:, None] * state.pose[:, :2], axis=0)
            s = jnp.sum(w * jnp.sin(state.pose[:, 2]))
            cth = jnp.sum(w * jnp.cos(state.pose[:, 2]))
            return jnp.concatenate([xy, wrap_angle(jnp.arctan2(s, cth))[None]])
        # SE(3): weighted translation + best-particle quaternion.
        best = jnp.argmax(state.log_w)
        t = jnp.sum(w[:, None] * state.pose[:, :3], axis=0)
        return jnp.concatenate([t, state.pose[best, 3:]])

    def best_particle_map(self, state: ParticleState):
        """(means [L, Dl], valid [L]) of the highest-weight particle."""
        best = jnp.argmax(state.log_w)
        return state.lm_mean[best], state.lm_valid[best]
