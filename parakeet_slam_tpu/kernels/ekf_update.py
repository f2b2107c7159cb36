"""Fused FastSLAM measurement-update Pallas kernel (2-D range-bearing).

This is the hot loop BASELINE.json:5 names: "propagation, EKF
innovation/Kalman-gain updates ... are single fused Pallas kernels".

TPU-first layout: the per-particle landmark maps are viewed as
structure-of-arrays planes of shape [P, L] (mean-x, mean-y, cov-xx, cov-xy,
cov-yy, signature channels, valid, count). One kernel invocation processes
ALL Z observations of a frame sequentially (the textbook FastSLAM ordering
— association of obs i sees obs i-1's map) with the state planes resident
in VMEM for the whole frame: zero HBM round-trips between observations.
The equivalent XLA path (`filter/fastslam.py::_process_observation`)
materializes [P, L, 2, 2] intermediates in HBM per observation.

VMEM discipline (what makes this scale to L = 10k+ under the ~16 MB scoped
limit): the grid tiles the particle axis; within a tile all mutation is
IN-PLACE on the output refs (no whole-plane loop carries), per-(particle,
landmark) likelihoods are computed chunk-by-chunk over the landmark axis
into one [Pt, L] scratch plane (so only O(chunk) temporaries are ever
live), and the EKF update itself is computed in per-particle VECTOR space
([Pt, 1] gathers of the associated landmark via one-hot reductions) before
being scattered back with masked writes.

Math per (particle p, landmark l, observation z) — SURVEY.md §3:
  dx, dy   = mean - pose.xy;  q = dx²+dy²;  r = √q
  zhat     = [r, atan2(dy, dx) - pose.θ]
  H        = [[dx/r, dy/r], [-dy/q, dx/q]]        (∂h/∂mean)
  Q        = H Σ Hᵀ + R;   ν = z ⊖ zhat (bearing wrapped)
  ℓ        = -½(νᵀQ⁻¹ν + log|Q| + 2 log 2π) - ½‖sig_z - sig_l‖²/σ_s²
  ĵ        = argmax_l ℓ;  new landmark iff max ℓ < log p₀
  update   : K = ΣHᵀQ⁻¹;  μ += Kν;  Σ ← (I-KH)Σ;  w += ℓ
  new      : μ = h⁻¹(pose, z);  Σ = H⁻¹R H⁻ᵀ;  w += log p₀
All 2×2 inverses are closed-form cofactors (`core/linalg.py` is the XLA
twin) — no linalg.solve in-kernel. Index selection is explicit first-match
lane-min (Mosaic argmax tie-breaking differs from interpret mode), and
padding lanes beyond the real capacity are never associated or allocated.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parakeet_slam_tpu.kernels import mathx

_NEG_INF = -1e30
_LOG_2PI = math.log(2.0 * math.pi)

# Mosaic has no atan2 primitive; use the polynomial octant reduction.
_atan2 = mathx.atan2
_wrap = mathx.wrap_angle


def _kernel(
    # SMEM observation arrays
    z_ref, sig_ref, vz_ref,
    # VMEM per-particle inputs
    pose_ref, logw_ref,
    mx_ref, my_ref, cxx_ref, cxy_ref, cyy_ref,
    refs,
    *,
    num_obs: int,
    num_landmarks: int,
    sig_dim: int,
    chunk: int,
    r_var: tuple[float, float],
    sig_var: float,
    log_p0: float,
    init_infl: float,
    max_range: float,
    fov_half: float,
    cull: bool,
    update_weights: bool,
):
    # Unpack variadic refs: sig planes (in), valid, count, outputs, scratch.
    sig_in = refs[:sig_dim]
    lv_ref, lc_ref = refs[sig_dim], refs[sig_dim + 1]
    out = refs[sig_dim + 2 : sig_dim + 2 + 9 + sig_dim]
    (logw_o, mx_o, my_o, cxx_o, cxy_o, cyy_o) = out[:6]
    sig_out = out[6 : 6 + sig_dim]
    lv_o, lc_o = out[6 + sig_dim], out[7 + sig_dim]
    nmatch_o = out[8 + sig_dim]
    tail = refs[sig_dim + 2 + 9 + sig_dim :]
    ll_s, matched_s = tail[0], tail[1]
    # Likelihood cache: range/bearing prediction + innovation covariance +
    # logdet per landmark, filled once per frame and refreshed per-lane
    # after updates/allocations — the per-observation sweep then costs
    # residual + quadratic form instead of the full sqrt/atan2/H/Q chain.
    r_s, th_s, q11_s, q12_s, q22_s, det_s, ld_s = tail[2:9]

    P, L = mx_o.shape
    NC = L // chunk
    r11, r22 = r_var

    # ---- initialize: copy state into the (aliased) output blocks --------
    logw_o[:, :] = logw_ref[:, :]
    mx_o[:, :] = mx_ref[:, :]
    my_o[:, :] = my_ref[:, :]
    cxx_o[:, :] = cxx_ref[:, :]
    cxy_o[:, :] = cxy_ref[:, :]
    cyy_o[:, :] = cyy_ref[:, :]
    for c in range(sig_dim):
        sig_out[c][:, :] = sig_in[c][:, :]
    lv_o[:, :] = lv_ref[:, :]
    lc_o[:, :] = lc_ref[:, :]
    nmatch_o[:, :] = jnp.zeros((P, 1), jnp.float32)
    matched_s[:, :] = jnp.zeros((P, L), jnp.float32)

    px = pose_ref[:, 0:1]
    py = pose_ref[:, 1:2]
    pth = pose_ref[:, 2:3]
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (P, chunk), 1)
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)
    real_f = lane_f < num_landmarks
    BIG_LANE = jnp.int32(2**30)

    def predict(mx, my, cxx, cxy, cyy):
        """(r, bearing, Q entries, det) at a landmark state — the same
        unrolled ops serve the chunked cache fill and the [P, 1] refresh,
        so cached likelihoods stay bit-exact vs a fresh sweep."""
        dx = mx - px
        dy = my - py
        q = dx * dx + dy * dy + 1e-12
        r = jnp.sqrt(q)
        h11 = dx / r
        h12 = dy / r
        h21 = -dy / q
        h22 = dx / q
        a11 = h11 * cxx + h12 * cxy
        a12 = h11 * cxy + h12 * cyy
        q11 = a11 * h11 + a12 * h12 + r11
        q12 = a11 * h21 + a12 * h22
        q22 = (h21 * cxx + h22 * cxy) * h21 + (h21 * cxy + h22 * cyy) * h22 + r22
        det = jnp.maximum(q11 * q22 - q12 * q12, 1e-12)
        return r, _atan2(dy, dx) - pth, q11, q12, q22, det

    # ---- pass 0: fill the likelihood cache, chunked over landmarks ------
    def cache_chunk(c, _):
        sl = pl.ds(c * chunk, chunk)
        r, th, q11, q12, q22, det = predict(
            mx_o[:, sl], my_o[:, sl],
            cxx_o[:, sl], cxy_o[:, sl], cyy_o[:, sl],
        )
        r_s[:, sl] = r
        th_s[:, sl] = th
        q11_s[:, sl] = q11
        q12_s[:, sl] = q12
        q22_s[:, sl] = q22
        det_s[:, sl] = det
        ld_s[:, sl] = jnp.log(det)
        return 0

    jax.lax.fori_loop(0, NC, cache_chunk, 0)

    def obs_body(i, _):
        zr = z_ref[i, 0]
        zphi = z_ref[i, 1]
        ovalid = vz_ref[i] > 0

        # ---- pass A: likelihoods over the cache, chunked ----------------
        def ll_chunk(c, _):
            sl = pl.ds(c * chunk, chunk)
            q11 = q11_s[:, sl]
            q12 = q12_s[:, sl]
            q22 = q22_s[:, sl]
            det = det_s[:, sl]
            nu1 = zr - r_s[:, sl]
            nu2 = _wrap(zphi - th_s[:, sl])
            # clamp: indefinite Q (fp-drifted cov) must lose the argmax,
            # not win it with a sign-flipped "negative distance"
            maha = jnp.maximum(
                (nu1 * nu1 * q22 - 2.0 * nu1 * nu2 * q12 + nu2 * nu2 * q11)
                / det,
                0.0,
            )
            ll = -0.5 * (maha + ld_s[:, sl] + 2.0 * _LOG_2PI)
            for s in range(sig_dim):
                ds_ = sig_out[s][:, sl] - sig_ref[i, s]
                ll = ll - 0.5 * ds_ * ds_ / sig_var
            valid_here = (lv_o[:, sl] > 0) & ((lane_c + c * chunk) < num_landmarks)
            ll_s[:, sl] = jnp.where(valid_here, ll, _NEG_INF)
            return 0

        jax.lax.fori_loop(0, NC, ll_chunk, 0)

        # ---- association ------------------------------------------------
        best_ll = jnp.max(ll_s[:, :], axis=1, keepdims=True)       # [P, 1]
        best_idx = jnp.min(
            jnp.where(ll_s[:, :] == best_ll, lane_f, BIG_LANE),
            axis=1, keepdims=True,
        )
        onehot = (lane_f == best_idx).astype(jnp.float32)          # [P, L]
        any_valid = best_ll > _NEG_INF / 2
        is_new = (best_ll < log_p0) | ~any_valid                   # [P, 1]
        do_upd = ~is_new & ovalid                                  # [P, 1]

        # ---- gather the associated landmark into vector space ----------
        def pick(plane_ref):
            return jnp.sum(plane_ref[:, :] * onehot, axis=1, keepdims=True)

        mx_b = pick(mx_o)
        my_b = pick(my_o)
        cxx_b = pick(cxx_o)
        cxy_b = pick(cxy_o)
        cyy_b = pick(cyy_o)

        # ---- EKF update in [P, 1] space ---------------------------------
        dx = mx_b - px
        dy = my_b - py
        q = dx * dx + dy * dy + 1e-12
        r = jnp.sqrt(q)
        h11 = dx / r
        h12 = dy / r
        h21 = -dy / q
        h22 = dx / q
        a11 = h11 * cxx_b + h12 * cxy_b
        a12 = h11 * cxy_b + h12 * cyy_b
        a21 = h21 * cxx_b + h22 * cxy_b
        a22 = h21 * cxy_b + h22 * cyy_b
        q11 = a11 * h11 + a12 * h12 + r11
        q12 = a11 * h21 + a12 * h22
        q22 = a21 * h21 + a22 * h22 + r22
        det = jnp.maximum(q11 * q22 - q12 * q12, 1e-12)
        qi11 = q22 / det
        qi12 = -q12 / det
        qi22 = q11 / det
        nu1 = zr - r
        nu2 = _wrap(zphi - (_atan2(dy, dx) - pth))
        b11 = cxx_b * h11 + cxy_b * h12
        b12 = cxx_b * h21 + cxy_b * h22
        b21 = cxy_b * h11 + cyy_b * h12
        b22 = cxy_b * h21 + cyy_b * h22
        k11 = b11 * qi11 + b12 * qi12
        k12 = b11 * qi12 + b12 * qi22
        k21 = b21 * qi11 + b22 * qi12
        k22 = b21 * qi12 + b22 * qi22
        mx_u = mx_b + k11 * nu1 + k12 * nu2
        my_u = my_b + k21 * nu1 + k22 * nu2
        i11 = 1.0 - (k11 * h11 + k12 * h21)
        i12 = -(k11 * h12 + k12 * h22)
        i21 = -(k21 * h11 + k22 * h21)
        i22 = 1.0 - (k21 * h12 + k22 * h22)
        cxx_u = i11 * cxx_b + i12 * cxy_b
        cxy_u = 0.5 * ((i11 * cxy_b + i12 * cyy_b) + (i21 * cxx_b + i22 * cxy_b))
        cyy_u = i21 * cxy_b + i22 * cyy_b

        # ---- allocation target (first free real slot) -------------------
        free_idx = jnp.min(
            jnp.where((lv_o[:, :] < 0.5) & real_f, lane_f, BIG_LANE),
            axis=1, keepdims=True,
        )
        has_free = free_idx < BIG_LANE
        do_alloc = is_new & has_free & ovalid                      # [P, 1]
        ang = pth + zphi
        ca = jnp.cos(ang)
        sa = jnp.sin(ang)
        nx = px + zr * ca
        ny = py + zr * sa
        zr2 = zr * zr
        n_cxx = init_infl * (r11 * ca * ca + r22 * zr2 * sa * sa)
        n_cxy = init_infl * ((r11 - r22 * zr2) * ca * sa)
        n_cyy = init_infl * (r11 * sa * sa + r22 * zr2 * ca * ca)

        # ---- scatter back (masked writes; one [P, L] temp at a time) ----
        upd_m = (lane_f == best_idx) & do_upd
        alloc_m = (lane_f == free_idx) & do_alloc
        mx_o[:, :] = jnp.where(upd_m, mx_u, jnp.where(alloc_m, nx, mx_o[:, :]))
        my_o[:, :] = jnp.where(upd_m, my_u, jnp.where(alloc_m, ny, my_o[:, :]))
        cxx_o[:, :] = jnp.where(
            upd_m, cxx_u, jnp.where(alloc_m, n_cxx, cxx_o[:, :])
        )
        cxy_o[:, :] = jnp.where(
            upd_m, cxy_u, jnp.where(alloc_m, n_cxy, cxy_o[:, :])
        )
        cyy_o[:, :] = jnp.where(
            upd_m, cyy_u, jnp.where(alloc_m, n_cyy, cyy_o[:, :])
        )
        lc_new = jnp.where(
            upd_m, lc_o[:, :] + 2.0, jnp.where(alloc_m, 1.0, lc_o[:, :])
        )
        lc_o[:, :] = lc_new
        if sig_dim:
            cnt_b = jnp.maximum(jnp.sum(lc_new * onehot, axis=1, keepdims=True), 1.0)
            for s in range(sig_dim):
                sig_b = jnp.sum(sig_out[s][:, :] * onehot, axis=1, keepdims=True)
                sig_u = sig_b + (sig_ref[i, s] - sig_b) / cnt_b
                sig_out[s][:, :] = jnp.where(
                    upd_m, sig_u, jnp.where(alloc_m, sig_ref[i, s], sig_out[s][:, :])
                )
        lv_o[:, :] = jnp.where(alloc_m, 1.0, lv_o[:, :])
        touched = upd_m | alloc_m

        # ---- refresh the likelihood cache at the touched lane -----------
        # Recompute the prediction at the NEW landmark state in [P, 1]
        # space so later observations score this lane bit-identically to
        # a fresh sweep.
        r2_, th2, q11_2, q12_2, q22_2, det2 = predict(
            jnp.where(do_upd, mx_u, nx),
            jnp.where(do_upd, my_u, ny),
            jnp.where(do_upd, cxx_u, n_cxx),
            jnp.where(do_upd, cxy_u, n_cxy),
            jnp.where(do_upd, cyy_u, n_cyy),
        )
        r_s[:, :] = jnp.where(touched, r2_, r_s[:, :])
        th_s[:, :] = jnp.where(touched, th2, th_s[:, :])
        q11_s[:, :] = jnp.where(touched, q11_2, q11_s[:, :])
        q12_s[:, :] = jnp.where(touched, q12_2, q12_s[:, :])
        q22_s[:, :] = jnp.where(touched, q22_2, q22_s[:, :])
        det_s[:, :] = jnp.where(touched, det2, det_s[:, :])
        ld_s[:, :] = jnp.where(touched, jnp.log(det2), ld_s[:, :])

        # ---- weights / bookkeeping -------------------------------------
        # update_weights=False: FastSLAM 2.0 map pass — every observation's
        # weight was already applied in the proposal stage
        # (filter/fastslam2.py), this kernel only mutates the maps.
        if update_weights:
            dw = jnp.where(is_new, log_p0, best_ll)
            logw_o[:, :] = logw_o[:, :] + jnp.where(ovalid, dw, 0.0)
        matched_s[:, :] = jnp.where(touched, 1.0, matched_s[:, :])
        nmatch_o[:, :] = nmatch_o[:, :] + jnp.max(
            jnp.where(touched, 1.0, 0.0), axis=1, keepdims=True
        )
        return 0

    jax.lax.fori_loop(0, num_obs, obs_body, 0)

    # ---- culling (chunked) ---------------------------------------------
    if cull:
        def cull_chunk(c, _):
            sl = pl.ds(c * chunk, chunk)
            # cached range/bearing are refreshed on every mutation, so they
            # equal a fresh recompute at the current means bit-for-bit
            r = r_s[:, sl]
            phi = _wrap(th_s[:, sl])
            in_fov = (r < max_range) & (jnp.abs(phi) < fov_half)
            lv = lv_o[:, sl]
            dec = (
                (lv > 0)
                & ((lane_c + c * chunk) < num_landmarks)
                & in_fov
                & (matched_s[:, sl] < 0.5)
            )
            lc = lc_o[:, sl] - dec.astype(jnp.float32)
            lc_o[:, sl] = lc
            lv_o[:, sl] = jnp.where((lv > 0) & (lc >= 0.0), 1.0, 0.0)
            return 0

        jax.lax.fori_loop(0, NC, cull_chunk, 0)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "sig_dim", "r_var", "sig_var", "log_p0", "init_infl",
        "max_range", "fov_half", "cull", "interpret", "update_weights",
    ),
)
def measurement_update_2d(
    pose, log_w, lm_mean, lm_cov, lm_sig, lm_valid, lm_count,
    z, sig, valid,
    *,
    sig_dim: int,
    r_var: tuple[float, float],
    sig_var: float,
    log_p0: float,
    init_infl: float,
    max_range: float,
    fov_half: float,
    cull: bool,
    interpret: bool = False,
    update_weights: bool = True,
):
    """Pallas-fused frame measurement update for the range-bearing model.

    Array-layout adapter around `_kernel`: splits [P, L, ...] state into
    [P, L] planes (padded to lane width 128), invokes one fused kernel for
    the whole frame, and reassembles the ParticleState fields. Returns
    updated (log_w, lm_mean, lm_cov, lm_sig, lm_valid, lm_count, n_match).
    """
    P, L = lm_valid.shape
    Z = z.shape[0]
    Lp = _round_up(max(L, 128), 128)
    pad = Lp - L

    def pad_plane(a, fill=0.0):
        if pad == 0:
            return a
        return jnp.pad(a, ((0, 0), (0, pad)), constant_values=fill)

    planes = [
        pad_plane(lm_mean[..., 0]), pad_plane(lm_mean[..., 1]),
        pad_plane(lm_cov[..., 0, 0]), pad_plane(lm_cov[..., 0, 1]),
        pad_plane(lm_cov[..., 1, 1]),
    ]
    sig_planes = [pad_plane(lm_sig[..., c]) for c in range(sig_dim)]
    lv = pad_plane(lm_valid.astype(jnp.float32))
    lc = pad_plane(lm_count.astype(jnp.float32))

    logw2 = log_w[:, None]
    pose_in = pose.astype(jnp.float32)
    z_in = z.astype(jnp.float32)
    if sig_dim > 0:
        sig_in = sig.astype(jnp.float32)[:, :sig_dim]
    else:
        sig_in = jnp.zeros((Z, 1), jnp.float32)  # placeholder; kernel ignores
    vz = valid.astype(jnp.int32)

    n_aliased = 6 + sig_dim + 2  # logw, 5 geom planes, sigs, valid, count
    out_shape = (
        [jax.ShapeDtypeStruct((P, 1), jnp.float32)]
        + [jax.ShapeDtypeStruct((P, Lp), jnp.float32)] * (5 + sig_dim + 2)
        + [jax.ShapeDtypeStruct((P, 1), jnp.float32)]  # n_match (not aliased)
    )

    # Particle-axis tiling: in+out plane blocks are double-buffered by the
    # pipeline, plus the ll/matched scratch planes — keep it under ~12 MB.
    n_planes = 7 + sig_dim
    # chunk MUST divide Lp (NC = Lp // chunk; a remainder leaves lanes
    # unscored and stale ll scratch wins the association argmax).
    chunk = next(
        c for c in (2048, 1024, 512, 384, 256, 128) if Lp % c == 0
    ) if Lp > 2048 else Lp
    budget = 12 * 1024 * 1024
    # in+out x2buf + ll/matched scratch + 7-plane likelihood cache
    per_particle = (2 * 2 * n_planes * Lp + (2 + 7) * Lp) * 4
    # Largest divisor of P within the VMEM budget. Mosaic requires the
    # particle (sublane) block dim to be a multiple of 8 OR equal to P; when
    # even the smallest legal tile exceeds the default 16M scoped-vmem
    # window, raise the kernel's vmem limit to what the tile actually needs
    # instead of failing (see the matching comment in ekf_update_3d.py).
    cands = [d for d in range(1, P + 1) if P % d == 0 and (d % 8 == 0 or d == P)]
    fits = [d for d in cands if d * per_particle <= budget]
    Pt = max(fits) if fits else min(cands)
    grid = (P // Pt,)
    vmem_limit = min(
        100 * 1024 * 1024,
        max(16 * 1024 * 1024, int(Pt * per_particle * 1.25) + (2 << 20)),
    )

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    row = lambda w: pl.BlockSpec((Pt, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    plane = lambda: row(Lp)
    in_specs = (
        [smem(), smem(), smem()]
        + [row(pose_in.shape[1]), row(1)]
        + [plane()] * (5 + sig_dim + 2)
    )
    out_specs = tuple([row(1)] + [plane()] * (5 + sig_dim + 2) + [row(1)])
    scratch = [
        pltpu.VMEM((Pt, Lp), jnp.float32),  # ll
        pltpu.VMEM((Pt, Lp), jnp.float32),  # matched
    ] + [
        pltpu.VMEM((Pt, Lp), jnp.float32)   # r/th/Q/det/logdet cache
        for _ in range(7)
    ]

    kernel = functools.partial(
        _kernel_entry,
        sig_dim=sig_dim,
        num_obs=Z,
        num_landmarks=L,
        chunk=chunk,
        r_var=r_var,
        sig_var=sig_var,
        log_p0=log_p0,
        init_infl=init_infl,
        max_range=max_range,
        fov_half=fov_half,
        cull=cull,
        update_weights=update_weights,
    )

    # Alias the big planes in-place: inputs [4=logw, 5..] -> outputs [0..].
    aliases = {4 + i: i for i in range(n_aliased)}

    results = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases=aliases,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(z_in, sig_in, vz, pose_in, logw2, *planes, *sig_planes, lv, lc)

    logw_n = results[0][:, 0]
    mx, my, cxx, cxy, cyy = results[1:6]
    sig_res = results[6 : 6 + sig_dim]
    lv_n, lc_n = results[6 + sig_dim], results[7 + sig_dim]
    n_match = results[8 + sig_dim][:, 0]

    unpad = lambda a: a[:, :L]
    lm_mean_n = jnp.stack([unpad(mx), unpad(my)], axis=-1)
    cov_rows = jnp.stack(
        [
            jnp.stack([unpad(cxx), unpad(cxy)], axis=-1),
            jnp.stack([unpad(cxy), unpad(cyy)], axis=-1),
        ],
        axis=-2,
    )
    if sig_dim > 0:
        lm_sig_n = jnp.stack([unpad(s) for s in sig_res], axis=-1)
    else:
        lm_sig_n = lm_sig
    return (
        logw_n,
        lm_mean_n,
        cov_rows,
        lm_sig_n,
        unpad(lv_n) > 0.5,
        unpad(lc_n).astype(jnp.int32),
        n_match,
    )


def _kernel_entry(z_ref, sig_ref, vz_ref, pose_ref, logw_ref,
                  mx, my, cxx, cxy, cyy, *rest, sig_dim, **kw):
    _kernel(
        z_ref, sig_ref, vz_ref, pose_ref, logw_ref,
        mx, my, cxx, cxy, cyy, rest, sig_dim=sig_dim, **kw,
    )
