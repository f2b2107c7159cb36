"""Fused FastSLAM measurement-update Pallas kernel (2-D range-bearing).

This is the hot loop BASELINE.json:5 names: "propagation, EKF
innovation/Kalman-gain updates ... are single fused Pallas kernels".

TPU-first layout: the per-particle landmark maps are viewed as
structure-of-arrays planes of shape [P, L] (mean-x, mean-y, cov-xx, cov-xy,
cov-yy, signature channels, valid, count). One kernel invocation processes
ALL Z observations of a frame sequentially (the textbook FastSLAM ordering
— association of obs i sees obs i-1's map), with every plane resident in
VMEM for the whole frame: zero HBM round-trips between observations,
everything elementwise on the VPU with lane-axis reductions for the
per-particle argmax association. The equivalent XLA path
(`filter/fastslam.py::_process_observation`) materializes [P, L, 2, 2]
intermediates in HBM per observation.

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
twin) — no linalg.solve in-kernel.
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
    sig_in_refs_and_rest,
    *,
    num_obs: int,
    num_landmarks: int,
    sig_dim: int,
    r_var: tuple[float, float],
    sig_var: float,
    log_p0: float,
    init_infl: float,
    max_range: float,
    fov_half: float,
    cull: bool,
):
    # Unpack variadic refs: sig planes (in), valid, count, then outputs.
    refs = sig_in_refs_and_rest
    sig_in = refs[:sig_dim]
    lv_ref, lc_ref = refs[sig_dim], refs[sig_dim + 1]
    out = refs[sig_dim + 2:]
    (logw_o, mx_o, my_o, cxx_o, cxy_o, cyy_o) = out[:6]
    sig_out = out[6 : 6 + sig_dim]
    lv_o, lc_o = out[6 + sig_dim], out[7 + sig_dim]
    nmatch_o = out[8 + sig_dim]

    P, L = mx_ref.shape
    px = pose_ref[:, 0:1]   # [P, 1]
    py = pose_ref[:, 1:2]
    pth = pose_ref[:, 2:3]

    lane = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)
    # Lanes beyond the real landmark capacity are padding: never associate
    # into them, never allocate them. (Mosaic argmax tie-breaking also
    # differs from interpret mode, so all index selection below is explicit
    # first-match lane-min — deterministic on every backend.)
    real_lane = lane < num_landmarks
    BIG_LANE = jnp.int32(2**30)

    r11, r22 = r_var
    state0 = (
        logw_ref[:, 0:1],
        mx_ref[:, :], my_ref[:, :],
        cxx_ref[:, :], cxy_ref[:, :], cyy_ref[:, :],
        tuple(s[:, :] for s in sig_in),
        lv_ref[:, :],                       # float32 0/1
        lc_ref[:, :],                       # float32 counts
        jnp.zeros((P, L), jnp.float32),     # matched mask
        jnp.zeros((P, 1), jnp.float32),     # per-particle associated-obs count
    )

    def obs_body(i, st):
        (logw, mx, my, cxx, cxy, cyy, sigs, lv, lc, matched, nmatch) = st
        zr = z_ref[i, 0]
        zphi = z_ref[i, 1]
        ovalid = vz_ref[i] > 0

        dx = mx - px
        dy = my - py
        q = dx * dx + dy * dy + 1e-12
        r = jnp.sqrt(q)
        # H rows
        h11 = dx / r
        h12 = dy / r
        h21 = -dy / q
        h22 = dx / q
        # A = H Σ (Σ = [[cxx,cxy],[cxy,cyy]])
        a11 = h11 * cxx + h12 * cxy
        a12 = h11 * cxy + h12 * cyy
        a21 = h21 * cxx + h22 * cxy
        a22 = h21 * cxy + h22 * cyy
        # Q = A Hᵀ + R
        q11 = a11 * h11 + a12 * h12 + r11
        q12 = a11 * h21 + a12 * h22
        q22 = a21 * h21 + a22 * h22 + r22
        det = q11 * q22 - q12 * q12
        det = jnp.maximum(det, 1e-12)
        qi11 = q22 / det
        qi12 = -q12 / det
        qi22 = q11 / det
        nu1 = zr - r
        nu2 = _wrap(zphi - (_atan2(dy, dx) - pth))
        maha = nu1 * nu1 * qi11 + 2.0 * nu1 * nu2 * qi12 + nu2 * nu2 * qi22
        ll = -0.5 * (maha + jnp.log(det) + 2.0 * _LOG_2PI)
        for c in range(sig_dim):
            ds = sigs[c] - sig_ref[i, c]
            ll = ll - 0.5 * ds * ds / sig_var
        ll = jnp.where((lv > 0) & real_lane, ll, _NEG_INF)

        best_ll = jnp.max(ll, axis=1, keepdims=True)          # [P, 1]
        best_idx = jnp.min(                                   # first-match
            jnp.where(ll == best_ll, lane, BIG_LANE), axis=1, keepdims=True
        )
        onehot = (lane == best_idx) & (lv > 0)
        any_valid = best_ll > _NEG_INF / 2
        is_new = (best_ll < log_p0) | ~any_valid              # [P, 1]
        upd_mask = onehot & ~is_new & ovalid                  # [P, L]

        # --- EKF update (masked over the associated lane) -------------
        # K = Σ Hᵀ Q⁻¹ : b = Σ Hᵀ  (b columns), K = b @ Qinv
        b11 = cxx * h11 + cxy * h12
        b12 = cxx * h21 + cxy * h22
        b21 = cxy * h11 + cyy * h12
        b22 = cxy * h21 + cyy * h22
        k11 = b11 * qi11 + b12 * qi12
        k12 = b11 * qi12 + b12 * qi22
        k21 = b21 * qi11 + b22 * qi12
        k22 = b21 * qi12 + b22 * qi22
        mx_u = mx + k11 * nu1 + k12 * nu2
        my_u = my + k21 * nu1 + k22 * nu2
        # (I - K H) Σ
        i11 = 1.0 - (k11 * h11 + k12 * h21)
        i12 = -(k11 * h12 + k12 * h22)
        i21 = -(k21 * h11 + k22 * h21)
        i22 = 1.0 - (k21 * h12 + k22 * h22)
        cxx_u = i11 * cxx + i12 * cxy
        cxy_u = i11 * cxy + i12 * cyy
        cyx_u = i21 * cxx + i22 * cxy
        cyy_u = i21 * cxy + i22 * cyy
        cxy_s = 0.5 * (cxy_u + cyx_u)

        mx = jnp.where(upd_mask, mx_u, mx)
        my = jnp.where(upd_mask, my_u, my)
        cxx = jnp.where(upd_mask, cxx_u, cxx)
        cxy = jnp.where(upd_mask, cxy_s, cxy)
        cyy = jnp.where(upd_mask, cyy_u, cyy)
        lc = jnp.where(upd_mask, lc + 2.0, lc)
        new_sigs = []
        for c in range(sig_dim):
            cnt = jnp.maximum(lc, 1.0)
            s_u = sigs[c] + (sig_ref[i, c] - sigs[c]) / cnt
            new_sigs.append(jnp.where(upd_mask, s_u, sigs[c]))
        sigs = tuple(new_sigs)

        # --- new landmark allocation ----------------------------------
        # first free REAL slot (explicit lane-min; padding excluded)
        free_lanes = jnp.where((lv < 0.5) & real_lane, lane, BIG_LANE)
        free_idx = jnp.min(free_lanes, axis=1, keepdims=True)  # [P, 1]
        has_free = free_idx < BIG_LANE
        alloc = (lane == free_idx) & is_new & has_free & ovalid
        ang = pth + zphi
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        nx = px + zr * ca
        ny = py + zr * sa
        # Σ₀ = H⁻¹ R H⁻ᵀ at the init point, closed form:
        # H at (dx,dy) = zr*(ca,sa): H = [[ca, sa], [-sa/zr, ca/zr]],
        # H⁻¹ = [[ca, -zr*sa], [sa, zr*ca]]
        zr2 = zr * zr
        n_cxx = init_infl * (r11 * ca * ca + r22 * zr2 * sa * sa)
        n_cxy = init_infl * ((r11 - r22 * zr2) * ca * sa)
        n_cyy = init_infl * (r11 * sa * sa + r22 * zr2 * ca * ca)
        mx = jnp.where(alloc, nx, mx)
        my = jnp.where(alloc, ny, my)
        cxx = jnp.where(alloc, n_cxx, cxx)
        cxy = jnp.where(alloc, n_cxy, cxy)
        cyy = jnp.where(alloc, n_cyy, cyy)
        lv = jnp.where(alloc, 1.0, lv)
        lc = jnp.where(alloc, 1.0, lc)
        sigs = tuple(
            jnp.where(alloc, sig_ref[i, c], sigs[c]) for c in range(sig_dim)
        )

        # --- importance weight ----------------------------------------
        dw = jnp.where(is_new, log_p0, best_ll)
        logw = logw + jnp.where(ovalid, dw, 0.0)

        matched = jnp.where(upd_mask | alloc, 1.0, matched)
        handled = jnp.max(
            jnp.where(upd_mask | alloc, 1.0, 0.0), axis=1, keepdims=True
        )
        nmatch = nmatch + handled
        return (logw, mx, my, cxx, cxy, cyy, sigs, lv, lc, matched, nmatch)

    st = jax.lax.fori_loop(0, num_obs, obs_body, state0)
    (logw, mx, my, cxx, cxy, cyy, sigs, lv, lc, matched, nmatch) = st

    if cull:
        dx = mx - px
        dy = my - py
        r = jnp.sqrt(dx * dx + dy * dy + 1e-12)
        phi = _wrap(_atan2(dy, dx) - pth)
        in_fov = (r < max_range) & (jnp.abs(phi) < fov_half)
        dec = (lv > 0) & real_lane & in_fov & (matched < 0.5)
        lc = lc - dec.astype(jnp.float32)
        lv = jnp.where((lv > 0) & (lc >= 0.0), 1.0, 0.0)

    logw_o[:, :] = logw
    mx_o[:, :] = mx
    my_o[:, :] = my
    cxx_o[:, :] = cxx
    cxy_o[:, :] = cxy
    cyy_o[:, :] = cyy
    for c in range(sig_dim):
        sig_out[c][:, :] = sigs[c]
    lv_o[:, :] = lv
    lc_o[:, :] = lc
    nmatch_o[:, :] = nmatch


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "sig_dim", "r_var", "sig_var", "log_p0", "init_infl",
        "max_range", "fov_half", "cull", "interpret",
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
):
    """Pallas-fused frame measurement update for the range-bearing model.

    Array-layout adapter around `_kernel`: splits [P, L, ...] state into
    [P, L] planes (padded to lane width 128), invokes one fused kernel for
    the whole frame, and reassembles the ParticleState fields. Returns
    (pose-unchanged) updated (log_w, lm_mean, lm_cov, lm_sig, lm_valid,
    lm_count).
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

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [smem(), smem(), smem()] + [vmem()] * (2 + 5 + sig_dim + 2)
    out_specs = tuple([vmem()] * (n_aliased + 1))

    kernel = functools.partial(
        _kernel_entry,
        sig_dim=sig_dim,
        num_obs=Z,
        num_landmarks=L,
        r_var=r_var,
        sig_var=sig_var,
        log_p0=log_p0,
        init_infl=init_infl,
        max_range=max_range,
        fov_half=fov_half,
        cull=cull,
    )

    # Alias the big planes in-place: inputs [4=logw, 5..] -> outputs [0..].
    aliases = {4 + i: i for i in range(n_aliased)}

    results = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases=aliases,
        interpret=interpret,
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
