"""Fused FastSLAM measurement-update Pallas kernel (2-D range-bearing).

This is the hot loop BASELINE.json:5 names: "propagation, EKF
innovation/Kalman-gain updates ... are single fused Pallas kernels".

Association semantics (v2, shared bit-for-bit with the XLA reference path
`filter/fastslam.py`): **parallel pre-frame association, per-lane
sequential composition.**  Every observation of a frame is scored against
the PRE-FRAME map (maximum-likelihood over landmarks, per particle); new
landmarks allocate free slots in observation order; observations that
associate to the same landmark apply their EKF updates sequentially in
observation order ("collision rounds" in-kernel, a sequential scan in the
XLA twin — identical arithmetic, identical results).  This differs from
the textbook strictly-sequential formulation (SURVEY.md §3) only in that
observation i's ASSOCIATION does not see observation i-1's update — the
standard batched formulation for SIMD hardware: within one frame the map
barely moves, detections are NMS-deduplicated, and the Monte-Carlo filter
is robust to it (golden-ATE regression tests pin the accuracy).

v3 kernel schedule (same v2 semantics, restructured for VPU issue rate —
the v2 kernel measured 44 ms at the KITTI bench shape, v3 targets <15 ms):

  * **Fused single-pass scoring.** v2 cached per-lane geometry in six
    [P, L] VMEM scratch planes and re-loaded all six per observation
    (≈6 extra vreg loads per pair, ≈40% of the sweep's issue slots).
    v3 computes geometry once per landmark chunk into live values and
    loops observations over them; the per-(obs, lane) work drops to the
    13-op likelihood evaluation plus a 3-op running argmax.
  * **Slice-tournament argmax.** v2 did two full reduction passes per
    (obs, chunk) (max, then masked-min for the index).  v3 keeps a
    running (best-ll, best-lane) pair per 128-lane vreg position and
    defers the cross-lane reduction to one tiny [P, 128] pass per
    observation at the end.  Strict `>` comparisons preserve the exact
    first-match lane-min tie-breaking of v2 (earliest chunk/slice wins;
    the final masked-min picks the smallest lane among global maxima).
  * **Guarded hole scan.** Free-slot discovery cost v2 ~10 ms per call:
    n_fs (=Z) full-plane iterated-min sweeps, even when the map had no
    holes (the common case — holes only exist after culls).  v3 counts
    holes in one sweep and skips the per-slot sweeps entirely via
    `pl.when(max_holes > j)`.
  * **Cull fused into the apply pass.** Round 1 of the apply phase
    already has every updated plane value live in registers; FOV culling
    runs there instead of a separate full-plane pass.  This is exact:
    collision rounds (2+) only touch lanes already matched in round 1,
    and matched lanes are never cull-decremented.
  * **Chunk-guarded collision rounds.** Rounds 2+ only run over chunks
    that actually contain a pending target (scalar test on the narrow
    [P, Z] target list), so collision resolution costs O(colliding
    lanes), not O(L) per round.
  * **Pt=32 particle tiles.** v2 ran 8-particle tiles (256 grid steps at
    the bench shape); measured scaling showed ~40% of wall time was
    per-step overhead.  v3 budgets 48 MB of VMEM (v5e has 128 MB) for
    32-particle tiles.

A bf16 MXU feature-matmul formulation of the scoring sweep was prototyped
and REJECTED: expanding the Mahalanobis quadratic for the matmul cancels
catastrophically in bf16 (measured: max |ll| error 1.7, 20% argmax
agreement), so scoring stays on the VPU in exact fp32 difference form.

TPU layout: per-particle landmark maps as structure-of-arrays planes
[P, L] (mean-x, mean-y, cov-xx/xy/yy, signature channels, valid, count),
VMEM-resident for the whole frame.  The landmark axis is processed in
chunks with a DYNAMIC trip count bounded by the map's high-watermark
(`active_hi`): allocation is first-free-slot so lanes beyond the highest
ever-allocated slot are never valid, and frames early in a run (or any
run whose map is far below capacity Lmax) skip the dead lanes entirely —
the whole sweep scales with the LIVE map, not the capacity.

Math per (particle p, landmark l, observation z) — SURVEY.md §3:
  dx, dy   = mean - pose.xy;  q = dx²+dy²;  r = √q
  zhat     = [r, atan2(dy, dx) - pose.θ]
  H        = [[dx/r, dy/r], [-dy/q, dx/q]]        (∂h/∂mean)
  Q        = H Σ Hᵀ + R;   ν = z ⊖ zhat (bearing wrapped)
  ℓ        = -½(νᵀQ⁻¹ν + log|Q| + 2 log 2π) - ½‖sig_z - sig_l‖²/σ_s²
  ĵ        = argmax_l ℓ;  new landmark iff max ℓ < log p₀
  update   : K = ΣHᵀQ⁻¹;  μ += Kν;  Σ ← (I-KH)Σ;  w += ℓ
  new      : μ = h⁻¹(pose, z);  Σ = H⁻¹R H⁻ᵀ;  w += log p₀
All 2×2 inverses are closed-form cofactors; no linalg.solve in-kernel.
Index selection is explicit first-match lane-min (Mosaic argmax
tie-breaking differs from interpret mode); padding lanes are never
associated or allocated.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parakeet_slam_tpu.kernels import ekf_common, mathx

_NEG_INF = -1e30
_LOG_2PI = math.log(2.0 * math.pi)
_BIG_LANE = 2**30

_atan2 = mathx.atan2
_wrap = mathx.wrap_angle


def _kernel(
    # SMEM observation arrays + active watermark (in score-chunk units)
    z_ref, sig_ref, vz_ref, hi_ref,
    # VMEM per-particle inputs
    pose_ref, logw_ref,
    mx_ref, my_ref, cxx_ref, cxy_ref, cyy_ref,
    refs,
    *,
    num_obs: int,
    num_landmarks: int,
    sig_dim: int,
    sc: int,
    ac: int,
    r_var: tuple[float, float],
    sig_var: float,
    log_p0: float,
    init_infl: float,
    max_range: float,
    fov_half: float,
    cull: bool,
    cull_unseen: bool,
    update_weights: bool,
):
    S = sig_dim
    sig_in = refs[:S]
    lv_ref, lc_ref = refs[S], refs[S + 1]
    out = refs[S + 2 : S + 2 + 9 + S]
    (logw_o, mx_o, my_o, cxx_o, cxy_o, cyy_o) = out[:6]
    sig_out = out[6 : 6 + S]
    lv_o, lc_o = out[6 + S], out[7 + S]
    nmatch_o = out[8 + S]
    tail = refs[S + 2 + 9 + S :]
    # narrow scratch [Pt, Zp]: top ll / idx, free-slot list, target, flags
    top_ll, top_ix, fs_s, tgt_s, new_s, done_s = tail[0:6]
    # per-obs running argmax accumulators [Pt, Z*128]
    acc_ll, acc_ix = tail[6], tail[7]

    P, L = mx_o.shape
    Z = num_obs
    r11, r22 = r_var

    # ---- init: copy state into the (aliased) output blocks ---------------
    logw_o[:, :] = logw_ref[:, :]
    mx_o[:, :] = mx_ref[:, :]
    my_o[:, :] = my_ref[:, :]
    cxx_o[:, :] = cxx_ref[:, :]
    cxy_o[:, :] = cxy_ref[:, :]
    cyy_o[:, :] = cyy_ref[:, :]
    for c in range(S):
        sig_out[c][:, :] = sig_in[c][:, :]
    lv_o[:, :] = lv_ref[:, :]
    lc_o[:, :] = lc_ref[:, :]
    nmatch_o[:, :] = jnp.zeros((P, 1), jnp.float32)
    acc_ll[:, :] = jnp.full(acc_ll.shape, _NEG_INF, jnp.float32)
    acc_ix[:, :] = jnp.zeros(acc_ix.shape, jnp.float32)
    top_ll[:, :] = jnp.full(top_ll.shape, _NEG_INF, jnp.float32)
    top_ix[:, :] = jnp.zeros(top_ix.shape, jnp.float32)

    px = pose_ref[:, 0:1]
    py = pose_ref[:, 1:2]
    pth = pose_ref[:, 2:3]
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (P, sc), 1)
    lane_a = jax.lax.broadcasted_iota(jnp.int32, (P, ac), 1)
    obs_lane = jax.lax.broadcasted_iota(jnp.int32, top_ll.shape, 1)

    # Active region in score-chunk (sc) units: chunks that can hold valid
    # lanes now; allocations may spill one apply-chunk past the watermark.
    nca = hi_ref[0]                      # active score-chunks
    hi_c = nca * sc                      # first fully-virgin lane
    nca_a = (hi_c + ac - 1) // ac        # active apply-chunks
    ncw = jnp.minimum(nca_a + 1, L // ac)  # apply/write bound

    # ---- pass 1: fused geometry + scoring over active chunks -------------
    # Per chunk: compute the per-lane geometry/likelihood coefficients once
    # into live values, then evaluate all Z observations against them with
    # a slice-tournament running argmax (see module docstring).
    def score_chunk(c, _):
        sl = pl.ds(c * sc, sc)
        dx = mx_o[:, sl] - px
        dy = my_o[:, sl] - py
        q = dx * dx + dy * dy + 1e-12
        r = jnp.sqrt(q)
        h11 = dx / r
        h12 = dy / r
        h21 = -dy / q
        h22 = dx / q
        sxx, sxy, syy = cxx_o[:, sl], cxy_o[:, sl], cyy_o[:, sl]
        a11 = h11 * sxx + h12 * sxy
        a12 = h11 * sxy + h12 * syy
        q11 = a11 * h11 + a12 * h12 + r11
        q12 = a11 * h21 + a12 * h22
        q22 = (h21 * sxx + h22 * sxy) * h21 + (h21 * sxy + h22 * syy) * h22 + r22
        det = jnp.maximum(q11 * q22 - q12 * q12, 1e-12)
        th = _atan2(dy, dx) - pth
        Af = -0.5 * (q22 / det)
        Bf = q12 / det
        Cf = -0.5 * (q11 / det)
        lanes = lane_s + c * sc
        ok = (lv_o[:, sl] > 0) & (lanes < num_landmarks)
        ldf = jnp.where(ok, -0.5 * (jnp.log(det) + 2.0 * _LOG_2PI), _NEG_INF)
        sigs = [sig_out[s][:, sl] for s in range(S)]
        lanes_f = lanes.astype(jnp.float32)

        for i in range(Z):
            nu1 = z_ref[i, 0] - r
            nu2 = _wrap(z_ref[i, 1] - th)
            # clamp: indefinite Q (fp-drifted cov) must lose the argmax, not
            # win it with a sign-flipped "negative distance" (quad = -maha/2)
            ll = jnp.minimum(
                (Af * nu1 + Bf * nu2) * nu1 + Cf * nu2 * nu2, 0.0
            ) + ldf
            for s in range(S):
                ds_ = sigs[s] - sig_ref[i, s]
                ll = ll - (0.5 / sig_var) * ds_ * ds_
            t1 = jnp.max(ll, axis=1, keepdims=True)
            i1 = jnp.min(
                jnp.where(ll == t1, lanes_f, jnp.float32(_BIG_LANE)),
                axis=1, keepdims=True)
            old = top_ll[:, i : i + 1]
            better = t1 > old
            top_ll[:, i : i + 1] = jnp.where(better, t1, old)
            top_ix[:, i : i + 1] = jnp.where(better, i1, top_ix[:, i : i + 1])
        return 0

    jax.lax.fori_loop(0, nca, score_chunk, 0, unroll=False)


    # ---- pass 2+3: free slots + vectorized association (shared helpers) --
    n_fs = min(Z, 64)
    ekf_common.fill_free_slots(
        fs_s, lv_o, lane_s, chunk=sc, nca=nca, hi_c=hi_c,
        num_landmarks=num_landmarks, n_fs=n_fs, obs_lane=obs_lane,
    )
    valid_obs, is_new, ll1, n_assoc = ekf_common.associate(
        top_ll, top_ix, fs_s, tgt_s, new_s, done_s, vz_ref, obs_lane,
        num_obs=Z, n_fs=n_fs, log_p0=log_p0,
    )
    nmatch_o[:, :] = n_assoc

    if update_weights:
        dw = jnp.where(is_new, log_p0, ll1)
        logw_o[:, :] = logw_o[:, :] + jnp.sum(
            jnp.where(valid_obs, dw, 0.0), axis=1, keepdims=True
        )

    # ---- pass 4: apply (round 1 full, with fused cull) --------------------
    # Each round, every pending target lane consumes its lowest-index
    # pending observation and applies the EKF update (or allocation init)
    # in plane space.  Round 1 consumes every observation whose target lane
    # is unique; collision rounds 2+ (same-lane multi-obs) run chunk-guarded.
    def apply_chunk(c, first_round: bool):
        sl = pl.ds(c * ac, ac)
        lanes = lane_a + c * ac
        lanes_f = lanes.astype(jnp.float32)
        already = jnp.zeros((P, ac), jnp.bool_)
        zr_b = jnp.zeros((P, ac), jnp.float32)
        zphi_b = jnp.zeros((P, ac), jnp.float32)
        sig_b = [jnp.zeros((P, ac), jnp.float32) for _ in range(S)]
        isnew_b = jnp.zeros((P, ac), jnp.float32)

        for i in range(Z):
            hit = (
                (tgt_s[:, i : i + 1] == lanes_f)
                & (done_s[:, i : i + 1] < 0.5)
                & ~already
            )
            already = already | hit
            zr_b = jnp.where(hit, z_ref[i, 0], zr_b)
            zphi_b = jnp.where(hit, z_ref[i, 1], zphi_b)
            for s in range(S):
                sig_b[s] = jnp.where(hit, sig_ref[i, s], sig_b[s])
            isnew_b = jnp.where(hit, new_s[:, i : i + 1], isnew_b)
            # obs i is consumed this round iff any lane took it
            took = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)
            done_s[:, i : i + 1] = jnp.maximum(done_s[:, i : i + 1], took)

        upd_m = already & (isnew_b < 0.5)
        alloc_m = already & (isnew_b > 0.5)

        # --- EKF update at matched lanes (same op order as the XLA twin's
        # narrow-space update: bit-exact parity) ----------------------------
        mx = mx_o[:, sl]
        my = my_o[:, sl]
        sxx, sxy, syy = cxx_o[:, sl], cxy_o[:, sl], cyy_o[:, sl]
        dx = mx - px
        dy = my - py
        q = dx * dx + dy * dy + 1e-12
        r = jnp.sqrt(q)
        h11 = dx / r
        h12 = dy / r
        h21 = -dy / q
        h22 = dx / q
        a11 = h11 * sxx + h12 * sxy
        a12 = h11 * sxy + h12 * syy
        a21 = h21 * sxx + h22 * sxy
        a22 = h21 * sxy + h22 * syy
        q11 = a11 * h11 + a12 * h12 + r11
        q12 = a11 * h21 + a12 * h22
        q22 = a21 * h21 + a22 * h22 + r22
        det = jnp.maximum(q11 * q22 - q12 * q12, 1e-12)
        qi11 = q22 / det
        qi12 = -q12 / det
        qi22 = q11 / det
        nu1 = zr_b - r
        nu2 = _wrap(zphi_b - (_atan2(dy, dx) - pth))
        b11 = sxx * h11 + sxy * h12
        b12 = sxx * h21 + sxy * h22
        b21 = sxy * h11 + syy * h12
        b22 = sxy * h21 + syy * h22
        k11 = b11 * qi11 + b12 * qi12
        k12 = b11 * qi12 + b12 * qi22
        k21 = b21 * qi11 + b22 * qi12
        k22 = b21 * qi12 + b22 * qi22
        mx_u = mx + k11 * nu1 + k12 * nu2
        my_u = my + k21 * nu1 + k22 * nu2
        i11 = 1.0 - (k11 * h11 + k12 * h21)
        i12 = -(k11 * h12 + k12 * h22)
        i21 = -(k21 * h11 + k22 * h21)
        i22 = 1.0 - (k21 * h12 + k22 * h22)
        cxx_u = i11 * sxx + i12 * sxy
        cxy_u = 0.5 * ((i11 * sxy + i12 * syy) + (i21 * sxx + i22 * sxy))
        cyy_u = i21 * sxy + i22 * syy

        # --- allocation init at alloc lanes --------------------------------
        ang = pth + zphi_b
        ca = jnp.cos(ang)
        sa = jnp.sin(ang)
        nx = px + zr_b * ca
        ny = py + zr_b * sa
        zr2 = zr_b * zr_b
        n_cxx = init_infl * (r11 * ca * ca + r22 * zr2 * sa * sa)
        n_cxy = init_infl * ((r11 - r22 * zr2) * ca * sa)
        n_cyy = init_infl * (r11 * sa * sa + r22 * zr2 * ca * ca)

        mxf = jnp.where(upd_m, mx_u, jnp.where(alloc_m, nx, mx))
        myf = jnp.where(upd_m, my_u, jnp.where(alloc_m, ny, my))
        cxxf = jnp.where(upd_m, cxx_u, jnp.where(alloc_m, n_cxx, sxx))
        cxyf = jnp.where(upd_m, cxy_u, jnp.where(alloc_m, n_cxy, sxy))
        cyyf = jnp.where(upd_m, cyy_u, jnp.where(alloc_m, n_cyy, syy))
        lc_old = lc_o[:, sl]
        lcf = jnp.where(upd_m, lc_old + 2.0, jnp.where(alloc_m, 1.0, lc_old))
        lvf = jnp.where(alloc_m, 1.0, lv_o[:, sl])

        if S:
            cnt = jnp.maximum(lcf, 1.0)
            for s in range(S):
                so = sig_out[s][:, sl]
                sig_u = so + (sig_b[s] - so) / cnt
                sig_out[s][:, sl] = jnp.where(
                    upd_m, sig_u, jnp.where(alloc_m, sig_b[s], so)
                )

        # --- FOV cull, fused into round 1 (exact: collision rounds only
        # touch matched lanes, which are never cull-decremented) ------------
        if cull and first_round:
            if cull_unseen:
                # decay-eviction: every valid unmatched lane ages
                # (config.cull_unseen — long-trajectory lane recycling)
                dec = (lvf > 0) & (lanes < num_landmarks) & ~already
            else:
                dxc = mxf - px
                dyc = myf - py
                rc = jnp.sqrt(dxc * dxc + dyc * dyc + 1e-12)
                phi = _wrap(_atan2(dyc, dxc) - pth)
                in_fov = (rc < max_range) & (jnp.abs(phi) < fov_half)
                dec = (
                    (lvf > 0)
                    & (lanes < num_landmarks)
                    & in_fov
                    & ~already
                )
            lcf = lcf - dec.astype(jnp.float32)
            lvf = jnp.where((lvf > 0) & (lcf >= 0.0), 1.0, 0.0)

        mx_o[:, sl] = mxf
        my_o[:, sl] = myf
        cxx_o[:, sl] = cxxf
        cxy_o[:, sl] = cxyf
        cyy_o[:, sl] = cyyf
        lc_o[:, sl] = lcf
        lv_o[:, sl] = lvf

    def round1_chunk(c, _):
        apply_chunk(c, first_round=True)
        return 0

    jax.lax.fori_loop(0, ncw, round1_chunk, 0, unroll=False)

    if Z > 1:
        # Early-exit WHILE loop over collision rounds (see the 3-D kernel:
        # a fixed fori(1, Z) sweep paid (Z-1) x ncw narrow checks + scalar
        # branch stalls per tile even with zero collisions — the round-4
        # bisection measured that overhead as the largest cost in the
        # frame). Runs exactly as many rounds as the deepest collision
        # chain.
        def round_cond(carry):
            m, pend = carry
            return pend & (m < Z)

        def round_body(carry):
            m, _ = carry

            def chunk_body(c, _):
                # skip chunks with no pending target lane
                lo = (c * ac).astype(jnp.float32)
                hi = ((c + 1) * ac).astype(jnp.float32)
                in_c = (
                    (done_s[:, :] < 0.5)
                    & (tgt_s[:, :] >= lo)
                    & (tgt_s[:, :] < hi)
                )
                has_t = jnp.max(in_c.astype(jnp.float32)) > 0.0

                @pl.when(has_t)
                def _():
                    apply_chunk(c, first_round=False)

                return 0

            jax.lax.fori_loop(0, ncw, chunk_body, 0, unroll=False)
            pend = jnp.max((done_s[:, :] < 0.5).astype(jnp.float32)) > 0.0
            return m + 1, pend

        pend0 = jnp.max((done_s[:, :] < 0.5).astype(jnp.float32)) > 0.0
        jax.lax.while_loop(round_cond, round_body, (jnp.int32(1), pend0))


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "sig_dim", "r_var", "sig_var", "log_p0", "init_infl",
        "max_range", "fov_half", "cull", "cull_unseen", "interpret",
        "update_weights",
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
    cull_unseen: bool = False,
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

    # chunk sizes MUST divide Lp (the landmark axis is tiled exactly).
    # sc: scoring chunk (geometry lives in registers across the obs loop —
    # small enough to bound register pressure); ac: apply chunk.
    sc = next(c for c in (2048, 1024, 512, 256, 128) if Lp % c == 0)
    ac = next(c for c in (1024, 512, 256, 128) if Lp % c == 0)

    # Active high-watermark in score-chunk units: number of leading chunks
    # that contain any ever-allocated lane.  Allocation is first-free-slot,
    # so all valid lanes live below the watermark; the kernel's dynamic
    # trip counts skip everything above it.
    hi_lane = jnp.max(
        jnp.where(lm_valid, jnp.arange(L, dtype=jnp.int32)[None, :], -1)
    )
    nca = jnp.clip((hi_lane + sc) // sc, 0, Lp // sc).astype(jnp.int32)

    out_shape = (
        [jax.ShapeDtypeStruct((P, 1), jnp.float32)]
        + [jax.ShapeDtypeStruct((P, Lp), jnp.float32)] * (5 + sig_dim + 2)
        + [jax.ShapeDtypeStruct((P, 1), jnp.float32)]  # n_match (not aliased)
    )

    n_planes = 7 + sig_dim
    Zp = _round_up(max(Z, 128), 128)
    budget = 48 * 1024 * 1024
    # in+out x2buf planes + 2 per-obs argmax accumulators + narrow scratch
    per_particle = (2 * 2 * n_planes * Lp + 2 * Z * 128 + 6 * Zp) * 4
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
        [smem(), smem(), smem(), smem()]
        + [row(pose_in.shape[1]), row(1)]
        + [plane()] * (5 + sig_dim + 2)
    )
    out_specs = tuple([row(1)] + [plane()] * (5 + sig_dim + 2) + [row(1)])
    scratch = (
        [pltpu.VMEM((Pt, Zp), jnp.float32) for _ in range(6)]      # narrow
        + [pltpu.VMEM((Pt, Z * 128), jnp.float32) for _ in range(2)]  # argmax
    )

    kernel = functools.partial(
        _kernel_entry,
        sig_dim=sig_dim,
        num_obs=Z,
        num_landmarks=L,
        sc=sc,
        ac=ac,
        r_var=r_var,
        sig_var=sig_var,
        log_p0=log_p0,
        init_infl=init_infl,
        max_range=max_range,
        fov_half=fov_half,
        cull=cull,
        cull_unseen=cull_unseen,
        update_weights=update_weights,
    )

    # Alias the big planes in-place: inputs [5=logw, 6..] -> outputs [0..].
    aliases = {5 + i: i for i in range(n_aliased)}

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
    )(z_in, sig_in, vz, nca[None], pose_in, logw2, *planes, *sig_planes, lv, lc)

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


def _kernel_entry(z_ref, sig_ref, vz_ref, hi_ref, pose_ref, logw_ref,
                  mx, my, cxx, cxy, cyy, *rest, sig_dim, **kw):
    _kernel(
        z_ref, sig_ref, vz_ref, hi_ref, pose_ref, logw_ref,
        mx, my, cxx, cxy, cyy, rest, sig_dim=sig_dim, **kw,
    )
