"""Fused FastSLAM measurement-update Pallas kernel for the 3-D vision
models (pinhole_3d / stereo_3d / equirect_3d).

The 2-D range-bearing twin lives in `kernels/ekf_update.py`; this kernel
covers the camera configs (TUM/KITTI/EuRoC/panoramic — BASELINE.json
configs 2-5), where the XLA path's per-pair materialization is the
bottleneck: each observation materializes H [P, L, Dz, 3] and
Q [P, L, Dz, Dz] in HBM (~300 MB each at P=1024, L=8192), roughly
60 GB of HBM traffic per 32-observation frame. Here the whole frame runs
with the landmark planes resident in VMEM: state is read from HBM once and
written once, regardless of Z.

Layout: structure-of-arrays [P, L] planes — mean x/y/z (3), covariance
upper triangle (6), packed BRIEF descriptor words (uint32 x W), valid,
count. The camera pose enters as a per-particle row [P, 12] holding the
world->camera rotation R_cw (9) and camera position t (3), precomputed in
XLA from the quaternion.

The small-matrix algebra (H = dproj/dp_cam . R_cw, Q = H S Ht + R, cofactor
inverses, K = S Ht Qinv, S' = (I-KH) S) is written ONCE over python lists
of planes and unrolled at trace time — the same code path serves the
[Pt, chunk] likelihood sweep and the [Pt, 1] per-particle update, and
Dz in {2, 3} is a static parameter.

Association and allocation follow the 2-D kernel exactly (v2 batched
semantics — see kernels/ekf_update.py: parallel pre-frame association,
per-lane sequential composition in collision rounds, free slots assigned
in observation order, landmark-axis chunk loops bounded by the live map's
high-watermark). Semantics match `filter/fastslam.py::measurement_core`
(parity-tested in tests/test_ekf3d_kernel.py).
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
_MIN_DEPTH = 0.1  # must match filter/models.py MIN_DEPTH

_atan2 = mathx.atan2
_wrap = mathx.wrap_angle


# ---------------------------------------------------------------------------
# Shape-generic small-matrix helpers (python lists of planes, unrolled)
# ---------------------------------------------------------------------------


def _matmul(A, B):
    """[r x k] @ [k x c] for nested lists of arrays."""
    r, k, c = len(A), len(B), len(B[0])
    return [
        [sum(A[i][t] * B[t][j] for t in range(k)) for j in range(c)]
        for i in range(r)
    ]


def _matvec(A, v):
    return [sum(A[i][t] * v[t] for t in range(len(v))) for i in range(len(A))]


def _transpose(A):
    return [[A[i][j] for i in range(len(A))] for j in range(len(A[0]))]


def _sym_inv_det(Q):
    """Inverse + det of a symmetric 2x2 or 3x3 given as nested lists."""
    n = len(Q)
    if n == 2:
        det = Q[0][0] * Q[1][1] - Q[0][1] * Q[0][1]
        det = jnp.maximum(det, 1e-12)
        inv = [[Q[1][1] / det, -Q[0][1] / det], [-Q[0][1] / det, Q[0][0] / det]]
        return inv, det
    a, b, c = Q[0][0], Q[0][1], Q[0][2]
    e, f, i = Q[1][1], Q[1][2], Q[2][2]
    A = e * i - f * f
    B = -(b * i - f * c)
    C = b * f - e * c
    E = a * i - c * c
    F = -(a * f - c * b)
    II = a * e - b * b
    det = a * A + b * B + c * C
    det = jnp.maximum(det, 1e-12)
    inv = [
        [A / det, B / det, C / det],
        [B / det, E / det, F / det],
        [C / det, F / det, II / det],
    ]
    return inv, det


def _inv3_general(H, eps=1e-9):
    """Cofactor inverse of a general 3x3 nested list (for stereo init)."""
    a, b, c = H[0]
    d, e, f = H[1]
    g, h, i = H[2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    Hc = -(a * f - c * d)
    II = a * e - b * d
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < eps, eps, det)
    return [
        [A / det, D / det, G / det],
        [B / det, E / det, Hc / det],
        [C / det, F / det, II / det],
    ]


# ---------------------------------------------------------------------------
# Measurement models in plane space
# ---------------------------------------------------------------------------


def _cam_point(R, t, m):
    """p_cam = R_cw (m - t); R nested [3][3], t/m lists of 3 planes."""
    d = [m[0] - t[0], m[1] - t[1], m[2] - t[2]]
    return _matvec(R, d)


def _model_hH(model, p, R, par):
    """(zhat list[Dz], H nested [Dz][3]) from camera-frame point p.

    H is d zhat / d m_world = (d zhat / d p_cam) . R_cw.
    """
    if model in ("pinhole_3d", "stereo_3d"):
        fx, fy, cx, cy = par["fx"], par["fy"], par["cx"], par["cy"]
        z = jnp.maximum(p[2], _MIN_DEPTH)
        iz = 1.0 / z
        u = fx * p[0] * iz + cx
        v = fy * p[1] * iz + cy
        zero = jnp.zeros_like(z)
        Hp = [
            [fx * iz, zero, -fx * p[0] * iz * iz],
            [zero, fy * iz, -fy * p[1] * iz * iz],
        ]
        zhat = [u, v]
        if model == "stereo_3d":
            fxb = par["fx"] * par["baseline"]
            zhat.append(fxb * iz)
            Hp.append([zero, zero, -fxb * iz * iz])
        return zhat, _matmul(Hp, R)
    # equirect_3d
    W_img, H_img = par["img_w"], par["img_h"]
    ku = W_img / (2.0 * math.pi)
    kv = H_img / math.pi
    x, y, z = p
    rho2 = x * x + y * y + 1e-9
    r2 = rho2 + z * z
    rho = jnp.sqrt(rho2)
    az = _atan2(y, x)
    el = _atan2(z, rho)  # asin(z/r) == atan2(z, rho)
    u = (az + math.pi) * ku
    v = (math.pi / 2.0 - el) * kv
    zero = jnp.zeros_like(x)
    du = [-ku * y / rho2, ku * x / rho2, zero]
    s = kv / (r2 * rho)
    dv = [x * z * s, y * z * s, -rho2 * s]
    return [u, v], _matmul([du, dv], R)


def _model_residual(model, zobs, zhat, par):
    nu = [zobs[k] - zhat[k] for k in range(len(zhat))]
    if model == "equirect_3d":
        W_img = par["img_w"]
        d = nu[0]
        nu[0] = d - W_img * jnp.floor(d / W_img + 0.5)
    return nu


def _model_in_fov(model, p, zhat, par, max_range):
    if model == "equirect_3d":
        r2 = p[0] * p[0] + p[1] * p[1] + p[2] * p[2]
        return r2 < max_range * max_range
    W_img, H_img = par["img_w"], par["img_h"]
    return (
        (p[2] > 0.05)
        & (p[2] < max_range)
        & (zhat[0] >= 0.0)
        & (zhat[0] < W_img)
        & (zhat[1] >= 0.0)
        & (zhat[1] < H_img)
    )


def _model_init(model, zobs, R, Rt, t, par, r_var, init_infl,
                init_range_prior, init_range_sigma):
    """New-landmark (mean list[3], cov upper-tri list[6]) in world frame.

    Rt = R_cw^T = R_wc (camera->world rotation).
    """
    if model == "stereo_3d":
        fx, fy, cx, cy = par["fx"], par["fy"], par["cx"], par["cy"]
        fxb = fx * par["baseline"]
        depth = fxb / jnp.maximum(zobs[2], 1e-3)
        pc = [(zobs[0] - cx) / fx * depth, (zobs[1] - cy) / fy * depth, depth]
        mw = _matvec(Rt, pc)
        mean = [t[k] + mw[k] for k in range(3)]
        # cov = infl * Hinv Rm Hinv^T with H at the init point
        _, H = _model_hH(model, pc, R, par)
        Hinv = _inv3_general(H)
        # Hinv @ diag(r_var) @ Hinv^T
        cov = [
            [
                sum(Hinv[i][k] * r_var[k] * Hinv[j][k] for k in range(3))
                * init_infl
                for j in range(3)
            ]
            for i in range(3)
        ]
        return mean, [cov[0][0], cov[0][1], cov[0][2],
                      cov[1][1], cov[1][2], cov[2][2]]
    if model == "pinhole_3d":
        fx, fy, cx, cy = par["fx"], par["fy"], par["cx"], par["cy"]
        rx = (zobs[0] - cx) / fx
        ry = (zobs[1] - cy) / fy
        rz = jnp.ones_like(rx)
        n = jnp.sqrt(rx * rx + ry * ry + 1.0)
        ray = [rx / n, ry / n, rz / n]
        sig_t = init_range_prior * math.sqrt(r_var[0]) / fx
    else:  # equirect_3d
        W_img, H_img = par["img_w"], par["img_h"]
        az = zobs[0] / W_img * 2.0 * math.pi - math.pi
        el = math.pi / 2.0 - zobs[1] / H_img * math.pi
        ce = jnp.cos(el)
        ray = [ce * jnp.cos(az), ce * jnp.sin(az), jnp.sin(el)]
        sig_t = init_range_prior * (2.0 * math.pi / par["img_w"]) * math.sqrt(
            r_var[0]
        )
    ray_w = _matvec(Rt, ray)
    mean = [t[k] + init_range_prior * ray_w[k] for k in range(3)]
    sr2 = init_range_sigma * init_range_sigma
    st2 = sig_t * sig_t
    cov6 = []
    for i in range(3):
        for j in range(i, 3):
            along = ray_w[i] * ray_w[j]
            eye = 1.0 if i == j else 0.0
            cov6.append(init_infl * (sr2 * along + st2 * (eye - along)))
    return mean, cov6


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

_COV_IDX = {  # (i, j) -> flat upper-tri index
    (0, 0): 0, (0, 1): 1, (0, 2): 2,
    (1, 0): 1, (1, 1): 3, (1, 2): 4,
    (2, 0): 2, (2, 1): 4, (2, 2): 5,
}

_UT2 = {(0, 0): 0, (0, 1): 1, (1, 0): 1, (1, 1): 2}


def _ut_idx(Dz):
    return _UT2 if Dz == 2 else _COV_IDX


def _predict_qi(model, m, S, R, t, par, r_var, Dz):
    """(zhat, Qinv, logdet) at landmark state (m, S) — the quantities the
    likelihood sweep needs, computed identically in [Pt, chunk] cache-fill
    space and [Pt, 1] refresh space so cached scores stay bit-exact."""
    p = _cam_point(R, t, m)
    zhat, H = _model_hH(model, p, R, par)
    HS = _matmul(H, S)
    Q = _matmul(HS, _transpose(H))
    for k in range(Dz):
        Q[k][k] = Q[k][k] + r_var[k]
    Qi, det = _sym_inv_det(Q)
    return zhat, Qi, jnp.log(det)


def _model_zhat(model, p, par):
    """Prediction only (no Jacobian) — cull pass / cheap in-FOV checks."""
    if model in ("pinhole_3d", "stereo_3d"):
        fx, fy, cx, cy = par["fx"], par["fy"], par["cx"], par["cy"]
        z = jnp.maximum(p[2], _MIN_DEPTH)
        iz = 1.0 / z
        zhat = [fx * p[0] * iz + cx, fy * p[1] * iz + cy]
        if model == "stereo_3d":
            zhat.append(par["fx"] * par["baseline"] * iz)
        return zhat
    W_img, H_img = par["img_w"], par["img_h"]
    x, y, z = p
    rho2 = x * x + y * y + 1e-9
    rho = jnp.sqrt(rho2)
    az = _atan2(y, x)
    el = _atan2(z, rho)
    return [(az + math.pi) * (W_img / (2.0 * math.pi)),
            (math.pi / 2.0 - el) * (H_img / math.pi)]


def _score_pass(
    mean_r, cov_r, desc_r, lv_r, z_ref, dz_ref, top_ll, top_ix,
    R, t, lane_s, nca,
    *, model, Dz, W, Z, sc, num_landmarks, par, r_var, desc_weight,
):
    """Pass 1 of the fused update (shared with the score-only kernel):
    fold per-(obs, particle) best association (ll, lane) over the active
    landmark chunks into top_ll/top_ix [Pt, Zp]."""
    P = lv_r.shape[0]

    def score_chunk(c, _):
        sl = pl.ds(c * sc, sc)
        m = [mean_r[k][:, sl] for k in range(3)]
        S = [[cov_r[_COV_IDX[(a, b)]][:, sl] for b in range(3)]
             for a in range(3)]
        zhat, Qi, ld0 = _predict_qi(model, m, S, R, t, par, r_var, Dz)
        lanes = lane_s + c * sc
        ok = (lv_r[:, sl] > 0) & (lanes < num_landmarks)
        ld = jnp.where(ok, ld0, -2.0 * _NEG_INF)  # +2e30 sinks invalid ll
        descs = [desc_r[w][:, sl] for w in range(W)]

        for i in range(Z):
            zobs = [z_ref[i, k] for k in range(Dz)]
            nu = _model_residual(model, zobs, zhat, par)
            maha = jnp.maximum(
                sum(nu[a] * Qi[a][b] * nu[b]
                    for a in range(Dz) for b in range(Dz)),
                0.0,
            )
            ll = -0.5 * (maha + ld + Dz * _LOG_2PI)
            if W > 0:
                ham = jnp.zeros_like(ll)
                for w in range(W):
                    x = jnp.bitwise_xor(descs[w], dz_ref[i, w])
                    ham = ham + jax.lax.population_count(x).astype(jnp.float32)
                ll = ll - desc_weight * ham
            t1 = jnp.max(ll, axis=1, keepdims=True)
            i1 = jnp.min(
                jnp.where(ll == t1, lanes, 2**30), axis=1, keepdims=True
            )
            old = top_ll[:, i : i + 1]
            better = t1 > old
            top_ll[:, i : i + 1] = jnp.where(better, t1, old)
            top_ix[:, i : i + 1] = jnp.where(
                better, i1.astype(jnp.float32), top_ix[:, i : i + 1]
            )
        return 0

    jax.lax.fori_loop(0, nca, score_chunk, 0, unroll=False)


def _kernel(
    z_ref, dz_ref, vz_ref, hi_ref,   # SMEM: [Z, Dz] f32, [Z, W] i32, [Z] i32, [1] i32
    cam_ref, logw_ref,               # VMEM rows: [Pt, 12], [Pt, 1]
    refs,
    *,
    model: str,
    Dz: int,
    desc_words: int,
    num_obs: int,
    num_landmarks: int,
    sc: int,
    ac: int,
    par: dict,
    r_var: tuple,
    desc_weight: float,
    log_p0: float,
    init_infl: float,
    init_range_prior: float,
    init_range_sigma: float,
    max_range: float,
    cull: bool,
    cull_unseen: bool,
    update_weights: bool,
    ext_scores: bool = False,
    freeze: int = 0,
    skip: tuple = (),
):
    W = desc_words
    mean_in = refs[0:3]
    cov_in = refs[3:9]
    desc_in = refs[9 : 9 + W]
    lv_ref, lc_ref = refs[9 + W], refs[10 + W]
    if ext_scores:
        ll_in, ix_in = refs[11 + W], refs[12 + W]
        out = refs[13 + W :]
    else:
        out = refs[11 + W :]
    logw_o = out[0]
    mean_o = out[1:4]
    cov_o = out[4:10]
    desc_o = out[10 : 10 + W]
    lv_o, lc_o = out[10 + W], out[11 + W]
    nmatch_o = out[12 + W]
    scratch = out[13 + W :]
    top_ll, top_ix, fs_s, tgt_s, new_s, done_s = scratch[0:6]
    lastj_s = scratch[6]

    P, L = mean_o[0].shape
    Z = num_obs

    # ---- init: copy state into aliased outputs ---------------------------
    logw_o[:, :] = logw_ref[:, :]
    for k in range(3):
        mean_o[k][:, :] = mean_in[k][:, :]
    for k in range(6):
        cov_o[k][:, :] = cov_in[k][:, :]
    for k in range(W):
        desc_o[k][:, :] = desc_in[k][:, :]
    lv_o[:, :] = lv_ref[:, :]
    lc_o[:, :] = lc_ref[:, :]
    nmatch_o[:, :] = jnp.zeros((P, 1), jnp.float32)
    lastj_s[:, :] = jnp.full((P, L), -1.0, jnp.float32)
    if ext_scores:
        # association precomputed by score_3d at the proposal pose
        # (FastSLAM 2.0): skip the landmark sweep entirely.
        top_ll[:, :] = ll_in[:, :]
        top_ix[:, :] = ix_in[:, :]
    else:
        top_ll[:, :] = jnp.full(top_ll.shape, _NEG_INF, jnp.float32)
        top_ix[:, :] = jnp.zeros(top_ix.shape, jnp.float32)

    R = [[cam_ref[:, 3 * i + j : 3 * i + j + 1] for j in range(3)]
         for i in range(3)]
    Rt = _transpose(R)
    t = [cam_ref[:, 9 + k : 10 + k] for k in range(3)]

    lane_s = jax.lax.broadcasted_iota(jnp.int32, (P, sc), 1)
    lane_a = jax.lax.broadcasted_iota(jnp.int32, (P, ac), 1)
    obs_lane = jax.lax.broadcasted_iota(jnp.int32, top_ll.shape, 1)

    nca = hi_ref[0]                      # active score-chunks
    hi_c = nca * sc                      # first fully-virgin lane
    nca_a = (hi_c + ac - 1) // ac        # active apply-chunks
    ncw = jnp.minimum(nca_a + 1, L // ac)  # apply/write bound

    # ---- pass 1: fused geometry + scoring over active chunks -------------
    # Per chunk: compute (zhat, Qinv, logdet) once into live values, then
    # evaluate all Z observations against them (see kernels/ekf_update.py
    # v3 docstring — same schedule, no VMEM cache roundtrip).
    if not ext_scores:
        _score_pass(
            mean_o, cov_o, desc_o, lv_o, z_ref, dz_ref, top_ll, top_ix,
            R, t, lane_s, nca,
            model=model, Dz=Dz, W=W, Z=Z, sc=sc,
            num_landmarks=num_landmarks, par=par, r_var=r_var,
            desc_weight=desc_weight,
        )

    # ---- pass 2+3: free slots + vectorized association -------------------
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

    # ---- pass 4: apply (round 1 full with fused cull; collision rounds
    # 2+ chunk-guarded) — see kernels/ekf_update.py v3 docstring ----------
    def apply_chunk(c, first_round: bool):
        sl = pl.ds(c * ac, ac)
        lanes = lane_a + c * ac
        lanes_f = lanes.astype(jnp.float32)
        already = jnp.zeros((P, ac), jnp.bool_)
        z_b = [jnp.zeros((P, ac), jnp.float32) for _ in range(Dz)]
        isnew_b = jnp.zeros((P, ac), jnp.float32)

        for i in range(Z):
            hit = (
                (tgt_s[:, i : i + 1] == lanes_f)
                & (done_s[:, i : i + 1] < 0.5)
                & ~already
            )
            already = already | hit
            for k in range(Dz):
                z_b[k] = jnp.where(hit, z_ref[i, k], z_b[k])
            isnew_b = jnp.where(hit, new_s[:, i : i + 1], isnew_b)
            lastj_s[:, sl] = jnp.where(hit, float(i), lastj_s[:, sl])
            took = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)
            done_s[:, i : i + 1] = jnp.maximum(done_s[:, i : i + 1], took)

        upd_m = already & (isnew_b < 0.5)
        alloc_m = already & (isnew_b > 0.5)

        # --- EKF update at matched lanes (same op order as v1) ------------
        m_b = [mean_o[k][:, sl] for k in range(3)]
        S = [[cov_o[_COV_IDX[(a, b)]][:, sl] for b in range(3)]
             for a in range(3)]
        p = _cam_point(R, t, m_b)
        zhat, H = _model_hH(model, p, R, par)
        nu = _model_residual(model, z_b, zhat, par)
        HS = _matmul(H, S)
        Q = _matmul(HS, _transpose(H))
        for k in range(Dz):
            Q[k][k] = Q[k][k] + r_var[k]
        Qi, _ = _sym_inv_det(Q)
        SHt = _transpose(HS)
        K = _matmul(SHt, Qi)
        m_u = [m_b[k] + sum(K[k][a] * nu[a] for a in range(Dz))
               for k in range(3)]
        KH = _matmul(K, H)
        IKH = [[(1.0 if a == b else 0.0) - KH[a][b] for b in range(3)]
               for a in range(3)]
        Snew = _matmul(IKH, S)
        c_u6 = [
            0.5 * (Snew[0][0] + Snew[0][0]),
            0.5 * (Snew[0][1] + Snew[1][0]),
            0.5 * (Snew[0][2] + Snew[2][0]),
            0.5 * (Snew[1][1] + Snew[1][1]),
            0.5 * (Snew[1][2] + Snew[2][1]),
            0.5 * (Snew[2][2] + Snew[2][2]),
        ]

        # --- allocation init at alloc lanes -------------------------------
        m_n, c_n6 = _model_init(
            model, z_b, R, Rt, t, par, r_var, init_infl,
            init_range_prior, init_range_sigma,
        )

        lc_old = lc_o[:, sl]
        # Anchor freeze (config.freeze_min_count): converged lanes keep
        # their mean/cov (fixed anchors measuring accumulated pose drift);
        # counts/descriptors still update.
        upd_move = (
            upd_m & (lc_old < float(freeze)) if freeze > 0 else upd_m
        )
        m_f = [
            jnp.where(upd_move, m_u[k], jnp.where(alloc_m, m_n[k], m_b[k]))
            for k in range(3)
        ]
        lcf = jnp.where(upd_m, lc_old + 2.0, jnp.where(alloc_m, 1.0, lc_old))
        lvf = jnp.where(alloc_m, 1.0, lv_o[:, sl])

        for k in range(6):
            cov_o[k][:, sl] = jnp.where(
                upd_move, c_u6[k],
                jnp.where(alloc_m, c_n6[k], cov_o[k][:, sl]),
            )

        # --- FOV cull, fused into round 1 (exact: collision rounds only
        # touch matched lanes, which are never cull-decremented) ------------
        if cull and first_round:
            if cull_unseen:
                # decay-eviction: every valid unmatched lane ages
                # (config.cull_unseen — long-trajectory lane recycling)
                dec = (lvf > 0) & (lanes < num_landmarks) & ~already
            else:
                pc = _cam_point(R, t, m_f)
                zh_c = _model_zhat(model, pc, par)
                in_fov = _model_in_fov(model, pc, zh_c, par, max_range)
                dec = (
                    (lvf > 0)
                    & (lanes < num_landmarks)
                    & in_fov
                    & ~already
                )
            lcf = lcf - dec.astype(jnp.float32)
            lvf = jnp.where((lvf > 0) & (lcf >= 0.0), 1.0, 0.0)

        for k in range(3):
            mean_o[k][:, sl] = m_f[k]
        lc_o[:, sl] = lcf
        lv_o[:, sl] = lvf

    def round1_chunk(c, _):
        apply_chunk(c, first_round=True)
        return 0

    if "round1" not in skip:
        jax.lax.fori_loop(0, ncw, round1_chunk, 0, unroll=False)

    if Z > 1 and "rounds" not in skip:
        # Early-exit WHILE loop, not a fixed Z-1 fori sweep: collisions
        # (two observations associating to the same lane) are rare, so the
        # common case is ZERO extra rounds — but a fori(1, Z) still paid
        # (Z-1) x ncw narrow pending/range checks + scalar-branch pipeline
        # stalls per tile, which the round-4 bisection measured at ~24 ms
        # of the 42 ms frame (the single largest cost in the kernel). The
        # while form runs exactly as many rounds as the deepest collision
        # chain.
        def round_cond(carry):
            m, pend = carry
            return pend & (m < Z)

        def round_body(carry):
            m, _ = carry

            def chunk_body(c, _):
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

    # ---- pass 5: latest-wins descriptor refresh at touched lanes ---------
    # (must run after ALL rounds: collided lanes take the LAST obs's
    # descriptor).  Chunks with no touched lane skip the select ladder.
    if W > 0:
        def desc_chunk(c, _):
            sl = pl.ds(c * ac, ac)
            lj = lastj_s[:, sl]
            any_touched = jnp.max(lj) >= 0.0

            @pl.when(any_touched)
            def _():
                for i in range(Z):
                    m = lj == float(i)
                    for w in range(W):
                        desc_o[w][:, sl] = jnp.where(
                            m, dz_ref[i, w], desc_o[w][:, sl]
                        )

            return 0

        if "desc" not in skip:
            jax.lax.fori_loop(0, ncw, desc_chunk, 0, unroll=False)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "desc_words", "par", "r_var", "desc_weight", "log_p0",
        "init_infl", "init_range_prior", "init_range_sigma", "max_range",
        "cull", "cull_unseen", "interpret", "update_weights", "freeze",
        "skip",
    ),
)
def measurement_update_3d(
    pose, log_w, lm_mean, lm_cov, lm_desc, lm_valid, lm_count,
    z, desc, valid,
    ext_ll=None, ext_ix=None,
    *,
    model: str,
    desc_words: int,
    par: tuple,           # hashable dict-as-items of camera params
    r_var: tuple,
    desc_weight: float,
    log_p0: float,
    init_infl: float,
    init_range_prior: float,
    init_range_sigma: float,
    max_range: float,
    cull: bool,
    cull_unseen: bool = False,
    interpret: bool = False,
    update_weights: bool = True,
    freeze: int = 0,
    skip: tuple = (),
):
    """Pallas-fused frame measurement update for the 3-D camera models.

    pose [P, 7] (t, q); lm_mean [P, L, 3]; lm_cov [P, L, 3, 3];
    lm_desc [P, L, W] uint32; z [Z, Dz]; desc [Z, W] uint32.
    Returns (log_w, lm_mean, lm_cov, lm_desc, lm_valid, lm_count, n_match).

    ext_ll/ext_ix ([P, Z] f32/int32, optional): precomputed association
    scores from `score_3d` (FastSLAM 2.0's proposal pose). When given the
    kernel SKIPS its own landmark sweep — the frame costs one plane
    read/write plus the narrow apply passes only.
    """
    from parakeet_slam_tpu.core import geometry

    par = dict(par)
    P, L = lm_valid.shape
    Z, Dz = z.shape
    W = desc_words
    Lp = _round_up(max(L, 128), 128)
    pad = Lp - L

    def pad_plane(a, fill=0.0):
        if pad == 0:
            return a
        return jnp.pad(a, ((0, 0), (0, pad)), constant_values=fill)

    # Pose -> [P, 12] camera row: R_cw rows then t.
    Rm = geometry.quat_to_matrix(pose[:, 3:])           # R_wc
    Rcw = jnp.swapaxes(Rm, -1, -2)
    cam = jnp.concatenate([Rcw.reshape(P, 9), pose[:, :3]], axis=1)

    mean_planes = [pad_plane(lm_mean[..., k]) for k in range(3)]
    cov_planes = [
        pad_plane(lm_cov[..., i, j])
        for (i, j) in [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    ]
    desc_planes = [
        pad_plane(lm_desc[..., w].astype(jnp.int32)) for w in range(W)
    ]
    lv = pad_plane(lm_valid.astype(jnp.float32))
    lc = pad_plane(lm_count.astype(jnp.float32))

    logw2 = log_w[:, None]
    z_in = z.astype(jnp.float32)
    if W > 0:
        dz_in = desc.astype(jnp.int32)
    else:
        dz_in = jnp.zeros((Z, 1), jnp.int32)
    vz = valid.astype(jnp.int32)

    n_aliased = 1 + 3 + 6 + W + 2
    out_shape = (
        [jax.ShapeDtypeStruct((P, 1), jnp.float32)]
        + [jax.ShapeDtypeStruct((P, Lp), jnp.float32)] * 9
        + [jax.ShapeDtypeStruct((P, Lp), jnp.int32)] * W
        + [jax.ShapeDtypeStruct((P, Lp), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((P, 1), jnp.float32)]   # n_match
    )

    n_planes = 11 + W
    # chunk sizes MUST divide Lp (the landmark axis is tiled exactly);
    # sc: scoring chunk, ac: apply chunk (see kernels/ekf_update.py v3).
    sc = next(c for c in (2048, 1024, 512, 256, 128) if Lp % c == 0)
    ac = next(c for c in (1024, 512, 256, 128) if Lp % c == 0)

    # Active high-watermark (see kernels/ekf_update.py): leading chunks
    # that contain any ever-allocated lane.
    hi_lane = jnp.max(
        jnp.where(lm_valid, jnp.arange(L, dtype=jnp.int32)[None, :], -1)
    )
    nca = jnp.clip((hi_lane + sc) // sc, 0, Lp // sc).astype(jnp.int32)

    Zp = _round_up(max(Z, 128), 128)
    budget = 48 * 1024 * 1024
    use_ext = ext_ll is not None
    # +2 double-buffered [Pt, Zp] input rows when ext scores ride along
    # (advisor r4: they were missing from the budget, undercounting VMEM)
    per_particle = (
        2 * 2 * n_planes * Lp + 1 * Lp + (6 + (4 if use_ext else 0)) * Zp
    ) * 4
    cands = [d for d in range(1, P + 1) if P % d == 0 and (d % 8 == 0 or d == P)]
    fits = [d for d in cands if d * per_particle <= budget]
    Pt = max(fits) if fits else min(cands)
    grid = (P // Pt,)
    vmem_limit = min(
        100 * 1024 * 1024,
        max(16 * 1024 * 1024, int(Pt * per_particle * 1.25) + (2 << 20)),
    )

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    row = lambda w: pl.BlockSpec(
        (Pt, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    plane = lambda: row(Lp)
    in_specs = (
        [smem(), smem(), smem(), smem()]
        + [row(12), row(1)]
        + [plane()] * (9 + W + 2)
        + ([row(Zp), row(Zp)] if use_ext else [])
    )
    out_specs = tuple([row(1)] + [plane()] * (9 + W + 2) + [row(1)])
    scratch = (
        [pltpu.VMEM((Pt, Zp), jnp.float32) for _ in range(6)]   # narrow
        + [pltpu.VMEM((Pt, Lp), jnp.float32)]                    # lastj
    )

    kernel = functools.partial(
        _kernel_entry,
        model=model,
        Dz=Dz,
        desc_words=W,
        num_obs=Z,
        num_landmarks=L,
        sc=sc,
        ac=ac,
        par=par,
        r_var=tuple(r_var),
        desc_weight=desc_weight,
        log_p0=log_p0,
        init_infl=init_infl,
        init_range_prior=init_range_prior,
        init_range_sigma=init_range_sigma,
        max_range=max_range,
        cull=cull,
        cull_unseen=cull_unseen,
        update_weights=update_weights,
        ext_scores=use_ext,
        freeze=freeze,
        skip=skip,
    )

    aliases = {5 + i: i for i in range(n_aliased)}

    operands = [z_in, dz_in, vz, nca[None], cam, logw2, *mean_planes,
                *cov_planes, *desc_planes, lv, lc]
    if use_ext:
        pad_z = Zp - Z
        operands.append(
            jnp.pad(ext_ll.astype(jnp.float32), ((0, 0), (0, pad_z)),
                    constant_values=_NEG_INF)
        )
        operands.append(
            jnp.pad(ext_ix.astype(jnp.float32), ((0, 0), (0, pad_z)))
        )

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
    )(*operands)

    logw_n = results[0][:, 0]
    mean_res = results[1:4]
    cov_res = results[4:10]
    desc_res = results[10 : 10 + W]
    lv_n, lc_n = results[10 + W], results[11 + W]
    n_match = results[12 + W][:, 0]

    unpad = lambda a: a[:, :L]
    lm_mean_n = jnp.stack([unpad(p) for p in mean_res], axis=-1)
    c = [unpad(p) for p in cov_res]
    cov_n = jnp.stack(
        [
            jnp.stack([c[0], c[1], c[2]], axis=-1),
            jnp.stack([c[1], c[3], c[4]], axis=-1),
            jnp.stack([c[2], c[4], c[5]], axis=-1),
        ],
        axis=-2,
    )
    if W > 0:
        lm_desc_n = jnp.stack(
            [unpad(p).astype(jnp.uint32) for p in desc_res], axis=-1
        )
    else:
        lm_desc_n = lm_desc
    return (
        logw_n,
        lm_mean_n,
        cov_n,
        lm_desc_n,
        unpad(lv_n) > 0.5,
        unpad(lc_n).astype(jnp.int32),
        n_match,
    )


def _kernel_entry(z_ref, dz_ref, vz_ref, hi_ref, cam_ref, logw_ref, *rest, **kw):
    _kernel(z_ref, dz_ref, vz_ref, hi_ref, cam_ref, logw_ref, rest, **kw)


# ---------------------------------------------------------------------------
# Score-only kernel (FastSLAM 2.0 proposal association)
# ---------------------------------------------------------------------------


def _score_entry(
    z_ref, dz_ref, hi_ref, cam_ref, *refs,
    model, Dz, desc_words, num_obs, num_landmarks, sc, par, r_var,
    desc_weight,
):
    W = desc_words
    mean_r = refs[0:3]
    cov_r = refs[3:9]
    desc_r = refs[9 : 9 + W]
    lv_r = refs[9 + W]
    top_ll, top_ix = refs[10 + W], refs[11 + W]
    P = lv_r.shape[0]
    top_ll[:, :] = jnp.full(top_ll.shape, _NEG_INF, jnp.float32)
    top_ix[:, :] = jnp.zeros(top_ix.shape, jnp.float32)
    R = [[cam_ref[:, 3 * i + j : 3 * i + j + 1] for j in range(3)]
         for i in range(3)]
    t = [cam_ref[:, 9 + k : 10 + k] for k in range(3)]
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (P, sc), 1)
    nca = hi_ref[0]
    _score_pass(
        mean_r, cov_r, desc_r, lv_r, z_ref, dz_ref, top_ll, top_ix,
        R, t, lane_s, nca,
        model=model, Dz=Dz, W=W, Z=num_obs, sc=sc,
        num_landmarks=num_landmarks, par=par, r_var=tuple(r_var),
        desc_weight=desc_weight,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "desc_words", "par", "r_var", "desc_weight", "interpret",
    ),
)
def score_3d(
    pose, lm_mean, lm_cov, lm_desc, lm_valid, z, desc,
    *,
    model: str,
    desc_words: int,
    par: tuple,
    r_var: tuple,
    desc_weight: float,
    interpret: bool = False,
):
    """Association scores only: per (particle, observation) best landmark
    (log-likelihood, lane) against the CURRENT map at the given poses —
    pass 1 of the fused update as a standalone kernel. This is the
    FastSLAM 2.0 proposal's single landmark sweep; feed the result to
    `measurement_update_3d(ext_ll=..., ext_ix=...)` so the map pass skips
    its own sweep. Scores are bit-identical to the fused kernel's pass 1
    (same `_score_pass` trace).

    Returns (top_ll [P, Z] f32, top_ix [P, Z] int32).
    """
    from parakeet_slam_tpu.core import geometry

    par = dict(par)
    P, L = lm_valid.shape
    Z, Dz = z.shape
    W = desc_words
    Lp = _round_up(max(L, 128), 128)
    pad = Lp - L

    def pad_plane(a, fill=0.0):
        if pad == 0:
            return a
        return jnp.pad(a, ((0, 0), (0, pad)), constant_values=fill)

    Rm = geometry.quat_to_matrix(pose[:, 3:])
    Rcw = jnp.swapaxes(Rm, -1, -2)
    cam = jnp.concatenate([Rcw.reshape(P, 9), pose[:, :3]], axis=1)

    mean_planes = [pad_plane(lm_mean[..., k]) for k in range(3)]
    cov_planes = [
        pad_plane(lm_cov[..., i, j])
        for (i, j) in [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    ]
    desc_planes = [
        pad_plane(lm_desc[..., w].astype(jnp.int32)) for w in range(W)
    ]
    lv = pad_plane(lm_valid.astype(jnp.float32))
    z_in = z.astype(jnp.float32)
    dz_in = desc.astype(jnp.int32) if W > 0 else jnp.zeros((Z, 1), jnp.int32)

    sc = next(c for c in (2048, 1024, 512, 256, 128) if Lp % c == 0)
    hi_lane = jnp.max(
        jnp.where(lm_valid, jnp.arange(L, dtype=jnp.int32)[None, :], -1)
    )
    nca = jnp.clip((hi_lane + sc) // sc, 0, Lp // sc).astype(jnp.int32)

    Zp = _round_up(max(Z, 128), 128)
    n_planes = 10 + W
    budget = 40 * 1024 * 1024
    # x2: the Pallas pipeline double-buffers the streamed input blocks
    per_particle = (2 * n_planes * Lp + 4 * Zp) * 4
    cands = [d for d in range(1, P + 1) if P % d == 0 and (d % 8 == 0 or d == P)]
    fits = [d for d in cands if d * per_particle <= budget]
    Pt = max(fits) if fits else min(cands)
    grid = (P // Pt,)
    vmem_limit = min(
        100 * 1024 * 1024,
        max(16 * 1024 * 1024, int(Pt * per_particle * 1.25) + (2 << 20)),
    )

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    row = lambda w: pl.BlockSpec(
        (Pt, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _score_entry,
        model=model, Dz=Dz, desc_words=W, num_obs=Z, num_landmarks=L,
        sc=sc, par=par, r_var=tuple(r_var), desc_weight=desc_weight,
    )
    ll, ix = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((P, Zp), jnp.float32),
            jax.ShapeDtypeStruct((P, Zp), jnp.float32),
        ),
        in_specs=(
            [smem(), smem(), smem()]
            + [row(12)]
            + [row(Lp)] * (9 + W + 1)
        ),
        out_specs=(row(Zp), row(Zp)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(z_in, dz_in, nca[None], cam, *mean_planes, *cov_planes, *desc_planes, lv)
    return ll[:, :Z], ix[:, :Z].astype(jnp.int32)
